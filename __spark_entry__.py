"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator family from SURVEY.md §2
plus the training-data operators (dedup, similarity, text analysis,
multimodal) over the driver-provided testdata tables; ``oracle_sql()``
gives the DuckDB-equivalent SQL for each (omitted only for genuinely
non-SQL-expressible ops — the token-hash SimHash approximation and the
image-feature pixel-decode UDF stage — which get rows-only checks).

Column names are aliased identically on both sides (the driver hashes
values after sorting columns by name).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cex_crawler_spark.functions.extract import extract_announcements
from cex_crawler_spark.functions.text import (
    EN_STOPWORDS,
    fingerprint_md5,
    lang_id,
    stopword_ratio,
    token_count,
)
from cex_crawler_spark.functions.urlnorm import canonicalize_url
from cex_crawler_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_candidates,
)
from cex_crawler_spark.operators.multimodal import extract_image_features
from cex_crawler_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_cosine_topk,
)
from cex_crawler_spark.session import ship_package
from cex_crawler_spark.streaming.events import (
    sessionize_events,
    windowed_event_counts,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# crawl-shaped queries over driver tables: events rows play frontier rows
# (host = user_id bucket, url from event_id) so the scheduler semantics are
# oracle-checkable on shared data.
# --------------------------------------------------------------------------

_URL_NOISE = {0: "", 1: "/", 2: "#frag", 3: "?utm_source=x&b=2"}

# run date of the reference's shipped CSVs (recovered from the 待确定 rows
# in announcements.csv — main.py stamps "today" into null/short times)
REF_RUN_DATE = "2025-09-02"


def _event_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    # the events table is one single-row-group file → one scan task; the
    # URL build + canonicalization regexes downstream would run serially
    # on one core (measured 1.2 s warm of a 1.7 s query).  Spread the
    # narrow raw rows first — the 2.4 MB shuffle costs far less than the
    # serialized regex pass (guide §2.5, input skew from one file).
    par = spark.sparkContext.defaultParallelism
    if e.rdd.getNumPartitions() < par:
        e = e.repartition(par, F.col("event_id"))
    noise = (
        F.when(F.col("event_id") % 4 == 1, "/")
        .when(F.col("event_id") % 4 == 2, "#frag")
        .when(F.col("event_id") % 4 == 3, "?utm_source=x&b=2")
        .otherwise("")
    )
    host_raw = F.concat(F.lit("host"), (F.col("user_id") % 5).cast("string"),
                        F.lit(".example.com"))
    host = F.when(F.col("event_id") % 5 == 0, F.upper(host_raw)).otherwise(host_raw)
    url = F.concat(
        F.lit("https://"), host, F.lit("/a/"),
        (F.col("event_id") % 500).cast("string"), noise,
    )
    return e.select(
        "event_id", "user_id", "ts",
        url.alias("url"),
        F.concat(F.lit("host"), (F.col("user_id") % 5).cast("string")).alias("hostname"),
    )


def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: engine canonicalization collapses noise variants — counts per host."""
    u = _event_urls(spark, sf_dir).withColumn(
        "canonical_url", canonicalize_url(F.col("url"))
    )
    return (
        u.groupBy("hostname")
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("url").alias("n_raw_distinct"),
            F.countDistinct("canonical_url").alias("n_canonical_distinct"),
        )
        .orderBy("hostname")
    )


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship crawl-scheduler semantics on shared data: canonicalize,
    dedup by canonical URL (first by ts, event_id), rank per host, budget 20."""
    u = _event_urls(spark, sf_dir).withColumn(
        "canonical_url", canonicalize_url(F.col("url"))
    )
    dd = Window.partitionBy("canonical_url").orderBy("ts", "event_id")
    first = (
        u.withColumn("rn", F.row_number().over(dd)).filter(F.col("rn") == 1).drop("rn")
    )
    rk = Window.partitionBy("hostname").orderBy("ts", "event_id")
    return (
        first.withColumn("host_seq", F.row_number().over(rk))
        .filter(F.col("host_seq") <= 20)
        .select("hostname", "host_seq", "canonical_url", "event_id")
        .orderBy("hostname", "host_seq")
    )


# --------------------------------------------------------------------------
# crawl_round_sim fixture: a deterministic frontier whose every attribute is
# plain modular arithmetic over range(n) — expressible identically in Spark
# and DuckDB, so the engine's politeness scheduler (schedule_round) gets a
# full SQL-window oracle (VERDICT r2 item 4).  Semantics mirror
# synth.gen_frontier (hot-host skew, robots paths, surface-noise dup URLs,
# post-fetch-time hosts); only the mixing functions differ (multiplicative
# mixes instead of xxhash64, which DuckDB lacks).
# --------------------------------------------------------------------------

SIM_N = 2000
SIM_WATERMARK = "2025-08-29 00:00:00"


def gen_sim_frontier(spark: SparkSession, n: int = SIM_N) -> DataFrame:
    from cex_crawler_spark.synth import (
        BASE_TIME,
        HOSTS,
        POST_FETCH_TIME_HOSTS,
        SECTIONS,
    )

    sid = F.col("id")
    is_dup = (sid % 17 == 0) & (sid > 0)
    target = F.when(is_dup, sid - 1).otherwise(sid)
    hmix = (target * 2654435761) % 26
    host_idx = F.when(hmix < 13, F.lit(0)).otherwise(hmix - 12)
    host = F.element_at(
        F.array(*[F.lit(h) for h in HOSTS]), (host_idx + 1).cast("int")
    )
    robots_hit = ((target * 40503 + 7) % 13) == 0
    path = F.when(
        robots_hit, F.format_string("/private/a/%d", target)
    ).otherwise(F.format_string("/a/%d", target))
    noise = (sid * 69069 + 1) % 5
    raw_host = F.when(noise == 2, F.upper(host)).otherwise(host)
    suffix = (
        F.when(noise == 1, F.lit("/"))
        .when(noise == 3, F.lit("#frag"))
        .when(noise == 4, F.lit("?utm_source=x"))
        .otherwise(F.lit(""))
    )
    url = F.concat(F.lit("https://"), raw_host, F.lit(".example.com"), path, suffix)
    section = F.element_at(
        F.array(*[F.lit(s) for s in SECTIONS]),
        ((target * 48271) % 3 + 1).cast("int"),
    )
    release_time = (
        F.to_timestamp(F.lit(BASE_TIME))
        - F.make_interval(days=(target * 16807) % 30,
                          hours=(target * 22695477) % 24)
    )
    out = spark.range(n).select(
        url.alias("url"),
        host.alias("host"),
        section.alias("section"),
        # NON-constant priority levels so the oracle actually verifies
        # priority-major crawl order (lower = sooner), not just the
        # reference's section order
        ((target * 7919) % 3).cast("long").alias("priority"),
        sid.alias("seed_id"),
        F.format_string("sim %d", target).alias("title"),
        release_time.alias("release_time"),
        F.format_string("img%010d", target % 100).alias("image_id"),
        (~host.isin(POST_FETCH_TIME_HOSTS)).alias("time_known_prefetch"),
        F.lit(None).cast("string").alias("duplicate_of"),
    )
    w = Window.partitionBy("host", "section").orderBy("seed_id")
    return out.withColumn("seq", F.row_number().over(w).cast("long"))


# --------------------------------------------------------------------------
# sim-images fixture: a deterministic image+caption metadata table in the
# exact input-hint shape (image_id, w, h, fmt, caption, phash) — every
# attribute plain integer arithmetic over range(n), expressible identically
# in Spark and DuckDB, so the image-payload curation path (LAION-style
# gates + perceptual-hash dedup + Hamming near-dup pairs) gets full SQL
# oracles instead of rows-only checks.  Exact-dup rows (every 13th) copy
# the previous row's phash; near-dup rows (every 29th) flip one bit of the
# row-two-back base hash.  The 64-bit phash is built from two 32-bit mixes
# so all four 16-bit Hamming blocks carry entropy (a <2^40 hash would make
# the top block a single degenerate bucket).
# --------------------------------------------------------------------------

SIM_IMG_N = 4000


def gen_sim_images(spark: SparkSession, n: int = SIM_IMG_N) -> DataFrame:
    sid = F.col("id")
    exact_dup = (sid % 13 == 0) & (sid > 0)
    near_dup = (sid % 29 == 0) & (sid > 1) & ~exact_dup
    t = F.when(exact_dup, sid - 1).when(near_dup, sid - 2).otherwise(sid)
    m1 = (t * 2654435761 + 11) % 2147483648
    m2 = (t * 40503 + 7) % 4294967296
    base = m1 * 4294967296 + m2
    phash = F.when(
        near_dup,
        base.bitwiseXOR(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 62 AS INT))")),
    ).otherwise(base)
    caption = F.concat(
        F.lit("img "),
        sid.cast("string"),
        F.expr("repeat(' tok', CAST((id * 48271 + 5) % 12 AS INT))"),
    )
    fmt = F.element_at(
        F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp"), F.lit("gif")),
        ((sid * 69069) % 4 + 1).cast("int"),
    )
    return spark.range(n).select(
        F.format_string("img%010d", sid).alias("image_id"),
        (16 * (1 + (sid * 48271) % 40)).cast("int").alias("w"),
        (16 * (1 + (sid * 16807) % 40)).cast("int").alias("h"),
        fmt.alias("fmt"),
        caption.alias("caption"),
        phash.cast("long").alias("phash"),
    )


def _sim_images_sql(n: int = SIM_IMG_N) -> str:
    """DuckDB CTE regenerating gen_sim_images row-for-row."""
    return f"""
      sim_images AS (
        SELECT printf('img%010d', sid) AS image_id,
               CAST(16 * (1 + (sid * 48271) % 40) AS INTEGER) AS w,
               CAST(16 * (1 + (sid * 16807) % 40) AS INTEGER) AS h,
               ['jpeg', 'png', 'webp', 'gif'][CAST((sid * 69069) % 4 + 1 AS INTEGER)] AS fmt,
               'img ' || sid || repeat(' tok', CAST((sid * 48271 + 5) % 12 AS INTEGER)) AS caption,
               CASE WHEN near_dup
                    THEN xor(base, CAST(1 AS BIGINT) << CAST(sid % 62 AS INTEGER))
                    ELSE base END AS phash
        FROM (
          SELECT sid, near_dup,
                 ((t * 2654435761 + 11) % 2147483648) * 4294967296
                 + (t * 40503 + 7) % 4294967296 AS base
          FROM (
            SELECT sid, near_dup,
                   CASE WHEN exact_dup THEN sid - 1
                        WHEN near_dup THEN sid - 2
                        ELSE sid END AS t
            FROM (
              SELECT range AS sid,
                     (range % 13 = 0 AND range > 0) AS exact_dup,
                     (range % 29 = 0 AND range > 1
                      AND NOT (range % 13 = 0 AND range > 0)) AS near_dup
              FROM range({n})
            )
          )
        )
      )
    """


# --------------------------------------------------------------------------
# sim fetch-history fixture: per-URL revisit summaries (visits, observed
# changes, revisit interval, age since last fetch) as plain modular
# arithmetic over range(n) — the SQL-mirrored input for the Cho &
# Garcia-Molina change-rate recrawl scheduler (operators/recrawl.py).
# --------------------------------------------------------------------------

SIM_HIST_N = 3000


def gen_sim_fetch_history(spark: SparkSession, n: int = SIM_HIST_N) -> DataFrame:
    sid = F.col("id")
    visits = 2 + (sid * 48271) % 9
    return spark.range(n).select(
        F.format_string("url%08d", sid).alias("url_id"),
        visits.cast("long").alias("n_visits"),
        ((sid * 69069) % (visits + 1)).cast("long").alias("n_changed"),
        (1 + (sid * 16807) % 14).cast("long").alias("interval_days"),
        (1 + (sid * 40503) % 30).cast("long").alias("age_days"),
    )


def _sim_history_sql(n: int = SIM_HIST_N) -> str:
    return f"""
      sim_history AS (
        SELECT printf('url%08d', sid) AS url_id,
               2 + (sid * 48271) % 9 AS n_visits,
               (sid * 69069) % (2 + (sid * 48271) % 9 + 1) AS n_changed,
               1 + (sid * 16807) % 14 AS interval_days,
               1 + (sid * 40503) % 30 AS age_days
        FROM (SELECT range AS sid FROM range({n}))
      )
    """


# --------------------------------------------------------------------------
# sim fetch-attempt log: per URL 1-6 attempts, ~20% deterministic
# failures, every 11th URL permanently failing (exercises give_up).
# --------------------------------------------------------------------------

SIM_ATTEMPT_URLS = 500
_SIM_ATTEMPT_MAX = 6


def gen_sim_attempts(spark: SparkSession, n_urls: int = SIM_ATTEMPT_URLS) -> DataFrame:
    u = (F.col("id") / _SIM_ATTEMPT_MAX).cast("long")
    j = F.col("id") % _SIM_ATTEMPT_MAX
    ok = ~((u % 11 == 0) | ((u * 48271 + j * 69069) % 5 == 0))
    base = F.unix_timestamp(F.lit("2025-08-01 00:00:00"))
    return (
        spark.range(n_urls * _SIM_ATTEMPT_MAX)
        .filter(j < 1 + (u * 31) % _SIM_ATTEMPT_MAX)
        .select(
            F.format_string("url%06d", u.cast("int")).alias("url_hash"),
            F.timestamp_seconds(base + (u % 53) * 60 + j * 3600).alias("fetch_ts"),
            ok.alias("ok"),
        )
    )


def _sim_attempts_sql(n_urls: int = SIM_ATTEMPT_URLS) -> str:
    m = _SIM_ATTEMPT_MAX
    return f"""
      sim_attempts AS (
        SELECT printf('url%06d', u) AS url_hash,
               TIMESTAMP '2025-08-01 00:00:00'
                 + to_seconds((u % 53) * 60 + j * 3600) AS fetch_ts,
               NOT (u % 11 = 0 OR (u * 48271 + j * 69069) % 5 = 0) AS ok
        FROM (
          SELECT range // {m} AS u, range % {m} AS j
          FROM range({n_urls * m})
        )
        WHERE j < 1 + (u * 31) % {m}
      )
    """


# --------------------------------------------------------------------------
# sim fetch-health fixture: per-attempt latency + outcome over 23 hosts.
# h03 is SLOW (multi-second latencies → the 3×p95 term dominates), h07
# ERRORS on even attempts (error_rate ≈ 0.55 > 0.3 → delay doubles),
# everything else is healthy (~5% background failures, sub-second
# latency → the 200 ms floor or a modest 3×p95).  All integer
# arithmetic, SQL-mirrored below.
# --------------------------------------------------------------------------

SIM_HEALTH_N = 4000
KMEANS_N = 600


def gen_sim_health(spark: SparkSession, n: int = SIM_HEALTH_N) -> DataFrame:
    sid = F.col("id")
    hostid = sid % 23
    slow = hostid == 3
    latency = (
        F.lit(50)
        + (sid * 48271) % 400
        + F.when(slow, F.lit(2000) + (sid * 69069) % 3000).otherwise(F.lit(0))
    )
    ok = ~(((hostid == 7) & (sid % 2 == 0)) | ((sid * 16807) % 20 == 0))
    return spark.range(n).select(
        F.format_string("h%02d", hostid.cast("int")).alias("host"),
        latency.cast("long").alias("latency_ms"),
        ok.alias("ok"),
    )


def _sim_health_sql(n: int = SIM_HEALTH_N) -> str:
    return f"""
      sim_health AS (
        SELECT printf('h%02d', sid % 23) AS host,
               CAST(50 + (sid * 48271) % 400
                    + CASE WHEN sid % 23 = 3
                           THEN 2000 + (sid * 69069) % 3000
                           ELSE 0 END AS BIGINT) AS latency_ms,
               NOT ((sid % 23 = 7 AND sid % 2 = 0)
                    OR (sid * 16807) % 20 = 0) AS ok
        FROM (SELECT range AS sid FROM range({n}))
      )
    """


# --------------------------------------------------------------------------
# sim trap-frontier fixture: URLs over 8 hosts (varied public suffixes for
# the registrable-domain rollup) where two hosts are calendar traps — their
# whole URL mass collapses to one template — and the rest spread over four
# path shapes.  SQL-mirrored like the other sim fixtures.
# --------------------------------------------------------------------------

SIM_TRAP_N = 3000
SIM_TRAP_HOSTS = [
    "shop.example.com", "news.example.co.uk", "blog.foo.org", "img.b.co.jp",
    "cdn.bar.com", "x.baz.net", "www.qux.com.au", "static.quux.io",
]


def gen_sim_trap_frontier(spark: SparkSession, n: int = SIM_TRAP_N) -> DataFrame:
    sid = F.col("id")
    hostid = (sid * 2654435761) % 8
    host = F.element_at(
        F.array(*[F.lit(h) for h in SIM_TRAP_HOSTS]), (hostid + 1).cast("int")
    )
    # floor(sid/8) decorrelates kind from hostid (sids per host are a
    # residue class mod 8, so any affine fn of sid is constant mod 4 there)
    kind = F.when(hostid < 2, F.lit(0)).otherwise(F.floor(sid / 8) % 4)
    path = (
        F.when(kind == 0, F.format_string("/cal/%d/%d", 1 + sid % 12, 1 + sid % 28))
        .when(kind == 1, F.format_string("/item/%d", sid))
        .when(kind == 2, F.format_string("/s/%08x", sid * 40503 + 9))
        .otherwise(F.format_string("/page?id=%d&sort=asc", sid % 50))
    )
    return spark.range(n).select(
        host.alias("host"),
        F.concat(F.lit("https://"), host, path).alias("url"),
    )


def _sim_traps_sql(n: int = SIM_TRAP_N) -> str:
    hosts_sql = ", ".join(f"'{h}'" for h in SIM_TRAP_HOSTS)
    return f"""
      sim_traps AS (
        SELECT host, 'https://' || host || path AS url
        FROM (
          SELECT [{hosts_sql}][CAST(hostid + 1 AS INTEGER)] AS host,
                 CASE kind
                   WHEN 0 THEN printf('/cal/%d/%d', 1 + sid % 12, 1 + sid % 28)
                   WHEN 1 THEN printf('/item/%d', sid)
                   WHEN 2 THEN printf('/s/%08x', sid * 40503 + 9)
                   ELSE printf('/page?id=%d&sort=asc', sid % 50)
                 END AS path
          FROM (
            SELECT sid, hostid,
                   CASE WHEN hostid < 2 THEN 0
                        ELSE (sid // 8) % 4 END AS kind
            FROM (
              SELECT range AS sid, (range * 2654435761) % 8 AS hostid
              FROM range({n})
            )
          )
        )
      )
    """


# --------------------------------------------------------------------------
# sim DUST fetch log: (host, url, digest) rows where digest is a pure
# function of the CONTENT-DETERMINING URL parts, so parameter significance
# is learnable from the log alone.  Per host:
#   shop:  page (relevant), sessionid (noise), ref (noise hidden BEHIND the
#          session id — only learnable on pass 2, after sessionid strips)
#   news:  lang (constant — no evidence, kept), sort (relevant: conflicts)
#   cdn:   v (noise, learnable pass 1); every 5th cdn URL has NO query
# --------------------------------------------------------------------------

SIM_DUST_N = 4000


def gen_sim_dust_log(spark: SparkSession, n: int = SIM_DUST_N) -> DataFrame:
    sid = F.col("id")
    hostid = sid % 3
    host = F.element_at(
        F.array(
            F.lit("shop.example.com"),
            F.lit("news.example.org"),
            F.lit("cdn.example.net"),
        ),
        (hostid + 1).cast("int"),
    )
    url = (
        F.when(
            hostid == 0,
            F.format_string(
                "https://shop.example.com/p/%d?page=%d&sessionid=%d&ref=%d",
                sid % 9,
                sid % 5,
                (sid * 48271) % 997,
                sid % 7,
            ),
        )
        .when(
            hostid == 1,
            F.format_string(
                "https://news.example.org/a/%d?lang=en&sort=%d",
                sid % 8,
                F.floor(sid / 3) % 3,
            ),
        )
        .otherwise(
            F.when(
                sid % 5 == 0,
                F.format_string("https://cdn.example.net/f/%d", sid % 7),
            ).otherwise(
                F.format_string(
                    "https://cdn.example.net/f/%d?v=%d", sid % 7, sid % 11
                )
            )
        )
    )
    digest = (
        F.when(hostid == 0, F.md5(F.format_string("shop|/p/%d|%d", sid % 9, sid % 5)))
        .when(
            hostid == 1,
            F.md5(F.format_string("news|/a/%d|%d", sid % 8, F.floor(sid / 3) % 3)),
        )
        .otherwise(F.md5(F.format_string("cdn|/f/%d", sid % 7)))
    )
    return spark.range(n).select(
        host.alias("host"), url.alias("url"), digest.alias("digest")
    )


def _sim_dust_sql(n: int = SIM_DUST_N) -> str:
    return f"""
      sim_dust AS (
        SELECT CASE hostid WHEN 0 THEN 'shop.example.com'
                           WHEN 1 THEN 'news.example.org'
                           ELSE 'cdn.example.net' END AS host,
               CASE hostid
                 WHEN 0 THEN printf(
                   'https://shop.example.com/p/%d?page=%d&sessionid=%d&ref=%d',
                   sid % 9, sid % 5, (sid * 48271) % 997, sid % 7)
                 WHEN 1 THEN printf(
                   'https://news.example.org/a/%d?lang=en&sort=%d',
                   sid % 8, (sid // 3) % 3)
                 ELSE CASE WHEN sid % 5 = 0
                   THEN printf('https://cdn.example.net/f/%d', sid % 7)
                   ELSE printf('https://cdn.example.net/f/%d?v=%d',
                               sid % 7, sid % 11) END
               END AS url,
               CASE hostid
                 WHEN 0 THEN md5(printf('shop|/p/%d|%d', sid % 9, sid % 5))
                 WHEN 1 THEN md5(printf('news|/a/%d|%d', sid % 8, (sid // 3) % 3))
                 ELSE md5(printf('cdn|/f/%d', sid % 7))
               END AS digest
        FROM (SELECT range AS sid, range % 3 AS hostid FROM range({n}))
      )
    """


# --------------------------------------------------------------------------
# sim mirror-pages fixture: 12 hosts' (host, digest) fetch log.  m00/m01/m02
# are full mirrors (plus two m01-only pages — containment, not equality),
# m03 is a 60% partial clone of the same site (below the 90% bar), m04-m11
# serve unique content, and EVERY host shares one 'blank' boilerplate digest
# (df 12 — the doc-frequency cap must drop it or everything links).
# --------------------------------------------------------------------------

SIM_MIRROR_N = 12 * 53


def gen_sim_mirror_pages(spark: SparkSession, n: int = SIM_MIRROR_N) -> DataFrame:
    sid = F.col("id")
    k = F.floor(sid / 53)
    j = sid % 53
    key = (
        F.when(j == 52, F.lit("blank"))
        .when(k.isin(0, 1, 2) & (j < 50), F.format_string("doc%d", j))
        .when((k == 1) & (j >= 50) & (j < 52), F.format_string("own1-%d", j))
        .when((k == 3) & (j < 30), F.format_string("doc%d", j))
        .when((k == 3) & (j >= 30) & (j < 50), F.format_string("own3-%d", j))
        .when((k >= 4) & (j < 40), F.format_string("u%d-%d", k, j))
    )
    return (
        spark.range(n)
        .select(
            F.format_string("m%02d", k).alias("host"),
            F.md5(key).alias("digest"),
        )
        .filter(F.col("digest").isNotNull())
    )


def _sim_mirror_sql(n: int = SIM_MIRROR_N) -> str:
    return f"""
      sim_mirror AS (
        SELECT printf('m%02d', k) AS host, md5(key) AS digest
        FROM (
          SELECT k, j,
                 CASE WHEN j = 52 THEN 'blank'
                      WHEN k IN (0, 1, 2) AND j < 50 THEN printf('doc%d', j)
                      WHEN k = 1 AND j >= 50 AND j < 52
                        THEN printf('own1-%d', j)
                      WHEN k = 3 AND j < 30 THEN printf('doc%d', j)
                      WHEN k = 3 AND j >= 30 AND j < 50
                        THEN printf('own3-%d', j)
                      WHEN k >= 4 AND j < 40 THEN printf('u%d-%d', k, j)
                 END AS key
          FROM (SELECT range // 53 AS k, range % 53 AS j FROM range({n}))
        ) WHERE key IS NOT NULL
      )
    """


# --------------------------------------------------------------------------
# sim novelty fixture: 4-round fetch log over 6 hosts — fresh (unique
# digests every fetch), stale (30 digests re-served forever), mixed (half
# new / half boilerplate), a SYNDICATOR republishing fresh's previous-round
# digests (per-host dedup is blind to it; global first-seen is not), a
# 5-fetch small host under min_docs, and a slow-cycle medium host.
# --------------------------------------------------------------------------

SIM_NOVELTY_N = 2400


def gen_sim_novelty_log(spark: SparkSession, n: int = SIM_NOVELTY_N) -> DataFrame:
    sid = F.col("id")
    k = sid % 6
    i = F.floor(sid / 6)
    host = F.element_at(
        F.array(
            F.lit("fresh.com"), F.lit("stale.com"), F.lit("mixed.com"),
            F.lit("syndicator.com"), F.lit("small.com"), F.lit("medium.com"),
        ),
        (k + 1).cast("int"),
    )
    key = (
        F.when(k == 0, F.format_string("f%d", i))
        .when(k == 1, F.format_string("s%d", i % 30))
        .when(
            k == 2,
            F.when(i % 2 == 0, F.format_string("mx%d", i)).otherwise(
                F.format_string("mr%d", i % 10)
            ),
        )
        .when(
            k == 3,
            F.when(i < 100, F.format_string("y%d", i)).otherwise(
                F.format_string("f%d", i - 100)
            ),
        )
        .when((k == 4) & (i < 5), F.format_string("v%d", i))
        .when(k == 5, F.format_string("k%d", i % 350))
    )
    return (
        spark.range(n)
        .select(
            host.alias("host"),
            F.md5(key).alias("digest"),
            F.floor(i / 100).cast("long").alias("round"),
        )
        .filter(F.col("digest").isNotNull())
    )


def _sim_novelty_sql(n: int = SIM_NOVELTY_N) -> str:
    return f"""
      sim_novelty AS (
        SELECT CASE k WHEN 0 THEN 'fresh.com' WHEN 1 THEN 'stale.com'
                      WHEN 2 THEN 'mixed.com' WHEN 3 THEN 'syndicator.com'
                      WHEN 4 THEN 'small.com' ELSE 'medium.com' END AS host,
               md5(key) AS digest,
               i // 100 AS round
        FROM (
          SELECT k, i,
                 CASE WHEN k = 0 THEN printf('f%d', i)
                      WHEN k = 1 THEN printf('s%d', i % 30)
                      WHEN k = 2 THEN CASE WHEN i % 2 = 0
                                           THEN printf('mx%d', i)
                                           ELSE printf('mr%d', i % 10) END
                      WHEN k = 3 THEN CASE WHEN i < 100
                                           THEN printf('y%d', i)
                                           ELSE printf('f%d', i - 100) END
                      WHEN k = 4 AND i < 5 THEN printf('v%d', i)
                      WHEN k = 5 THEN printf('k%d', i % 350)
                 END AS key
          FROM (SELECT range % 6 AS k, range // 6 AS i FROM range({n}))
        ) WHERE key IS NOT NULL
      )
    """


# --------------------------------------------------------------------------
# sim alias fixture for the collapse capstone: two mirror hosts serve the
# same 40 pages (digest shared), a third serves 50 unique pages; EVERY url
# carries a session-id param, so each page appears under ~25 raw aliases.
# The true fetch set is 40 + 50 URLs hiding in 3000 raw frontier rows.
# --------------------------------------------------------------------------

SIM_ALIAS_N = 3000


def gen_sim_alias_log(spark: SparkSession, n: int = SIM_ALIAS_N) -> DataFrame:
    sid = F.col("id")
    hostid = sid % 3
    host = F.element_at(
        F.array(
            F.lit("w0.site.com"), F.lit("w1.site.com"), F.lit("unique.org")
        ),
        (hostid + 1).cast("int"),
    )
    pid = F.when(hostid < 2, F.floor(sid / 3) % 40).otherwise(
        F.floor(sid / 3) % 50
    )
    url = F.format_string(
        "https://%s/p/%d?sid=%d", host, pid, (sid * 48271) % 997
    )
    digest = F.when(hostid < 2, F.md5(F.format_string("page%d", pid))).otherwise(
        F.md5(F.format_string("u%d", pid))
    )
    return spark.range(n).select(
        host.alias("host"), url.alias("url"), digest.alias("digest")
    )


def _sim_alias_sql(n: int = SIM_ALIAS_N) -> str:
    return f"""
      sim_alias AS (
        SELECT host,
               printf('https://%s/p/%d?sid=%d', host, pid,
                      (sid * 48271) % 997) AS url,
               CASE WHEN hostid < 2 THEN md5(printf('page%d', pid))
                    ELSE md5(printf('u%d', pid)) END AS digest
        FROM (
          SELECT sid, hostid,
                 CASE hostid WHEN 0 THEN 'w0.site.com'
                             WHEN 1 THEN 'w1.site.com'
                             ELSE 'unique.org' END AS host,
                 CASE WHEN hostid < 2 THEN (sid // 3) % 40
                      ELSE (sid // 3) % 50 END AS pid
          FROM (SELECT range AS sid, range % 3 AS hostid FROM range({n}))
        )
      )
    """


# Mirror-pair replay as a reusable CTE suffix over ``src`` (host, digest):
# distinct sets → df cap → digest self-join → containment verdict.
def _mirror_pairs_sql(
    src: str,
    min_shared: int = 10,
    min_containment_pct: int = 90,
    max_hosts_per_digest: int = 8,
) -> str:
    return f"""
      {src}_hd AS (SELECT DISTINCT host, digest FROM {src}),
      {src}_ok AS (
        SELECT digest FROM {src}_hd
        GROUP BY digest HAVING count(*) <= {max_hosts_per_digest}
      ),
      {src}_capped AS (
        SELECT h.* FROM {src}_hd h JOIN {src}_ok USING (digest)
      ),
      {src}_sizes AS (
        SELECT host, count(*) AS n FROM {src}_capped GROUP BY host
      ),
      {src}_shared AS (
        SELECT a.host AS host_a, b.host AS host_b, count(*) AS shared
        FROM {src}_capped a
        JOIN {src}_capped b ON a.digest = b.digest AND a.host < b.host
        GROUP BY a.host, b.host
      ),
      {src}_pairs AS (
        SELECT host_a, host_b,
               CAST(shared AS BIGINT) AS shared,
               CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b,
               (shared >= {min_shared}
                AND shared * 100 >= {min_containment_pct} * least(sa.n, sb.n))
                 AS is_mirror
        FROM {src}_shared p
        JOIN {src}_sizes sa ON p.host_a = sa.host
        JOIN {src}_sizes sb ON p.host_b = sb.host
      )
    """


# The param-significance replay as a reusable CTE suffix: groups keyed
# (host, param, residual) from list ops, then the verdict rollup.
# ``src`` is the CTE name holding (host, url, digest).
def _dust_rules_sql(src: str, min_groups: int = 3) -> str:
    return f"""
      {src}_parts AS (
        SELECT host, digest, url,
               regexp_extract(url, '^([^?]*)', 1) AS base,
               CASE WHEN regexp_extract(url, '\\?(.*)$', 1) = '' THEN []
                    ELSE string_split(regexp_extract(url, '\\?(.*)$', 1), '&')
               END AS params
        FROM {src}
      ),
      {src}_exploded AS (
        SELECT host, digest, base, params, unnest(params) AS item
        FROM {src}_parts
      ),
      {src}_keyed AS (
        SELECT host, digest,
               string_split(item, '=')[1] AS param,
               coalesce(string_split(item, '=')[2], '') AS value,
               base || '|' || coalesce(array_to_string(
                 list_sort(list_filter(params,
                   x -> string_split(x, '=')[1] <> string_split(item, '=')[1])),
                 '&'), '') AS residual
        FROM {src}_exploded
      ),
      {src}_groups AS (
        SELECT host, param, residual,
               count(DISTINCT value) AS n_values,
               count(DISTINCT digest) AS n_digests
        FROM {src}_keyed GROUP BY host, param, residual
      ),
      {src}_rules AS (
        SELECT host, param,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_values >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_varied_groups,
               CAST(sum(CASE WHEN n_values >= 2 AND n_digests >= 2
                             THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_conflict_groups,
               (sum(CASE WHEN n_values >= 2 THEN 1 ELSE 0 END)
                  >= {min_groups}
                AND sum(CASE WHEN n_values >= 2 AND n_digests >= 2
                             THEN 1 ELSE 0 END) = 0) AS irrelevant
        FROM {src}_groups GROUP BY host, param
      )
    """


# --------------------------------------------------------------------------
# sim link-graph fixture: 4000 deterministic edges over ≤600 nodes; srcs
# only cover ids < 500, so ids 500-599 that appear as dst are DANGLING
# (out-degree 0) — exercising pagerank's dangling-mass redistribution.
# --------------------------------------------------------------------------

SIM_EDGE_N = 4000


def gen_sim_linkgraph(spark: SparkSession, n: int = SIM_EDGE_N) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        ((i * 2654435761) % 500).alias("src"),
        ((i * 48271 + 17) % 600).alias("dst"),
    )


def _sim_linkgraph_sql(n: int = SIM_EDGE_N) -> str:
    return f"""
      sim_edges AS (
        SELECT (range * 2654435761) % 500 AS src,
               (range * 48271 + 17) % 600 AS dst
        FROM range({n})
      )
    """


def gen_sim_opicgraph(spark: SparkSession, n: int = SIM_EDGE_N) -> DataFrame:
    """Skewed variant of the sim linkgraph: every 7th-or-8th edge is
    redirected onto a 50-page hub tier.  The plain modular graph is
    EXACTLY vertex-uniform (6-out/5-in everywhere) — integer OPIC sits
    at its fixed point there, cash == init for every node, so a broken
    operator would still 'match'.  The hub tier breaks the symmetry:
    in-degree, residues and pool flow all vary."""
    i = F.col("id")
    return spark.range(n).select(
        ((i * 2654435761) % 500).alias("src"),
        F.when(i % 7 < 2, (i * 131) % 50)
        .otherwise((i * 48271 + 17) % 600)
        .alias("dst"),
    )


def _sim_opicgraph_sql(n: int = SIM_EDGE_N) -> str:
    return f"""
      sim_edges AS (
        SELECT (range * 2654435761) % 500 AS src,
               CASE WHEN range % 7 < 2 THEN (range * 131) % 50
                    ELSE (range * 48271 + 17) % 600 END AS dst
        FROM range({n})
      )
    """


# --------------------------------------------------------------------------
# sim meta-robots fixture: pages carrying <meta name="robots"> directives
# (both attribute orders, a "none" alias, a decoy viewport meta) and two
# links of which one is rel="nofollow" on every third page.
# --------------------------------------------------------------------------

SIM_META_PAGE_N = 300


def gen_sim_meta_pages(spark: SparkSession, n: int = SIM_META_PAGE_N) -> DataFrame:
    i = F.col("id")
    meta1 = F.when(i % 5 == 0, F.lit('<meta name="robots" content="noindex, follow">')).otherwise(F.lit(""))
    meta2 = F.when(i % 7 == 0, F.lit('<meta content="nofollow" name="robots">')).otherwise(F.lit(""))
    meta3 = F.when(i % 11 == 3, F.lit('<meta name="robots" content="none">')).otherwise(F.lit(""))
    l1 = F.format_string(
        '<a href="https://m%d.example.com/p/%d">a</a>',
        (i % 6).cast("int"), ((i * 13) % 50).cast("int"),
    )
    l2 = F.when(
        i % 3 == 0,
        F.format_string(
            '<a href="https://m%d.example.com/q/%d" rel="nofollow">b</a>',
            ((i + 1) % 6).cast("int"), (i % 50).cast("int"),
        ),
    ).otherwise(
        F.format_string(
            '<a href="https://m%d.example.com/q/%d">b</a>',
            ((i + 1) % 6).cast("int"), (i % 50).cast("int"),
        )
    )
    html = F.concat(
        F.lit('<html><head><meta name="viewport" content="width=1">'),
        meta1, meta2, meta3,
        F.lit('</head><body><a name="x">decoy</a>'),
        l1, l2,
        F.lit("</body></html>"),
    )
    return spark.range(n).select(
        F.format_string("https://m%d.example.com/page/%d", (i % 6).cast("int"), i.cast("int")).alias("url"),
        html.alias("html"),
    )


def _sim_meta_pages_sql(n: int = SIM_META_PAGE_N) -> str:
    return f"""
      sim_meta_pages AS (
        SELECT printf('https://m%d.example.com/page/%d', i % 6, i) AS url,
               '<html><head><meta name="viewport" content="width=1">'
               || CASE WHEN i % 5 = 0 THEN '<meta name="robots" content="noindex, follow">' ELSE '' END
               || CASE WHEN i % 7 = 0 THEN '<meta content="nofollow" name="robots">' ELSE '' END
               || CASE WHEN i % 11 = 3 THEN '<meta name="robots" content="none">' ELSE '' END
               || '</head><body><a name="x">decoy</a>'
               || printf('<a href="https://m%d.example.com/p/%d">a</a>', i % 6, (i * 13) % 50)
               || CASE WHEN i % 3 = 0
                       THEN printf('<a href="https://m%d.example.com/q/%d" rel="nofollow">b</a>', (i + 1) % 6, i % 50)
                       ELSE printf('<a href="https://m%d.example.com/q/%d">b</a>', (i + 1) % 6, i % 50) END
               || '</body></html>' AS html
        FROM (SELECT range AS i FROM range({n}))
      )
    """


# --------------------------------------------------------------------------
# sim trust-graph fixture: the classic spam-farm topology — a good core
# (0-99, two modular out-links each, plus a link into one of 10 dst-only
# dangling sinks 181-190), an 80-node spam farm (100-179) in a boosting
# star with its target 180, and ONE hijacked edge 50→180 making the farm
# reachable.  Seeds = 0-9.  The farm target earns real PageRank from the
# star but near-zero TrustRank (one attenuated path from the core), so
# its relative spam mass ≈ 1 while good-core mass stays low/negative.
# --------------------------------------------------------------------------

SIM_TRUST_SEEDS = 10


def gen_sim_trustgraph(spark: SparkSession) -> DataFrame:
    i = F.col("id")
    good = spark.range(100).select(i.alias("src"), ((i * 31 + 7) % 100).alias("dst"))
    good2 = spark.range(100).select(i.alias("src"), ((i * 17 + 3) % 100).alias("dst"))
    sinks = spark.range(100).select(i.alias("src"), (181 + i % 10).alias("dst"))
    farm_in = spark.range(80).select((100 + i).alias("src"), F.lit(180).cast("long").alias("dst"))
    farm_out = spark.range(80).select(F.lit(180).cast("long").alias("src"), (100 + i).alias("dst"))
    hijack = spark.range(1).select(F.lit(50).cast("long").alias("src"), F.lit(180).cast("long").alias("dst"))
    return good.unionByName(good2).unionByName(sinks).unionByName(farm_in).unionByName(farm_out).unionByName(hijack)


def _sim_trustgraph_sql() -> str:
    return """
      trust_edges AS (
        SELECT range AS src, (range * 31 + 7) % 100 AS dst FROM range(100)
        UNION ALL
        SELECT range, (range * 17 + 3) % 100 FROM range(100)
        UNION ALL
        SELECT range, 181 + range % 10 FROM range(100)
        UNION ALL
        SELECT 100 + range, 180 FROM range(80)
        UNION ALL
        SELECT 180, 100 + range FROM range(80)
        UNION ALL
        SELECT 50, 180
      )
    """


# --------------------------------------------------------------------------
# sim redirect-graph fixture: a functional 3xx graph — 20 disjoint
# 20-hop chains (srcs 0-399, chain r resolves to terminal 1380+r), a
# planted 3-cycle 400→401→402→400, and a tail 403→400 leading INTO the
# cycle.  Chains exercise pointer-jump doubling; the cycle and its tail
# must come back unresolved (final_url NULL).
# --------------------------------------------------------------------------

SIM_REDIRECT_N = 404


def gen_sim_redirects(spark: SparkSession, n: int = SIM_REDIRECT_N) -> DataFrame:
    i = F.col("id")
    return spark.range(n).select(
        i.alias("src"),
        F.when(i < 380, i + 20)
        .when(i < 400, i + 1000)
        .when(i < 403, 400 + (i - 399) % 3)
        .otherwise(F.lit(400).cast("long"))
        .alias("dst"),
    )


def _sim_redirects_sql(n: int = SIM_REDIRECT_N) -> str:
    return f"""
      redirect_edges AS (
        SELECT range AS src,
               CASE WHEN range < 380 THEN range + 20
                    WHEN range < 400 THEN range + 1000
                    WHEN range < 403 THEN 400 + (range - 399) % 3
                    ELSE 400 END AS dst
        FROM range({n})
      )
    """


# --------------------------------------------------------------------------
# sim html-pages fixture: pages with 1-3 <a href> links plus a decoy
# anchor without href (must NOT extract) and inter-link prose.
# --------------------------------------------------------------------------

SIM_PAGE_N = 400


def gen_sim_pages(spark: SparkSession, n: int = SIM_PAGE_N) -> DataFrame:
    i = F.col("id")
    n_links = 1 + (i * 31) % 3

    def link(j: int):
        # host h0 is a planted calendar trap (all its URL mass collapses
        # to /cal/N/N); healthy hosts spread over three path shapes
        hh = (i * 7 + j) % 5
        kk = (i * 13 + j * 101) % 97
        path = (
            F.when(hh == 0, F.format_string("/cal/%d/%d", (1 + kk % 12).cast("int"), (1 + kk % 28).cast("int")))
            .when(kk % 3 == 0, F.format_string("/p/%d", kk.cast("int")))
            .when(kk % 3 == 1, F.format_string("/article/%d/view", kk.cast("int")))
            .otherwise(F.format_string("/p/%d?ref=%d", kk.cast("int"), (kk % 7).cast("int")))
        )
        return F.format_string(
            '<a href="https://h%d.example.com%s">anchor %d %d</a> and text ',
            hh.cast("int"),
            path,
            i.cast("int"),
            F.lit(j).cast("int"),
        )

    html = F.concat(
        F.lit('<html><body><a name="top">not a link</a><p>intro</p>'),
        link(0),
        F.when(n_links > 1, link(1)).otherwise(F.lit("")),
        F.when(n_links > 2, link(2)).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    return spark.range(n).select(
        F.format_string("https://h%d.example.com/page/%d", (i % 5).cast("int"), i.cast("int")).alias("url"),
        html.alias("html"),
    )


def _sim_pages_sql(n: int = SIM_PAGE_N) -> str:
    def link(j: int) -> str:
        hh = f"(i * 7 + {j}) % 5"
        kk = f"(i * 13 + {j} * 101) % 97"
        path = f"""CASE
            WHEN {hh} = 0 THEN printf('/cal/%d/%d', 1 + ({kk}) % 12, 1 + ({kk}) % 28)
            WHEN ({kk}) % 3 = 0 THEN printf('/p/%d', {kk})
            WHEN ({kk}) % 3 = 1 THEN printf('/article/%d/view', {kk})
            ELSE printf('/p/%d?ref=%d', {kk}, ({kk}) % 7) END"""
        return (
            f"printf('<a href=\"https://h%d.example.com%s\">anchor %d %d</a> and text ', "
            f"{hh}, {path}, i, {j})"
        )

    return f"""
      sim_pages AS (
        SELECT printf('https://h%d.example.com/page/%d', i % 5, i) AS url,
               '<html><body><a name="top">not a link</a><p>intro</p>'
               || {link(0)}
               || CASE WHEN 1 + (i * 31) % 3 > 1 THEN {link(1)} ELSE '' END
               || CASE WHEN 1 + (i * 31) % 3 > 2 THEN {link(2)} ELSE '' END
               || '</body></html>' AS html
        FROM (SELECT range AS i FROM range({n}))
      )
    """


# --------------------------------------------------------------------------
# sim sitemap fixture: one multi-line XML body per host; every third
# entry omits <lastmod> (the positional-zip trap parse_sitemaps avoids).
# --------------------------------------------------------------------------

SIM_SITEMAP_HOSTS = 6
SIM_SITEMAP_URLS = 8


def gen_sim_sitemaps(spark: SparkSession, n_hosts: int = SIM_SITEMAP_HOSTS) -> DataFrame:
    h = F.col("id")

    def block(j: int):
        lastmod = F.when(
            (h + j) % 3 != 0,
            F.format_string(
                "  <lastmod>2025-%02d-%02d</lastmod>\n",
                (1 + (h * 3 + j) % 12).cast("int"),
                (1 + (h * 7 + j * 5) % 28).cast("int"),
            ),
        ).otherwise(F.lit(""))
        return F.concat(
            F.lit("<url>\n"),
            F.format_string(
                "  <loc> https://site%d.example.org/doc/%d </loc>\n",
                h.cast("int"),
                (j * 37 + h).cast("int") % 1000,
            ),
            lastmod,
            F.lit("</url>\n"),
        )

    xml = F.concat(
        F.lit('<?xml version="1.0"?>\n<urlset>\n'),
        *[block(j) for j in range(SIM_SITEMAP_URLS)],
        F.lit("</urlset>"),
    )
    return spark.range(n_hosts).select(
        F.format_string("site%d.example.org", h.cast("int")).alias("host"),
        xml.alias("xml"),
    )


def _sim_sitemaps_sql(n_hosts: int = SIM_SITEMAP_HOSTS) -> str:
    def block(j: int) -> str:
        return (
            "'<url>\n'"
            f" || printf('  <loc> https://site%d.example.org/doc/%d </loc>\n', h, ({j} * 37 + h) % 1000)"
            f" || CASE WHEN (h + {j}) % 3 <> 0"
            f"    THEN printf('  <lastmod>2025-%02d-%02d</lastmod>\n',"
            f" 1 + (h * 3 + {j}) % 12, 1 + (h * 7 + {j} * 5) % 28) ELSE '' END"
            " || '</url>\n'"
        )

    blocks = " || ".join(block(j) for j in range(SIM_SITEMAP_URLS))
    return f"""
      sim_sitemaps AS (
        SELECT printf('site%d.example.org', h) AS host,
               '<?xml version="1.0"?>\n<urlset>\n' || {blocks} || '</urlset>' AS xml
        FROM (SELECT range AS h FROM range({n_hosts}))
      )
    """


# --------------------------------------------------------------------------
# sim binary-payload fixture: hex strings with real magic-byte prefixes
# (the engine unhexes to true binary; the oracle inspects the hex text).
# --------------------------------------------------------------------------

SIM_PAYLOAD_N = 600
_SNIFF_PREFIXES = [
    "89504E470D0A1A0A",          # png
    "FFD8FFE0",                  # jpeg (JFIF APP0)
    "474946383961",              # GIF89a
    "524946460A0B0C0D57454250",  # RIFF <size> WEBP
    "424D",                      # bmp
    "00112233",                  # junk → unknown
]
_SNIFF_EXPECTED = ["png", "jpeg", "gif", "webp", "bmp", "unknown"]


def gen_sim_payload_hex(spark: SparkSession, n: int = SIM_PAYLOAD_N) -> DataFrame:
    i = F.col("id")
    prefix = F.element_at(
        F.array(*[F.lit(p) for p in _SNIFF_PREFIXES]),
        ((i * 69069) % 6 + 1).cast("int"),
    )
    return spark.range(n).select(
        i.alias("payload_id"),
        F.concat(prefix, F.format_string("%016X", i)).alias("hexstr"),
    )


def _sim_payloads_sql(n: int = SIM_PAYLOAD_N) -> str:
    prefixes = ", ".join(f"'{p}'" for p in _SNIFF_PREFIXES)
    return f"""
      sim_payloads AS (
        SELECT i AS payload_id,
               [{prefixes}][CAST((i * 69069) % 6 + 1 AS INTEGER)]
                 || printf('%016X', i) AS hexstr
        FROM (SELECT range AS i FROM range({n}))
      )
    """


def _sim_oracle_sql() -> str:
    from cex_crawler_spark.synth import HOSTS, POST_FETCH_TIME_HOSTS, SECTIONS

    host_rows = ", ".join(
        f"({i}, '{h}', {3 + (i % 5)})" for i, h in enumerate(HOSTS)
    )
    post_fetch = ", ".join(f"'{h}'" for h in POST_FETCH_TIME_HOSTS)
    section_case = (
        f"CASE section_idx WHEN 0 THEN '{SECTIONS[0]}' "
        f"WHEN 1 THEN '{SECTIONS[1]}' ELSE '{SECTIONS[2]}' END"
    )
    return f"""
        WITH hosts(i, host, budget_per_round) AS (VALUES {host_rows}),
        base AS (
          SELECT id AS seed_id,
                 CASE WHEN id % 17 = 0 AND id > 0 THEN id - 1 ELSE id END AS target
          FROM range({SIM_N}) t(id)
        ),
        attrs AS (
          SELECT seed_id, target,
                 CASE WHEN (target * 2654435761) % 26 < 13 THEN 0
                      ELSE (target * 2654435761) % 26 - 12 END AS host_idx,
                 ((target * 40503 + 7) % 13 = 0) AS robots_hit,
                 (target * 7919) % 3 AS priority,
                 (target * 48271) % 3 AS section_idx,
                 TIMESTAMP '2025-09-12 00:00:00'
                   - ((target * 16807) % 30) * INTERVAL '1 day'
                   - ((target * 22695477) % 24) * INTERVAL '1 hour' AS release_time
          FROM base
        ),
        named AS (
          SELECT a.seed_id, a.priority, a.release_time, h.host,
                 h.budget_per_round,
                 h.host NOT IN ({post_fetch}) AS time_known_prefetch,
                 {section_case} AS section,
                 CASE WHEN a.robots_hit THEN '/private/a/' || a.target
                      ELSE '/a/' || a.target END AS path
          FROM attrs a JOIN hosts h ON h.i = a.host_idx
        ),
        seqd AS (
          SELECT *,
                 CASE section WHEN '{SECTIONS[0]}' THEN 0
                              WHEN '{SECTIONS[1]}' THEN 1 ELSE 2 END AS section_rank,
                 row_number() OVER (PARTITION BY host, section
                                    ORDER BY seed_id) AS seq,
                 'https://' || host || '.example.com' || path AS canonical_url
          FROM named
        ),
        pre AS (
          SELECT *,
                 CASE WHEN path LIKE '/private%' THEN 'robots_blocked'
                      WHEN time_known_prefetch
                           AND release_time < TIMESTAMP '{SIM_WATERMARK}'
                        THEN 'stale_placeholder'
                 END AS pre_status
          FROM seqd
        ),
        dups AS (
          SELECT seed_id,
                 row_number() OVER (PARTITION BY canonical_url
                                    ORDER BY priority, section_rank, seq,
                                             seed_id) AS dup_rn
          FROM pre WHERE pre_status IS NULL
        ),
        ranked AS (
          SELECT p.seed_id,
                 row_number() OVER (PARTITION BY p.host
                                    ORDER BY p.priority, p.section_rank,
                                             p.seq) AS host_rank
          FROM pre p JOIN dups d USING (seed_id)
          WHERE d.dup_rn = 1
        )
        SELECT p.seed_id, p.host,
               CASE WHEN p.pre_status IS NOT NULL THEN p.pre_status
                    WHEN d.dup_rn > 1 THEN 'dup_skipped'
                    WHEN r.host_rank <= p.budget_per_round THEN 'scheduled'
                    ELSE 'deferred' END AS status,
               CASE WHEN p.pre_status IS NULL AND d.dup_rn = 1
                         AND r.host_rank <= p.budget_per_round
                    THEN r.host_rank END AS host_seq
        FROM pre p
        LEFT JOIN dups d USING (seed_id)
        LEFT JOIN ranked r USING (seed_id)
        ORDER BY seed_id
    """


_ORACLE_EVENT_URLS = """
    SELECT event_id, user_id, ts,
           'host' || (user_id % 5) AS hostname,
           'https://host' || (user_id % 5) || '.example.com/a/' || (event_id % 500)
             || CASE WHEN event_id % 4 = 3 THEN '?b=2' ELSE '' END AS canonical_url,
           'https://' ||
             CASE WHEN event_id % 5 = 0
                  THEN upper('host' || (user_id % 5) || '.example.com')
                  ELSE 'host' || (user_id % 5) || '.example.com' END
             || '/a/' || (event_id % 500)
             || CASE event_id % 4 WHEN 1 THEN '/' WHEN 2 THEN '#frag'
                                  WHEN 3 THEN '?utm_source=x&b=2' ELSE '' END AS url
    FROM events
"""


# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- relational core (SURVEY §2.3-2.10) --------------------------------

    def q1_pricing_summary(spark, sf):
        li = _t(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= "2000-12-01")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("sum_disc_price"),
                F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                F.count("*").alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["q1_pricing_summary"] = q1_pricing_summary

    def q3_top_orders(spark, sf):
        c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        o = _t(spark, sf, "orders")
        li = _t(spark, sf, "lineitem")
        return (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("o_orderkey", "o_orderdate")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
            .limit(10)
        )

    q["q3_top_orders"] = q3_top_orders

    def broadcast_dim_join(spark, sf):
        c = _t(spark, sf, "customer")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(
                F.count("*").alias("n_customers"),
                F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            )
            .orderBy("r_name")
        )

    q["broadcast_dim_join"] = broadcast_dim_join

    def q5_local_supplier_volume(spark, sf):
        """TPC-H Q5 shape: six-table join (two big facts + four dims)
        with revenue per nation — the multi-join reordering case; dims
        broadcast, lineitem⋈orders/supplier stay shuffle joins under
        AQE at scale."""
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        s = _t(spark, sf, "supplier")
        n = _t(spark, sf, "nation")
        r = _t(spark, sf, "region")
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("n_name")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .orderBy(F.desc("revenue"), F.asc("n_name"))
        )

    q["q5_local_supplier_volume"] = q5_local_supplier_volume

    def q18_large_orders(spark, sf):
        """TPC-H Q18 shape (r5): customers whose single order exceeds a
        quantity threshold — an aggregate-then-semi-join.  The HAVING
        subquery produces a tiny key set, so the plan is a map-side
        combinable groupBy followed by a BROADCAST semi-join of the big
        tables against it, never a shuffle of orders×lineitem; the
        re-aggregation after the join only touches the surviving rows."""
        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        c = _t(spark, sf, "customer")
        big = (
            li.groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("__q"))
            .filter(F.col("__q") > 300)
            .select("l_orderkey")
        )
        return (
            li.join(F.broadcast(big), "l_orderkey")
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .groupBy(
                "c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice",
            )
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), "o_orderkey")
            .limit(100)
        )

    q["q18_large_orders"] = q18_large_orders

    def orders_rollup(spark, sf):
        """Hierarchical ROLLUP (the hypertable-rollup aggregation
        shape): per (year, orderstatus) → per year → grand total in one
        pass, grouping level disambiguated by grouping_id — partial
        aggregation applies at every level."""
        o = _t(spark, sf, "orders")
        return (
            o.withColumn("yr", F.year("o_orderdate"))
            .rollup("yr", "o_orderstatus")
            .agg(
                F.count("*").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
                F.grouping_id().cast("long").alias("gid"),
            )
            .orderBy(
                F.col("yr").asc_nulls_first(),
                F.col("o_orderstatus").asc_nulls_first(),
            )
        )

    q["orders_rollup"] = orders_rollup

    def doc_length_quantiles(spark, sf):
        """Exact interpolated quantiles (p50/p90/p99) of document
        length per language — Spark `percentile` matches DuckDB
        `quantile_cont` value-for-value (verified).  At 100 TB the
        same query swaps `percentile` for `percentile_approx` (a
        mergeable sketch with map-side partials) where exactness is
        not required; the exact form is the oracle-checkable one."""
        d = _t(spark, sf, "documents")
        ln = F.length("text")
        return (
            d.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.round(F.percentile(ln, F.lit(0.5)), 4).alias("p50"),
                F.round(F.percentile(ln, F.lit(0.9)), 4).alias("p90"),
                F.round(F.percentile(ln, F.lit(0.99)), 4).alias("p99"),
            )
            .orderBy("lang")
        )

    q["doc_length_quantiles"] = doc_length_quantiles

    def doc_length_quantiles_approx(spark, sf):
        """Mergeable-sketch quantiles (VERDICT r4 item 5) — the 100 TB
        form of doc_length_quantiles: `percentile_approx` (accuracy
        10⁴) keeps a bounded GK summary with map-side partials instead
        of buffering every per-group value like exact `percentile`.
        Rank error ≤ n/accuracy rows (guaranteed by the sketch); below
        the compression threshold the sketch is exact and returns the
        discrete order statistic DuckDB `quantile_disc` picks — the
        hash oracle.  The rank-error bound at sketch-compressing sizes
        is asserted in tests/test_functions.py."""
        d = _t(spark, sf, "documents")
        ln = F.length("text")
        acc = F.lit(10_000)
        return (
            d.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.percentile_approx(ln, F.lit(0.5), acc).cast("long").alias("p50"),
                F.percentile_approx(ln, F.lit(0.9), acc).cast("long").alias("p90"),
                F.percentile_approx(ln, F.lit(0.99), acc).cast("long").alias("p99"),
            )
            .orderBy("lang")
        )

    q["doc_length_quantiles_approx"] = doc_length_quantiles_approx

    def events_asof_join(spark, sf):
        """Backward as-of join (clicks ← latest at-or-before view per
        user), built as union + last-non-null window — ONE shuffle on
        the key, no range-explosion join.  Oracle: DuckDB's native
        ASOF LEFT JOIN."""
        from cex_crawler_spark.operators.temporal import asof_join

        e = _t(spark, sf, "events")
        clicks = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        views = (
            e.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts")
            .agg(F.round(F.max("value"), 4).alias("view_value"))
        )
        return (
            asof_join(clicks, views, on=["user_id"], ts_col="ts",
                      value_cols=["view_value"])
            .select("event_id", "user_id", "ts", "view_value")
            .orderBy("event_id")
        )

    q["events_asof_join"] = events_asof_join

    def events_asof_join_forward(spark, sf):
        """Forward as-of join (r5): clicks ← NEAREST at-or-after view
        per user (next-event attribution).  Same union+window shape as
        backward over the reversed time order — still one shuffle.
        Oracle: DuckDB native ASOF with the <= comparator."""
        from cex_crawler_spark.operators.temporal import asof_join

        e = _t(spark, sf, "events")
        clicks = e.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        views = (
            e.filter(F.col("event_type") == "view")
            .groupBy("user_id", "ts")
            .agg(F.round(F.max("value"), 4).alias("view_value"))
        )
        return (
            asof_join(clicks, views, on=["user_id"], ts_col="ts",
                      value_cols=["view_value"], direction="forward")
            .select("event_id", "user_id", "ts", "view_value")
            .orderBy("event_id")
        )

    q["events_asof_join_forward"] = events_asof_join_forward

    def range_join_shipments(spark, sf):
        """Bucketized range join: line items shipped within each
        order's 30-day window — interval containment as a hash join on
        (bucket) + exact filter, never a nested-loop inequality join.
        Oracle: plain BETWEEN join in DuckDB."""
        from cex_crawler_spark.operators.temporal import range_join

        li = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders")
        pts = li.select(
            F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
            .cast("long").alias("ship_day"),
            "l_quantity",
        )
        iv = o.filter(F.col("o_orderkey") <= 320).select(
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long").alias("win_start"),
        ).withColumn("win_end", F.col("win_start") + 30)
        return (
            range_join(pts, iv, "ship_day", "win_start", "win_end",
                       bucket_width=7)
            .groupBy("o_orderkey")
            .agg(
                F.count("*").alias("n_shipped"),
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            )
            .orderBy("o_orderkey")
        )

    q["range_join_shipments"] = range_join_shipments

    def event_sessionize_native(spark, sf):
        """ST4 in its Spark-first form: the BUILT-IN ``session_window``
        operator (30-min gap; boundary-inclusive — an event exactly at
        prev+gap extends the session, probed empirically) instead of
        the hand-rolled lag+cumsum of ``event_sessionize``.  The window
        start equals the session's min ts, so the DuckDB lag+cumsum
        oracle reproduces it exactly; in Structured Streaming the same
        expression runs stateful with watermark-driven eviction."""
        e = _t(spark, sf, "events")
        return (
            e.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("w")
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                "user_id", F.col("w.start").alias("session_start"),
                "n_events", "sum_value",
            )
            .orderBy("user_id", "session_start")
        )

    q["event_sessionize_native"] = event_sessionize_native

    def window_topk_orders(spark, sf):
        o = _t(spark, sf, "orders")
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        return (
            o.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select("o_custkey", "o_orderkey",
                    F.round("o_totalprice", 2).alias("totalprice"), "rk")
            .orderBy("o_custkey", "rk")
        )

    q["window_topk_orders"] = window_topk_orders

    def salted_topk_events(spark, sf):
        """Skew-safe per-group top-k: 5 event types over the whole
        events table is exactly the hot-key shape where the window form
        (`window_topk_orders`) serializes each group into one task.
        `salted_topk` computes the SAME exact result via two bounded
        aggregates — no Window node in the plan (asserted in
        tests/test_skew.py)."""
        from cex_crawler_spark.operators.skew import salted_topk

        e = _t(spark, sf, "events").select("event_type", "event_id", "value")
        top = salted_topk(e, ["event_type"], ["value", "event_id"], 5)
        return top.select(
            "event_type", "event_id",
            F.round("value", 3).alias("value"), "rank",
        ).orderBy("event_type", "rank")

    q["salted_topk_events"] = salted_topk_events

    def salted_distinct_users(spark, sf):
        """Exact per-group COUNT(DISTINCT) with bounded per-task state:
        value-salted partial distinct counts (disjoint by construction)
        summed in a second aggregate."""
        from cex_crawler_spark.operators.skew import salted_distinct_count

        e = _t(spark, sf, "events")
        return salted_distinct_count(
            e, ["event_type"], "user_id"
        ).orderBy("event_type")

    q["salted_distinct_users"] = salted_distinct_users

    def hll_distinct_users(spark, sf):
        """Mergeable-sketch cardinality: per-(event_type, day) HLL
        partials unioned per event_type — the rollup shape that answers
        'distinct users over ANY day window' from sketch rows alone.
        At these cardinalities the DataSketches coupon regime is exact,
        so the oracle is plain COUNT(DISTINCT) (the error-bound regime
        is property-tested at 200k distincts in tests/test_sketches.py)."""
        from cex_crawler_spark.functions.sketches import (
            hll_merge_estimate,
            hll_partial_sketches,
        )

        e = _t(spark, sf, "events").withColumn(
            "day", F.to_date("ts")
        )
        parts = hll_partial_sketches(e, ["event_type", "day"], "user_id")
        return hll_merge_estimate(
            parts, ["event_type"], "user_id_hll", "user_id_distinct"
        ).orderBy("event_type")

    q["hll_distinct_users"] = hll_distinct_users

    def heavy_hitter_tokens(spark, sf):
        """Exact corpus-level heavy tokens (freq ≥ 0.5 %) via
        Misra-Gries candidate pruning + exact recount — per-task state
        bounded by k counters, shuffle O(candidates) not O(vocabulary)
        (the shape where even map-side-combined groupBy state IS the
        vocabulary)."""
        from cex_crawler_spark.functions.text import tokens
        from cex_crawler_spark.operators.heavyhitters import heavy_hitters

        d = _t(spark, sf, "documents")
        toks = d.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("token")
        )
        return heavy_hitters(toks, "token", 0.005)

    q["heavy_hitter_tokens"] = heavy_hitter_tokens

    def pivot_order_status(spark, sf):
        o = _t(spark, sf, "orders")
        return (
            o.withColumn("yr", F.year("o_orderdate"))
            .groupBy("yr")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .count()
            .na.fill(0, ["F", "O", "P"])
            .withColumnsRenamed({"F": "n_f", "O": "n_o", "P": "n_p"})
            .orderBy("yr")
        )

    q["pivot_order_status"] = pivot_order_status

    def ordered_group_concat(spark, sf):
        c = _t(spark, sf, "customer")
        return (
            c.groupBy("c_mktsegment")
            .agg(
                F.array_join(
                    F.transform(
                        F.slice(
                            F.array_sort(
                                F.collect_list(F.struct("c_custkey", "c_name"))
                            ),
                            1, 5,
                        ),
                        lambda s: s["c_name"],
                    ),
                    " ",
                ).alias("first_names")
            )
            .orderBy("c_mktsegment")
        )

    q["ordered_group_concat"] = ordered_group_concat

    def antijoin_customers_no_orders(spark, sf):
        c = _t(spark, sf, "customer")
        o = _t(spark, sf, "orders")
        return (
            c.join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n_no_orders"))
            .orderBy("c_mktsegment")
        )

    q["antijoin_customers_no_orders"] = antijoin_customers_no_orders

    def union_sections(spark, sf):
        e = _t(spark, sf, "events")
        a = e.filter(F.col("event_type") == "error").select("event_id", "event_type")
        b = e.filter(F.col("value") > 9).select("event_id", "event_type")
        return (
            a.unionByName(b)
            .groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .orderBy("event_type")
        )

    q["union_sections"] = union_sections

    def conditional_fill(spark, sf):
        o = _t(spark, sf, "orders")
        return (
            o.withColumn(
                "bucket",
                F.when(F.col("o_totalprice") > 200000, "big")
                .when(F.col("o_totalprice") > 50000, "mid")
                .otherwise("small"),
            )
            .groupBy("bucket", "o_orderpriority")
            .agg(F.count("*").alias("n"))
            .orderBy("bucket", "o_orderpriority")
        )

    q["conditional_fill"] = conditional_fill

    def scalar_functions(spark, sf):
        p = _t(spark, sf, "part")
        return p.select(
            "p_partkey",
            F.md5(F.lower("p_name")).alias("name_md5"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
            F.length("p_name").alias("name_len"),
        ).orderBy("p_partkey").limit(500)

    q["scalar_functions"] = scalar_functions

    def base64_roundtrip(spark, sf):
        """SC-encode: base64/unbase64 (reference binance.py:62 device-info
        encoding) with a decode round-trip."""
        p = _t(spark, sf, "part")
        b64 = F.base64(F.encode("p_name", "UTF-8"))
        return (
            p.select(
                "p_partkey",
                b64.alias("name_b64"),
                F.decode(F.unbase64(b64), "UTF-8").alias("name_rt"),
            )
            .orderBy("p_partkey")
            .limit(500)
        )

    q["base64_roundtrip"] = base64_roundtrip

    def timestamp_normalize(spark, sf):
        e = _t(spark, sf, "events")
        return (
            e.groupBy("event_type")
            .agg(
                F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("min_ts_str"),
                F.unix_timestamp(F.max("ts")).alias("max_ts_epoch"),
                F.countDistinct(F.to_date("ts")).alias("n_days"),
            )
            .orderBy("event_type")
        )

    q["timestamp_normalize"] = timestamp_normalize

    def freshness_filter(spark, sf):
        e = _t(spark, sf, "events")
        return (
            e.filter(F.col("ts") >= "2024-01-15 00:00:00")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .orderBy("event_type")
        )

    q["freshness_filter"] = freshness_filter

    def json_props_extract(spark, sf):
        e = _t(spark, sf, "events")
        return (
            e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
            .groupBy("event_type")
            .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.max("k").alias("max_k"))
            .orderBy("event_type")
        )

    q["json_props_extract"] = json_props_extract

    # ---- crawl-shaped (P8 canonicalization + §2.7 scheduler) --------------

    q["url_canonicalize"] = q_url_canonicalize
    q["frontier_schedule"] = q_frontier_schedule

    def frontier_priority_aging(spark, sf):
        """Starvation-free scheduling (r5): effective priority after
        aging — a URL waiting ``age_every`` rounds climbs one level
        (politeness.age_priorities), so a steady priority-0 inflow can
        never defer anything forever.  Fixture spans every branch:
        levels 0-3, waits 0-16 (incl. waits that clamp at the floor and
        a negative wait — producer clock skew — that must NOT promote),
        current_round=12, age_every=4.  Pure row-local arithmetic; the
        oracle replays it with the same integer floor."""
        from cex_crawler_spark.operators.politeness import age_priorities

        o = _t(spark, sf, "orders").filter(F.col("o_orderkey") <= 2000)
        frontier = o.select(
            F.col("o_orderkey").alias("url_id"),
            (F.col("o_orderkey") % 4).cast("long").alias("priority"),
            # enqueued_round -4..12: waits of 16 down to 0, plus rows
            # enqueued "in the future" (negative wait)
            ((F.col("o_orderkey") % 17) - 4).cast("long").alias(
                "enqueued_round"
            ),
        )
        aged = age_priorities(frontier, current_round=12, age_every=4)
        return (
            aged.select(
                "url_id",
                "enqueued_round",
                F.col("priority").alias("effective_priority"),
            )
            .orderBy("url_id")
            .limit(2000)
        )

    q["frontier_priority_aging"] = frontier_priority_aging

    def extractor_announcements(spark, sf):
        """U2 fallback-analyzer fidelity cases: both-families emission
        (delisting ⊃ listing substring), dash pairs, lowercase symbols,
        Chinese + non-padded dates, duplicate symbols kept, first-3 cap.
        Runs through the pluggable extractor strategy (U1 shape,
        functions/analyzer.py) — the oracle guards the indirection."""
        from cex_crawler_spark.functions.analyzer import default_extractor

        extractor = default_extractor()
        p = _t(spark, sf, "part")
        letter = F.char(F.lit(65) + F.col("p_partkey") % 26)
        m = F.col("p_partkey") % 5
        text = (
            F.when(m == 0, F.lit(
                "listing soon: alpha/usdt beta/usdt alpha/usdt gamma/usdt "
                "on 2025年3月4日"))
            .when(m == 1, F.concat(
                F.lit("delisting perpetual pair sym"), letter,
                F.lit("/usdt 停止交易 on 2025-5-6")))
            .when(m == 2, F.concat(
                F.lit("removal notice for sym"), letter,
                F.lit("-pair effective immediately")))
            .when(m == 3, F.lit("新增 maintenance window on 2025-12-01"))
            .otherwise(F.lit("scheduled maintenance"))
        )
        return (
            p.select("p_partkey", text.alias("text"))
            .select(
                "p_partkey",
                F.explode(extractor.announcements(F.col("text"))).alias("ann"),
            )
            .select(
                "p_partkey",
                F.col("ann.symbol").alias("symbol"),
                F.col("ann.action").alias("action"),
                F.col("ann.type").alias("type"),
                F.col("ann.time").alias("time"),
            )
            .orderBy("p_partkey")
        )

    q["extractor_announcements"] = extractor_announcements

    def html_text_extract(spark, sf):
        """P6: HTML → text over a synthetic page built from part rows."""
        from cex_crawler_spark.functions.text import html_to_text

        p = _t(spark, sf, "part")
        html = F.format_string(
            "<html><head><style>body{color:red}</style>"
            "<script>var x=1;</script></head>"
            "<body><h1>%s</h1><p>Size &amp; brand: %d / %s</p></body></html>",
            F.col("p_name"), F.col("p_size"), F.col("p_brand"),
        )
        return (
            p.select("p_partkey", html_to_text(html).alias("text"))
            .orderBy("p_partkey")
            .limit(500)
        )

    q["html_text_extract"] = html_text_extract

    def ssr_json_extract(spark, sf):
        """S5: JSON embedded in a script tag → regexp_extract + get_json_object."""
        p = _t(spark, sf, "part")
        html = F.format_string(
            '<html><script id="__NEXT_DATA__" type="application/json">'
            '{"props":{"size":%d,"brand":"%s"}}</script></html>',
            F.col("p_size"), F.col("p_brand"),
        )
        blob = F.regexp_extract(
            html, r'<script id="__NEXT_DATA__"[^>]*>(.*?)</script>', 1
        )
        return (
            p.select(
                "p_partkey",
                F.get_json_object(blob, "$.props.size").cast("int").alias("size"),
                F.get_json_object(blob, "$.props.brand").alias("brand"),
            )
            .orderBy("p_partkey")
            .limit(500)
        )

    q["ssr_json_extract"] = ssr_json_extract

    def robots_parse(spark, sf):
        """North-rule robots input: parse Disallow prefixes from robots.txt."""
        from cex_crawler_spark.functions.robots import parse_robots_disallow

        p = _t(spark, sf, "part")
        txt = F.format_string(
            "User-agent: *\nDisallow: /p%d\nAllow: /open\n"
            "disallow: /q%d\n# comment\nDisallow:\n",
            F.col("p_size"), F.col("p_partkey") % 7,
        )
        return (
            p.select(
                "p_partkey",
                F.explode(parse_robots_disallow(txt)).alias("prefix"),
            )
            .orderBy("p_partkey", "prefix")
            .limit(1000)
        )

    q["robots_parse"] = robots_parse

    def robots_crawl_delay(spark, sf):
        """Crawl-delay politeness input (r5): parse the strictest
        Crawl-delay per host and derive the scheduler's min_delay_ms
        budget (greatest of the existing floor and the directive).
        Rows synthesize directive-present/absent/multiple cases."""
        from cex_crawler_spark.functions.robots import (
            parse_robots_crawl_delay,
        )

        p = _t(spark, sf, "part")
        txt = F.concat(
            F.lit("User-agent: *\n"),
            F.when(
                F.col("p_size") % 3 != 0,
                F.format_string("Crawl-delay: %d\n", F.col("p_size")),
            ).otherwise(F.lit("")),
            F.lit("Disallow: /private\n"),
            F.when(
                F.col("p_partkey") % 2 == 0,
                F.format_string(
                    "crawl-delay: %d.5\n", F.col("p_partkey") % 7
                ),
            ).otherwise(F.lit("")),
        )
        delay = parse_robots_crawl_delay(txt)
        return (
            p.select(
                "p_partkey",
                F.round(delay, 4).alias("delay_s"),
                F.round(
                    F.greatest(F.lit(1000.0), delay * 1000.0), 4
                ).alias("min_delay_ms"),
            )
            .orderBy("p_partkey")
            .limit(500)
        )

    q["robots_crawl_delay"] = robots_crawl_delay

    def robots_rfc_match(spark, sf):
        """Full RFC 9309 robots matcher (r5): Allow/Disallow rules with
        ``*`` wildcards and ``$`` end-anchors, longest-pattern-wins,
        Allow beats Disallow on length ties.  Bodies and candidate
        paths synthesize every grammar feature per part row: a plain
        prefix block, a longer Allow carve-out, a ``$``-anchored
        extension rule, a mid-pattern wildcard, and an exact
        length-tie.  Output = the decision AND the winning pattern, so
        the oracle checks precedence, not just the boolean."""
        from cex_crawler_spark.functions.robots import (
            parse_robots_rules,
            robots_allowed,
            robots_best_rule,
        )

        p = _t(spark, sf, "part").filter(F.col("p_partkey") <= 300)
        txt = F.format_string(
            "User-agent: *\n"
            "Disallow: /p%d/\n"
            "Allow: /p%d/open\n"
            "Disallow: /*.j%d$\n"
            "Allow: /q%d*x\n"
            "Disallow: /q%d\n"
            "Allow: /t%d\n"
            "Disallow: /t%d\n"
            "Disallow:\n",
            F.col("p_size"), F.col("p_size"),
            F.col("p_partkey") % 7, F.col("p_partkey") % 7,
            F.col("p_partkey") % 7,
            F.col("p_partkey") % 5, F.col("p_partkey") % 5,
        )
        paths = F.array(
            F.format_string("/p%d/item%d", F.col("p_size"),
                            F.col("p_partkey") % 10),
            F.format_string("/p%d/open/f", F.col("p_size")),
            F.format_string("/x%d.j%d", F.col("p_partkey") % 10,
                            F.col("p_partkey") % 7),
            F.format_string("/x%d.j%dz", F.col("p_partkey") % 10,
                            F.col("p_partkey") % 7),
            F.format_string("/q%dzzx", F.col("p_partkey") % 7),
            F.format_string("/q%dzz", F.col("p_partkey") % 7),
            F.format_string("/t%d/y", F.col("p_partkey") % 5),
            F.lit("/free"),
        )
        cand = p.select(
            "p_partkey", txt.alias("txt"), F.explode(paths).alias("path")
        )
        rules = parse_robots_rules(F.col("txt"))
        best = robots_best_rule(F.col("path"), rules)
        return (
            cand.select(
                "p_partkey",
                "path",
                robots_allowed(F.col("path"), rules).alias("allowed"),
                best["p"].alias("winner"),
            )
            .orderBy("p_partkey", "path")
            .limit(2400)
        )

    q["robots_rfc_match"] = robots_rfc_match

    def robots_group_select(spark, sf):
        """RFC 9309 §2.2.1 user-agent group selection (r5): a body with
        a headerless preamble, a single-agent group, a shared
        two-agent group, a ``*`` fallback group, and a SECOND group for
        the first agent (must merge).  Per row the governing agent
        varies, so every selection branch — own group(s) merged, shared
        group, ``*`` fallback, preamble never selected — is exercised;
        output keeps the winning pattern so precedence inside the
        selected set is checked too."""
        from cex_crawler_spark.functions.robots import (
            parse_robots_groups,
            robots_allowed,
            robots_best_rule,
            select_robots_rules,
        )

        p = _t(spark, sf, "part").filter(F.col("p_partkey") <= 300)
        txt = F.format_string(
            "Disallow: /pre\n"
            "User-agent: alpha\n"
            "Disallow: /own%d\n"
            "User-agent: beta\n"
            "User-agent: gamma\n"
            "Disallow: /shared%d\n"
            "Allow: /shared%d/pub\n"
            "User-agent: *\n"
            "Disallow: /star%d\n"
            "User-agent: alpha\n"
            "Allow: /own%d/pub\n",
            F.col("p_size"),
            F.col("p_partkey") % 7, F.col("p_partkey") % 7,
            F.col("p_partkey") % 5,
            F.col("p_size"),
        )
        agent = F.element_at(
            F.array(
                F.lit("alpha"), F.lit("beta"),
                F.lit("gamma"), F.lit("nobody"),
            ),
            (F.col("p_partkey") % 4 + 1).cast("int"),
        )
        paths = F.array(
            F.format_string("/own%d/x", F.col("p_size")),
            F.format_string("/own%d/pub/f", F.col("p_size")),
            F.format_string("/shared%d/x", F.col("p_partkey") % 7),
            F.format_string("/shared%d/pub/f", F.col("p_partkey") % 7),
            F.format_string("/star%d/x", F.col("p_partkey") % 5),
            F.lit("/pre/x"),
            F.lit("/free"),
        )
        cand = p.select(
            "p_partkey",
            agent.alias("agent"),
            txt.alias("txt"),
            F.explode(paths).alias("path"),
        )
        rules = select_robots_rules(
            parse_robots_groups(F.col("txt")), F.col("agent")
        )
        best = robots_best_rule(F.col("path"), rules)
        return (
            cand.select(
                "p_partkey",
                "agent",
                "path",
                robots_allowed(F.col("path"), rules).alias("allowed"),
                best["p"].alias("winner"),
            )
            .orderBy("p_partkey", "path")
            .limit(2400)
        )

    q["robots_group_select"] = robots_group_select

    def warc_roundtrip(spark, sf):
        """WARC interchange round-trip (r5): documents → per-file WARC
        blobs (byte-accurate Content-Length, deterministic record ids)
        → Content-Length-honoring parse → per-record fields.  Every
        doc_id%5==0 payload embeds a COMPLETE fake WARC record
        (``\\r\\n\\r\\nWARC/1.0…``) plus a multi-byte char, so the
        oracle match proves the parser frames by Content-Length bytes
        — a delimiter-splitting parser would emit extra records and
        mis-slice every payload after the sentinel."""
        from cex_crawler_spark.sources.warc import (
            parse_warc,
            render_warc_files,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        sentinel = (
            "qé\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
            "Content-Length: 3\r\n\r\nxyz\r\n\r\n"
        )
        recs = d.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.format_string(
                "http://site%d.example/doc/%d",
                F.col("doc_id") % 50, F.col("doc_id"),
            ).alias("uri"),
            F.format_string(
                "2025-08-%02dT00:00:00Z",
                (F.col("doc_id") % 28 + 1).cast("int"),
            ).alias("date"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(sentinel), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("payload"),
        )
        parsed = parse_warc(render_warc_files(recs))
        return (
            parsed.select(
                "target_uri",
                "warc_date",
                "content_length",
                F.md5("payload").alias("payload_md5"),
            )
            .orderBy("target_uri")
            .limit(1000)
        )

    q["warc_roundtrip"] = warc_roundtrip

    def warc_cdx_index(spark, sf):
        """CDX index over the same rendered archives (r5): SURT url
        keys, 14-digit timestamps, payload digests, and byte-exact
        (file, offset, length) pointers.  The oracle re-derives every
        offset ANALYTICALLY (window sum of SQL-reconstructed record
        byte lengths) — a single byte of layout drift anywhere in the
        engine's render or parse shifts every subsequent offset in the
        file and breaks the hash."""
        from cex_crawler_spark.sources.warc import (
            cdx_index,
            parse_warc,
            render_warc_files,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        sentinel = (
            "qé\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
            "Content-Length: 3\r\n\r\nxyz\r\n\r\n"
        )
        recs = d.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.format_string(
                "http://site%d.example/doc/%d",
                F.col("doc_id") % 50, F.col("doc_id"),
            ).alias("uri"),
            F.format_string(
                "2025-08-%02dT00:00:00Z",
                (F.col("doc_id") % 28 + 1).cast("int"),
            ).alias("date"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(sentinel), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("payload"),
        )
        return (
            cdx_index(parse_warc(render_warc_files(recs)))
            .orderBy("urlkey", "cdx_ts")
            .limit(1000)
        )

    q["warc_cdx_index"] = warc_cdx_index

    def warc_revisit_dedup(spark, sf):
        """Digest-deduplicated WARC export (r5): payloads synthesized
        to collide in groups of 3 — the canonical first capture
        (min (uri, date), deterministic) stores its bytes as a
        ``response`` record, every other capture becomes a zero-length
        ``revisit`` record pointing at it (the spec's recrawl-dedup
        mechanism).  Round-tripped through the strict parser, so
        revisit framing (Content-Length: 0) is proven too."""
        from cex_crawler_spark.sources.warc import (
            parse_warc,
            render_warc_files_deduped,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        recs = d.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.format_string(
                "http://site%d.example/doc/%d",
                F.col("doc_id") % 50, F.col("doc_id"),
            ).alias("uri"),
            F.format_string(
                "2025-08-%02dT00:00:00Z",
                (F.col("doc_id") % 28 + 1).cast("int"),
            ).alias("date"),
            F.format_string(
                "doc body %d é",
                F.col("doc_id") - F.col("doc_id") % 3,
            ).alias("payload"),
        )
        parsed = parse_warc(render_warc_files_deduped(recs))
        return (
            parsed.select(
                "target_uri", "warc_type", "refers_to", "content_length"
            )
            .orderBy("target_uri")
            .limit(1000)
        )

    q["warc_revisit_dedup"] = warc_revisit_dedup

    def warc_gz_roundtrip(spark, sf):
        """Record-gzipped WARC round-trip (r5): same archives as
        warc_roundtrip but shipped as per-record gzip members
        (``.warc.gz`` — the ranged-read layout Common Crawl uses),
        member boundaries recovered from zlib end-of-stream accounting.
        The oracle is warc_roundtrip's verbatim: compression must be
        invisible to the record contents."""
        from cex_crawler_spark.sources.warc import (
            parse_warc_gz,
            render_warc_gz_files,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        sentinel = (
            "qé\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
            "Content-Length: 3\r\n\r\nxyz\r\n\r\n"
        )
        recs = d.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.format_string(
                "http://site%d.example/doc/%d",
                F.col("doc_id") % 50, F.col("doc_id"),
            ).alias("uri"),
            F.format_string(
                "2025-08-%02dT00:00:00Z",
                (F.col("doc_id") % 28 + 1).cast("int"),
            ).alias("date"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(sentinel), F.col("text")),
            )
            .otherwise(F.col("text"))
            .alias("payload"),
        )
        parsed = parse_warc_gz(render_warc_gz_files(recs))
        return (
            parsed.select(
                "target_uri",
                "warc_date",
                "content_length",
                F.md5("payload").alias("payload_md5"),
            )
            .orderBy("target_uri")
            .limit(1000)
        )

    q["warc_gz_roundtrip"] = warc_gz_roundtrip

    def warc_wet_extract(spark, sf):
        """WET sidecar extraction (r5): HTML response archives →
        parse → visible-text ``conversion`` records (render_wet_files)
        → re-parse.  The payload is a full HTML page (script + style
        blocks, entities, a multi-byte char), so the oracle match
        proves the WARC→WET loop end to end: the text-extraction chain,
        the conversion re-framing with its OWN byte-accurate
        Content-Length, and the second parse — the format downstream
        curation reads instead of raw HTML at 10× the bytes."""
        from cex_crawler_spark.sources.warc import (
            parse_warc,
            render_warc_files,
            render_wet_files,
        )

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 500)
        html = F.format_string(
            "<html><head><style>h1{color:red}</style>"
            "<script>track(1);</script></head>"
            "<body><h1>Doc %d</h1><p>%s &amp; fin é</p></body></html>",
            F.col("doc_id"), F.col("text"),
        )
        recs = d.select(
            (F.col("doc_id") % 7).alias("file_id"),
            F.format_string(
                "http://site%d.example/doc/%d",
                F.col("doc_id") % 50, F.col("doc_id"),
            ).alias("uri"),
            F.format_string(
                "2025-08-%02dT00:00:00Z",
                (F.col("doc_id") % 28 + 1).cast("int"),
            ).alias("date"),
            html.alias("payload"),
        )
        wet = parse_warc(
            render_wet_files(parse_warc(render_warc_files(recs)))
        )
        return (
            wet.select(
                "warc_type",
                "target_uri",
                "warc_date",
                "content_length",
                F.md5("payload").alias("text_md5"),
            )
            .orderBy("target_uri")
            .limit(1000)
        )

    q["warc_wet_extract"] = warc_wet_extract

    def sitemap_index_expand(spark, sf):
        """Sitemap-index expansion (r5): the middle hop of discovery
        (robots ``Sitemap:`` → INDEX → leaf sitemaps → seeds) — the
        protocol's own sharding for 10^9-URL hosts.  Bodies exercise
        per-block isolation: lastmod-less children, whitespace-padded
        locs, tag order flipped inside a block, and an empty-loc entry
        that must drop without shifting its neighbors."""
        from cex_crawler_spark.sources.sitemap import expand_sitemap_index

        p = _t(spark, sf, "part").filter(F.col("p_partkey") <= 400)
        k = F.col("p_partkey")
        b0 = F.format_string(
            "<sitemap><loc>https://h%d.example/sm-a.xml</loc>"
            "<lastmod>2025-08-%02dT00:00:00Z</lastmod></sitemap>",
            k, (k % 28 + 1).cast("int"),
        )
        b1 = F.format_string(
            "<sitemap>\n  <loc> https://h%d.example/sm-b.xml </loc>\n"
            "</sitemap>", k,
        )
        b2 = F.when(
            k % 3 == 0, F.lit("<sitemap><loc></loc></sitemap>")
        ).otherwise(
            F.format_string(
                "<sitemap><lastmod>2025-01-%02d</lastmod>"
                "<loc>https://h%d.example/sm-c%d.xml</loc></sitemap>",
                (k % 28 + 1).cast("int"), k, k % 9,
            )
        )
        idx = p.select(
            F.format_string("h%d.example", k).alias("host"),
            F.concat(
                F.lit("<sitemapindex>"), b0, b1, b2,
                F.lit("</sitemapindex>"),
            ).alias("xml"),
        )
        return (
            expand_sitemap_index(idx)
            .orderBy("host", "sitemap_url")
            .limit(2000)
        )

    q["sitemap_index_expand"] = sitemap_index_expand

    def corpus_split_assign(spark, sf):
        """Leakage-safe train/val/test assignment (r5): the split key
        is the NEAR-DUP CLUSTER, not the document — hashing raw doc
        ids puts near-copies of one page in train AND test, and the
        eval set silently becomes training data.  Gates → LSH pairs →
        connected components (all the audited scale paths), then
        split = md5(component) first byte mod 10 (8 → val, 9 → test)
        so every member of a cluster lands in the same split by
        construction.  md5 keeps the bucket choice engine-portable;
        the hash is of the CLUSTER id, so moving one doc between
        clusters moves its whole cluster's split, never a lone doc."""
        from cex_crawler_spark.functions.text import lang_id, quality_score
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        d = _t(spark, sf, "documents")
        scored = d.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        kept = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        pairs = minhash_lsh_pairs(
            kept, "text", "doc_id", num_hashes=64, bands=32, shingle_k=3,
            threshold=0.5,
        )
        labeled = dedup_cluster_representatives(kept, pairs, "doc_id")
        h = (
            F.conv(
                F.substring(
                    F.md5(F.col("component").cast("string")), 1, 2
                ),
                16, 10,
            ).cast("int")
            % 10
        )
        split = (
            F.when(h == 8, F.lit("val"))
            .when(h == 9, F.lit("test"))
            .otherwise(F.lit("train"))
        )
        return (
            labeled.select("doc_id", "component", split.alias("split"))
            .orderBy("doc_id")
        )

    q["corpus_split_assign"] = corpus_split_assign

    def sitemap_discovery_chain(spark, sf):
        """Discovery-chain capstone (r5): robots ``Sitemap:`` →
        sitemap-INDEX → leaf sitemaps → frontier seeds, with the
        freshness watermark pruning BETWEEN hops — a stale child shard
        is dropped before its leaf is ever expanded, and a stale page
        before it reaches the frontier.  That inter-hop pruning is the
        point at 10^10 URLs: an unchanged shard of 50k URLs costs one
        dropped row, not 50k.  Bodies at each hop derive scan-side
        from the previous hop's URL (deterministic stand-in for the
        fetch), so the whole chain is Catalyst end to end."""
        from cex_crawler_spark.functions.robots import (
            parse_robots_sitemaps,
        )
        from cex_crawler_spark.sources.sitemap import (
            expand_sitemap_index,
            parse_sitemaps,
        )

        wm = F.to_timestamp(F.lit("2025-06-01 00:00:00"))

        def fresh(df):
            return df.filter(
                F.col("lastmod").isNull() | (F.col("lastmod") >= wm)
            )

        p = _t(spark, sf, "part").filter(F.col("p_partkey") <= 200)
        k = F.col("p_partkey")
        robots_txt = F.concat(
            F.format_string(
                "User-agent: *\nDisallow: /private\n"
                "Sitemap: https://h%d.example/idx.xml\n", k,
            ),
            F.when(
                k % 4 == 0,
                F.format_string(
                    "Sitemap: https://h%d.example/idx2.xml\n", k
                ),
            ).otherwise(F.lit("")),
        )
        hop1 = p.select(
            F.format_string("h%d.example", k).alias("host"),
            F.explode(parse_robots_sitemaps(robots_txt)).alias(
                "sitemap_url"
            ),
        )

        # hop 2: index XML derived from the index URL; child 'c' is
        # stale (Jan lastmod < watermark) and must die HERE
        kk = F.regexp_extract(F.col("sitemap_url"), r"h(\d+)\.", 1)
        day = (kk.cast("int") % 28 + 1).cast("int")
        idx_xml = F.when(
            F.col("sitemap_url").endswith("idx2.xml"),
            F.format_string(
                "<sitemapindex><sitemap>"
                "<loc>https://h%s.example/sm-d.xml</loc>"
                "<lastmod>2025-08-%02d</lastmod></sitemap>"
                "</sitemapindex>", kk, day,
            ),
        ).otherwise(
            F.format_string(
                "<sitemapindex>"
                "<sitemap><loc>https://h%s.example/sm-a.xml</loc>"
                "<lastmod>2025-08-%02d</lastmod></sitemap>"
                "<sitemap><loc>https://h%s.example/sm-b.xml</loc>"
                "</sitemap>"
                "<sitemap><loc>https://h%s.example/sm-c.xml</loc>"
                "<lastmod>2025-01-%02d</lastmod></sitemap>"
                "</sitemapindex>", kk, day, kk, kk, day,
            )
        )
        hop2 = fresh(
            expand_sitemap_index(
                hop1.select("host", idx_xml.alias("xml")), xml_col="xml"
            )
        ).select("host", "sitemap_url")

        # hop 3: leaf XML from the leaf URL; page u2 is stale and dies
        leaf = F.regexp_extract(F.col("sitemap_url"), r"(sm-[a-d])", 1)
        kk3 = F.regexp_extract(F.col("sitemap_url"), r"h(\d+)\.", 1)
        leaf_xml = F.format_string(
            "<urlset>"
            "<url><loc>https://h%s.example/%s/u1</loc>"
            "<lastmod>2025-07-15</lastmod></url>"
            "<url><loc>https://h%s.example/%s/u2</loc>"
            "<lastmod>2025-02-01</lastmod></url>"
            "<url><loc>https://h%s.example/%s/u3</loc></url>"
            "</urlset>", kk3, leaf, kk3, leaf, kk3, leaf,
        )
        seeds = fresh(
            parse_sitemaps(
                hop2.select("host", leaf_xml.alias("xml")), xml_col="xml"
            )
        )
        return seeds.select("host", "url", "lastmod").orderBy(
            "host", "url"
        ).limit(3000)

    q["sitemap_discovery_chain"] = sitemap_discovery_chain

    # ---- text analysis over documents --------------------------------------

    def doc_token_stats(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.round(F.avg(token_count(F.col("text"))), 4).alias("avg_tokens"),
                F.max(token_count(F.col("text"))).alias("max_tokens"),
            )
            .orderBy("lang")
        )

    q["doc_token_stats"] = doc_token_stats

    def doc_pack_sequences(spark, sf):
        """Sequence packing (r5): assign each document to a fixed
        token-budget pack (contiguous packing — a doc belongs to the
        pack its first token lands in, overflow ≤ max doc length; the
        never-overflow greedy reset is a sequential recurrence no
        engine parallelizes).  The running token sum uses the chunked
        decomposition from the scheduler's per-host rank, never a
        global single-task window; the oracle is the equivalent plain
        SQL window cumsum."""
        from cex_crawler_spark.operators.packing import pack_documents

        d = _t(spark, sf, "documents")
        packed = pack_documents(
            d, "doc_id", token_count(F.col("text")), budget=2048
        )
        return packed.select("doc_id", "n_tokens", "pack_id").orderBy(
            "doc_id"
        )

    q["doc_pack_sequences"] = doc_pack_sequences

    def doc_decontamination(spark, sf):
        """Benchmark decontamination (r5): training docs sharing any
        verbatim 8-gram with the held-out eval slice (doc_id % 29 == 0
        plays the benchmark).  Eval grams broadcast; the corpus is one
        scan-side explode + map-side join — see
        operators/dedup.py:decontamination_matches."""
        from cex_crawler_spark.operators.dedup import decontamination_matches

        d = _t(spark, sf, "documents")
        ev = d.filter(F.col("doc_id") % 29 == 0)
        tr = d.filter(F.col("doc_id") % 29 != 0)
        return decontamination_matches(tr, ev, k=8).orderBy("doc_id")

    q["doc_decontamination"] = doc_decontamination

    def doc_pii_scrub(spark, sf):
        """PII detection + redaction (r5): emails/phones injected
        deterministically into the corpus (the parquet has none), then
        counted and scrubbed by the pure-Catalyst transforms — patterns
        chosen to mean the same thing in Java regex and RE2 so the
        oracle replays them verbatim."""
        from cex_crawler_spark.functions.text import (
            pii_email_count,
            pii_phone_count,
            scrub_pii,
        )

        d = _t(spark, sf, "documents")
        txt = F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.format_string(
                    " contact user%d@mail-%d.example.org now",
                    F.col("doc_id"), F.col("doc_id") % 7,
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.format_string(
                    " call +1 555 10%04d", F.col("doc_id") % 10000
                ),
            ).otherwise(F.lit("")),
        )
        return d.select(
            "doc_id",
            pii_email_count(txt).alias("n_emails"),
            pii_phone_count(txt).alias("n_phones"),
            scrub_pii(txt).alias("scrubbed"),
        ).orderBy("doc_id")

    q["doc_pii_scrub"] = doc_pii_scrub

    def doc_repetition_stats(spark, sf):
        """Gopher-style repetition screens (r5): top-token fraction,
        top-bigram fraction, distinct-token ratio per doc — the mode is
        computed relationally (explode → map-combinable count aggs),
        never as a per-row array fold."""
        from cex_crawler_spark.functions.text import repetition_stats

        d = _t(spark, sf, "documents")
        return repetition_stats(d, "text", "doc_id").orderBy("id")

    q["doc_repetition_stats"] = doc_repetition_stats

    def doc_unigram_logprob(spark, sf):
        """CCNet-style LM quality gate: per-doc mean −ln p(token) under
        the corpus's own unigram MLE model (rare-token noise scores
        high, boilerplate low).  Corpus total rides a one-row broadcast;
        the token→frequency join is a plain hash join — no
        window-over-everything."""
        from cex_crawler_spark.functions.text import unigram_logprob_scores

        d = _t(spark, sf, "documents")
        return (
            unigram_logprob_scores(d, "text", "doc_id")
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id")
            .limit(500)
        )

    q["doc_unigram_logprob"] = doc_unigram_logprob

    def doc_bigram_logprob(spark, sf):
        """Interpolated-bigram LM gate (r5): context-aware upgrade of
        the unigram filter — λ=0.5 mix of P(w|prev) and P(w), both MLE
        from the corpus itself.  Oracle pairs bigrams by a positional
        self-join where the engine uses a per-doc lag window —
        different mechanics, same counts."""
        from cex_crawler_spark.functions.text import bigram_logprob_scores

        d = _t(spark, sf, "documents")
        return (
            bigram_logprob_scores(d, "text", "doc_id")
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id")
            .limit(500)
        )

    q["doc_bigram_logprob"] = doc_bigram_logprob

    def doc_lang_id(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.withColumn("lang_pred", lang_id(F.col("text")))
            .groupBy("lang", "lang_pred")
            .agg(F.count("*").alias("n"))
            .orderBy("lang", "lang_pred")
        )

    q["doc_lang_id"] = doc_lang_id

    def doc_stopword_ratio(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.select(
                "doc_id",
                F.round(stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
            )
            .orderBy("doc_id")
            .limit(500)
        )

    q["doc_stopword_ratio"] = doc_stopword_ratio

    def doc_quality(spark, sf):
        """Composite quality score (stopword presence, token length,
        punctuation density, length) — the training-data filter knob."""
        from cex_crawler_spark.functions.text import quality_score

        d = _t(spark, sf, "documents")
        return (
            d.select("doc_id", quality_score(F.col("text")).alias("quality"))
            .orderBy("doc_id")
            .limit(500)
        )

    q["doc_quality"] = doc_quality

    def hkt_render(spark, sf):
        """HKT export edge: UTC event timestamps rendered as the
        reference's Asia/Hong_Kong strings (binance.py:239)."""
        from cex_crawler_spark.operators.aggregate import hkt_export_view

        e = _t(spark, sf, "events")
        return (
            hkt_export_view(e.select("event_id", "ts"), ("ts",))
            .orderBy("event_id")
            .limit(500)
        )

    q["hkt_render"] = hkt_render

    def doc_fingerprint(spark, sf):
        d = _t(spark, sf, "documents")
        return (
            d.groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct(fingerprint_md5(F.col("text"))).alias("n_distinct_fp"),
                F.min(fingerprint_md5(F.col("text"))).alias("min_fp"),
            )
            .orderBy("source")
        )

    q["doc_fingerprint"] = doc_fingerprint

    # ---- dedup family -------------------------------------------------------

    def dedup_exact(spark, sf):
        d = _t(spark, sf, "documents").select("doc_id", "text")
        dup = d.withColumn("doc_id", F.col("doc_id") + 100000)
        return (
            exact_dedup(d.unionByName(dup), "text", "doc_id")
            .select("doc_id")
            .orderBy("doc_id")
        )

    q["dedup_exact"] = dedup_exact

    def dedup_ngram_jaccard(spark, sf):
        d = _t(spark, sf, "documents")
        return ngram_jaccard_pairs(
            d, "text", "doc_id", k=3, threshold=0.5, max_df=None
        ).orderBy("id_a", "id_b")

    q["dedup_ngram_jaccard"] = dedup_ngram_jaccard

    def dedup_minhash_lsh(spark, sf):
        d = _t(spark, sf, "documents")
        return minhash_lsh_pairs(
            d, "text", "doc_id", num_hashes=64, bands=32, shingle_k=3,
            threshold=0.5,
        ).orderBy("id_a", "id_b")

    q["dedup_minhash_lsh"] = dedup_minhash_lsh

    def dedup_clusters(spark, sf):
        """Pairs → connected components → one representative per
        cluster (the step a training pipeline actually applies: a~b~c
        collapses even when the (a,c) pair was never emitted).
        Distributed min-label propagation; oracle = DuckDB recursive-CTE
        transitive closure over the same exact-Jaccard pairs."""
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        d = _t(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(
            d, "text", "doc_id", k=3, threshold=0.5, max_df=None
        )
        return (
            dedup_cluster_representatives(d, pairs, "doc_id")
            .select("doc_id", "component", "is_representative")
            .orderBy("doc_id")
        )

    q["dedup_clusters"] = dedup_clusters

    def dedup_cluster_census(spark, sf):
        """Near-dup cluster-size census: the size histogram of the
        Jaccard connected components plus the dedup-savings column
        ((size−1)·n_clusters = docs a representatives-only corpus
        drops) — the capacity-planning view a curation run publishes
        before committing the dedup (a heavy tail here means mirror
        farms, not editorial reuse).  Two map-combinable rollups on
        top of the CC operator."""
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        d = _t(spark, sf, "documents")
        pairs = ngram_jaccard_pairs(
            d, "text", "doc_id", k=3, threshold=0.5, max_df=None
        )
        sizes = (
            dedup_cluster_representatives(d, pairs, "doc_id")
            .groupBy("component")
            .agg(F.count("*").alias("cluster_size"))
        )
        return (
            sizes.groupBy("cluster_size")
            .agg(F.count("*").alias("n_clusters"))
            .select(
                "cluster_size",
                "n_clusters",
                (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
                ((F.col("cluster_size") - 1) * F.col("n_clusters")).alias(
                    "docs_removed_if_deduped"
                ),
            )
            .orderBy("cluster_size")
        )

    q["dedup_cluster_census"] = dedup_cluster_census


    def corpus_curation(spark, sf):
        """The canonical training-data pipeline END-TO-END in one plan:
        quality gate + language gate + exact-dedup representative — the
        composition a 100 TB curation job runs, filters and dedup fused
        so Catalyst pushes the gates below the dedup aggregation."""
        from cex_crawler_spark.functions.text import lang_id, quality_score
        from cex_crawler_spark.operators.dedup import exact_dedup

        d = _t(spark, sf, "documents")
        scored = d.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        kept = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        return (
            exact_dedup(kept, "text", "doc_id")
            .select("doc_id", "quality")
            .orderBy("doc_id")
        )

    q["corpus_curation"] = corpus_curation

    def corpus_curation_neardup(spark, sf):
        """The curation pipeline a 100 TB job actually ends with
        (VERDICT r3 item 2): quality + language gates, then NEAR-dup
        collapse — MinHash-LSH candidate pairs (exact-Jaccard-verified)
        → connected components → one representative per cluster, with
        the cluster size each representative stands for.  Oracle: the
        same gates in DuckDB + a recursive-CTE transitive closure over
        exact-Jaccard pairs (LSH recall is 1.0 here: candidate
        generation is per-doc, so recall on the gated subset is ≥ the
        full-corpus recall dedup_minhash_lsh's hash-green oracle
        already rests on)."""
        from cex_crawler_spark.functions.text import lang_id, quality_score
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        d = _t(spark, sf, "documents")
        scored = d.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        kept = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        pairs = minhash_lsh_pairs(
            kept, "text", "doc_id", num_hashes=64, bands=32, shingle_k=3,
            threshold=0.5,
        )
        reps = dedup_cluster_representatives(kept, pairs, "doc_id")
        sizes = reps.groupBy("component").agg(
            F.count("*").alias("cluster_size")
        )
        return (
            reps.filter(F.col("is_representative"))
            .join(sizes, "component")
            .select("doc_id", "quality", "cluster_size")
            .orderBy("doc_id")
        )

    q["corpus_curation_neardup"] = corpus_curation_neardup

    def corpus_curation_packed(spark, sf):
        """The END of the pipeline (r5 capstone): quality+language
        gates → near-dup collapse (LSH pairs → connected components →
        representatives) → SEQUENCE PACKING of the surviving docs into
        1024-token packs — curation's output in the shape a trainer
        actually consumes.  Every stage is the audited scale path; the
        oracle extends the curation recursive CTE with the window-cumsum
        pack assignment."""
        from cex_crawler_spark.functions.text import lang_id, quality_score
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )
        from cex_crawler_spark.operators.packing import pack_documents

        d = _t(spark, sf, "documents")
        scored = d.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        kept = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        pairs = minhash_lsh_pairs(
            kept, "text", "doc_id", num_hashes=64, bands=32, shingle_k=3,
            threshold=0.5,
        )
        reps = dedup_cluster_representatives(kept, pairs, "doc_id")
        sizes = reps.groupBy("component").agg(
            F.count("*").alias("cluster_size")
        )
        rep = reps.filter(F.col("is_representative")).join(sizes, "component")
        packed = pack_documents(
            rep, "doc_id", token_count(F.col("text")), budget=1024
        )
        return packed.select(
            "doc_id", "cluster_size", "n_tokens", "pack_id"
        ).orderBy("doc_id")

    q["corpus_curation_packed"] = corpus_curation_packed

    def doc_dup_span_stats(spark, sf):
        """Linear-cost substring-dedup screen: per-doc count/ratio of
        5-token spans shared with ≥ 2 documents (no pair join — the
        first-pass signal at scales where even LSH candidate pair
        output is too much)."""
        from cex_crawler_spark.operators.dedup import duplicate_span_stats

        d = _t(spark, sf, "documents")
        return (
            duplicate_span_stats(d, "text", "doc_id", k=5, min_df=2)
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id")
        )

    q["doc_dup_span_stats"] = doc_dup_span_stats

    def corpus_mix_sample(spark, sf):
        """Deterministic stratified sampling for training-data mixing:
        keep 50% of 'en'-classified docs and 10% of the rest, selected
        by a pure modular mix of doc_id — reproducible across runs and
        engines (no RNG, SURVEY §2.10 determinism rule), trivially
        repartitionable at 100 TB because the predicate is row-local."""
        from cex_crawler_spark.functions.text import lang_id

        d = _t(spark, sf, "documents")
        bucket = F.pmod(F.col("doc_id") * F.lit(2654435761), F.lit(100))
        rate = F.when(lang_id(F.col("text")) == "en", F.lit(50)).otherwise(
            F.lit(10)
        )
        return (
            d.filter(bucket < rate)
            .select("doc_id", lang_id(F.col("text")).alias("lang_pred"))
            .orderBy("doc_id")
        )

    q["corpus_mix_sample"] = corpus_mix_sample

    def doc_winnow_fingerprints(spark, sf):
        """Winnowing fingerprints (SIGMOD'03 / MOSS): per-doc selected
        set of window-min md5 k-gram hashes — any shared substring of
        length ≥ w+k−1 = 11 chars yields a shared fingerprint.  Fully
        relational (transform + posexplode + min-over-window), so the
        DuckDB oracle replays it exactly (md5 agrees byte-for-byte
        across engines).  Bounded to 100 docs at any SF."""
        from cex_crawler_spark.operators.dedup import winnow_fingerprints

        d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
        return (
            winnow_fingerprints(d, "text", "doc_id", k=8, w=4)
            .withColumnRenamed("id", "doc_id")
            .orderBy("doc_id", "fp")
        )

    q["doc_winnow_fingerprints"] = doc_winnow_fingerprints

    def winnow_near_dup_pairs(spark, sf):
        """Cross-doc near-dups from winnowing fingerprints (VERDICT r4
        item 6): inverted-index join on the window-min md5 sketch, pair
        aggregate, containment ≥ 0.5 gate — the full-corpus MOSS-style
        near-dup detector, oracled by replaying winnowing + the pair
        join in DuckDB."""
        from cex_crawler_spark.operators.dedup import (
            winnow_near_dup_pairs as pairs_fn,
        )

        d = _t(spark, sf, "documents")
        return pairs_fn(
            d, "text", "doc_id", k=8, w=4, min_shared=5,
            min_containment=0.5,
        ).orderBy("id_a", "id_b")

    q["winnow_near_dup_pairs"] = winnow_near_dup_pairs

    def dedup_simhash(spark, sf):
        """4×16-bit multi-block candidates; with radius 3 ≤ blocks−1 the
        output is EXACTLY all pairs at Hamming ≤ 3 (pigeonhole) — still
        rows-only (the token-hash SimHash isn't SQL-expressible)."""
        d = _t(spark, sf, "documents")
        return (
            simhash_dedup_candidates(d, "text", "doc_id")
            .filter(F.col("hamming") <= 3)
            .orderBy("id_a", "id_b")
        )

    q["dedup_simhash"] = dedup_simhash

    # ---- similarity search --------------------------------------------------

    def ann_cosine_topk(spark, sf):
        emb = _t(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 8)
        return cosine_topk(emb, queries_df, k=5).orderBy("query_id", "rank")

    q["ann_cosine_topk"] = ann_cosine_topk

    def ann_lsh_topk(spark, sf):
        """Multi-table + multiprobe SRP LSH; at 32 tables the candidate
        set provably covers the true top-5 on the test embeddings, so the
        exact-top-k oracle applies (recall gate lives in pytest too)."""
        emb = _t(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 8)
        return lsh_cosine_topk(
            emb, queries_df, k=5, dim=64, n_tables=64
        ).orderBy("query_id", "rank")

    q["ann_lsh_topk"] = ann_lsh_topk

    def ann_ivf_topk(spark, sf):
        """IVF ANN (hash-sampled k-means cells + n_probe scan).  At
        n_probe=15/16 the probed cells provably cover the true top-5 on
        the test embeddings at BOTH sf0.001 and sf0.01 (verified — the
        LSH-lesson SF-dependence check), so the exact-top-k oracle
        applies; the ≥0.9-recall-at-lower-probe gate lives in pytest."""
        from cex_crawler_spark.operators.similarity import ivf_cosine_topk

        emb = _t(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 8)
        return ivf_cosine_topk(
            emb, queries_df, k=5, n_centroids=16, n_probe=15
        ).orderBy("query_id", "rank")

    q["ann_ivf_topk"] = ann_ivf_topk

    def ann_ivf_pq_topk(spark, sf):
        """IVF-PQ ANN (r5): coarse cells + product-quantized 20-byte
        codes (16 subspaces x 16 codes over 64 dims); ADC shortlist,
        exact re-rank of the top `refine`.  Near-uniform random
        embeddings are PQ's adversarial case (true-neighbor cosine gaps
        are smaller than the coding error), so the oracle setting
        derives refine from the corpus size — max(192, n/3), one tiny
        count — which provably covers the true top-5 at sf0.001, sf0.01
        AND sf0.1 (verified), making the brute-force oracle apply; the
        recall gate at economical settings lives in pytest."""
        from cex_crawler_spark.operators.similarity import ivf_pq_cosine_topk

        emb = _t(spark, sf, "embeddings")
        queries_df = emb.filter(F.col("vec_id") < 8)
        refine = max(192, emb.count() // 3)
        return ivf_pq_cosine_topk(
            emb, queries_df, k=5, n_centroids=16, n_probe=16,
            m_subspaces=16, n_codes=16, refine=refine,
        ).orderBy("query_id", "rank")

    q["ann_ivf_pq_topk"] = ann_ivf_pq_topk

    def embedding_near_dups(spark, sf):
        emb = _t(spark, sf, "embeddings")
        return embedding_near_dup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")

    q["embedding_near_dups"] = embedding_near_dups

    def semantic_dedup(spark, sf):
        """SemDeDup-style semantic dedup end-to-end (r5): embedding
        near-dup pairs (exact-cosine-verified) → connected components →
        one representative per semantic cluster with the cluster size it
        stands for — the embedding-space twin of
        ``corpus_curation_neardup``.  Every stage is the audited scale
        path: pair generation is the gated GEMM/LSH operator (never an
        ungated all-pairs), components are path-halving (O(log diameter)
        rounds), sizes are a map-combinable count.  Oracle: brute-force
        ``list_cosine_similarity`` pairs + recursive-CTE closure."""
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        emb = _t(spark, sf, "embeddings")
        pairs = embedding_near_dup_pairs(emb, threshold=0.4).select(
            "id_a", "id_b"
        )
        reps = dedup_cluster_representatives(
            emb.select("vec_id"), pairs, "vec_id"
        )
        sizes = reps.groupBy("component").agg(
            F.count("*").alias("cluster_size")
        )
        return (
            reps.filter(F.col("is_representative"))
            .join(sizes, "component")
            .select("vec_id", "cluster_size")
            .orderBy("vec_id")
        )

    q["semantic_dedup"] = semantic_dedup

    # ---- streaming-analog windows ------------------------------------------

    def event_tumbling_windows(spark, sf):
        e = _t(spark, sf, "events")
        return windowed_event_counts(e, "1 hour").orderBy(
            "window_start", "event_type"
        )

    q["event_tumbling_windows"] = event_tumbling_windows

    def event_sessionize(spark, sf):
        e = _t(spark, sf, "events")
        return (
            sessionize_events(e, gap_minutes=30)
            .select("user_id", "session_no", "n_events", "sum_value")
            .orderBy("user_id", "session_no")
        )

    q["event_sessionize"] = event_sessionize

    # ---- multimodal (rows-only: payload tables are engine-synthesized) ----

    def image_features(spark, sf):
        from cex_crawler_spark.synth import gen_payloads

        ship_package(spark)
        return extract_image_features(gen_payloads(spark, 200)).orderBy("image_id")

    q["image_features"] = image_features

    def image_phash_near_dups(spark, sf):
        """Multimodal near-dup detection: perceptual hashes of the
        synthetic image corpus PLUS a pixel-jittered re-encode of every
        image (real decode → ±8 checkerboard → PNG re-encode), bucketed
        by the generalized multi-block Hamming scheme.  The jitter is
        zero-mean per phash cell so each (original, edited) pair lands
        at Hamming ≤ 3 — inside the 4-block pigeonhole radius; this is
        the image analog of text SimHash dedup.  Rows-only (imaging is
        not SQL-expressible)."""
        from cex_crawler_spark.operators.dedup import (
            hamming_near_dup_candidates,
        )
        from cex_crawler_spark.operators.multimodal import jitter_images
        from cex_crawler_spark.synth import gen_payloads

        ship_package(spark)
        base = gen_payloads(spark, 120)
        variants = jitter_images(base).withColumn(
            "image_id", F.concat(F.col("image_id"), F.lit("_r"))
        )
        feats = extract_image_features(
            base.select("image_id", "bytes", "fmt").unionByName(
                variants.select("image_id", "bytes", "fmt")
            )
        ).filter(F.col("decode_ok"))
        return (
            hamming_near_dup_candidates(feats, "phash", "image_id")
            .filter(F.col("hamming") <= 3)
            .orderBy("id_a", "id_b")
        )

    q["image_phash_near_dups"] = image_phash_near_dups

    def crawl_round_sim(spark, sf):
        """One politeness-scheduled round — the engine's spine query —
        over the SQL-expressible deterministic frontier, so every per-row
        verdict (robots → stale → dup → budget rank) is checked against a
        DuckDB window-function oracle (hash-green, not rows-only).
        Reference semantics: the sequential loop at
        /root/reference/exchange/binance.py:233-288."""
        from cex_crawler_spark.functions.urlnorm import with_canonical_url
        from cex_crawler_spark.operators.politeness import schedule_round
        from cex_crawler_spark.synth import gen_host_policy

        ship_package(spark)
        frontier = with_canonical_url(gen_sim_frontier(spark))
        decisions = schedule_round(frontier, gen_host_policy(spark), SIM_WATERMARK)
        return decisions.select(
            "seed_id", "host", "status", "host_seq"
        ).orderBy("seed_id")

    q["crawl_round_sim"] = crawl_round_sim

    # ---- reference shipped corpus (the repo's real ground truth) ----------

    def reference_consolidate(spark, sf):
        """K4 over the REAL reference corpus: 674 shipped JSON records →
        the announcements.csv view (main.py:42-67 semantics)."""
        from cex_crawler_spark.operators.aggregate import (
            consolidate_announcements,
        )
        from cex_crawler_spark.sources.corpus import read_announcement_corpus

        return consolidate_announcements(
            read_announcement_corpus(spark), REF_RUN_DATE
        )

    q["reference_consolidate"] = reference_consolidate

    def _reference_pivot(spark, type_value, roster):
        from cex_crawler_spark.operators.aggregate import (
            consolidate_announcements,
            filter_recent,
            pivot_by_exchange,
        )
        from cex_crawler_spark.sources.corpus import read_announcement_corpus

        cons = consolidate_announcements(
            read_announcement_corpus(spark), REF_RUN_DATE
        )
        return pivot_by_exchange(
            filter_recent(cons, REF_RUN_DATE), type_value, roster
        )

    def reference_pivot_spot(spark, sf):
        from cex_crawler_spark.operators.aggregate import SPOT_CEX

        return _reference_pivot(spark, "现货", SPOT_CEX)

    q["reference_pivot_spot"] = reference_pivot_spot

    def reference_pivot_futures(spark, sf):
        from cex_crawler_spark.operators.aggregate import FUTURES_CEX

        return _reference_pivot(spark, "合约", FUTURES_CEX)

    q["reference_pivot_futures"] = reference_pivot_futures

    def bloom_semijoin_revenue(spark, sf):
        """Semi-join reduction (operators/joins.py): a distributed-built
        Bloom over urgent orders' keys drops lineitem rows scan-side
        BEFORE the shuffle; the exact join after it kills Bloom false
        positives, so the composition is bit-identical to the plain
        join — which is exactly what the oracle runs."""
        from cex_crawler_spark.operators.joins import bloom_filtered_join

        urgent = (
            _t(spark, sf, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_orderkey").alias("l_orderkey"))
        )
        li = _t(spark, sf, "lineitem")
        return (
            bloom_filtered_join(li, urgent, on="l_orderkey", how="inner")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n_items"),
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("revenue"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["bloom_semijoin_revenue"] = bloom_semijoin_revenue

    def image_caption_curation(spark, sf):
        """LAION-style image-caption curation over the input-hint table
        shape (image_id, w, h, fmt, caption, phash): resolution floor,
        aspect-ratio cap, format whitelist, caption-length gate — all
        scan-side Catalyst filters — then exact perceptual-hash dedup
        via the groupBy-min + semi-join scale path (operators/dedup.py's
        exact_dedup shape on the 8-byte phash, map-side combinable, no
        window over the corpus), then per-format stats."""
        imgs = gen_sim_images(spark)
        toks = F.size(F.split(F.col("caption"), " "))
        gated = imgs.filter(
            (F.col("w") >= 64)
            & (F.col("h") >= 64)
            & (F.greatest("w", "h") <= 3 * F.least("w", "h"))
            & F.col("fmt").isin("jpeg", "png", "webp")
            & (toks >= 5)
        )
        keep = gated.groupBy("phash").agg(F.min("image_id").alias("image_id"))
        canon = gated.join(keep, ["phash", "image_id"], "left_semi")
        return (
            canon.groupBy("fmt")
            .agg(
                F.count("*").alias("n_images"),
                F.round(F.avg("w"), 2).alias("avg_w"),
                F.round(F.avg("h"), 2).alias("avg_h"),
                F.sum(F.size(F.split(F.col("caption"), " ")))
                .cast("long")
                .alias("caption_tokens"),
            )
            .orderBy("fmt")
        )

    q["image_caption_curation"] = image_caption_curation

    def phash_hamming_pairs_sim(spark, sf):
        """Perceptual-hash near-dup pairs over the sim image table via the
        generalized multi-block pigeonhole candidate generator
        (operators/dedup.py hamming_near_dup_candidates): bucketed
        16-bit-block equi-join, O(rows×4) shuffle, never all-pairs — the
        oracle IS the all-pairs brute force, so candidate recall at
        Hamming ≤ 3 is proven exact, not just planted-pair-tested."""
        from cex_crawler_spark.operators.dedup import hamming_near_dup_candidates

        imgs = gen_sim_images(spark)
        return (
            hamming_near_dup_candidates(imgs, "phash", "image_id")
            .filter(F.col("hamming") <= 3)
            .select(
                "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
            )
            .orderBy("id_a", "id_b")
        )

    q["phash_hamming_pairs_sim"] = phash_hamming_pairs_sim

    def recrawl_schedule(spark, sf):
        """Cho & Garcia-Molina change-rate recrawl scheduling
        (operators/recrawl.py): bias-reduced Poisson-rate estimate per
        URL from its own revisit history, staleness probability at the
        current age, and the scheduler-ready priority ladder — all
        shuffle-free scan-side arithmetic."""
        from cex_crawler_spark.operators.recrawl import change_rate_priorities

        hist = gen_sim_fetch_history(spark)
        scored = change_rate_priorities(hist)
        # + 0.0 canonicalizes IEEE negative zero (−ln(1.0) = −0.0 in
        # DuckDB; the driver's value-hash would see "-0.000000" ≠ "0.000000")
        return scored.select(
            "url_id",
            (F.round("lambda_hat", 4) + 0.0).alias("lambda_hat"),
            (F.round("p_stale", 4) + 0.0).alias("p_stale"),
            "recrawl_priority",
        ).orderBy("url_id")

    q["recrawl_schedule"] = recrawl_schedule

    def doc_sliding_chunks(spark, sf):
        """Overlapping fixed-size context windows per document
        (operators/packing.py sliding_chunks): the long-document shaping
        step before packing — pure scan-side Catalyst (sequence →
        posexplode → slice), no shuffle, fan-out ceil(n/stride)/doc."""
        from cex_crawler_spark.operators.packing import sliding_chunks

        d = _t(spark, sf, "documents")
        return sliding_chunks(
            d, "text", "doc_id", chunk_tokens=128, stride=96
        ).orderBy("doc_id", "chunk_idx")

    q["doc_sliding_chunks"] = doc_sliding_chunks

    def crawl_trap_hosts(spark, sf):
        """URL-template trap screen (operators/traps.py): collapse
        variable URL parts (digit runs, hex ids, query values), flag
        hosts whose frontier mass concentrates in one template — two
        map-combinable aggregates, scan-side regexes, no corpus-sized
        shuffle."""
        from cex_crawler_spark.operators.traps import trap_hosts

        f = gen_sim_trap_frontier(spark)
        return trap_hosts(f, min_urls=100, max_top_template_share=0.5).orderBy(
            "host"
        )

    q["crawl_trap_hosts"] = crawl_trap_hosts

    def dust_param_rules(spark, sf):
        """DUST parameter-significance learning (operators/dust.py):
        per-(host, param) verdicts from the crawl's own (url, digest)
        log — varied-residual evidence counting, conflict detection,
        conservative strip rules; two map-combinable aggregates over
        narrow exploded-param rows, no UDF, no self-join."""
        from cex_crawler_spark.operators.dust import param_significance

        log = gen_sim_dust_log(spark)
        return param_significance(log, min_groups=3).orderBy("host", "param")

    q["dust_param_rules"] = dust_param_rules

    def dust_url_collapse(spark, sf):
        """Learned-rule URL rewrite (operators/dust.py
        strip_learned_params): pass-1 rules broadcast back onto the log,
        scan-side array filter + order canonicalization — distinct-URL
        collapse per host is the alias mass the frontier stops paying
        politeness slots for."""
        from cex_crawler_spark.operators.dust import (
            param_significance,
            strip_learned_params,
        )

        log = gen_sim_dust_log(spark)
        rules = param_significance(log, min_groups=3)
        return (
            strip_learned_params(log, rules)
            .groupBy("host")
            .agg(
                F.countDistinct("url").alias("n_raw_urls"),
                F.countDistinct("canonical_url").alias("n_canonical_urls"),
            )
            .orderBy("host")
        )

    q["dust_url_collapse"] = dust_url_collapse

    def mirror_host_pairs(spark, sf):
        """Mirror-host detection (operators/mirrors.py): digest-set
        containment between hosts from the fetch log — distinct sets,
        boilerplate-digest doc-frequency cap (the stop-shingle twin),
        digest-keyed self-join bounded by cap², integer
        cross-multiplied containment verdict."""
        from cex_crawler_spark.operators import mirrors

        pages = gen_sim_mirror_pages(spark)
        return mirrors.mirror_host_pairs(
            pages, min_shared=10, min_containment_pct=90,
            max_hosts_per_digest=8,
        ).orderBy("host_a", "host_b")

    q["mirror_host_pairs"] = mirror_host_pairs

    def mirror_host_clusters(spark, sf):
        """Mirror groups → canonical host (operators/mirrors.py): mirror
        pairs feed the engine's path-halving connected components over
        host strings; the lexicographic component min is the
        deterministic canonical host the scheduler keeps at full
        priority while demoting the aliases."""
        from cex_crawler_spark.operators import mirrors

        pages = gen_sim_mirror_pages(spark)
        pairs = mirrors.mirror_host_pairs(
            pages, min_shared=10, min_containment_pct=90,
            max_hosts_per_digest=8,
        )
        return mirrors.mirror_clusters(pairs).orderBy("host")

    q["mirror_host_clusters"] = mirror_host_clusters

    def crawl_byte_budget_take(spark, sf):
        """Bandwidth-aware round sizing (operators/allocation.py
        take_byte_budget): maximal priority-ordered prefix under a
        global byte budget — chunked running sum (no global window),
        contiguous-prefix semantics so priority order is never traded
        for knapsack fill."""
        from cex_crawler_spark.operators.allocation import take_byte_budget

        sid = F.col("id")
        cand = spark.range(4000).select(
            sid.alias("url_id"),
            ((sid * 2654435761) % 3).alias("priority"),
            (500 + (sid * 48271) % 5000).alias("est_bytes"),
        ).withColumn(
            "okey", F.col("priority") * 100000 + F.col("url_id")
        )
        return (
            take_byte_budget(
                cand, "okey", "est_bytes", budget=2_500_000, chunk_width=256
            )
            .select("url_id", "priority", "est_bytes", "cum_bytes", "taken")
            .orderBy("priority", "url_id")
        )

    q["crawl_byte_budget_take"] = crawl_byte_budget_take

    def frontier_alias_collapse(spark, sf):
        """Alias-collapse capstone: learned DUST param rules strip the
        session-id noise, mirror detection over the de-noised (host,
        digest) log folds the clone hosts, and the frontier rewrites to
        (canonical host × canonical URL) — 3000 raw frontier rows
        collapse to the 90 truly distinct pages.  Every stage is the
        audited scale path (broadcast rules, df-capped digest join,
        path-halving CC)."""
        from cex_crawler_spark.operators import mirrors
        from cex_crawler_spark.operators.dust import (
            param_significance,
            strip_learned_params,
        )

        log = gen_sim_alias_log(spark)
        rules = param_significance(log, min_groups=3)
        stripped = strip_learned_params(log, rules)
        pairs = mirrors.mirror_host_pairs(
            stripped, min_shared=10, min_containment_pct=90,
            max_hosts_per_digest=8,
        )
        clusters = mirrors.mirror_clusters(pairs).withColumnRenamed(
            "host", "__chost"
        )
        final = (
            stripped.join(
                F.broadcast(clusters),
                stripped["host"] == F.col("__chost"),
                "left",
            )
            .withColumn(
                "final_host", F.coalesce(F.col("canonical_host"), F.col("host"))
            )
            .withColumn(
                "final_url",
                F.concat(
                    F.lit("https://"),
                    F.col("final_host"),
                    F.regexp_replace(
                        F.col("canonical_url"), "^https://[^/]*", ""
                    ),
                ),
            )
        )
        return (
            final.groupBy("final_host")
            .agg(
                F.countDistinct("url").alias("n_raw_urls"),
                F.countDistinct("final_url").alias("n_final_urls"),
            )
            .orderBy("final_host")
        )

    q["frontier_alias_collapse"] = frontier_alias_collapse

    def frontier_frontcode(spark, sf):
        """Front-coded seen-set storage (operators/frontcode.py): SURT
        keys blocked by fixed key prefix, every key stored as
        (lcp-vs-block-header, suffix) — header-relative so decode is
        scan-side with no intra-block recurrence; per-block exact
        integer storage accounting."""
        from cex_crawler_spark.operators.frontcode import (
            frontcode_stats,
            frontcode_urls,
        )

        f = gen_sim_trap_frontier(spark)
        coded, headers = frontcode_urls(f, block_prefix_len=12)
        return frontcode_stats(coded, headers).orderBy("block")

    q["frontier_frontcode"] = frontier_frontcode

    def recrawl_round_plan(spark, sf):
        """Freshness-round capstone: Cho–Garcia-Molina change-rate
        priorities (operators/recrawl.py) → starvation-free priority
        aging (operators/politeness.py age_priorities) → bandwidth-
        budget prefix take (operators/allocation.py) — the round plan a
        freshness-aware, byte-provisioned recrawler actually executes;
        every stage scan-side or chunked, no global window."""
        from cex_crawler_spark.operators.allocation import take_byte_budget
        from cex_crawler_spark.operators.politeness import age_priorities
        from cex_crawler_spark.operators.recrawl import change_rate_priorities

        hist = gen_sim_fetch_history(spark)
        scored = change_rate_priorities(hist).withColumn(
            "__sid", F.substring("url_id", 4, 8).cast("long")
        )
        d = scored.withColumn(
            "priority", F.col("recrawl_priority")
        ).withColumn("enqueued_round", (F.col("__sid") * 40503) % 7)
        aged = age_priorities(d, current_round=6, age_every=2)
        cand = aged.withColumn(
            "est_bytes", 500 + (F.col("__sid") * 48271) % 4000
        ).withColumn("okey", F.col("priority") * 100000 + F.col("__sid"))
        return (
            take_byte_budget(
                cand, "okey", "est_bytes", budget=1_500_000, chunk_width=256
            )
            .select(
                "url_id",
                (F.round("p_stale", 4) + 0.0).alias("p_stale"),
                "recrawl_priority",
                "priority",
                "est_bytes",
                "cum_bytes",
                "taken",
            )
            .orderBy("priority", "url_id")
        )

    q["recrawl_round_plan"] = recrawl_round_plan

    def host_novelty_steering(spark, sf):
        """Novelty-yield steering (operators/politeness.py
        novelty_yield): per-host share of fetches whose digest is
        GLOBALLY first-seen that round — catches stale hosts AND
        syndicators (per-host dedup can't); digest-keyed min + hash
        join, map-combinable rollups, integer-permille verdict."""
        from cex_crawler_spark.operators.politeness import novelty_yield

        log = gen_sim_novelty_log(spark)
        return novelty_yield(
            log, min_docs=20, min_permille=200
        ).orderBy("host")

    q["host_novelty_steering"] = host_novelty_steering

    def crawl_dispatch_timeline(spark, sf):
        """Politeness as a timeline (operators/politeness.py
        dispatch_timeline): each scheduled URL's earliest-start offset
        = (rank_in_host − 1) × host_delay — per-host rank via the
        chunked running sum (skew-safe), delay dim broadcast; sorted by
        dispatch_ms this is the executor's dispatch plan and its max is
        the round makespan."""
        from cex_crawler_spark.operators.politeness import dispatch_timeline

        sid = F.col("id")
        cand = spark.range(3000).select(
            sid.alias("okey"), F.format_string("h%d", sid % 5).alias("host")
        )
        policy = spark.range(5).select(
            F.format_string("h%d", F.col("id")).alias("host"),
            ((F.col("id") + 1) * 100).alias("min_delay_ms"),
        )
        return (
            dispatch_timeline(cand, policy, order_col="okey")
            .select("okey", "host", "host_rank", "dispatch_ms")
            .orderBy("okey")
        )

    q["crawl_dispatch_timeline"] = crawl_dispatch_timeline

    def crawl_politeness_audit(spark, sf):
        """Politeness compliance audit (operators/validate.py
        politeness_audit): verify an executed round kept its promises —
        per-host consecutive-gap vs min_delay_ms, fetched paths vs
        robots disallow prefixes; lag window over the round-bounded log,
        policy broadcast, all-integer verdicts."""
        from cex_crawler_spark.operators.validate import politeness_audit

        sid = F.col("id")
        k = sid % 4
        i = F.floor(sid / 4)
        host = F.format_string("h%d", k)
        ts = (
            F.when(k == 0, i * 200)
            .when(
                k == 1,
                i * 300
                - F.when((i % 10 == 0) & (i > 0), F.lit(150)).otherwise(0),
            )
            .when(k == 2, i * 100)
            .otherwise(i * 1000)
        )
        url = F.when(
            (k == 2) & (i % 20 == 0),
            F.format_string("https://h2/private/%d", i),
        ).otherwise(F.format_string("https://h%d/p/%d", k, i))
        log = (
            spark.range(2000)
            .select(
                host.alias("host"),
                url.alias("url"),
                ts.cast("long").alias("fetch_ts_ms"),
                k.alias("__k"),
                i.alias("__i"),
            )
            .filter((F.col("__k") != 3) | (F.col("__i") == 0))
            .drop("__k", "__i")
        )
        policy = spark.createDataFrame(
            [
                ("h0", 200, ["/admin/"]),
                ("h1", 300, ["/admin/"]),
                ("h2", 100, ["/private/"]),
                ("h3", 1000, []),
            ],
            "host string, min_delay_ms long, robots_disallow array<string>",
        )
        return politeness_audit(log, policy).orderBy("host")

    q["crawl_politeness_audit"] = crawl_politeness_audit

    def image_curriculum_phases(spark, sf):
        """Curriculum export ordering (operators/packing.py
        curriculum_order): exact global easy→hard rank by (caption
        token count, md5 shuffle within equal difficulty) + equal-size
        integer phase split — chunked rank decomposition, corpus total
        via one-row broadcast cross join, no global window over data."""
        from cex_crawler_spark.operators.packing import curriculum_order

        imgs = gen_sim_images(spark)
        d = imgs.withColumn(
            "difficulty", F.size(F.split("caption", " ")).cast("long")
        )
        return (
            curriculum_order(d, "image_id", "difficulty", n_phases=3)
            .select("image_id", "difficulty", "curriculum_rank", "phase")
            .orderBy("curriculum_rank")
        )

    q["image_curriculum_phases"] = image_curriculum_phases

    def crawl_domain_queues(spark, sf):
        """Registrable-domain politeness collapse (operators/
        politeness.py domain_queue_policy): a wildcard-subdomain farm
        minting hostnames collapses onto ONE shared queue (budget = min
        member, delay = max member) once its eTLD+1 fan-out passes the
        threshold; normal www/cdn/apex spreads keep per-host queues —
        dim-sized broadcast work, scheduler key-agnostic."""
        from cex_crawler_spark.operators.politeness import domain_queue_policy

        sid = F.col("id")
        host = (
            F.when(sid < 20, F.format_string("s%d.spamfarm.com", sid))
            .when(
                sid < 23,
                F.element_at(
                    F.array(
                        F.lit("www.shop.co.uk"),
                        F.lit("cdn.shop.co.uk"),
                        F.lit("shop.co.uk"),
                    ),
                    (sid - 19).cast("int"),
                ),
            )
            .otherwise(F.format_string("solo%d.org", sid))
        )
        policy = spark.range(30).select(
            host.alias("host"),
            (100 + sid * 10).alias("budget_per_round"),
            (200 + sid * 7).alias("min_delay_ms"),
        )
        return (
            domain_queue_policy(policy, max_hosts_per_domain=8)
            .select(
                "host", "queue_key", "n_hosts_on_domain", "n_hosts_on_queue",
                "queue_budget_per_round", "queue_min_delay_ms",
            )
            .orderBy("host")
        )

    q["crawl_domain_queues"] = crawl_domain_queues

    def sitemap_coverage_gap(spark, sf):
        """Sitemap-vs-discovery reconciliation (sources/sitemap.py
        sitemap_coverage_gap): declared-only = content link-following
        misses (seed it directly), discovered-only = orphan/param pages
        (DUST suspects) — one full-outer join on (host, url) + a
        map-combinable rollup."""
        from cex_crawler_spark.sources.sitemap import sitemap_coverage_gap

        sid = F.col("id")
        # host h{sid%4}: declared inventory u0..u59, discovery finds
        # u(20+k)..u(79+k) of it (k = hostid) — per-host gap sizes vary
        declared = spark.range(240).select(
            F.format_string("h%d", sid % 4).alias("host"),
            F.format_string("u%d", F.floor(sid / 4)).alias("url"),
        )
        discovered = spark.range(240).select(
            F.format_string("h%d", sid % 4).alias("host"),
            F.format_string("u%d", F.floor(sid / 4) + 20 + sid % 4).alias(
                "url"
            ),
        )
        return sitemap_coverage_gap(declared, discovered).orderBy("host")

    q["sitemap_coverage_gap"] = sitemap_coverage_gap

    def doc_block_density(spark, sf):
        """Block-level boilerplate removal (functions/text.py
        block_density_extract, the jusText/Arc90 shallow-feature
        family): split on block tags, keep blocks with ≥25 chars of
        visible text and ≤30% link-anchor share — nav/footer chrome
        drops, content paragraphs (even those containing links)
        survive; scan-side split/transform/filter, RE2-safe regexes."""
        from cex_crawler_spark.functions.text import block_density_extract

        sid = F.col("id")
        html = F.concat(
            F.lit('<div><a href="/h">Home</a> <a href="/n">News</a></div>'),
            F.lit("<p>"),
            F.expr(
                "repeat('alpha beta gamma delta epsilon zeta eta theta. ',"
                " CAST(2 + id % 3 AS INT))"
            ),
            F.lit("</p>"),
            F.format_string(
                '<p>Read the full analysis at <a href="/x">this page</a>'
                " for details on topic %d and the surrounding market"
                " context</p>",
                sid % 50,
            ),
            F.when(sid % 4 == 0, F.lit("<p>ok</p>")).otherwise(F.lit("")),
            F.lit('<div><a href="/p">Privacy</a> <a href="/t">Terms</a></div>'),
        )
        d = spark.range(300).select(sid.alias("doc_id"), html.alias("html"))
        s = block_density_extract(F.col("html"))
        return d.select(
            "doc_id",
            s["content"].alias("content"),
            s["n_blocks"].alias("n_blocks"),
            s["n_kept"].alias("n_kept"),
        ).orderBy("doc_id")

    q["doc_block_density"] = doc_block_density

    def robots_policy_delta(spark, sf):
        """Robots verdict delta after a rules refetch (functions/
        robots.py robots_policy_delta): newly_blocked URLs stop being
        scheduled, newly_allowed ones requeue — two broadcast dim joins
        + the scheduler's scan-side prefix exists, no data shuffle."""
        from cex_crawler_spark.functions.robots import robots_policy_delta

        sid = F.col("id")
        frontier = spark.range(1200).select(
            F.format_string("h%d", sid % 3).alias("host"),
            F.when(
                sid % 5 == 0,
                F.format_string("https://h%d/private/%d", sid % 3, sid),
            )
            .when(
                sid % 5 == 1,
                F.format_string("https://h%d/beta/%d", sid % 3, sid),
            )
            .otherwise(F.format_string("https://h%d/p/%d", sid % 3, sid))
            .alias("url"),
        )
        old = spark.createDataFrame(
            [("h0", ["/private/"]), ("h1", ["/private/", "/beta/"]),
             ("h2", [])],
            "host string, robots_disallow array<string>",
        )
        new = spark.createDataFrame(
            [("h0", ["/private/", "/beta/"]), ("h1", ["/private/"]),
             ("h2", [])],
            "host string, robots_disallow array<string>",
        )
        return (
            robots_policy_delta(frontier, old, new)
            .select("host", "url", "old_blocked", "new_blocked", "delta")
            .orderBy("host", "url")
        )

    q["robots_policy_delta"] = robots_policy_delta

    def canonical_link_collapse(spark, sf):
        """rel=canonical alias collapse (operators/linkgraph.py
        canonical_hints + collapse_by_canonical): the site's own alias
        verdict (RFC 6596) — both attribute orders extracted RE2-safely,
        root-relative hrefs resolved, families collapsed by one
        min-struct aggregate (canonical row preferred as kept)."""
        from cex_crawler_spark.operators.linkgraph import (
            canonical_hints,
            collapse_by_canonical,
        )

        sid = F.col("id")
        g = sid % 40
        v = F.floor(sid / 40)
        url = (
            F.when(v == 0, F.format_string("https://c.com/art/%d", g))
            .when(
                v % 3 != 0,
                F.format_string("https://c.com/art/%d?ref=%d", g, v),
            )
            .otherwise(F.format_string("https://c.com/alone/%d-%d", g, v))
        )
        html = (
            F.when(
                v == 0,
                F.format_string(
                    '<html><link rel="canonical" href="/art/%d">body</html>',
                    g,
                ),
            )
            .when(
                (v % 3 == 1),
                F.format_string(
                    '<html><link rel="canonical" href="/art/%d">alias</html>',
                    g,
                ),
            )
            .when(
                (v % 3 == 2),
                F.format_string(
                    '<html><link href="https://c.com/art/%d"'
                    ' rel="canonical">alias</html>',
                    g,
                ),
            )
            .otherwise(F.lit("<html>standalone page, no hint</html>"))
        )
        pages = spark.range(600).select(
            url.alias("url"), html.alias("html")
        )
        return collapse_by_canonical(canonical_hints(pages)).orderBy(
            "canonical_target"
        )

    q["canonical_link_collapse"] = canonical_link_collapse

    def crawl_conditional_plan(spark, sf):
        """HTTP conditional-request planning (operators/recrawl.py
        conditional_fetch_plan): validator-bearing URLs expect header +
        P(changed)×body bytes (CGM staleness model), validator-less
        re-fetches pay the full body, unseen URLs a default — the
        revalidation tier that lets one byte budget cover several× more
        URLs; one url-keyed hash join, floats only at the permille
        grid."""
        from cex_crawler_spark.operators.recrawl import conditional_fetch_plan

        sid = F.col("id")
        hist = gen_sim_fetch_history(spark)
        prior = hist.withColumn(
            "__sid", F.substring("url_id", 4, 8).cast("long")
        ).select(
            "url_id", "n_visits", "n_changed", "interval_days", "age_days",
            (F.col("__sid") % 3 != 0).alias("has_validators"),
            (2000 + (F.col("__sid") * 48271) % 30000).alias("content_bytes"),
        )
        cand = spark.range(3500).select(
            F.format_string("url%08d", sid).alias("url_id")
        )
        return (
            conditional_fetch_plan(cand, prior)
            .select("url_id", "kind", "p_permille", "est_bytes")
            .orderBy("url_id")
        )

    q["crawl_conditional_plan"] = crawl_conditional_plan

    def sitemap_changefreq_trust(spark, sf):
        """Changefreq honesty screen (sources/sitemap.py
        sitemap_changefreq_trust): observed inter-change interval from
        the revisit history vs the sitemap's declaration, slack-banded
        integer verdicts — lastmod-based pruning is only safe on
        'consistent' hosts."""
        from cex_crawler_spark.sources.sitemap import sitemap_changefreq_trust

        sid = F.col("id")
        k = sid % 5
        hist = spark.range(500).select(
            F.format_string("h%d", k).alias("host"),
            F.lit(10).cast("long").alias("n_visits"),
            F.when(k == 0, 10)
            .when(k == 1, F.when(sid % 50 == k, 1).otherwise(0))
            .when(k == 2, 10)
            .when(k == 3, 0)
            .otherwise(10)
            .cast("long")
            .alias("n_changed"),
            F.lit(1).cast("long").alias("interval_days"),
        )
        declared = spark.createDataFrame(
            [("h0", "daily"), ("h1", "hourly"), ("h2", "monthly"),
             ("h3", "daily"), ("h4", "always")],
            "host string, changefreq string",
        )
        return sitemap_changefreq_trust(hist, declared).orderBy("host")

    q["sitemap_changefreq_trust"] = sitemap_changefreq_trust

    def crawl_soft404_screen(spark, sf):
        """Soft-404 / error-template screen (operators/traps.py
        soft404_suspects): one digest carried by many DISTINCT URLs on
        ONE host = a 200-status error template poisoning the corpus —
        the within-host axis beside mirrors (cross-host) and dup spans
        (substrings); dedup_exact's aggregate shape."""
        from cex_crawler_spark.operators.traps import soft404_suspects

        sid = F.col("id")
        k = sid % 4
        i = F.floor(sid / 4)
        # h0: healthy (unique digests); h1: 150 dead URLs → ONE template
        # digest + some real pages; h2: popular page under 5 aliases
        # (below the bar); h3: healthy
        digest = (
            F.when(k == 1, F.when(i < 150, F.lit("tmpl")).otherwise(
                F.format_string("real1-%d", i)))
            .when((k == 2) & (i < 5), F.lit("popular"))
            .otherwise(F.format_string("ok%d-%d", k, i))
        )
        pages = spark.range(1200).select(
            F.format_string("h%d", k).alias("host"),
            F.format_string("https://h%d/u/%d", k, i).alias("url"),
            F.md5(digest).alias("digest"),
        )
        return soft404_suspects(pages, min_urls=20).orderBy(
            "host", "digest"
        )

    q["crawl_soft404_screen"] = crawl_soft404_screen

    def webdataset_manifest(spark, sf):
        """Shard integrity manifest (operators/packing.py
        shard_manifest): per-shard sample count, byte total, and the md5
        of the idx-ordered id list — the loader-side receipt that a
        re-derived export is provably the shipped one; bounded
        collect_list (never corpus-sized), no window."""
        from cex_crawler_spark.operators.packing import (
            assign_shards,
            shard_manifest,
        )

        imgs = gen_sim_images(spark).withColumn(
            "cap_bytes", F.length("caption").cast("long")
        )
        sharded = assign_shards(imgs, "image_id", samples_per_shard=256)
        return shard_manifest(
            sharded, "image_id", bytes_col="cap_bytes"
        ).orderBy("shard_id")

    q["webdataset_manifest"] = webdataset_manifest

    def dedup_incremental_clusters(spark, sf):
        """Incremental connected components (operators/dedup.py
        incremental_components): day-2 pairs fold into day-1 labels via
        the label-star + new-edges closure — work O(labeled nodes + new
        pairs), NOT O(pair history); oracle recomputes the closure over
        ALL pairs, so hash-equality IS the incremental-equals-from-
        scratch invariant."""
        from cex_crawler_spark.operators.dedup import (
            connected_components,
            incremental_components,
        )

        i = F.col("id")
        batch1 = spark.range(800).select(
            ((i % 100) * 10 + (F.floor(i / 100) % 10)).alias("id_a"),
            (
                (i % 100) * 10
                + (F.floor(i / 100) + 1 + (i % 100) % 3) % 10
            ).alias("id_b"),
        )
        j = F.col("id")
        batch2 = spark.range(80).select(
            F.when(j < 60, j * 10).otherwise(1000 + j).alias("id_a"),
            F.when(j < 60, (j + 40) * 10).otherwise(1100 + j).alias("id_b"),
        )
        labels1 = connected_components(batch1)
        return incremental_components(labels1, batch2).orderBy("id")

    q["dedup_incremental_clusters"] = dedup_incremental_clusters

    def source_overlap_matrix(spark, sf):
        """Cross-source syndication matrix: winnowing fingerprints
        (operators/dedup.py) keyed by SOURCE instead of doc, then the
        mirror containment operator verbatim (operators/mirrors.py —
        one operator, two applications: hosts×digests and
        sources×fingerprints) — which sources republish each other's
        content, the input a corpus-mixing plan needs before weighting
        sources independently."""
        from cex_crawler_spark.operators.dedup import winnow_fingerprints
        from cex_crawler_spark.operators.mirrors import mirror_host_pairs

        d = _t(spark, sf, "documents")
        fps = (
            winnow_fingerprints(d, "text", "doc_id")
            .withColumnRenamed("id", "doc_id")
            .join(d.select("doc_id", "source"), "doc_id")
        )
        return (
            mirror_host_pairs(
                fps, host_col="source", digest_col="fp",
                min_shared=5, min_containment_pct=50,
                max_hosts_per_digest=10,
            )
            .withColumnRenamed("host_a", "source_a")
            .withColumnRenamed("host_b", "source_b")
            .withColumnRenamed("is_mirror", "syndication_suspect")
            .orderBy("source_a", "source_b")
        )

    q["source_overlap_matrix"] = source_overlap_matrix

    def frontier_admission(spark, sf):
        """Bounded-frontier admission control (operators/politeness.py
        admit_frontier): per-host cap then global cap over host-cap
        survivors, both via chunked ranks (no global window); rejects
        annotated with the binding cap, never dropped."""
        from cex_crawler_spark.operators.politeness import admit_frontier

        sid = F.col("id")
        frontier = spark.range(2000).select(
            sid.alias("okey"), F.format_string("h%d", sid % 8).alias("host")
        )
        return (
            admit_frontier(frontier, host_cap=200, global_cap=1200)
            .select("okey", "host", "host_rank", "admitted", "reject_reason")
            .orderBy("okey")
        )

    q["frontier_admission"] = frontier_admission

    def image_aug_manifest(spark, sf):
        """Deterministic augmentation manifest (operators/multimodal.py
        augmentation_manifest): per-(image, epoch) flip/rotation/crop/
        brightness parameters derived from md5(seed:epoch:id) — the
        reproducibility contract that lets a training run resume or be
        audited with augmentations held fixed; scan-side epoch explode,
        integers only, no RNG state anywhere."""
        from cex_crawler_spark.operators.multimodal import (
            augmentation_manifest,
        )

        imgs = gen_sim_images(spark)
        return augmentation_manifest(imgs, n_epochs=3).orderBy(
            "image_id", "epoch"
        )

    q["image_aug_manifest"] = image_aug_manifest

    def crawl_health_windows(spark, sf):
        """Windowed host-health rollup (streaming/health.py — batch form
        of the shared builder): per (window, host) attempt/error counts,
        integer mean latency, and the clamped adaptive delay (mean-based
        — the mergeable streaming variant of the batch p95 tier);
        stream==batch equality is pinned by the suite."""
        from cex_crawler_spark.streaming.health import host_health_windows

        sid = F.col("id")
        k = sid % 6
        attempts = spark.range(3000).select(
            F.format_string("h%d", k).alias("host"),
            F.to_timestamp(F.from_unixtime(F.lit(1756400000) + sid * 7)).alias(
                "ts"
            ),
            (
                50
                + (sid * 48271) % 400
                + F.when(k == 3, 2500).otherwise(0)
            ).cast("long").alias("latency_ms"),
            (~((k == 5) & (sid % 3 == 0))).alias("ok"),
        )
        return host_health_windows(attempts, "10 minutes").orderBy(
            "window_start", "host"
        )

    q["crawl_health_windows"] = crawl_health_windows

    def frontier_url_hygiene(spark, sf):
        """Structural URL hygiene gate (operators/traps.py
        url_hygiene_screen): scheme/userinfo/length/depth/params checks
        as scan-side expressions, reasons '+'-joined alphabetically —
        the pre-admission screen that costs nothing and drops the
        crawler-hostile tail before politeness budget is spent."""
        from cex_crawler_spark.operators.traps import url_hygiene_screen

        sid = F.col("id")
        k = sid % 6
        url = (
            F.when(k == 0, F.format_string("https://ok.com/a/%d", sid))
            .when(k == 1, F.format_string("mailto:user%d@x.com", sid))
            .when(k == 2, F.format_string("https://u%d@evil.com/p", sid))
            .when(
                k == 3,
                F.concat(
                    F.lit("https://deep.com"),
                    F.repeat(F.lit("/s"), 30),
                    sid.cast("string"),
                ),
            )
            .when(
                k == 4,
                F.concat(
                    F.lit("https://long.com/p?x="),
                    F.repeat(F.lit("a"), 2100),
                    sid.cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("https://params.com/p?"),
                    F.lit("&".join(f"k{i}=1" for i in range(20))),
                    F.lit("&z="),
                    sid.cast("string"),
                )
            )
        )
        frontier = spark.range(600).select(url.alias("url"))
        return (
            url_hygiene_screen(frontier)
            .select("url", "reasons", "blocked")
            .orderBy("url")
        )

    q["frontier_url_hygiene"] = frontier_url_hygiene

    def crawl_round_report(spark, sf):
        """Scheduler-tier capstone: admission caps (bounded frontier) →
        bandwidth-budget prefix take → dispatch timeline, rolled up to
        the per-host round report (frontier mass in, admitted, taken,
        bytes, politeness-bound finish time) — every stage a chunked
        rank or cumsum, no global window over data anywhere."""
        from cex_crawler_spark.operators.allocation import take_byte_budget
        from cex_crawler_spark.operators.politeness import (
            admit_frontier,
            dispatch_timeline,
        )

        sid = F.col("id")
        frontier = spark.range(3000).select(
            F.format_string("h%d", sid % 6).alias("host"),
            (
                ((sid * 2654435761) % 3) * 100000 + sid
            ).alias("okey"),
            (400 + (sid * 48271) % 4000).alias("est_bytes"),
        )
        admitted = admit_frontier(
            frontier, host_cap=300, global_cap=1500
        ).filter("admitted")
        taken = take_byte_budget(
            admitted, "okey", "est_bytes", budget=2_000_000, chunk_width=256
        ).filter("taken")
        policy = spark.range(6).select(
            F.format_string("h%d", F.col("id")).alias("host"),
            ((F.col("id") + 1) * 100).alias("min_delay_ms"),
        )
        tl = dispatch_timeline(taken, policy, order_col="okey")
        n_front = frontier.groupBy("host").agg(
            F.count("*").alias("n_frontier")
        )
        n_adm = admitted.groupBy("host").agg(F.count("*").alias("n_admitted"))
        rep = tl.groupBy("host").agg(
            F.count("*").alias("n_taken"),
            F.sum("est_bytes").alias("bytes_taken"),
            F.max("dispatch_ms").alias("host_finish_ms"),
        )
        return (
            n_front.join(n_adm, "host", "left")
            .join(rep, "host", "left")
            .orderBy("host")
        )

    q["crawl_round_report"] = crawl_round_report

    def crawl_fetcher_assignment(spark, sf):
        """Queue→fetcher pinning with per-worker wall bounds (operators/
        politeness.py fetcher_assignment): md5-hash affinity (stateless,
        engine-replayable), service vs politeness lower bounds per
        worker — the imbalance signal that sizes the fetcher fleet."""
        from cex_crawler_spark.operators.politeness import fetcher_assignment

        sid = F.col("id")
        queues = spark.range(200).select(
            F.format_string("q%03d", sid).alias("queue_key"),
            (5 + (sid * 48271) % 120).alias("n_urls"),
            ((5 + (sid * 48271) % 120) * (100 + (sid % 7) * 50)).alias(
                "host_finish_ms"
            ),
        )
        return fetcher_assignment(queues, n_workers=8).orderBy("worker")

    q["crawl_fetcher_assignment"] = crawl_fetcher_assignment

    def image_drift_screen(spark, sf):
        """Image-distribution drift screen (operators/multimodal.py
        image_distribution_drift): current round vs standing corpus over
        (format × resolution-tier) buckets, integer-permille shares and
        per-bucket |Δ| — the ingest-time dataset-shift monitor; two
        map-combinable histograms + broadcast totals + a tiny bucket
        join."""
        from cex_crawler_spark.operators.multimodal import (
            image_distribution_drift,
        )

        ref = gen_sim_images(spark)
        # a biased "current round": jpeg-heavy, small-image-heavy subset
        cur = ref.withColumn(
            "__sid", F.substring("image_id", 4, 10).cast("long")
        ).filter(
            ((F.col("__sid") * 7) % 10 < 3)
            | ((F.col("fmt") == "jpeg") & (F.col("w") <= 320))
        ).drop("__sid")
        return image_distribution_drift(ref, cur).orderBy("fmt", "res_tier")

    q["image_drift_screen"] = image_drift_screen

    def corpus_mix_anneal(spark, sf):
        """Annealed mixing schedule (operators/allocation.py
        anneal_mix_schedule): epoch e samples at alphas[e] — flat early
        (every source heard), natural late; one temperature_mix per
        epoch, each independently largest-remainder-exact."""
        from cex_crawler_spark.operators.allocation import (
            anneal_mix_schedule,
        )

        return (
            anneal_mix_schedule(
                _thinned_documents(spark, sf), "source", total=200,
                alphas=[0.5, 0.7, 1.0],
            )
            .select(
                "epoch", "source", "n_docs", "weight", "target",
                "target_capped",
            )
            .orderBy("epoch", "source")
        )

    q["corpus_mix_anneal"] = corpus_mix_anneal

    def sitemap_priority_seed(spark, sf):
        """Sitemap <priority> → scheduler ladder (sources/sitemap.py
        parse_sitemaps_with_priority): the site's own crawl-order hint
        on the same 0/1/2 ladder as staleness and aging; decimal parses
        onto a permille grid, missing tag = the spec default 500,
        per-block isolation as for loc/lastmod."""
        from cex_crawler_spark.sources.sitemap import (
            parse_sitemaps_with_priority,
        )

        sid = F.col("id")
        # 4 entries per host body: 1.0, 0.2, missing (→500), 0.55
        xml = F.format_string(
            "<urlset>"
            "<url><loc>https://h%d/a/%d</loc><priority>1.0</priority>"
            "<lastmod>2025-06-01</lastmod></url>"
            "<url><loc>https://h%d/b/%d</loc><priority>0.2</priority></url>"
            "<url><loc>https://h%d/c/%d</loc></url>"
            "<url><priority>0.9</priority></url>"
            "<url><loc>https://h%d/d/%d</loc><priority>0.55</priority></url>"
            "</urlset>",
            sid, sid, sid, sid, sid, sid, sid, sid,
        )
        maps = spark.range(200).select(
            F.format_string("h%d", sid).alias("host"), xml.alias("xml")
        )
        return parse_sitemaps_with_priority(maps).orderBy("host", "url")

    q["sitemap_priority_seed"] = sitemap_priority_seed

    def image_caption_alignment(spark, sf):
        """CLIP-score-style pairing gate (operators/multimodal.py
        caption_alignment_gate): cosine between an image's embedding
        and ITS OWN caption's, thresholded on a permille grid — the
        LAION primary filter's plumbing with integer fixture vectors
        (every intermediate sum exact in doubles → the cosine is
        bit-identical across engines by construction)."""
        from cex_crawler_spark.operators.multimodal import (
            caption_alignment_gate,
        )

        sid = F.col("id")
        img = F.array(
            *[
                (((sid * (j + 1) * 48271) % 9) - 4).cast("double")
                for j in range(8)
            ]
        )
        txt_matched = F.array(
            *[
                (
                    ((sid * (j + 1) * 48271) % 9)
                    - 4
                    + (1 if j == 7 else 0)
                ).cast("double")
                for j in range(8)
            ]
        )
        txt_mismatch = F.array(
            *[
                (((sid * (j + 1) * 69069 + 5) % 9) - 4).cast("double")
                for j in range(8)
            ]
        )
        pairs = spark.range(3000).select(
            F.format_string("img%06d", sid).alias("image_id"),
            img.alias("img_embedding"),
            F.when(sid % 3 != 0, txt_matched)
            .otherwise(txt_mismatch)
            .alias("txt_embedding"),
        )
        return (
            caption_alignment_gate(pairs)
            .select("image_id", "align_permille", "aligned")
            .orderBy("image_id")
        )

    q["image_caption_alignment"] = image_caption_alignment

    def crawl_budget_by_pagerank(spark, sf):
        """Link mass decides host budgets (Cho et al. WWW'98 made the
        case; this is the composition): 3-iteration PageRank → per-node
        INTEGER micro-ranks (round(rank·1e6) — grid-snap BEFORE the
        host sum so float summation order can never flip a weight) →
        host mass → the all-integer largest-remainder apportionment;
        linkgraph tier meets allocation tier in one plan."""
        from cex_crawler_spark.operators.allocation import allocate_budget
        from cex_crawler_spark.operators.linkgraph import pagerank

        e = gen_sim_linkgraph(spark)
        r = pagerank(e, n_iter=3, damping=0.85)
        mass = (
            r.withColumn("host", F.format_string("h%02d", F.col("id") % 20))
            .withColumn(
                "__irank", F.round(F.col("rank") * 1000000).cast("long")
            )
            .groupBy("host")
            .agg(F.sum("__irank").alias("weight"))
        )
        return (
            allocate_budget(mass, "host", "weight", total=1000)
            .select("host", "weight", "budget")
            .orderBy("host")
        )

    q["crawl_budget_by_pagerank"] = crawl_budget_by_pagerank

    def frontier_outlink_screen(spark, sf):
        """Link-farm screen on the discovery feed (operators/traps.py
        outlink_screen): per-source outlink and distinct-target counts —
        500 links to 3 targets is nav chrome, 500 to 500 is the farm;
        one map-combinable aggregate on src."""
        from cex_crawler_spark.operators.traps import outlink_screen

        sid = F.col("id")
        k = sid % 4
        i = F.floor(sid / 4)
        # p0/p1: normal pages (30 links, distinct); p2: nav chrome (300
        # links, 5 targets); p3: farm (300 links, 300 targets)
        links = (
            spark.range(4 * 300)
            .select(
                F.format_string("p%d", k).alias("src"),
                F.when(k < 2, F.format_string("t%d-%d", k, i % 30))
                .when(k == 2, F.format_string("nav%d", i % 5))
                .otherwise(F.format_string("farm%d", i))
                .alias("dst"),
                k.alias("__k"),
                i.alias("__i"),
            )
            .filter((F.col("__k") >= 2) | (F.col("__i") < 30))
            .drop("__k", "__i")
        )
        return outlink_screen(links, max_outlinks=200).orderBy("src")

    q["frontier_outlink_screen"] = frontier_outlink_screen

    def domain_rollup(spark, sf):
        """Registrable-domain (eTLD+1) rollup of the frontier
        (functions/urlnorm.py registrable_domain): the per-SITE grouping
        key politeness and trap screens should really bucket by — pure
        Catalyst label arithmetic against a public-suffix list."""
        from cex_crawler_spark.functions.urlnorm import registrable_domain

        f = gen_sim_trap_frontier(spark)
        return (
            f.select(registrable_domain(F.col("host")).alias("domain"), "host")
            .groupBy("domain")
            .agg(
                F.countDistinct("host").alias("n_hosts"),
                F.count("*").alias("n_urls"),
            )
            .orderBy("domain")
        )

    q["domain_rollup"] = domain_rollup

    def image_dedup_clusters(spark, sf):
        """Image near-dup CLUSTERS — the image-payload twin of
        corpus_curation_neardup: pigeonhole Hamming pairs over phash →
        path-halving connected components → one representative (min
        image_id) + cluster size per component.  Every stage is the
        audited scale path (bucketed candidates, O(log diameter) CC)."""
        from cex_crawler_spark.operators.dedup import (
            connected_components,
            hamming_near_dup_candidates,
        )

        imgs = gen_sim_images(spark)
        pairs = hamming_near_dup_candidates(imgs, "phash", "image_id").filter(
            F.col("hamming") <= 3
        )
        comp = connected_components(pairs)
        return (
            comp.groupBy("component")
            .agg(F.count("*").alias("n_members"))
            .select(F.col("component").alias("representative"), "n_members")
            .orderBy("representative")
        )

    q["image_dedup_clusters"] = image_dedup_clusters

    def image_quality_gates(spark, sf):
        """LAION-style metadata gates (operators/multimodal
        .image_quality_gates): min short side, aspect ceiling, format
        allowlist, caption token window (CLIP's 77-token budget) —
        pure scan-side Catalyst, zero shuffles, drop REASONS logged
        per row.  Caption window tightened to [3, 8] so both caption
        gates fire on the fixture's 2-13-token captions."""
        from cex_crawler_spark.operators.multimodal import (
            image_quality_gates as gates,
        )

        imgs = gen_sim_images(spark)
        out = gates(imgs, min_caption_tokens=3, max_caption_tokens=8)
        return out.select(
            "image_id", "w", "h", "fmt", "n_caption_tokens", "keep",
            F.array_join("reasons", ",").alias("reasons"),
        ).orderBy("image_id")

    q["image_quality_gates"] = image_quality_gates

    def image_caption_dedup(spark, sf):
        """Caption-keyed dedup + alt-text-spam screen (operators/
        multimodal.caption_screen): one canonical image per normalized
        caption, captions on ≥8 distinct images dropped as boiler
        alt-text.  Fixture plants 'Stock  Photo image' (double space +
        case — exercises normalization) on every 5th image and 97
        small repeat-caption groups on every 7th≡3; group key is
        xxhash64 of the normalized caption, canonical = min(struct),
        one narrow shuffle (the dedup_exact shape)."""
        from cex_crawler_spark.operators.multimodal import caption_screen

        imgs = gen_sim_images(spark)
        sid = F.substring("image_id", 4, 10).cast("long")
        planted = imgs.withColumn(
            "caption",
            F.when(sid % 5 == 0, F.lit("Stock  Photo image"))
            .when(sid % 7 == 3, F.format_string("repeat cap %d", sid % 97))
            .otherwise(F.col("caption")),
        )
        return (
            caption_screen(planted, spam_min_images=8)
            .select(
                "image_id", "w", "h", "fmt", "caption",
                "n_caption_images", "caption_deduped",
            )
            .orderBy("image_id")
        )

    q["image_caption_dedup"] = image_caption_dedup

    def webdataset_shards(spark, sf):
        """Deterministic-shuffle shard export assignment (operators/
        packing.assign_shards): every image+caption sample placed in a
        fixed-count WebDataset-style shard under a reproducible
        md5(seed:id) global order — chunked row_number decomposition
        (local rank in 4096 hash-prefix chunks + broadcast count
        offsets), never a single-task global sort."""
        from cex_crawler_spark.operators.packing import assign_shards

        imgs = gen_sim_images(spark)
        return (
            assign_shards(imgs, "image_id", samples_per_shard=250)
            .select("image_id", "caption", "shard_id", "idx_in_shard")
            .orderBy("shard_id", "idx_in_shard")
        )

    q["webdataset_shards"] = webdataset_shards

    def host_quality_steering(spark, sf):
        """Content-quality crawl steering (operators/politeness
        .quality_verdicts): per-host rollup of fetched-page quality →
        demote verdict for the scheduler's priority column — the
        CONTENT loop beside the structural trap screen and the health
        loop (adaptive delay).  Mean quality sums exact micro-quality
        integers (no float-order dependence); fixture plants junk text
        on 2/3 of src3+src7's docs so both verdict branches fire."""
        from cex_crawler_spark.functions.text import quality_score
        from cex_crawler_spark.operators.politeness import quality_verdicts

        d = _t(spark, sf, "documents")
        junk = F.col("source").isin("src3", "src7") & (
            F.col("doc_id").cast("long") % 3 != 0
        )
        planted = d.withColumn(
            "text",
            F.when(junk, F.lit("!!! ??? ### %% ^^")).otherwise(F.col("text")),
        )
        scored = planted.select(
            F.col("source").alias("host"),
            quality_score(F.col("text")).alias("quality"),
        )
        return quality_verdicts(scored).orderBy("host")

    q["host_quality_steering"] = host_quality_steering

    def ip_politeness_groups(spark, sf):
        """IP-level politeness queues (operators/politeness
        .ip_queue_policy): virtual hosts behind one IP share ONE
        queue — group budget = MIN member budget, group delay = MAX;
        unresolved hosts stay singletons.  Fixture: 60 hosts, the even
        residues mod 4 collapse onto 10 shared IPs, every 9th host has
        no DNS answer (NULL ip)."""
        from cex_crawler_spark.operators.politeness import ip_queue_policy

        sid = F.col("id")
        policy = spark.range(60).select(
            F.format_string("h%02d", sid.cast("int")).alias("host"),
            (2 + sid % 5).cast("int").alias("budget_per_round"),
            (100 * (1 + sid % 7)).cast("long").alias("min_delay_ms"),
        )
        ips = spark.range(60).select(
            F.format_string("h%02d", sid.cast("int")).alias("host"),
            F.when(
                sid % 9 == 0, F.lit(None).cast("string")
            ).when(
                sid % 4 < 2, F.format_string("10.0.0.%d", (sid % 10).cast("int"))
            ).otherwise(
                F.format_string("10.1.%d.%d", (sid / 7).cast("int"),
                                (sid % 7).cast("int"))
            ).alias("ip"),
        )
        return (
            ip_queue_policy(policy, ips)
            .select(
                "host", "queue_key", "n_hosts_on_queue",
                "queue_budget_per_round", "queue_min_delay_ms",
            )
            .orderBy("host")
        )

    q["ip_politeness_groups"] = ip_politeness_groups

    def _thinned_documents(spark, sf):
        # unequal source sizes (factor ~7) so temperature flattening and
        # the no-replacement cap BOTH have something to do: keep docs
        # where doc_id % (1 + source_idx % 7) == 0
        # rank within source (doc_id div 20 — sources are the mod-20
        # residue classes, so the raw id is CONSTANT mod 20 per source
        # and thinning on it would empty half the sources)
        d = _t(spark, sf, "documents")
        k = F.substring("source", 4, 6).cast("long")
        seq = F.expr("CAST(doc_id AS BIGINT) div 20")
        return d.filter(seq % (1 + k % 7) == 0)

    def corpus_temperature_mix(spark, sf):
        """Temperature (α-)sampling targets per source (operators/
        allocation.temperature_mix): share ∝ n^0.7 — the XLM-R mixing
        rule that keeps a dominant source from drowning the tail;
        weights round onto a 1e-6 grid, then the SAME all-integer
        largest-remainder apportionment as the crawl budget;
        target_capped = min(target, n) is the no-replacement bound."""
        from cex_crawler_spark.operators.allocation import temperature_mix

        return temperature_mix(
            _thinned_documents(spark, sf), "source", alpha=0.7, total=200
        ).orderBy("source")

    q["corpus_temperature_mix"] = corpus_temperature_mix

    def corpus_temperature_sample(spark, sf):
        """Materialized temperature sample (operators/allocation
        .take_stratified): first target_capped docs per source under
        the deterministic md5(seed:id) order — unbiased, reproducible,
        targets broadcast onto the corpus scan."""
        from cex_crawler_spark.operators.allocation import (
            take_stratified,
            temperature_mix,
        )

        d = _thinned_documents(spark, sf)
        t = temperature_mix(d, "source", alpha=0.7, total=200)
        return (
            take_stratified(d, t, "source", "doc_id")
            .select("doc_id", "source")
            .orderBy("source", "doc_id")
        )

    q["corpus_temperature_sample"] = corpus_temperature_sample

    def frontier_blocklist_screen(spark, sf):
        """Safety-domain blocklist gate (operators/traps
        .blocklist_screen): hard pre-politeness drop keyed on the
        REGISTRABLE domain, so blocking example.co.uk covers
        news.example.co.uk — one scan-side broadcast map join over the
        trap-frontier fixture's varied public suffixes."""
        from cex_crawler_spark.operators.traps import blocklist_screen

        frontier = gen_sim_trap_frontier(spark)
        bl = spark.createDataFrame(
            [("example.co.uk", "unsafe_content"), ("baz.net", "takedown"),
             ("unused.org", "malware")],
            ["domain", "reason"],
        )
        return (
            blocklist_screen(frontier, bl)
            .groupBy("site", "blocked", "block_reason")
            .agg(F.count("*").alias("n_urls"))
            .orderBy("site")
        )

    q["frontier_blocklist_screen"] = frontier_blocklist_screen

    def robots_cache_staleness(spark, sf):
        """Robots-cache TTL screen (functions/robots.robots_refetch_due,
        RFC 9309 §2.4): successes age out at 24 h, failed fetches
        retry hourly; explicit `now` watermark, dim-sized scan-side
        arithmetic.  Fixture spreads fetch ages 0-36 h with every 5th
        fetch failed."""
        from cex_crawler_spark.functions.robots import robots_refetch_due

        sid = F.col("id")
        base = F.unix_timestamp(F.lit("2025-09-01 12:00:00"))
        meta = spark.range(120).select(
            F.format_string("h%03d", sid.cast("int")).alias("host"),
            F.timestamp_seconds(base - (sid * 1080)).alias("fetched_at"),
            (sid % 5 != 0).alias("fetch_ok"),
        )
        return robots_refetch_due(meta, "2025-09-01 12:00:00").orderBy("host")

    q["robots_cache_staleness"] = robots_cache_staleness

    def ivf_codebook_refine(spark, sf):
        """Distributed integer-lattice Lloyd iterations (operators/
        similarity.kmeans_lattice): full-corpus IVF/PQ codebook
        refinement — assignment is one scan-side min-struct expression
        over broadcast-literal centroids, update one map-combinable
        (cell, dim) shuffle of k·d groups; integer centroids make the
        whole recurrence exact in doubles, hence SQL-replayable.
        Fixture: 600 4-dim vectors in 8 planted integer clusters,
        init = the first 8 vectors."""
        from cex_crawler_spark.operators.similarity import kmeans_lattice

        dim = 4
        vecs = spark.range(KMEANS_N).select(
            F.col("id").alias("vec_id"),
            F.array(*[
                (
                    100 * (((F.col("id") % 8) * 7 + d) % 8)
                    + (F.col("id") * 48271 + d * 31) % 11
                ).cast("long")
                for d in range(dim)
            ]).alias("vec"),
        )
        init = [
            [100 * (((s % 8) * 7 + d) % 8) + (s * 48271 + d * 31) % 11
             for d in range(dim)]
            for s in range(8)
        ]
        assigned, cents = kmeans_lattice(vecs, init, iters=3)
        cent_rows = [
            (c, d, int(v)) for c, row in enumerate(cents)
            for d, v in enumerate(row)
        ]
        cdf = spark.createDataFrame(cent_rows, "cell int, dim int, value long")
        counts = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
        return (
            cdf.join(counts, "cell", "left")
            .select(
                F.col("cell").cast("long").alias("cell"),
                F.coalesce("n_members", F.lit(0)).alias("n_members"),
                F.col("dim").cast("long").alias("dim"),
                "value",
            )
            .orderBy("cell", "dim")
        )

    q["ivf_codebook_refine"] = ivf_codebook_refine

    def image_export_pipeline(spark, sf):
        """CAPSTONE — crawled payloads to trainer shards in ONE
        declarative plan: LAION metadata gates → caption spam/dedup
        screen → pigeonhole phash near-dup pairs → path-halving CC →
        one representative per cluster → deterministic WebDataset
        shard assignment.  Every stage the audited scale path
        (scan-side gates, one caption-hash shuffle, bucketed pairs,
        O(log d) CC, chunked shard rank)."""
        from cex_crawler_spark.operators.dedup import (
            connected_components,
            hamming_near_dup_candidates,
        )
        from cex_crawler_spark.operators.multimodal import (
            caption_screen,
            image_quality_gates as gates,
        )
        from cex_crawler_spark.operators.packing import assign_shards

        imgs = gen_sim_images(spark)
        sid = F.substring("image_id", 4, 10).cast("long")
        planted = imgs.withColumn(
            "caption",
            F.when(sid % 5 == 0, F.lit("Stock  Photo image"))
            .when(sid % 7 == 3, F.format_string("repeat cap %d", sid % 97))
            .otherwise(F.col("caption")),
        )
        kept = planted.join(
            gates(planted).filter("keep").select("image_id"), "image_id"
        )
        screened = caption_screen(kept, spam_min_images=8)
        pairs = hamming_near_dup_candidates(
            screened, "phash", "image_id"
        ).filter(F.col("hamming") <= 3)
        drop = (
            connected_components(pairs)
            .filter(F.col("id") != F.col("component"))
            .select(F.col("id").alias("image_id"))
        )
        survivors = screened.join(drop, "image_id", "left_anti")
        return (
            assign_shards(survivors, "image_id", samples_per_shard=100)
            .select("image_id", "caption", "shard_id", "idx_in_shard")
            .orderBy("shard_id", "idx_in_shard")
        )

    q["image_export_pipeline"] = image_export_pipeline

    def link_graph_pagerank(spark, sf):
        """Fixed-iteration PageRank with dangling-mass redistribution
        (operators/linkgraph.py) — the principled frontier-priority
        signal (Cho et al., WWW'98).  One dst-keyed shuffle per
        iteration, map-combinable contribution sums, localCheckpointed
        lineage; oracled by unrolling the same recurrence in SQL."""
        from cex_crawler_spark.operators.linkgraph import pagerank

        e = gen_sim_linkgraph(spark)
        r = pagerank(e, n_iter=5, damping=0.85)
        return r.select("id", F.round("rank", 6).alias("rank")).orderBy("id")

    q["link_graph_pagerank"] = link_graph_pagerank

    def link_graph_opic(spark, sf):
        """Synchronous integer-cash OPIC (operators/linkgraph.opic —
        Abiteboul WWW'03): the on-line importance signal a frontier
        scheduler can accrue WHILE crawling, no full-graph restart
        when pages appear.  Micro-cash shares = cash div out, residues
        + dangling cash pool uniformly with exact carry — every value
        64-bit integer, so the oracle unrolls the recurrence with zero
        tolerance (no float mirroring at all, unlike pagerank)."""
        from cex_crawler_spark.operators.linkgraph import opic

        s = opic(gen_sim_opicgraph(spark), n_rounds=6, init_cash=1_000_000)
        total = s.agg(F.sum("history").alias("t"))
        return (
            s.crossJoin(F.broadcast(total))
            .select(
                "id",
                "cash",
                "history",
                F.expr("(1000000 * history) div t").alias("imp_ppm"),
            )
            .orderBy("id")
        )

    q["link_graph_opic"] = link_graph_opic

    def link_graph_opic_extend(spark, sf):
        """The ON-LINE property itself (linkgraph.opic with
        init_state/init_pool): 3 cash rounds on the sim graph, then
        the graph GROWS (50 new pages linked both ways) and 3 more
        rounds continue from the carried state — known nodes keep
        cash+history, new nodes enter at init_cash, the pool carry
        survives, conservation holds at N'·c0.  Batch PageRank
        restarts from scratch here; OPIC just keeps accumulating —
        the reason a crawler can rank WHILE the frontier grows.
        Lossless-resume (2+2 == 4 rounds) is unit-tested; the oracle
        unrolls BOTH phases as one integer CTE chain."""
        from cex_crawler_spark.operators.linkgraph import opic

        g1 = gen_sim_opicgraph(spark)
        s1, pool1 = opic(g1, n_rounds=3, init_cash=1_000_000, with_pool=True)
        i = F.col("id")
        extra = spark.range(600).select(
            F.when(i % 2 == 0, 1000 + i % 50).otherwise((i * 13) % 500).alias("src"),
            F.when(i % 2 == 0, (i * 7) % 600).otherwise(1000 + i % 50).alias("dst"),
        )
        s2 = opic(
            g1.unionByName(extra),
            n_rounds=3,
            init_cash=1_000_000,
            init_state=s1,
            init_pool=pool1,
        )
        total = s2.agg(F.sum("history").alias("t"))
        return (
            s2.crossJoin(F.broadcast(total))
            .select(
                "id", "cash", "history",
                F.expr("(1000000 * history) div t").alias("imp_ppm"),
            )
            .orderBy("id")
        )

    q["link_graph_opic_extend"] = link_graph_opic_extend

    def pagination_series_map(spark, sf):
        """rel=next pagination reconstruction (linkgraph.
        pagination_hints + paginate_series): the frontier treats
        /s7/p0..p6 as ONE logical document — series id, 1-based
        position and length for every page, declared-next cycles
        surfaced as data.  The resolver is the redirect pointer-jumper
        with distance accumulation (one functional-graph operator, two
        protocols).  Fixture: 120 series of length 3-7 with attribute
        order flipped on odd series, root-relative hrefs on k%3==0,
        a stylesheet-link decoy on every last page, plus a planted
        3-page rel=next cycle."""
        from cex_crawler_spark.operators.linkgraph import (
            paginate_series, pagination_hints,
        )

        k, j = F.col("k"), F.col("j")
        ser = spark.range(120).select(
            F.col("id").alias("k"),
            F.explode(F.sequence(F.lit(0), F.lit(2) + F.col("id") % 5)).alias("j"),
        )
        href = F.when(
            k % 3 == 0, F.format_string("/s%d/p%d", k, j + 1)
        ).otherwise(
            F.format_string("https://site%d.example.com/s%d/p%d", k % 7, k, j + 1)
        )
        html = F.when(
            j < 2 + k % 5,
            F.when(
                k % 2 == 0,
                F.concat(F.lit('<link rel="next" href="'), href, F.lit('"><p>body</p>')),
            ).otherwise(
                F.concat(F.lit('<link href="'), href, F.lit('" rel="next"><p>body</p>')),
            ),
        ).otherwise(F.lit('<p>last page</p><link rel="stylesheet" href="/x.css">'))
        chain = ser.select(
            F.format_string("https://site%d.example.com/s%d/p%d", k % 7, k, j).alias("url"),
            html.alias("html"),
        )
        cyc = spark.range(3).select(
            F.format_string("https://loop.example.com/c%d", F.col("id")).alias("url"),
            F.format_string(
                '<link rel="next" href="/c%d">', (F.col("id") + 1) % 3
            ).alias("html"),
        )
        pages = chain.unionByName(cyc)
        edges = (
            pagination_hints(pages)
            .filter(F.col("next_target").isNotNull())
            .select(F.col("url").alias("src"), F.col("next_target").alias("dst"))
        )
        return paginate_series(edges).orderBy("url")

    q["pagination_series_map"] = pagination_series_map

    def hreflang_alternate_clusters(spark, sf):
        """Translation-cluster reconstruction (linkgraph.
        hreflang_alternates + hreflang_clusters): rel=alternate
        hreflang declarations → connected components — alternates are
        the same logical content in different languages, invisible to
        text near-dup yet exactly what a language-balanced corpus must
        group (one member per language, x-default as the credited
        canonical).  The parse matches whole rel=alternate tags and
        pulls hreflang/href independently, so ANY attribute order
        works.  Fixture: 80 clusters of 1-4 languages where every
        declaring member lists ALL members; member 0 of every 5th
        cluster declares NOTHING (joins via others — the partial-graph
        case), every 7th-cluster-less-3 omits x-default (NULL
        default)."""
        from cex_crawler_spark.operators.linkgraph import (
            hreflang_alternates, hreflang_clusters,
        )

        g = F.col("g")
        mem = spark.range(80).select(
            F.col("id").alias("g"),
            F.explode(F.sequence(F.lit(0), F.col("id") % 4)).alias("v"),
        )
        langs = F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("ja"))
        w = F.col("w")
        tags = (
            mem.join(mem.select(F.col("g").alias("g2"), F.col("v").alias("w")),
                     F.col("g") == F.col("g2"))
            .select(
                "g", "v", "w",
                F.format_string(
                    '<link rel="alternate" hreflang="%s" href="https://ex%d.org/l%d/a%d">',
                    F.element_at(langs, (w + 1).cast("int")), g % 9, w, g,
                ).alias("tag"),
            )
        )
        htmls = tags.groupBy("g", "v").agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("w", "tag"))),
                    lambda s: s["tag"],
                ),
                "",
            ).alias("base")
        )
        xdef = F.when(
            g % 7 != 3,
            F.format_string(
                '<link href="https://ex%d.org/l0/a%d" hreflang="x-default" rel="alternate">',
                g % 9, g,
            ),
        ).otherwise(F.lit(""))
        pages = htmls.select(
            F.format_string("https://ex%d.org/l%d/a%d", g % 9, F.col("v"), g).alias("url"),
            F.when(
                (F.col("v") == 0) & (g % 5 == 0), F.lit("<p>no tags</p>")
            ).otherwise(F.concat(F.col("base"), xdef)).alias("html"),
        )
        return hreflang_clusters(hreflang_alternates(pages)).orderBy("url")

    q["hreflang_alternate_clusters"] = hreflang_alternate_clusters

    def linkgraph_gap_compression(spark, sf):
        """Delta-gap adjacency encoding (linkgraph.compress_adjacency
        — the WebGraph idea, Boldi & Vigna WWW'04): per-src sorted
        targets as first id + gaps; gap_bits audits the locality win
        (Σ length(bin(gap)) — integer-exact, no log) against 64-bit
        raw storage.  One bounded collect_list shuffle; gap math and
        the decode (tested roundtrip) are scan-side array folds.
        Gaps publish as a '+'-joined string (arrays are hash-hostile
        in the driver compare)."""
        from cex_crawler_spark.operators.linkgraph import compress_adjacency

        adj = compress_adjacency(gen_sim_opicgraph(spark))
        return adj.select(
            "src",
            "n_out",
            "first_dst",
            F.array_join("gaps", "+").alias("gaps_str"),
            "gap_bits",
            "raw_bits",
        ).orderBy("src")

    q["linkgraph_gap_compression"] = linkgraph_gap_compression

    def crawl_fetcher_ring_rebalance(spark, sf):
        """Fleet-resize audit under consistent hashing (politeness.
        fetcher_ring_rebalance — Karger et al.): 4 workers → 5 over
        3000 politeness queues.  Mod-W pinning (fetcher_assignment)
        would remap ~4/5 of queues and drop every worker's warm
        connections; the ring strands ~1/5, and NO queue moves between
        survivors.  Ring = broadcast array of md5 worker:replica
        points; successor = scan-side array filter — md5 arithmetic
        replays in any engine."""
        from cex_crawler_spark.operators.politeness import (
            fetcher_ring_rebalance,
        )

        q_ = spark.range(3000).select(
            F.format_string("host%d.example.com", F.col("id")).alias("queue_key")
        )
        return fetcher_ring_rebalance(
            q_, ["w0", "w1", "w2", "w3"], ["w0", "w1", "w2", "w3", "w4"]
        ).orderBy("queue_key")

    q["crawl_fetcher_ring_rebalance"] = crawl_fetcher_ring_rebalance

    def crawl_discovery_saturation(spark, sf):
        """Link-space saturation steering (politeness.
        discovery_saturation): per (host, round), how many distinct
        outlink targets were first seen by the crawl THAT round —
        the Heaps-law stop signal that reads the outlink log alone,
        before any fetch spend (novelty_yield needs digests,
        quality_verdicts needs scored text).  Fixture: even hosts
        re-draw from a 200-URL pool (saturate), odd hosts mint fresh
        URLs every round (never saturate); 5 rounds × 50 links."""
        from cex_crawler_spark.operators.politeness import (
            discovery_saturation,
        )

        i = F.col("id")
        h = (i / 250).cast("long")
        rr = ((i / 50).cast("long") % 5) + 1
        j = i % 50
        log = spark.range(20 * 5 * 50).select(
            F.format_string("h%d", h).alias("host"),
            rr.alias("round"),
            F.when(
                h % 2 == 0,
                F.format_string(
                    "https://pool.example.com/t%d",
                    (h * 977 + rr * 131 + j * 17) % 200,
                ),
            ).otherwise(
                F.format_string("https://h%d.example.com/p%d", h, rr * 1000 + j)
            ).alias("target"),
        )
        return discovery_saturation(log).orderBy("host", "round")

    q["crawl_discovery_saturation"] = crawl_discovery_saturation

    def linkgraph_bowtie(spark, sf):
        """Broder bow-tie decomposition (linkgraph.bowtie_regions,
        WWW'00): core/IN/OUT/disconnected relative to the pivot's SCC
        via two BFS sweeps (graph + transpose) — the macro-structure
        shares that steer crawl policy (drowning in OUT = harvesting
        leaves; fat IN = seeds entered the periphery).  Fixture: a
        40-node chorded ring core, one- and two-hop IN and OUT
        fringes, and tendrils hanging off IN that the pivot can
        neither reach nor be reached from."""
        from cex_crawler_spark.operators.linkgraph import bowtie_regions

        i = F.col("id")
        ring = spark.range(40).select(i.alias("src"), ((i + 1) % 40).alias("dst"))
        chord = spark.range(40).select(i.alias("src"), ((i + 7) % 40).alias("dst"))
        in1 = spark.range(50).select((100 + i).alias("src"), (i % 40).alias("dst"))
        in2 = spark.range(20).select((150 + i).alias("src"), (100 + i).alias("dst"))
        out1 = spark.range(50).select((i % 40).alias("src"), (200 + i).alias("dst"))
        out2 = spark.range(20).select((200 + i).alias("src"), (250 + i).alias("dst"))
        tdr = spark.range(10).select((100 + i).alias("src"), (300 + i).alias("dst"))
        e = ring.unionByName(chord).unionByName(in1).unionByName(in2)
        e = e.unionByName(out1).unionByName(out2).unionByName(tdr)
        return bowtie_regions(e, 0).orderBy("id")

    q["linkgraph_bowtie"] = linkgraph_bowtie

    def frontier_eviction(spark, sf):
        """Hot/cold frontier split (politeness.frontier_eviction_plan):
        entries aged ≥6 rounds at priority ≥1 evict to the cold tier,
        EXCEPT each host's 40 best (priority, id) entries — eviction
        never starves a host.  Chunked per-host rank (no global
        window), row-local age arithmetic, annotate-never-drop."""
        from cex_crawler_spark.operators.politeness import (
            frontier_eviction_plan,
        )

        i = F.col("id")
        fr = spark.range(4000).select(
            i.alias("url_id"),
            F.format_string("h%d", i % 37).alias("host"),
            ((i * 2654435761) % 3).alias("priority"),
            ((i * 48271) % 12).alias("added_round"),
        ).withColumn("okey", F.col("priority") * 10_000_000 + F.col("url_id"))
        return (
            frontier_eviction_plan(
                fr, current_round=12, min_age=6,
                evict_priority_floor=1, keep_per_host=40,
            )
            .select(
                "url_id", "host", "priority", "added_round",
                "age", "protected", "evict", "reason",
            )
            .orderBy("url_id")
        )

    q["frontier_eviction"] = frontier_eviction

    def recrawl_outlink_delta(spark, sf):
        """Outlink-set diff between a hub's two latest fetches
        (recrawl.outlink_delta): ADDED targets are the fresh-content
        seeds a news-index revisit exists to find (rounds before any
        sitemap ping), REMOVED targets demote.  The link-structure
        twin of recrawl_change_magnitude.  Round 2 shifts each doc's
        5-target window by doc_id%3 (0 = stable hub, 1-2 = churn);
        doc_id%4==3 never refetches (first_seen path)."""
        from cex_crawler_spark.operators.recrawl import outlink_delta

        d = _t(spark, sf, "documents").select("doc_id")
        k = F.explode(F.sequence(F.lit(0), F.lit(4)))
        base = d.select("doc_id", k.alias("k"))
        i = F.col("doc_id")
        r1 = base.select(
            F.format_string("u%d", i).alias("url"),
            F.lit(1).alias("round"),
            F.format_string(
                "https://t.example.com/%d", (i * 7 + F.col("k")) % 500
            ).alias("target"),
        )
        r2 = base.filter(i % 4 != 3).select(
            F.format_string("u%d", i).alias("url"),
            F.lit(2).alias("round"),
            F.format_string(
                "https://t.example.com/%d", (i * 7 + F.col("k") + i % 3) % 500
            ).alias("target"),
        )
        return (
            outlink_delta(r1.unionByName(r2))
            .orderBy("url", "change", "target")
        )

    q["recrawl_outlink_delta"] = recrawl_outlink_delta

    def crawl_retry_after_holds(spark, sf):
        """Server-directed backpressure (recrawl.retry_after_holds,
        RFC 9110 §10.2.3): 429/503 Retry-After in BOTH wire forms —
        delta-seconds and HTTP-date (day-name stripped before parse:
        Spark's modern parser rejects EEE) — plus the default hold
        for backpressure without a usable hint; per-host MAX wins.
        The third delay tier beside the configured floor and the
        inferred adaptive delay.  Scan-side parse, one max/count per
        host."""
        from cex_crawler_spark.operators.recrawl import retry_after_holds

        i = F.col("id")
        base = 1_756_684_800_000
        dates = F.array(
            F.lit("Mon, 01 Sep 2025 00:02:00 GMT"),
            F.lit("Mon, 01 Sep 2025 00:10:00 GMT"),
            F.lit("Tue, 02 Sep 2025 12:00:00 GMT"),
            F.lit("Mon, 01 Sep 2025 23:59:59 GMT"),
        )
        m = i % 9
        resp = spark.range(400).select(
            F.format_string("h%d", i % 20).alias("host"),
            F.when(m == 0, 429).when(m.isin(1, 2), 503)
            .when(m == 3, 429).otherwise(200).alias("status"),
            F.when(m == 0, F.format_string("%d", 10 + i % 50))
            .when(m == 1, F.element_at(dates, (i % 4 + 1).cast("int")))
            .when(m == 3, F.lit("soon"))
            .alias("retry_after"),
            (F.lit(base) + i * 1000).alias("fetched_ms"),
        )
        return retry_after_holds(resp).orderBy("host")

    q["crawl_retry_after_holds"] = crawl_retry_after_holds

    def frontier_lifecycle_report(spark, sf):
        """Hot/cold lifecycle capstone: eviction at round 12
        (frontier_eviction_plan — aged low-priority past each host's
        40-best floor) → the evicted rows attempt RE-ADMISSION next
        round through admit_frontier under tight caps (20/host, 300
        global) → per-host flow accounting (frontier in, kept hot,
        evicted, readmitted, still cold).  Demonstrates the
        drop-never-lose discipline end to end: every row is in
        exactly one bucket, n_hot + n_readmitted + n_still_cold ==
        n_frontier."""
        from cex_crawler_spark.operators.politeness import (
            admit_frontier, frontier_eviction_plan,
        )

        i = F.col("id")
        fr = spark.range(4000).select(
            i.alias("url_id"),
            F.format_string("h%d", i % 37).alias("host"),
            ((i * 2654435761) % 3).alias("priority"),
            ((i * 48271) % 12).alias("added_round"),
        ).withColumn("okey", F.col("priority") * 10_000_000 + F.col("url_id"))
        ev = frontier_eviction_plan(
            fr, current_round=12, min_age=6,
            evict_priority_floor=1, keep_per_host=40,
        ).persist()
        cold = ev.filter(F.col("evict")).select(
            "url_id", "host", "priority", "okey"
        )
        re = admit_frontier(cold, host_cap=20, global_cap=300)
        flows = ev.groupBy("host").agg(
            F.count("*").alias("n_frontier"),
            F.sum((~F.col("evict")).cast("long")).alias("n_hot"),
            F.sum(F.col("evict").cast("long")).alias("n_evicted"),
        )
        readm = re.groupBy("host").agg(
            F.sum(F.col("admitted").cast("long")).alias("n_readmitted")
        )
        return (
            flows.join(readm, "host", "left")
            .select(
                "host", "n_frontier", "n_hot", "n_evicted",
                F.coalesce("n_readmitted", F.lit(0)).alias("n_readmitted"),
                (
                    F.col("n_evicted") - F.coalesce("n_readmitted", F.lit(0))
                ).alias("n_still_cold"),
            )
            .orderBy("host")
        )

    q["frontier_lifecycle_report"] = frontier_lifecycle_report

    def crawl_fairness_audit(spark, sf):
        """Jain fairness of per-host dispatch counts (validate.
        fairness_index), all-integer permille — compared across three
        allocation policies over the same 40 hosts: even (1000‰),
        hash-varied, and one-host-hogs.  The starvation scalar a
        round report should publish beside its makespan."""
        from cex_crawler_spark.operators.validate import fairness_index

        i = F.col("id")
        h = i % 40
        pol = (i / 40).cast("long")
        counts = spark.range(120).select(
            F.when(pol == 0, F.lit("even"))
            .when(pol == 1, F.lit("varied"))
            .otherwise(F.lit("hog")).alias("policy"),
            h.alias("host"),
            F.when(pol == 0, F.lit(25))
            .when(pol == 1, 5 + (h * 2654435761) % 30)
            .otherwise(F.when(h == 0, F.lit(961)).otherwise(F.lit(1)))
            .cast("long").alias("n_dispatched"),
        )
        return fairness_index(counts, "n_dispatched", ["policy"]).orderBy(
            "policy"
        )

    q["crawl_fairness_audit"] = crawl_fairness_audit

    def corpus_vocab_growth(spark, sf):
        """Heaps-law vocabulary-growth census: per power-of-two
        doc-id prefix, how much NEW vocabulary the corpus added —
        V(2n)/V(n) declining is the sublinear growth (β<1) a healthy
        natural corpus shows; a flat ratio means boilerplate/synthetic
        churn is minting tokens.  The audit a mixing pipeline runs
        before trusting token-count budgets.  Shape: one explode +
        one (min first-doc, count) aggregate per token (a corpus-wide
        stopword is ONE agg key), bucket = length(bin(first_doc)) —
        integer log2, no transcendental — and the only window runs
        over the ≤64-row bucket table."""
        from pyspark.sql import Window

        from cex_crawler_spark.functions.text import tokens

        d = _t(spark, sf, "documents")
        tok = d.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        stats = tok.groupBy("tok").agg(
            F.min("doc_id").alias("first_doc"), F.count("*").alias("occ")
        )
        per = (
            stats.withColumn(
                "bucket", F.length(F.bin("first_doc")).cast("long")
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("new_tokens"),
                F.sum("occ").alias("occ_in_bucket"),
            )
        )
        w = Window.orderBy("bucket").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return per.select(
            "bucket",
            F.expr(
                "shiftleft(cast(1 as bigint), cast(bucket as int))"
            ).alias("threshold_docs"),
            "new_tokens",
            F.sum("new_tokens").over(w).alias("vocab_cum"),
            "occ_in_bucket",
        ).orderBy("bucket")

    q["corpus_vocab_growth"] = corpus_vocab_growth

    def linkgraph_triangles(spark, sf):
        """Exact triangles + local clustering coefficient (linkgraph.
        triangle_counts): dense mutually-linked neighbourhoods are the
        link-farm signature the spam-mass tier can't see structurally;
        clustering = 2t·1000 div d(d−1), all integer.  Ordered-wedge
        join, each triangle materialized once as a<b<c.  Fixture: a
        chorded ring (every node in ≥2 triangles), a planted K10
        (clustering 1000), hash chords for irregularity."""
        from cex_crawler_spark.operators.linkgraph import triangle_counts

        i = F.col("id")
        r1 = spark.range(300).select(i.alias("src"), ((i + 1) % 300).alias("dst"))
        r2 = spark.range(300).select(i.alias("src"), ((i + 2) % 300).alias("dst"))
        k10 = (
            spark.range(100)
            .select((i / 10).cast("long").alias("a"), (i % 10).alias("b"))
            .filter(F.col("a") < F.col("b"))
            .select((500 + F.col("a")).alias("src"), (500 + F.col("b")).alias("dst"))
        )
        ch = spark.range(150).select(
            ((i * 17) % 300).alias("src"), ((i * 37) % 300).alias("dst")
        )
        e = r1.unionByName(r2).unionByName(k10).unionByName(ch)
        return triangle_counts(e).orderBy("id")

    q["linkgraph_triangles"] = linkgraph_triangles

    def search_bm25_topk(spark, sf):
        """BM25 retrieval over relational inverted postings
        (operators/index.py — Okapi weighting, +1-inside-log idf):
        the serving tier a 100 TB crawl feeds.  Only the query terms'
        postings are touched (IN-literal pushdown), corpus constants
        ride a one-row broadcast, scores round(4) under the proven
        ln-parity discipline, order (score DESC, doc_id) makes the
        top-k SET engine-replayable."""
        from cex_crawler_spark.operators.index import bm25_topk

        d = _t(spark, sf, "documents")
        return bm25_topk(
            d, "text", "doc_id", ["vector", "merge", "window"], k=25
        )

    q["search_bm25_topk"] = search_bm25_topk

    def search_phrase_match(spark, sf):
        """Exact phrase retrieval (index.phrase_match): the next-word
        position-adjacency join over the positional index — what
        bag-of-words BM25 can't do.  P−1 hash joins keyed (doc, pos),
        IN-literal pushdown to the phrase terms only."""
        from cex_crawler_spark.operators.index import phrase_match

        d = _t(spark, sf, "documents")
        return phrase_match(d, "text", "doc_id", ["merge", "join"]).orderBy(
            "doc_id"
        )

    q["search_phrase_match"] = search_phrase_match

    def search_postings_compression(spark, sf):
        """Index-storage tier composition: the inverted postings'
        sorted doc-id lists gap-coded by the SAME delta operator the
        link graph uses (linkgraph.compress_adjacency — one operator,
        two storage problems); bits audit per term vs raw 64-bit
        lists.  Terms with a single posting row still encode (empty
        gap array)."""
        from cex_crawler_spark.operators.index import build_postings
        from cex_crawler_spark.operators.linkgraph import compress_adjacency

        d = _t(spark, sf, "documents")
        post = build_postings(d, "text", "doc_id").select(
            F.col("term").alias("src"), F.col("doc_id").alias("dst")
        )
        return (
            compress_adjacency(post)
            .select(
                F.col("src").alias("term"),
                F.col("n_out").alias("df"),
                F.col("first_dst").alias("first_doc"),
                F.array_join("gaps", "+").alias("gaps_str"),
                "gap_bits",
                "raw_bits",
            )
            .orderBy("term")
        )

    q["search_postings_compression"] = search_postings_compression

    def search_snippets(spark, sf):
        """Keyword-in-context result rendering (index.phrase_snippets):
        ±3 tokens around the FIRST phrase hit, sliced scan-side from
        the token array — the result-page tier on top of the phrase
        join."""
        from cex_crawler_spark.operators.index import phrase_snippets

        d = _t(spark, sf, "documents")
        return phrase_snippets(
            d, "text", "doc_id", ["merge", "join"], context=3
        ).orderBy("doc_id")

    q["search_snippets"] = search_snippets

    def search_term_suggest(spark, sf):
        """Spelling suggestion from the corpus's own vocabulary
        (index.term_suggest): exact integer Levenshtein DP (engine-
        replayable), ranked (distance, −df, term); vocab × queries is
        a broadcast-literal cross join with scan-side distance."""
        from cex_crawler_spark.operators.index import term_suggest

        d = _t(spark, sf, "documents")
        return term_suggest(
            d, "text", "doc_id", ["mergee", "windoow", "scann"], k=3
        ).orderBy("query", "rank")

    q["search_term_suggest"] = search_term_suggest

    def image_hash_search(spark, sf):
        """Query-side fingerprint search (similarity.
        hamming_search_topk): nearest stored 64-bit hashes to a query
        hash by popcount(XOR) — one codegen pass, distributed
        TakeOrdered.  Population = md5-derived 60-bit hashes (so the
        oracle replays them); neighbors planted at Hamming 1 by
        single-bit flips of the query."""
        from cex_crawler_spark.operators.similarity import hamming_search_topk

        i = F.col("id")
        qh = 0x0F0F0F0F0F0F0F0
        pop = spark.range(4000).select(
            i.alias("id"),
            F.conv(
                F.substring(F.md5(F.concat(F.lit("img:"), i.cast("string"))), 1, 15),
                16, 10,
            ).cast("long").alias("h"),
        )
        planted = spark.range(8).select(
            (10000 + i).alias("id"),
            F.lit(qh).cast("long").bitwiseXOR(
                F.expr("shiftleft(cast(1 as bigint), cast(id % 56 as int) + 1)")
            ).alias("h"),
        )
        return hamming_search_topk(pop.unionByName(planted), qh, k=15)

    q["image_hash_search"] = image_hash_search

    def search_index_merge(spark, sf):
        """Incremental index maintenance (index.merge_postings):
        re-crawled docs' postings REPLACE their base rows via one
        doc-keyed anti-join (per-term upsert would leak stale
        postings when a revisit drops terms).  The oracle builds the
        index FROM SCRATCH over the current corpus — hash equality IS
        the incremental-equals-from-scratch invariant (the
        dedup_incremental_clusters discipline).  Fixture: every 5th
        doc re-crawled with ' refreshed content marker refreshed'
        appended."""
        from cex_crawler_spark.operators.index import (
            build_postings, merge_postings,
        )

        d = _t(spark, sf, "documents")
        base = build_postings(d, "text", "doc_id")
        delta_docs = d.filter(F.col("doc_id") % 5 == 0).select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit(" refreshed content marker refreshed")
            ).alias("text"),
        )
        delta = build_postings(delta_docs, "text", "doc_id")
        return (
            merge_postings(base, delta)
            .filter(F.col("term").isin("merge", "vector", "refreshed"))
            .orderBy("term", "doc_id")
        )

    q["search_index_merge"] = search_index_merge

    def search_standing_alerts(spark, sf):
        """Prospective search / percolation (index.standing_alerts):
        standing conjunctive alert queries matched against the
        crawled corpus — the inverse of retrieval (small alert dim,
        big doc stream); a doc fires when it carries ALL the query's
        terms.  Broadcast semi-filter before any fan-out."""
        from cex_crawler_spark.operators.index import standing_alerts

        d = _t(spark, sf, "documents")
        queries = spark.createDataFrame(
            [("q_joins", "merge"), ("q_joins", "join"),
             ("q_vec", "vector"), ("q_vec", "batch"), ("q_vec", "scan"),
             ("q_ghost", "merge"), ("q_ghost", "zzzabsent")],
            ["query_id", "term"],
        )
        return standing_alerts(d, "text", "doc_id", queries).orderBy(
            "query_id", "doc_id"
        )

    q["search_standing_alerts"] = search_standing_alerts

    def search_anchor_boosted(spark, sf):
        """Two-field retrieval (index.anchor_boosted_topk, BM25F-
        lite): body text and inbound ANCHOR text scored as separate
        BM25 fields (own corpus stats each) and fused 0.7/0.3 — the
        web's oldest relevance signal; pages never crawled but richly
        linked surface through the anchor field alone (full-outer
        fusion).  Fixture: deterministic anchor rows over documents
        plus targets beyond the corpus (link-only pages)."""
        from cex_crawler_spark.operators.index import anchor_boosted_topk

        d = _t(spark, sf, "documents")
        i = F.col("id")
        texts = F.array(
            F.lit("vector index link"),
            F.lit("merge join deep dive"),
            F.lit("fast scan tricks"),
            F.lit("click here"),
            F.lit("best vector merge guide"),
        )
        anchors = spark.range(3000).select(
            ((i * 13) % 600).alias("doc_id"),
            F.element_at(texts, (i % 5 + 1).cast("int")).alias("anchor"),
        )
        return anchor_boosted_topk(
            d, "text", "doc_id", anchors, ["vector", "merge"], k=30
        )

    q["search_anchor_boosted"] = search_anchor_boosted

    def sitemap_cross_host_screen(spark, sf):
        """Sitemap poisoning screen (sources/sitemap.
        cross_host_sitemap_screen): a Sitemap: line pointing at
        another REGISTRABLE domain would let any crawled site inject
        a victim's URL namespace — cross-host declarations are
        accepted only within the eTLD+1 (www/cdn sharding), all else
        quarantined.  Fixture cycles same-host / sibling / foreign /
        apex-http / foreign-co.uk / uppercase+port declarations."""
        from cex_crawler_spark.sources.sitemap import (
            cross_host_sitemap_screen,
        )

        i = F.col("id")
        k = i % 20
        m = i % 6
        url = (
            F.when(m == 0, F.format_string("https://www.ex%d.co.uk/sitemap%d.xml", k, i))
            .when(m == 1, F.format_string("https://cdn.ex%d.co.uk/sm.xml", k))
            .when(m == 2, F.format_string("https://evil%d.com/sm.xml", k))
            .when(m == 3, F.format_string("http://ex%d.co.uk/sm.xml", k))
            .when(m == 4, F.format_string("https://other%d.co.uk/sm.xml", k))
            .otherwise(F.format_string("HTTPS://CDN.EX%d.CO.UK:8443/sm.xml", k))
        )
        decl = spark.range(200).select(
            F.format_string("www.ex%d.co.uk", k).alias("host"),
            url.alias("sitemap_url"),
        )
        return cross_host_sitemap_screen(decl).orderBy(
            "host", "sitemap_url"
        )

    q["sitemap_cross_host_screen"] = sitemap_cross_host_screen

    def search_eval_pr(spark, sf):
        """In-engine retrieval evaluation: ground truth = docs where
        the EXACT phrase 'merge join' occurs (phrase_match), system =
        bag-of-words BM25 top-10 on the same two terms — P@10 and
        recall@10 on the integer permille grid.  The eval harness IS
        a query: rankers get regression-tested by the same oracle
        gate as everything else."""
        from cex_crawler_spark.operators.index import bm25_topk, phrase_match

        d = _t(spark, sf, "documents")
        truth = phrase_match(d, "text", "doc_id", ["merge", "join"]).select(
            "doc_id"
        )
        top = bm25_topk(d, "text", "doc_id", ["merge", "join"], k=10).select(
            "doc_id"
        )
        n_truth = truth.count()
        n_hits = top.join(truth, "doc_id", "left_semi").count()
        return spark.createDataFrame(
            [(
                "merge join", 10, n_truth, n_hits,
                (1000 * n_hits) // 10,
                (1000 * n_hits) // n_truth if n_truth else None,
            )],
            "query string, k int, n_truth bigint, n_hits bigint, "
            "p_at_k_permille bigint, recall_permille bigint",
        )

    q["search_eval_pr"] = search_eval_pr

    def frontier_feed_merge(spark, sf):
        """Multi-feed discovery merge (expand.merge_discovery_feeds):
        link extraction, sitemap seeds, hreflang alternates and
        redirect canonicals folded into ONE frontier insert batch —
        best priority wins, provenance kept as the audit column.
        Overlapping arithmetic feeds + a redirect-exclusive tail."""
        from cex_crawler_spark.operators.expand import merge_discovery_feeds

        i = F.col("id")
        u = lambda c: F.format_string("https://ex.com/u%d", c)
        links = spark.range(1500).select(
            u(i).alias("url"), F.lit(2).alias("priority"),
            F.lit("links").alias("source"))
        sitemap = spark.range(1000).select(
            u(i * 2).alias("url"), (i * 2 / 500).cast("int").alias("priority"),
            F.lit("sitemap").alias("source"))
        hreflang = spark.range(200).select(
            u(i * 10 + 7).alias("url"), F.lit(1).alias("priority"),
            F.lit("hreflang").alias("source"))
        redirects = spark.range(400).select(
            u(i * 5).alias("url"), F.lit(2).alias("priority"),
            F.lit("redirects").alias("source"))
        tail = spark.range(100).select(
            u(2000 + i).alias("url"), F.lit(0).alias("priority"),
            F.lit("redirects").alias("source"))
        feeds = links.unionByName(sitemap).unionByName(hreflang)
        feeds = feeds.unionByName(redirects).unionByName(tail)
        return merge_discovery_feeds(feeds).orderBy("url")

    q["frontier_feed_merge"] = frontier_feed_merge

    def frontier_feed_census(spark, sf):
        """Marginal feed utility (expand.feed_yield_census): per
        discovery feed, how many URLs ONLY it surfaced — 'is parsing
        sitemaps worth it' as a measured permille, the demote-to-
        verification-cadence signal for redundant feeds."""
        from cex_crawler_spark.operators.expand import feed_yield_census

        i = F.col("id")
        u = lambda c: F.format_string("https://ex.com/u%d", c)
        links = spark.range(1500).select(
            u(i).alias("url"), F.lit(2).alias("priority"),
            F.lit("links").alias("source"))
        sitemap = spark.range(1000).select(
            u(i * 2).alias("url"), (i * 2 / 500).cast("int").alias("priority"),
            F.lit("sitemap").alias("source"))
        hreflang = spark.range(200).select(
            u(i * 10 + 7).alias("url"), F.lit(1).alias("priority"),
            F.lit("hreflang").alias("source"))
        redirects = spark.range(400).select(
            u(i * 5).alias("url"), F.lit(2).alias("priority"),
            F.lit("redirects").alias("source"))
        tail = spark.range(100).select(
            u(2000 + i).alias("url"), F.lit(0).alias("priority"),
            F.lit("redirects").alias("source"))
        feeds = links.unionByName(sitemap).unionByName(hreflang)
        feeds = feeds.unionByName(redirects).unionByName(tail)
        return feed_yield_census(feeds).orderBy("source")

    q["frontier_feed_census"] = frontier_feed_census

    def linkgraph_hopplot(spark, sf):
        """Hop plot (Broder WWW'00 measurement): BFS depth histograms
        from three fixed pivots over the hub-skewed sim graph — the
        reachable-mass-per-hop curve that sizes crawl depth limits
        (crawl_depth IS the operator; this is its measurement form).
        Per pivot: (pivot, depth, n_nodes, cum_nodes)."""
        from pyspark.sql import Window

        from cex_crawler_spark.operators.linkgraph import crawl_depth

        e = gen_sim_opicgraph(spark)
        outs = []
        for pivot in (0, 7, 13):
            seeds = spark.createDataFrame([(pivot,)], "url long")
            d = crawl_depth(e, seeds, max_depth=8).groupBy("depth").agg(
                F.count("*").alias("n_nodes")
            ).withColumn("pivot", F.lit(pivot).cast("long"))
            outs.append(d)
        per = outs[0].unionByName(outs[1]).unionByName(outs[2])
        w = Window.partitionBy("pivot").orderBy("depth").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return per.select(
            "pivot", "depth", "n_nodes",
            F.sum("n_nodes").over(w).alias("cum_nodes"),
        ).orderBy("pivot", "depth")

    q["linkgraph_hopplot"] = linkgraph_hopplot

    def robots_render_roundtrip(spark, sf):
        """Exporter-tier identity proof (functions/robots.
        render_robots_txt): per-host policy → canonical robots.txt
        body → re-parsed through all three channels (Disallow prefix,
        Crawl-delay, Sitemap).  The oracle derives the SAME rows
        straight from the policy arithmetic without ever rendering or
        parsing — hash equality proves render→parse is the identity
        (the WARC/WET roundtrip discipline applied to robots)."""
        from cex_crawler_spark.functions.robots import (
            parse_robots_crawl_delay, parse_robots_disallow,
            parse_robots_sitemaps, render_robots_txt,
        )

        i = F.col("id")
        dis = F.when(
            i % 2 == 0,
            F.array(
                F.format_string("/p%d", i % 5), F.lit("/admin")
            ),
        ).otherwise(F.array(F.format_string("/x%d", i)))
        cd = F.when(i % 3 != 0, (1 + i % 4).cast("int"))
        sm1 = F.format_string("https://h%d.ex.com/sm1.xml", i)
        sms = F.when(
            i % 5 == 0,
            F.array(sm1, F.format_string("https://h%d.ex.com/sm2.xml", i)),
        ).otherwise(F.array(sm1))
        hosts = spark.range(60).select(
            F.format_string("h%d", i).alias("host"),
            render_robots_txt(dis, cd, sms).alias("txt"),
        )
        t = F.col("txt")
        return hosts.select(
            "host",
            F.array_join(parse_robots_disallow(t), "+").alias("prefixes"),
            parse_robots_crawl_delay(t).cast("long").alias("crawl_delay_s"),
            F.array_join(parse_robots_sitemaps(t), "+").alias("sitemaps"),
        ).orderBy("host")

    q["robots_render_roundtrip"] = robots_render_roundtrip

    def sitemap_render_roundtrip(spark, sf):
        """Sitemap exporter identity proof (sources/sitemap.
        render_sitemap_xml): catalog-derived entries → canonical XML →
        re-parsed with the per-block parser (loc + optional lastmod +
        optional priority ladder).  Oracle derives the rows straight
        from the entry arithmetic — render→parse is the identity."""
        from cex_crawler_spark.sources.sitemap import (
            parse_sitemaps_with_priority, render_sitemap_xml,
        )

        h, j = F.col("h"), F.col("j")
        mem = spark.range(200).select(
            (F.col("id") / 5).cast("long").alias("h"),
            (F.col("id") % 5).alias("j"),
        )
        entry = F.struct(
            F.format_string("https://h%d.ex.com/p%d", h, j).alias("loc"),
            F.when(
                j % 2 == 0,
                F.format_string("2025-09-%02dT00:00:00Z", 1 + (h + j) % 27),
            ).alias("lastmod"),
            F.when(
                j % 3 != 1,
                F.format_string("0.%d", (h + j) % 10),
            ).alias("priority_str"),
        )
        sm = mem.groupBy("h").agg(
            F.sort_array(F.collect_list(F.struct(j.alias("j"), entry.alias("e"))))
            .alias("es")
        ).select(
            F.format_string("h%d", F.col("h")).alias("host"),
            render_sitemap_xml(
                F.transform(F.col("es"), lambda s: s["e"])
            ).alias("xml"),
        )
        return parse_sitemaps_with_priority(sm).orderBy("host", "url")

    q["sitemap_render_roundtrip"] = sitemap_render_roundtrip

    def crawl_serve_pipeline(spark, sf):
        """Crawl→curate→index→serve capstone: the quality + language
        gates and exact-dedup representatives (the corpus_curation
        spine) feed the BM25 retrieval tier — the serving index is
        built ONLY from curated representatives, so boilerplate
        duplicates can never vote a result up twice.  One declarative
        plan end to end; oracle composes the curation CTEs with the
        Okapi replay scoped to the representative set."""
        from cex_crawler_spark.functions.text import lang_id, quality_score
        from cex_crawler_spark.operators.dedup import exact_dedup
        from cex_crawler_spark.operators.index import bm25_topk

        d = _t(spark, sf, "documents")
        scored = d.select(
            "doc_id", "text",
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
        )
        kept = scored.filter(
            (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
        )
        reps = exact_dedup(kept, "text", "doc_id").select("doc_id")
        corpus = kept.join(reps, "doc_id").select("doc_id", "text")
        return bm25_topk(corpus, "text", "doc_id", ["vector", "merge"], k=15)

    q["crawl_serve_pipeline"] = crawl_serve_pipeline

    def corpus_perplexity_buckets(spark, sf):
        """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3):
        docs bucketed by corpus-own LM score tertiles — head (most
        natural) is kept outright, middle sampled, tail dropped; this
        is THE published recipe large text corpora are filtered with.
        Milli-logprob rides an integer grid off the round(4) score
        (house ln-parity), tertile cuts via exact percentile
        (== quantile_cont value-for-value, the proven trick), buckets
        rolled up map-combinably."""
        from cex_crawler_spark.functions.text import unigram_logprob_scores

        d = _t(spark, sf, "documents")
        lp = unigram_logprob_scores(d, "text", "doc_id").select(
            F.col("id").alias("doc_id"),
            F.round(F.col("avg_neg_logprob") * 1000).cast("long").alias("mi"),
        )
        cuts = lp.agg(
            F.expr(
                "percentile(mi, array(0.3333333333333333D, 0.6666666666666666D))"
            ).alias("q")
        ).select(
            F.col("q")[0].alias("q1"), F.col("q")[1].alias("q2")
        )
        return (
            lp.crossJoin(F.broadcast(cuts))
            .select(
                "doc_id", "mi",
                F.when(F.col("mi") <= F.col("q1"), F.lit("head"))
                .when(F.col("mi") <= F.col("q2"), F.lit("middle"))
                .otherwise(F.lit("tail")).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias("n_docs"),
                F.min("mi").alias("min_mi"),
                F.max("mi").alias("max_mi"),
            )
            .orderBy("bucket")
        )

    q["corpus_perplexity_buckets"] = corpus_perplexity_buckets

    def corpus_ccnet_sample(spark, sf):
        """The CCNet policy applied: keep head outright, thin middle
        50% by a deterministic md5 coin (audit-replayable, no RNG
        state), drop tail — the materialized training-set ids with
        their bucket provenance.  Composes the tertile machinery with
        the established md5-thinning idiom."""
        from cex_crawler_spark.functions.text import unigram_logprob_scores

        d = _t(spark, sf, "documents")
        lp = unigram_logprob_scores(d, "text", "doc_id").select(
            F.col("id").alias("doc_id"),
            F.round(F.col("avg_neg_logprob") * 1000).cast("long").alias("mi"),
        )
        cuts = lp.agg(
            F.expr(
                "percentile(mi, array(0.3333333333333333D, 0.6666666666666666D))"
            ).alias("q")
        ).select(F.col("q")[0].alias("q1"), F.col("q")[1].alias("q2"))
        tagged = lp.crossJoin(F.broadcast(cuts)).select(
            "doc_id", "mi",
            F.when(F.col("mi") <= F.col("q1"), F.lit("head"))
            .when(F.col("mi") <= F.col("q2"), F.lit("middle"))
            .otherwise(F.lit("tail")).alias("bucket"),
        )
        coin = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("ccnet:"), F.col("doc_id").cast("string"))),
                    1, 2,
                ),
                16, 10,
            ).cast("int") % 2
        )
        return (
            tagged.filter(
                (F.col("bucket") == "head")
                | ((F.col("bucket") == "middle") & (coin == 0))
            )
            .select("doc_id", "bucket", "mi")
            .orderBy("doc_id")
        )

    q["corpus_ccnet_sample"] = corpus_ccnet_sample

    def frontier_robots_deadweight(spark, sf):
        """Robots dead-weight census: per host, the permille of
        FRONTIER urls its Disallow prefixes already block — queued
        work that can never be fetched (frontier hygiene should have
        dropped it at admission; a high number means discovery keeps
        re-finding disallowed families, a DUST/trap smell).  Scan-side
        prefix test against the broadcast policy dim + one
        map-combinable host rollup."""
        i = F.col("id")
        h = i % 25
        fr = spark.range(5000).select(
            F.format_string("h%d", h).alias("host"),
            F.when(
                i % 5 < 2, F.format_string("/private/p%d", i)
            ).when(
                i % 5 == 2, F.format_string("/tmp/s%d", i)
            ).otherwise(F.format_string("/articles/a%d", i)).alias("path"),
        )
        rules = spark.range(25).select(
            F.format_string("h%d", i).alias("host"),
            F.when(i % 3 == 0, F.array(F.lit("/private/"), F.lit("/tmp/")))
            .when(i % 3 == 1, F.array(F.lit("/private/")))
            .otherwise(F.array().cast("array<string>")).alias("prefixes"),
        )
        joined = fr.join(F.broadcast(rules), "host")
        blocked = F.exists(
            F.col("prefixes"), lambda p: F.col("path").startswith(p)
        )
        return (
            joined.groupBy("host")
            .agg(
                F.count("*").alias("n_frontier"),
                F.sum(blocked.cast("long")).alias("n_blocked"),
            )
            .withColumn(
                "deadweight_permille",
                F.expr("(1000 * n_blocked) div n_frontier"),
            )
            .orderBy("host")
        )

    q["frontier_robots_deadweight"] = frontier_robots_deadweight













    def linkgraph_kcore(spark, sf):
        """k-core extraction (linkgraph.kcore_membership, k=4):
        ITERATED peeling — satellites whose degree rests on soon-
        peeled neighbours cascade out (plain degree thresholds keep
        them); what survives is the robust dense region.  Fixture: a
        doubled ring (degree exactly 4 once satellites go), a K8, a
        degree-3 satellite layer that peels in round 1, and a hub on
        four leaves that peels in round 2 — two genuine cascade
        rounds."""
        from cex_crawler_spark.operators.linkgraph import kcore_membership

        i = F.col("id")
        ring1 = spark.range(200).select(i.alias("src"), ((i + 1) % 200).alias("dst"))
        ring2 = spark.range(200).select(i.alias("src"), ((i + 2) % 200).alias("dst"))
        k8 = (
            spark.range(64)
            .select((i / 8).cast("long").alias("a"), (i % 8).alias("b"))
            .filter(F.col("a") < F.col("b"))
            .select((500 + F.col("a")).alias("src"), (500 + F.col("b")).alias("dst"))
        )
        sats = spark.range(100).select(
            (1000 + i).alias("src"), ((i * 3) % 200).alias("dst")
        ).unionByName(
            spark.range(100).select(
                (1000 + i).alias("src"), ((i * 7 + 1) % 200).alias("dst")
            )
        ).unionByName(
            spark.range(100).select(
                (1000 + i).alias("src"), ((i * 11 + 2) % 200).alias("dst")
            )
        )
        hub = spark.range(4).select(
            F.lit(2000).alias("src"), (3000 + i).alias("dst")
        )
        e = ring1.unionByName(ring2).unionByName(k8).unionByName(sats)
        e = e.unionByName(hub)
        return kcore_membership(e, k=4).orderBy("id")

    q["linkgraph_kcore"] = linkgraph_kcore

    def crawl_trending_terms(spark, sf):
        """Trending-term windows (streaming/trending.py shared
        builder): per tumbling 10-minute window, term occurrence
        counts ranked top-3 — the breaking-topic steering signal; the
        SAME single-aggregation builder runs under readStream
        (stream==batch drain test), ranking deliberately outside the
        streamed aggregate.  Fixture plants a 'flashcrash' burst in
        one window over a 6-term background vocabulary."""
        from pyspark.sql import Window

        from cex_crawler_spark.streaming.trending import (
            trending_term_windows,
        )

        i = F.col("id")
        vocab = F.array(
            F.lit("alpha"), F.lit("beta"), F.lit("gamma"),
            F.lit("delta"), F.lit("epsilon"), F.lit("zeta"),
        )
        text = F.concat_ws(
            " ",
            F.element_at(vocab, ((i * 7) % 6 + 1).cast("int")),
            F.element_at(vocab, ((i * 11) % 6 + 1).cast("int")),
            F.when((i >= 200) & (i < 300), F.lit("flashcrash")).otherwise(
                F.element_at(vocab, ((i * 13) % 6 + 1).cast("int"))
            ),
        )
        pages = spark.range(600).select(
            i.alias("page_id"),
            F.timestamp_seconds(
                F.lit(1756684800) + (i * 97) % 3600
            ).alias("ts"),
            text.alias("text"),
        )
        counts = trending_term_windows(pages, "10 minutes")
        w = Window.partitionBy("window_start").orderBy(
            F.col("n_occurrences").desc(), "term"
        )
        return (
            counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .orderBy("window_start", "rank")
        )

    q["crawl_trending_terms"] = crawl_trending_terms

    def host_steering_fusion(spark, sf):
        """Signal-fusion capstone: the four INDEPENDENT steering
        signals — content quality (quality_verdicts), global novelty
        (novelty_yield), link-space saturation
        (discovery_saturation), server health (adaptive_host_delay) —
        computed over ONE shared 3-round fetch log and merged into
        the per-host verdict the scheduler consumes: priority_penalty
        = number of firing demotion signals, delay_ms from the health
        tier.  Fixture: 24 hosts where h%4==0 serves junk, h%3==0
        re-serves stale digests, h%2==0 exhausts a 20-URL link pool,
        h%5==0 is slow, h%7==0 errors — every subset combination
        fires somewhere."""
        from cex_crawler_spark.operators.politeness import (
            discovery_saturation, novelty_yield, quality_verdicts,
        )
        from cex_crawler_spark.operators.recrawl import adaptive_host_delay

        i = F.col("id")
        h = (i / 90).cast("long")
        r = ((i / 30).cast("long") % 3) + 1
        j = i % 30
        log = spark.range(2160).select(
            F.format_string("h%d", h).alias("host"),
            r.alias("round"),
            F.when((h % 4 == 0) & (j % 10 < 7), F.lit(0.2))
            .otherwise(F.lit(0.8)).alias("quality"),
            F.when(h % 3 == 0, F.format_string("d%d", h * 100 + j))
            .otherwise(F.format_string("d%d", h * 1000 + r * 100 + j))
            .alias("digest"),
            F.when(h % 2 == 0, F.format_string("t%d", h * 50 + j % 20))
            .otherwise(F.format_string("t%d", h * 1000 + r * 100 + j))
            .alias("target"),
            F.when(h % 5 == 0, 900 + j * 10).otherwise(80 + j)
            .cast("long").alias("latency_ms"),
            F.when(h % 7 == 0, j % 2 == 0).otherwise(F.lit(True)).alias("ok"),
        ).persist()
        qv = quality_verdicts(log).select(
            "host", F.col("demote").alias("quality_demote")
        )
        nv = novelty_yield(log).select(
            "host", F.col("demote").alias("novelty_demote")
        )
        sat = discovery_saturation(log).filter(F.col("is_latest")).select(
            "host", "saturated"
        )
        ad = adaptive_host_delay(log).select("host", "delay_ms")
        return (
            qv.join(nv, "host")
            .join(sat, "host")
            .join(ad, "host")
            .select(
                "host",
                "quality_demote",
                "novelty_demote",
                "saturated",
                (
                    F.col("quality_demote").cast("long")
                    + F.col("novelty_demote").cast("long")
                    + F.col("saturated").cast("long")
                ).alias("priority_penalty"),
                "delay_ms",
            )
            .orderBy("host")
        )

    q["host_steering_fusion"] = host_steering_fusion

    def link_spam_mass(spark, sf):
        """TrustRank + relative spam mass (operators/linkgraph.py;
        Gyöngyi et al. VLDB'04/'06): seed-biased power iteration beside
        plain PageRank on the spam-farm fixture — the farm target's
        rank is almost entirely unexplained by trust (rel_mass ≈ 1)
        while the good core stays near 0/negative.  The anti-spam
        counterpart of the structural trap screen: the reference crawls
        a vetted URL list and never needs one; an open frontier does."""
        from cex_crawler_spark.operators.linkgraph import (
            pagerank,
            relative_spam_mass,
            trustrank,
        )

        e = gen_sim_trustgraph(spark)
        seeds = spark.range(SIM_TRUST_SEEDS).select(F.col("id"))
        pr = pagerank(e, n_iter=4, damping=0.85)
        tr = trustrank(e, seeds, n_iter=4, damping=0.85)
        out = relative_spam_mass(pr, tr, suspect_threshold=0.95)
        return out.select(
            "id",
            F.round("rank", 6).alias("rank"),
            F.round("trust", 6).alias("trust"),
            F.round("rel_mass", 6).alias("rel_mass"),
            "spam_suspect",
        ).orderBy("id")

    q["link_spam_mass"] = link_spam_mass

    def link_graph_degree_stats(spark, sf):
        """In/out degree histograms with degree-0 rows (operators/
        linkgraph.degree_stats) — the dangling census and hub-
        concentration readout a frontier monitors per round; two
        map-combinable aggregates, no window/explode."""
        from cex_crawler_spark.operators.linkgraph import degree_stats

        # the trust-graph fixture has genuinely varied degrees (sinks 0,
        # farm 1, core ~3, hub 80+); sim_edges is degree-uniform
        e = gen_sim_trustgraph(spark)
        return degree_stats(e).orderBy("side", "degree")

    q["link_graph_degree_stats"] = link_graph_degree_stats

    def meta_robots_screen(spark, sf):
        """In-page Robots Exclusion Protocol (operators/linkgraph.
        robots_meta_screen): <meta name="robots"> noindex/nofollow/none
        in either attribute order + per-link rel="nofollow" — gates the
        corpus sink and zeroes nofollow pages' expansion contribution;
        pure scan-side regexp codegen, no shuffle."""
        from cex_crawler_spark.operators.linkgraph import robots_meta_screen

        pages = gen_sim_meta_pages(spark)
        out = robots_meta_screen(pages)
        return out.select(
            "url",
            "noindex",
            "nofollow",
            F.col("n_links").cast("long").alias("n_links"),
            F.col("n_follow_links").cast("long").alias("n_follow_links"),
        ).orderBy("url")

    q["meta_robots_screen"] = meta_robots_screen

    def recrawl_change_magnitude(spark, sf):
        """Graded revisit change (operators/recrawl.
        content_change_magnitude): 1000·(1 − shingle-Jaccard) between a
        URL's two latest fetches — the magnitude the binary digest flip
        feeding λ̂ can't express (a timestamp widget ≠ a rewrite).
        Round 2 mutates documents deterministically: %4==0 identical,
        %4==1 appended note, %4==2 half rewritten, %4==3 never refetched
        (first_seen).  Per-URL window + (url, shingle) equi-join — never
        cross-doc; all-integer permille."""
        from cex_crawler_spark.operators.recrawl import content_change_magnitude

        d = spark.read.parquet(f"{sf}/documents.parquet")
        r1 = d.select(
            F.col("doc_id").alias("url"), F.lit(1).alias("round"), "text"
        )
        i = F.col("doc_id")
        mut = (
            F.when(i % 4 == 0, F.col("text"))
            .when(
                i % 4 == 1,
                F.concat(
                    F.col("text"),
                    F.lit(" appended update note number "),
                    i.cast("string"),
                ),
            )
            .otherwise(
                F.concat(
                    F.expr("substring(text, 1, length(text) div 2)"),
                    F.lit(" entirely new rewritten second half with fresh vocabulary "),
                    i.cast("string"),
                )
            )
        )
        r2 = d.filter(i % 4 != 3).select(
            F.col("doc_id").alias("url"), F.lit(2).alias("round"), mut.alias("text")
        )
        log = r1.unionByName(r2)
        return content_change_magnitude(log).orderBy("url")

    q["recrawl_change_magnitude"] = recrawl_change_magnitude

    def redirect_resolution(spark, sf):
        """Redirect-chain resolution (operators/linkgraph.
        resolve_redirects): pointer jumping over the functional 3xx
        graph — O(log max_chain) node-sized self-joins resolve every
        URL to its final target; redirect cycles (and tails into them)
        are detected as DATA and come back unresolved, never followed
        forever.  The seen-set then dedups on final_url: ten mirrors
        301-ing to one canonical page are one page."""
        from cex_crawler_spark.operators.linkgraph import resolve_redirects

        e = gen_sim_redirects(spark)
        return resolve_redirects(e).orderBy("url")

    q["redirect_resolution"] = redirect_resolution

    def link_graph_hits(spark, sf):
        """HITS hubs/authorities (operators/linkgraph.hits, Kleinberg
        JACM'99): a high-hub page is a directory worth crawling EARLY
        for its outlinks even when its own authority is low — the
        complementary signal to PageRank for frontier ordering.  Two
        map-combinable aggregates per iteration over the src-partitioned
        edge list; oracled by unrolling the recurrence in SQL."""
        from cex_crawler_spark.operators.linkgraph import hits

        r = hits(gen_sim_linkgraph(spark), n_iter=3)
        return r.select(
            "id",
            F.round("hub", 6).alias("hub"),
            F.round("auth", 6).alias("auth"),
        ).orderBy("id")

    q["link_graph_hits"] = link_graph_hits

    def crawl_depth_labels(spark, sf):
        """Seed-distance BFS labeling (operators/linkgraph.crawl_depth):
        min link-hops from the seed set, level-synchronous — the
        depth-bounded crawl policy that keeps a 10^10-URL frontier
        finite.  One same-key hash join + anti-join per layer; only the
        node-sized frontier shuffles (edges persisted src-partitioned).
        Oracled by an independent recursive-CTE walk (UNION-distinct
        bounds states, min(depth) per url)."""
        from cex_crawler_spark.operators.linkgraph import crawl_depth

        seeds = spark.range(1).select(F.lit(0).cast("long").alias("url"))
        return crawl_depth(
            gen_sim_linkgraph(spark), seeds, max_depth=4
        ).orderBy("url")

    q["crawl_depth_labels"] = crawl_depth_labels

    def doc_line_scrub(spark, sf):
        """C4/CCNet line-level boilerplate scrub
        (dedup.scrub_duplicated_lines): nav/footer lines repeated
        across the corpus are removed except one canonical first
        occurrence; docs rebuilt in line order, fully-scrubbed docs
        come back empty rather than dropped.  Linear — no pair join.
        Fixture: documents re-lined at 8 words/line with a nav header
        planted on doc_id%3==0 and a copyright footer on doc_id%5==0
        (the boilerplate line-dedup exists to kill)."""
        from cex_crawler_spark.operators.dedup import scrub_duplicated_lines

        d = _t(spark, sf, "documents")
        words = F.split(F.col("text"), " ")
        nl = F.floor((F.size(words) - 1) / 8).cast("int")
        lined = F.array_join(
            F.transform(
                F.sequence(F.lit(0), nl),
                lambda i: F.array_join(F.slice(words, i * 8 + 1, F.lit(8)), " "),
            ),
            "\n",
        )
        header = F.when(
            F.col("doc_id") % 3 == 0, F.lit("nav home products contact\n")
        ).otherwise(F.lit(""))
        footer = F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\ncopyright example corp all rights reserved"),
        ).otherwise(F.lit(""))
        fixture = d.select(
            "doc_id", F.concat(header, lined, footer).alias("text")
        )
        return (
            scrub_duplicated_lines(fixture, "text", "doc_id")
            .select(
                F.col("id").alias("doc_id"), "text", "n_lines", "n_kept"
            )
            .orderBy("doc_id")
        )

    q["doc_line_scrub"] = doc_line_scrub

    def doc_host_template_scrub(spark, sf):
        """Host-scoped template removal (dedup.host_template_lines +
        scrub_host_templates — Gibson et al. WWW'05: templates are
        per-SITE): a line is chrome only if it covers ≥40% AND ≥3 of
        ITS OWN host's documents, so cross-site recurring content
        (quotes, specs) survives where the global C4 scrub over-fires.
        Fixture: documents re-lined 8 words/line under host =
        h(doc_id%20); hosts ≡0 (mod 3) carry a host-specific nav
        header on EVERY doc, and a global cookie banner rides every
        even doc_id (≈50% share per host — caught per-host by the
        share bar).  At sf0.001 hosts have 2-3 docs, so min_docs=3
        also exercises the small-host guard."""
        from cex_crawler_spark.operators.dedup import (
            host_template_lines, scrub_host_templates,
        )

        d = _t(spark, sf, "documents")
        words = F.split(F.col("text"), " ")
        nl = F.floor((F.size(words) - 1) / 8).cast("int")
        lined = F.array_join(
            F.transform(
                F.sequence(F.lit(0), nl),
                lambda i: F.array_join(F.slice(words, i * 8 + 1, F.lit(8)), " "),
            ),
            "\n",
        )
        hostk = F.col("doc_id") % 20
        header = F.when(
            hostk % 3 == 0,
            F.concat(
                F.lit("site h"), hostk.cast("string"), F.lit(" navigation menu\n")
            ),
        ).otherwise(F.lit(""))
        footer = F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("\nglobal cookie banner accept decline"),
        ).otherwise(F.lit(""))
        fixture = d.select(
            "doc_id",
            F.concat(F.lit("h"), hostk.cast("string")).alias("host"),
            F.concat(header, lined, footer).alias("text"),
        )
        t = host_template_lines(
            fixture, "text", "doc_id", "host", min_docs=3, min_share_permille=400
        )
        return (
            scrub_host_templates(fixture, t, "text", "doc_id", "host")
            .select(
                F.col("id").alias("doc_id"), "host", "text",
                "n_lines", "n_kept", "n_template",
            )
            .orderBy("doc_id")
        )

    q["doc_host_template_scrub"] = doc_host_template_scrub

    def image_batch_packing(spark, sf):
        """Aspect-bucketed pixel-budget batch packing
        (multimodal.aspect_bucket + pack_images): vision trainers batch
        images of like aspect ratio under a per-batch pixel budget —
        the image twin of sequence packing.  Bucket = nearest grid
        ratio in log space, computed tie-stably from exact integer
        cross-products (no transcendentals); packing restarts per
        bucket via the chunked prefix-sum decomposition (no global
        window).  Oracled by an independent cross-join argmin + plain
        window cumsum."""
        from cex_crawler_spark.operators.multimodal import pack_images

        imgs = spark.range(600).select(
            F.col("id").alias("image_id"),
            (160 + (F.col("id") * 37) % 768).alias("w"),
            (160 + (F.col("id") * 53) % 768).alias("h"),
        )
        return (
            pack_images(imgs, budget_px=1_500_000)
            .select("image_id", "ar_bucket", "n_px", "pack_id")
            .orderBy("image_id")
        )

    q["image_batch_packing"] = image_batch_packing

    def image_decontamination(spark, sf):
        """Image benchmark decontamination
        (dedup.hamming_decontamination_matches): corpus images whose
        perceptual hash lands within Hamming ≤ 3 of any eval-set image
        (phash survives re-encode/resize, so leaked eval images are
        caught even when bytes differ).  Directed — eval (block, fp)
        keys broadcast, the corpus is one scan-side 4-block explode +
        map-side join, never corpus²; pigeonhole makes radius-3 recall
        exact.  Fixture: arithmetic 64-bit fingerprints; eval rows are
        corpus fps with 0-3 bits flipped (even ids → leaked) or 9 bits
        flipped (odd ids → clean).  Oracled by brute-force
        bit_count(xor) cross join."""
        from cex_crawler_spark.operators.dedup import (
            hamming_decontamination_matches,
        )

        corpus = spark.range(600).select(
            F.col("id").alias("image_id"),
            F.expr(
                "(id * 2654435761) ^ shiftleft(id * 48271, 30)"
                " ^ shiftleft(id, 47)"
            ).alias("phash"),
        )
        ev = spark.range(20).select(
            F.col("id").alias("eval_id"),
            F.expr(
                "((id*17) * 2654435761) ^ shiftleft((id*17) * 48271, 30)"
                " ^ shiftleft(id*17, 47)"
                " ^ shiftleft(CAST(CASE WHEN id % 2 = 0 THEN"
                "   CASE CAST(id % 4 AS INT) WHEN 0 THEN 0 WHEN 2 THEN 3"
                "        ELSE 1 END"
                "   ELSE 511 END AS BIGINT), CAST(id % 40 AS INT))"
            ).alias("phash"),
        )
        return (
            hamming_decontamination_matches(
                corpus, ev, "phash", "image_id", eval_id_col="eval_id"
            )
            .select(
                F.col("id").alias("image_id"),
                "n_eval_matches",
                F.col("best_hamming").cast("long").alias("best_hamming"),
            )
            .orderBy("image_id")
        )

    q["image_decontamination"] = image_decontamination

    def anchor_text_consensus(spark, sf):
        """Per-target anchor-text consensus
        (linkgraph.anchor_text_profile): the modal anchor string, total
        in-links and distinct linking pages per href — the web's name
        for a page, and the only text a frontier has for un-fetched
        URLs.  Two-level map-combinable aggregate, mode carried as one
        struct per group; ties break lexicographically (deterministic).
        Fixture: 2/3 of links use the target's canonical anchor, the
        rest scatter — consensus must surface the canonical one."""
        from cex_crawler_spark.operators.linkgraph import anchor_text_profile

        i = F.col("id")
        anchors = F.array(
            F.lit("click here"),
            F.lit("official site"),
            F.lit("read more"),
            F.lit("home"),
        )
        ai = F.when(i % 3 < 2, ((i * 261) % 80) % 4).otherwise((i * 7) % 4)
        links = spark.range(2000).select(
            F.format_string(
                "https://s%d.example.com/p", (i % 200).cast("int")
            ).alias("src_url"),
            F.format_string(
                "https://t%d.example.com/", ((i * 261) % 80).cast("int")
            ).alias("href"),
            F.element_at(anchors, (ai + 1).cast("int")).alias("anchor"),
        )
        return anchor_text_profile(links).orderBy("href")

    q["anchor_text_consensus"] = anchor_text_consensus

    def image_curation_packed(spark, sf):
        """Image curation → batch-shaping CAPSTONE — the image twin of
        `corpus_curation_packed`, the pipeline a vision-data job
        actually ends with: pigeonhole Hamming pairs over phash →
        path-halving connected components → keep one representative
        per near-dup cluster → aspect-ratio bucket the SURVIVORS →
        pixel-budget batch packing per bucket.  Every stage is the
        audited scale path (bucketed candidates, O(log d) CC, no
        global window in the packing)."""
        from cex_crawler_spark.operators.dedup import (
            connected_components,
            hamming_near_dup_candidates,
        )
        from cex_crawler_spark.operators.multimodal import pack_images

        imgs = gen_sim_images(spark)
        pairs = hamming_near_dup_candidates(
            imgs, "phash", "image_id"
        ).filter(F.col("hamming") <= 3)
        comp = connected_components(pairs)
        drop = comp.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("image_id")
        )
        survivors = imgs.join(drop, "image_id", "left_anti").withColumn(
            "ord", F.substring("image_id", 4, 10).cast("long")
        )
        return (
            pack_images(survivors, id_col="ord", budget_px=1_500_000)
            .select("image_id", "ar_bucket", "n_px", "pack_id")
            .orderBy("image_id")
        )

    q["image_curation_packed"] = image_curation_packed

    def crawl_budget_allocation(spark, sf):
        """Proportional crawl-budget apportionment
        (operators/allocation.allocate_budget): split a round's global
        fetch budget across hosts ∝ weight (frontier mass / PageRank /
        change rate) by the largest-remainder method — sum(budget) ==
        total EXACTLY, all integer arithmetic (quota = total·w div W,
        remainder = total·w mod W — no float division anywhere, so
        engines agree bit-for-bit).  The top-r remainder selection is
        the distributed value-bucket form: only the boundary bucket is
        window-ranked, never the whole host dim."""
        from cex_crawler_spark.operators.allocation import allocate_budget

        w = spark.range(200).select(
            F.format_string(
                "h%03d.example.com", F.col("id").cast("int")
            ).alias("host"),
            (1 + (F.col("id") * 48271) % 997).alias("weight"),
        )
        return allocate_budget(w, "host", "weight", 10_000).orderBy("host")

    q["crawl_budget_allocation"] = crawl_budget_allocation

    def page_link_extract(spark, sf):
        """<a href> extraction (operators/linkgraph.page_links): pure
        codegen regexp over fetched html, zipped href/anchor pairs —
        the frontier-expansion feed, fused with the fetch scan."""
        from cex_crawler_spark.operators.linkgraph import page_links

        p = gen_sim_pages(spark)
        return page_links(p).orderBy("src_url", "href", "anchor")

    q["page_link_extract"] = page_link_extract

    def sitemap_frontier_seed(spark, sf):
        """Sitemap XML → frontier seed rows (sources/sitemap.py):
        per-<url>-block isolation so missing <lastmod> tags can't shift
        the positional zip; lastmod → UTC timestamp, NULL = always
        stale."""
        from cex_crawler_spark.sources.sitemap import parse_sitemaps

        sm = gen_sim_sitemaps(spark)
        return parse_sitemaps(sm).orderBy("host", "url")

    q["sitemap_frontier_seed"] = sitemap_frontier_seed

    def payload_sniff_format(spark, sf):
        """Magic-byte content-type sniffing (functions/sniff.py) over
        true binary payloads — headers lie, the payload doesn't.  One
        scan-side CASE over hex(substring(bytes,1,16)); the fixture
        unhexes deterministic hex strings so the oracle can replay the
        classifier on the hex text."""
        from cex_crawler_spark.functions.sniff import sniff_format

        p = gen_sim_payload_hex(spark)
        return (
            p.select("payload_id", sniff_format(F.unhex("hexstr")).alias("fmt"))
            .orderBy("payload_id")
        )

    q["payload_sniff_format"] = payload_sniff_format

    def dedup_incremental(spark, sf):
        """Incremental batch-vs-corpus near-dup screen
        (operators/dedup.incremental_jaccard_matches): today's ingest
        joined against the standing corpus via the shingle-hash
        inverted index — O(batch × postings), never corpus².  Batch =
        docs whose md5(doc_id) starts 0/1/2 (mirrorable split)."""
        from cex_crawler_spark.operators.dedup import incremental_jaccard_matches

        docs = _t(spark, sf, "documents")
        is_batch = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin(
            "0", "1", "2"
        )
        return incremental_jaccard_matches(
            docs.filter(~is_batch),
            docs.filter(is_batch),
            k=3,
            threshold=0.5,
            max_df=None,
        ).orderBy("batch_id", "corpus_id")

    q["dedup_incremental"] = dedup_incremental

    def crawl_backoff_schedule(spark, sf):
        """Exponential-backoff retry schedule from the fetch-attempt log
        (operators/recrawl.backoff_schedule): trailing-failure count via
        conditional aggregates only — no window over the attempt log;
        max_failures=4 marks permanently-failing URLs dead."""
        from cex_crawler_spark.operators.recrawl import backoff_schedule

        a = gen_sim_attempts(spark)
        return backoff_schedule(a, max_failures=4).orderBy("url_hash")

    q["crawl_backoff_schedule"] = crawl_backoff_schedule

    def crawl_adaptive_delay(spark, sf):
        """Server-health-adaptive politeness delay per host
        (operators/recrawl.adaptive_host_delay): delay = clamp(3×p95
        latency, 200 ms, 60 s), doubled when the host's error rate
        exceeds 0.3 — the Heritrix delay-factor policy the reference
        replaces with a FIXED random 1-3 s sleep.  p95 via
        `percentile_approx` (mergeable GK sketch, map-side partials —
        exact discrete order statistic below compression), the rest
        map-combinable aggregates; one narrow shuffle on host."""
        from cex_crawler_spark.operators.recrawl import adaptive_host_delay

        a = gen_sim_health(spark)
        return adaptive_host_delay(a).orderBy("host")

    q["crawl_adaptive_delay"] = crawl_adaptive_delay

    def robots_sitemap_discovery(spark, sf):
        """Sitemap: directive extraction (functions/robots.py) — the
        discovery edge robots → sitemap fetch → frontier seed; RFC 9309
        makes the directive user-agent-independent, so it's one
        scan-side regexp on the host dim."""
        from cex_crawler_spark.functions.robots import parse_robots_sitemaps

        p = _t(spark, sf, "part")
        txt = F.concat(
            F.lit("User-agent: *\nDisallow: /tmp\n"),
            F.when(
                F.col("p_size") % 4 != 0,
                F.format_string(
                    "Sitemap: https://h%d.example.com/sitemap.xml\n",
                    F.col("p_size"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("p_partkey") % 3 == 0,
                F.format_string(
                    "sitemap: https://h%d.example.com/sitemap-news.xml\n",
                    F.col("p_partkey") % 11,
                ),
            ).otherwise(F.lit("")),
        )
        return (
            p.select(
                "p_partkey",
                F.explode(parse_robots_sitemaps(txt)).alias("sitemap_url"),
            )
            .orderBy("p_partkey", "sitemap_url")
        )

    q["robots_sitemap_discovery"] = robots_sitemap_discovery

    def doc_tfidf_topk(spark, sf):
        """Top-5 TF-IDF terms per document (functions/text.tfidf_top_terms):
        keyword extraction the relational way — two map-combinable
        aggregates + salted exact top-k (no per-doc window task); score
        rounded to 4 BEFORE ranking for cross-engine rank stability."""
        from cex_crawler_spark.functions.text import tfidf_top_terms

        d = _t(spark, sf, "documents")
        return (
            tfidf_top_terms(d, "text", "doc_id", k=5)
            .select(F.col("id").alias("doc_id"), "token", "score", "rank")
            .orderBy("doc_id", "rank")
        )

    q["doc_tfidf_topk"] = doc_tfidf_topk

    def frontier_discovery_pipeline(spark, sf):
        """CAPSTONE — the whole discovery loop, end to end: extract
        links from fetched pages → PageRank over the link graph →
        union with sitemap seeds → median-bucketed priority (unknown
        rank = middle) → trap-host demotion.  Every stage is the
        audited scale path (codegen extraction, per-iteration
        map-combinable shuffle, broadcast trap verdict); ranks are
        rounded to 6 BEFORE the median/compare so the bucket boundary
        is grid-stable across engines."""
        from cex_crawler_spark.operators.linkgraph import page_links, pagerank
        from cex_crawler_spark.operators.traps import demote_trapped, trap_hosts
        from cex_crawler_spark.sources.sitemap import parse_sitemaps

        links = page_links(gen_sim_pages(spark))
        edges = links.select(
            F.col("src_url").alias("src"), F.col("href").alias("dst")
        )
        pr = pagerank(edges, n_iter=3).select(
            F.col("id").alias("url"), F.round("rank", 6).alias("rank")
        )
        discovered = (
            links.select(F.col("href").alias("url"))
            .unionByName(parse_sitemaps(gen_sim_sitemaps(spark)).select("url"))
            .distinct()
            .select(
                "url",
                F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
            )
        )
        joined = discovered.join(pr, "url", "left")
        # median of the DISCOVERED urls' ranks (null = never linked),
        # not of the whole node table — the bucket boundary must split
        # the actual frontier
        med = joined.agg(F.expr("percentile(rank, 0.5)").alias("m"))
        ranked = (
            joined.crossJoin(F.broadcast(med))
            .withColumn(
                "priority",
                F.when(F.col("rank").isNull(), F.lit(1))
                .when(F.col("rank") >= F.col("m"), F.lit(0))
                .otherwise(F.lit(2))
                .cast("long"),
            )
            .select("url", "host", "priority")
        )
        traps = trap_hosts(ranked, min_urls=20, max_top_template_share=0.5)
        return demote_trapped(ranked, traps, penalty=10).orderBy(
            "priority", "url"
        )

    q["frontier_discovery_pipeline"] = frontier_discovery_pipeline

    return q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl-scheduler semantics (canonicalize → dedup → per-host
    window-rank budget) over the sf0.001 events table."""
    return q_frontier_schedule(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------------

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_STOP_LIST = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
# whitespace tokens of the raw lowercased text (matches functions.text.tokens)
_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_STOP_RATIO = (
    f"CASE WHEN len({_TOKS}) > 0 THEN "
    f"len(list_filter({_TOKS}, t -> t IN ({_STOP_LIST})))::DOUBLE / len({_TOKS}) "
    "ELSE 0.0 END"
)
# 3-word shingle set over normalized text (matches functions.text.word_shingles)
_SHINGLES3 = (
    f"list_distinct([array_to_string(toks[i:i+2], ' ') "
    f"for i in range(1, greatest(len(toks) - 2, 0) + 1)])"
)

# Inverted-index formulation (unnest shingles → equi-join → count):
# row-identical to the original all-pairs list_intersect form (verified
# at sf0.001 and sf0.01; the all-pairs SQL is in git history) but
# O(shared-shingle pairs) instead of O(n² docs) — the all-pairs form
# took >1 h for the 12.5M candidate pairs of the sf0.1 self-check,
# this one 1.8 s.
def _pagerank_cte_chain(n_iter: int) -> str:
    """CTE chain (nodes/nn/deg/r0..r{n}) unrolling the pagerank power
    iteration over an existing ``dedges(src, dst)`` CTE — expression
    shapes/order mirror operators/linkgraph.pagerank exactly."""
    iters = []
    for k in range(n_iter):
        iters.append(f"""
        d{k} AS (
          SELECT coalesce(sum(rank), 0) AS m
          FROM r{k} r LEFT JOIN deg g ON g.id = r.id
          WHERE g.id IS NULL
        ),
        r{k + 1} AS (
          SELECT n.id,
                 ((1 - 0.85) / (SELECT cnt FROM nn)
                  + 0.85 * (SELECT m FROM d{k}) / (SELECT cnt FROM nn))
                 + 0.85 * coalesce(c.contrib, 0) AS rank
          FROM nodes n
          LEFT JOIN (
            SELECT e.dst AS id, sum(r.rank / g.outd) AS contrib
            FROM dedges e
            JOIN r{k} r ON r.id = e.src
            JOIN deg g ON g.id = e.src
            GROUP BY e.dst
          ) c ON c.id = n.id
        )""")
    return f"""
        nodes AS (
          SELECT DISTINCT src AS id FROM dedges
          UNION SELECT DISTINCT dst FROM dedges
        ),
        nn AS (SELECT count(*) AS cnt FROM nodes),
        deg AS (SELECT src AS id, count(*) AS outd FROM dedges GROUP BY src),
        r0 AS (SELECT id, 1.0 / (SELECT cnt FROM nn) AS rank FROM nodes),
        {",".join(iters)}
    """


def _trustrank_cte_chain(n_iter: int) -> str:
    """CTE chain (tns/tvec/t0..t{n}) unrolling the seed-biased
    TrustRank iteration — assumes ``dedges``, ``nodes``, ``deg`` (from
    ``_pagerank_cte_chain``) and a ``tseeds(id)`` CTE exist; expression
    shapes/order mirror operators/linkgraph.trustrank exactly."""
    iters = []
    for k in range(n_iter):
        iters.append(f"""
        dm{k} AS (
          SELECT coalesce(sum(trust), 0) AS m
          FROM t{k} t LEFT JOIN deg g ON g.id = t.id
          WHERE g.id IS NULL
        ),
        t{k + 1} AS (
          SELECT n.id, n.sv,
                 (1 - 0.85) * n.sv
                 + 0.85 * (coalesce(c.contrib, 0)
                           + (SELECT m FROM dm{k}) * n.sv) AS trust
          FROM tvec n
          LEFT JOIN (
            SELECT e.dst AS id, sum(t.trust / g.outd) AS contrib
            FROM dedges e
            JOIN t{k} t ON t.id = e.src
            JOIN deg g ON g.id = e.src
            GROUP BY e.dst
          ) c ON c.id = n.id
        )""")
    return f"""
        tns AS (
          SELECT count(*) AS cnt FROM tseeds s JOIN nodes n ON n.id = s.id
        ),
        tvec AS (
          SELECT n.id,
                 CASE WHEN s.id IS NOT NULL
                      THEN 1.0 / (SELECT cnt FROM tns) ELSE 0.0 END AS sv
          FROM nodes n LEFT JOIN tseeds s ON s.id = n.id
        ),
        t0 AS (SELECT id, sv, sv AS trust FROM tvec),
        {",".join(iters)}
    """


def _opic_cte_chain(
    n_rounds: int,
    init_cash: int,
    edges: str = "dedges",
    pfx: str = "",
    s0_from: str | None = None,
    p0_from: str | None = None,
    extra_nodes: str | None = None,
) -> str:
    """CTE chain ({pfx}nodes/nn/deg/s0..s{n}, p0.., res0..) unrolling
    the synchronous integer-cash OPIC recurrence over an existing
    ``{edges}(src, dst)`` CTE — all 64-bit integer, so this mirror is
    exact by construction.  DuckDB sums promote BIGINT→HUGEINT; every
    state column casts back so pandas sees int64 (memory'd pitfall);
    CTEs are MATERIALIZED because plain ones re-inline exponentially.

    Two-phase (on-line extension) use: pass ``pfx`` plus ``s0_from`` /
    ``p0_from`` (a previous chain's final state/pool CTEs) and
    ``extra_nodes`` (the previous node set, so nodes surviving only in
    the old state stay in play); new nodes enter at ``init_cash``.
    """
    iters = []
    for k in range(n_rounds):
        iters.append(f"""
        {pfx}res{k} AS MATERIALIZED (
          SELECT CAST((SELECT pool FROM {pfx}p{k})
                 + coalesce(sum(CASE WHEN g.id IS NULL THEN s.cash
                                     ELSE s.cash % g.outd END), 0) AS BIGINT) AS pool_in
          FROM {pfx}s{k} s LEFT JOIN {pfx}deg g ON g.id = s.id
        ),
        {pfx}p{k + 1} AS MATERIALIZED (
          SELECT CAST(pool_in % (SELECT cnt FROM {pfx}nn) AS BIGINT) AS pool
          FROM {pfx}res{k}
        ),
        {pfx}s{k + 1} AS MATERIALIZED (
          SELECT n.id,
                 CAST(coalesce(c.contrib, 0)
                      + (SELECT pool_in FROM {pfx}res{k}) // (SELECT cnt FROM {pfx}nn)
                      AS BIGINT) AS cash,
                 CAST(s.hist + s.cash AS BIGINT) AS hist
          FROM {pfx}nodes n
          JOIN {pfx}s{k} s ON s.id = n.id
          LEFT JOIN (
            SELECT e.dst AS id, sum(s2.cash // g.outd) AS contrib
            FROM {edges} e
            JOIN {pfx}s{k} s2 ON s2.id = e.src
            JOIN {pfx}deg g ON g.id = e.src
            GROUP BY e.dst
          ) c ON c.id = n.id
        )""")
    node_srcs = f"SELECT src AS id FROM {edges} UNION ALL SELECT dst FROM {edges}"
    if extra_nodes:
        node_srcs += f" UNION ALL SELECT id FROM {extra_nodes}"
    if s0_from:
        s0 = f"""
          SELECT n.id,
                 CAST(coalesce(s.cash, {init_cash}) AS BIGINT) AS cash,
                 CAST(coalesce(s.hist, 0) AS BIGINT) AS hist
          FROM {pfx}nodes n LEFT JOIN {s0_from} s ON s.id = n.id
        """
    else:
        s0 = f"""
          SELECT id, CAST({init_cash} AS BIGINT) AS cash,
                 CAST(0 AS BIGINT) AS hist
          FROM {pfx}nodes
        """
    p0 = (
        f"SELECT pool FROM {p0_from}"
        if p0_from
        else "SELECT CAST(0 AS BIGINT) AS pool"
    )
    return f"""
        {pfx}nodes AS MATERIALIZED (
          SELECT DISTINCT id FROM ({node_srcs})
        ),
        {pfx}nn AS MATERIALIZED (SELECT count(*) AS cnt FROM {pfx}nodes),
        {pfx}deg AS MATERIALIZED (
          SELECT src AS id, count(*) AS outd FROM {edges} GROUP BY src
        ),
        {pfx}s0 AS MATERIALIZED ({s0}),
        {pfx}p0 AS MATERIALIZED ({p0}),
        {",".join(iters)}
    """


def _kcore_cte_chain(n_rounds: int, k: int) -> str:
    """CTE chain (e0..e{n}) unrolling k-core peeling over an existing
    ``raw(src, dst)`` CTE — MATERIALIZED (each round is referenced
    twice; plain CTEs re-inline exponentially in DuckDB 1.0)."""
    parts = ["""
        e0 AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        )"""]
    for r in range(1, n_rounds + 1):
        parts.append(f"""
        d{r} AS MATERIALIZED (
          SELECT id, count(*) AS d FROM (
            SELECT a AS id FROM e{r - 1}
            UNION ALL SELECT b FROM e{r - 1}
          ) GROUP BY id
        ),
        a{r} AS MATERIALIZED (SELECT id FROM d{r} WHERE d >= {k}),
        e{r} AS MATERIALIZED (
          SELECT e.a, e.b FROM e{r - 1} e
          JOIN a{r} x ON x.id = e.a
          JOIN a{r} y ON y.id = e.b
        )""")
    return ",".join(parts)


def _hits_cte_chain(n_iter: int) -> str:
    """CTE chain (nodes/h0/a1..h{n}) unrolling the HITS mutual
    recursion over an existing ``dedges(src, dst)`` CTE — auth from
    PREVIOUS hubs, hub from CURRENT auths, L2-normalized each
    half-step, mirroring operators/linkgraph.hits exactly."""
    iters = []
    for k in range(1, n_iter + 1):
        iters.append(f"""
        a{k}raw AS (
          SELECT n.id, coalesce(s.v, 0.0) AS auth
          FROM nodes n LEFT JOIN (
            SELECT e.dst AS id, sum(h.hub) AS v
            FROM dedges e JOIN h{k - 1} h ON h.id = e.src
            GROUP BY e.dst
          ) s ON s.id = n.id
        ),
        a{k} AS (
          SELECT id, auth / (SELECT sqrt(sum(auth * auth)) FROM a{k}raw) AS auth
          FROM a{k}raw
        ),
        h{k}raw AS (
          SELECT n.id, coalesce(s.v, 0.0) AS hub
          FROM nodes n LEFT JOIN (
            SELECT e.src AS id, sum(a.auth) AS v
            FROM dedges e JOIN a{k} a ON a.id = e.dst
            GROUP BY e.src
          ) s ON s.id = n.id
        ),
        h{k} AS (
          SELECT id, hub / (SELECT sqrt(sum(hub * hub)) FROM h{k}raw) AS hub
          FROM h{k}raw
        )""")
    return f"""
        nodes AS (
          SELECT DISTINCT src AS id FROM dedges
          UNION SELECT DISTINCT dst FROM dedges
        ),
        h0 AS (SELECT id, 1.0 AS hub FROM nodes),
        {",".join(iters)}
    """


_JACCARD_PAIRS_SQL = f"""
    WITH n AS (
      SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS sh
      FROM n
    ),
    e AS (SELECT doc_id, unnest(sh) AS s FROM g),
    sizes AS (SELECT doc_id, len(sh) AS n FROM g),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
      FROM e a JOIN e b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(i::DOUBLE / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
    ORDER BY id_a, id_b
"""


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    o["q3_top_orders"] = """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """

    o["broadcast_dim_join"] = """
        SELECT r_name, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """

    o["q5_local_supplier_volume"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """

    o["q18_large_orders"] = """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY 1 HAVING sum(l_quantity) > 300
        )
        GROUP BY 1, 2, 3, 4, 5
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """

    o["doc_length_quantiles"] = """
        SELECT lang, count(*) AS n_docs,
               round(quantile_cont(length(text), 0.5), 4) AS p50,
               round(quantile_cont(length(text), 0.9), 4) AS p90,
               round(quantile_cont(length(text), 0.99), 4) AS p99
        FROM documents GROUP BY lang ORDER BY lang
    """

    # doc_length_quantiles_approx: below the sketch's compression
    # threshold percentile_approx is exact and picks the discrete order
    # statistic — quantile_disc, not quantile_cont (verified at sf0.001,
    # sf0.01 and sf0.1, 15/15 group-quantile cells each)
    o["doc_length_quantiles_approx"] = """
        SELECT lang, count(*) AS n_docs,
               quantile_disc(length(text), 0.5) AS p50,
               quantile_disc(length(text), 0.9) AS p90,
               quantile_disc(length(text), 0.99) AS p99
        FROM documents GROUP BY lang ORDER BY lang
    """

    # events_asof_join: DuckDB's NATIVE ASOF JOIN is the independent
    # oracle for the engine's union+window formulation
    o["events_asof_join"] = """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        views AS (
          SELECT user_id, ts, round(max(value), 4) AS view_value
          FROM events WHERE event_type = 'view' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id, c.ts, v.view_value
        FROM clicks c
        ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        ORDER BY c.event_id
    """

    # events_asof_join_forward: DuckDB ASOF with <= picks the NEAREST
    # at-or-after row — the forward-direction oracle
    o["events_asof_join_forward"] = """
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        views AS (
          SELECT user_id, ts, round(max(value), 4) AS view_value
          FROM events WHERE event_type = 'view' GROUP BY 1, 2
        )
        SELECT c.event_id, c.user_id, c.ts, v.view_value
        FROM clicks c
        ASOF LEFT JOIN views v
          ON c.user_id = v.user_id AND c.ts <= v.ts
        ORDER BY c.event_id
    """

    # range_join_shipments: the oracle is the direct BETWEEN join the
    # bucketized engine plan must reproduce exactly
    o["range_join_shipments"] = """
        WITH pts AS (
          SELECT datediff('day', DATE '1970-01-01', l_shipdate::DATE)
                   AS ship_day,
                 l_quantity
          FROM lineitem
        ),
        iv AS (
          SELECT o_orderkey,
                 datediff('day', DATE '1970-01-01', o_orderdate::DATE)
                   AS win_start,
                 datediff('day', DATE '1970-01-01', o_orderdate::DATE) + 30
                   AS win_end
          FROM orders WHERE o_orderkey <= 320
        )
        SELECT iv.o_orderkey, count(*) AS n_shipped,
               round(sum(pts.l_quantity), 2) AS sum_qty
        FROM pts JOIN iv
          ON pts.ship_day BETWEEN iv.win_start AND iv.win_end
        GROUP BY iv.o_orderkey
        ORDER BY iv.o_orderkey
    """

    o["orders_rollup"] = """
        SELECT year(o_orderdate)::INT AS yr, o_orderstatus,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               GROUPING(year(o_orderdate), o_orderstatus)::BIGINT AS gid
        FROM orders
        GROUP BY ROLLUP (year(o_orderdate), o_orderstatus)
        ORDER BY yr ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
    """

    o["window_topk_orders"] = """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rk
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
          FROM orders
        ) WHERE rk <= 3
        ORDER BY o_custkey, rk
    """

    o["salted_topk_events"] = """
        SELECT event_type, event_id, round(value, 3) AS value, rank
        FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id DESC)
                   AS rank
          FROM events
        ) WHERE rank <= 5
        ORDER BY event_type, rank
    """

    o["salted_distinct_users"] = """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS user_id_distinct
        FROM events GROUP BY event_type ORDER BY event_type
    """

    o["heavy_hitter_tokens"] = f"""
        WITH toks AS (
          SELECT unnest({_TOKS}) AS token FROM documents
        ), tot AS (SELECT count(*) AS total FROM toks)
        SELECT token, CAST(count(*) AS BIGINT) AS cnt,
               round(count(*) / (SELECT total FROM tot), 6) AS fraction
        FROM toks
        GROUP BY token
        HAVING count(*) >= ceil(0.005 * (SELECT total FROM tot))
        ORDER BY cnt DESC, token
    """

    o["hll_distinct_users"] = """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS user_id_distinct
        FROM events GROUP BY event_type ORDER BY event_type
    """

    o["pivot_order_status"] = """
        SELECT year(o_orderdate) AS yr,
               count(*) FILTER (o_orderstatus = 'F') AS n_f,
               count(*) FILTER (o_orderstatus = 'O') AS n_o,
               count(*) FILTER (o_orderstatus = 'P') AS n_p
        FROM orders GROUP BY 1 ORDER BY yr
    """

    o["ordered_group_concat"] = """
        SELECT c_mktsegment, string_agg(c_name, ' ' ORDER BY c_custkey) AS first_names
        FROM (
          SELECT c_mktsegment, c_custkey, c_name,
                 row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_custkey) rn
          FROM customer
        ) WHERE rn <= 5
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """

    o["antijoin_customers_no_orders"] = """
        SELECT c_mktsegment, count(*) AS n_no_orders
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """

    o["union_sections"] = """
        SELECT event_type, count(*) AS n FROM (
          SELECT event_id, event_type FROM events WHERE event_type = 'error'
          UNION ALL
          SELECT event_id, event_type FROM events WHERE value > 9
        ) GROUP BY event_type ORDER BY event_type
    """

    o["conditional_fill"] = """
        SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 50000 THEN 'mid'
                    ELSE 'small' END AS bucket,
               o_orderpriority, count(*) AS n
        FROM orders GROUP BY 1, 2 ORDER BY bucket, o_orderpriority
    """

    o["scalar_functions"] = """
        SELECT p_partkey, md5(lower(p_name)) AS name_md5,
               substr(p_name, 1, 5) AS name_prefix,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               length(p_name) AS name_len
        FROM part ORDER BY p_partkey LIMIT 500
    """

    o["base64_roundtrip"] = """
        SELECT p_partkey, to_base64(encode(p_name)) AS name_b64,
               decode(from_base64(to_base64(encode(p_name)))) AS name_rt
        FROM part ORDER BY p_partkey LIMIT 500
    """

    o["timestamp_normalize"] = """
        SELECT event_type,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS min_ts_str,
               floor(epoch(max(ts)))::BIGINT AS max_ts_epoch,
               count(DISTINCT ts::DATE) AS n_days
        FROM events GROUP BY event_type ORDER BY event_type
    """

    o["freshness_filter"] = """
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        GROUP BY event_type ORDER BY event_type
    """

    o["json_props_extract"] = """
        SELECT event_type,
               round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k,
               max(CAST(props->>'$.k' AS INT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """

    o["url_canonicalize"] = f"""
        SELECT hostname, count(*) AS n_urls,
               count(DISTINCT url) AS n_raw_distinct,
               count(DISTINCT canonical_url) AS n_canonical_distinct
        FROM ({_ORACLE_EVENT_URLS})
        GROUP BY hostname ORDER BY hostname
    """

    o["frontier_schedule"] = f"""
        WITH u AS ({_ORACLE_EVENT_URLS}),
        first AS (
          SELECT * FROM (
            SELECT u.*, row_number() OVER (PARTITION BY canonical_url
                                           ORDER BY ts, event_id) AS rn
            FROM u
          ) WHERE rn = 1
        )
        SELECT hostname, host_seq, canonical_url, event_id FROM (
          SELECT hostname, canonical_url, event_id,
                 row_number() OVER (PARTITION BY hostname
                                    ORDER BY ts, event_id) AS host_seq
          FROM first
        ) WHERE host_seq <= 20
        ORDER BY hostname, host_seq
    """

    # frontier_priority_aging: the same integer clamp/floor replayed in
    # SQL — GREATEST clamps both the negative wait (clock skew must not
    # promote) and the floor; FLOOR over a double is exact at round-count
    # magnitudes.
    o["frontier_priority_aging"] = """
        SELECT o_orderkey AS url_id,
               (o_orderkey % 17) - 4 AS enqueued_round,
               GREATEST(
                 0,
                 (o_orderkey % 4)
                 - CAST(FLOOR(
                     GREATEST(0, 12 - ((o_orderkey % 17) - 4)) / 4.0
                   ) AS BIGINT)
               ) AS effective_priority
        FROM orders WHERE o_orderkey <= 2000
        ORDER BY url_id LIMIT 2000
    """

    # independent derivation: expected fallback-analyzer output per text class
    # (m=1 emits BOTH 上架 and 下架 rows — 'delisting' contains 'listing')
    o["extractor_announcements"] = """
        WITH base AS (
          SELECT p_partkey, p_partkey % 5 AS m,
                 chr((65 + p_partkey % 26)::INT) AS L
          FROM part
        )
        SELECT p_partkey, symbol, action, type, time FROM (
          SELECT p_partkey, 'ALPHA/USDT' AS symbol, '上架' AS action,
                 '现货' AS type, '2025年3月4日' AS time FROM base WHERE m = 0
          UNION ALL SELECT p_partkey, 'BETA/USDT', '上架', '现货',
                 '2025年3月4日' FROM base WHERE m = 0
          UNION ALL SELECT p_partkey, 'ALPHA/USDT', '上架', '现货',
                 '2025年3月4日' FROM base WHERE m = 0
          UNION ALL SELECT p_partkey, 'SYM' || L || '/USDT', '上架', '合约',
                 '2025-5-6' FROM base WHERE m = 1
          UNION ALL SELECT p_partkey, 'SYM' || L || '/USDT', '下架', '合约',
                 '2025-5-6' FROM base WHERE m = 1
          UNION ALL SELECT p_partkey, 'SYM' || L || '-PAIR', '下架', '现货',
                 '时间未明确' FROM base WHERE m = 2
        ) ORDER BY p_partkey
    """

    o["html_text_extract"] = """
        SELECT p_partkey,
               trim(regexp_replace(
                 replace(replace(replace(replace(replace(replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         '<html><head><style>body{color:red}</style>'
                         || '<script>var x=1;</script></head>'
                         || '<body><h1>' || p_name || '</h1><p>Size &amp; brand: '
                         || p_size || ' / ' || p_brand || '</p></body></html>',
                         '<script[^>]*>.*?</script>', ' ', 'isg'),
                       '<style[^>]*>.*?</style>', ' ', 'isg'),
                     '<[^>]+>', ' ', 'sg'),
                   '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                   '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
                 '\\s+', ' ', 'g')) AS text
        FROM part ORDER BY p_partkey LIMIT 500
    """

    o["ssr_json_extract"] = """
        SELECT p_partkey,
               CAST(blob->>'$.props.size' AS INT) AS size,
               blob->>'$.props.brand' AS brand
        FROM (
          SELECT p_partkey,
                 regexp_extract(
                   '<html><script id="__NEXT_DATA__" type="application/json">'
                   || '{"props":{"size":' || p_size || ',"brand":"' || p_brand
                   || '"}}</script></html>',
                   '<script id="__NEXT_DATA__"[^>]*>(.*?)</script>', 1) AS blob
          FROM part
        ) ORDER BY p_partkey LIMIT 500
    """

    # independent derivation (not the same regex): each part contributes
    # exactly its /p{size} and /q{partkey%7} prefixes
    o["robots_parse"] = """
        SELECT p_partkey, prefix FROM (
          SELECT p_partkey, '/p' || p_size AS prefix FROM part
          UNION ALL
          SELECT p_partkey, '/q' || (p_partkey % 7) AS prefix FROM part
        ) ORDER BY p_partkey, prefix LIMIT 1000
    """

    # robots_crawl_delay: independent derivation of the strictest
    # directive — p_size when p_size%3!=0, (p_partkey%7)+0.5 when
    # p_partkey%2=0, max of both when both present, null when neither
    o["robots_crawl_delay"] = """
        SELECT p_partkey,
               round(delay_s, 4) AS delay_s,
               round(greatest(1000.0, coalesce(delay_s * 1000.0, 0.0)),
                     4) AS min_delay_ms
        FROM (
          SELECT p_partkey,
                 CASE
                   WHEN p_size % 3 <> 0 AND p_partkey % 2 = 0
                     THEN greatest(p_size::DOUBLE,
                                   (p_partkey % 7) + 0.5)
                   WHEN p_size % 3 <> 0 THEN p_size::DOUBLE
                   WHEN p_partkey % 2 = 0 THEN (p_partkey % 7) + 0.5
                   ELSE NULL
                 END AS delay_s
          FROM part
        ) ORDER BY p_partkey LIMIT 500
    """

    # robots_rfc_match: same body construction, then an independent
    # RFC 9309 evaluation — rules via regexp_extract_all (positional
    # unnest zip), pattern -> RE2 regex via escape + '*'->'.*' +
    # optional '$' anchor, winner via row_number over (length DESC,
    # allow DESC, pattern DESC) — the engine's struct-max precedence.
    o["robots_rfc_match"] = r"""
        WITH src AS (
          SELECT p_partkey, p_size, p_partkey % 7 AS b, p_partkey % 5 AS c
          FROM part WHERE p_partkey <= 300
        ),
        body AS (
          SELECT p_partkey,
                 'User-agent: *' || chr(10) ||
                 'Disallow: /p' || p_size || '/' || chr(10) ||
                 'Allow: /p' || p_size || '/open' || chr(10) ||
                 'Disallow: /*.j' || b || '$' || chr(10) ||
                 'Allow: /q' || b || '*x' || chr(10) ||
                 'Disallow: /q' || b || chr(10) ||
                 'Allow: /t' || c || chr(10) ||
                 'Disallow: /t' || c || chr(10) ||
                 'Disallow:' || chr(10) AS txt,
                 ['/p' || p_size || '/item' || (p_partkey % 10),
                  '/p' || p_size || '/open/f',
                  '/x' || (p_partkey % 10) || '.j' || b,
                  '/x' || (p_partkey % 10) || '.j' || b || 'z',
                  '/q' || b || 'zzx',
                  '/q' || b || 'zz',
                  '/t' || c || '/y',
                  '/free'] AS paths
          FROM src
        ),
        cand AS (
          SELECT p_partkey, txt, unnest(paths) AS path FROM body
        ),
        rules AS (
          SELECT p_partkey, path,
                 unnest(regexp_extract_all(txt,
                   '(?m)^[ \t]*([Aa]llow|[Dd]isallow):[ \t]*(\S+)', 1))
                   AS kind,
                 unnest(regexp_extract_all(txt,
                   '(?m)^[ \t]*([Aa]llow|[Dd]isallow):[ \t]*(\S+)', 2))
                   AS pattern
          FROM cand
        ),
        rx AS (
          SELECT p_partkey, path, lower(kind) = 'allow' AS allow, pattern,
                 '^' ||
                 replace(
                   regexp_replace(
                     CASE WHEN pattern LIKE '%$'
                          THEN substr(pattern, 1, length(pattern) - 1)
                          ELSE pattern END,
                     '([.^$+?(){}\[\]|\\\\])', '\\\0', 'g'),
                   '*', '.*')
                 || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rex
          FROM rules
        ),
        m AS (
          SELECT p_partkey, path, allow, pattern,
                 row_number() OVER (PARTITION BY p_partkey, path
                   ORDER BY length(pattern) DESC, allow DESC,
                            pattern DESC) AS rn
          FROM rx WHERE regexp_matches(path, rex)
        )
        SELECT c.p_partkey, c.path,
               coalesce(m.allow, TRUE) AS allowed,
               m.pattern AS winner
        FROM cand c
        LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON c.p_partkey = m.p_partkey AND c.path = m.path
        ORDER BY c.p_partkey, c.path LIMIT 2400
    """

    # warc_roundtrip: the oracle never renders or parses WARC at all —
    # it derives each record's fields straight from documents, so a
    # framing bug anywhere in the render→parse loop (mis-sliced
    # payload, wrong byte length, phantom sentinel record) breaks the
    # hash.  strlen = byte length (octet_length twin); md5 over the
    # same UTF-8 bytes on both engines.
    o["warc_roundtrip"] = r"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'qé' || e'\r\n\r\nWARC/1.0\r\n' ||
                           e'WARC-Type: response\r\n' ||
                           e'Content-Length: 3\r\n\r\nxyz\r\n\r\n' ||
                           text
                      ELSE text END AS payload
          FROM documents WHERE doc_id < 500
        )
        SELECT 'http://site' || (doc_id % 50) || '.example/doc/' || doc_id
                 AS target_uri,
               '2025-08-' || printf('%02d', (doc_id % 28) + 1)
                 || 'T00:00:00Z' AS warc_date,
               strlen(payload) AS content_length,
               md5(payload) AS payload_md5
        FROM src
        ORDER BY target_uri LIMIT 1000
    """

    # sitemap_index_expand: expected children derived directly (no XML
    # parsing) — sm-a always with its timestamp, sm-b always
    # lastmod-NULL, sm-c only when p_partkey % 3 <> 0 (the empty-loc
    # branch contributes nothing).
    o["sitemap_index_expand"] = """
        SELECT host, sitemap_url, CAST(lm AS TIMESTAMP) AS lastmod
        FROM (
          SELECT 'h' || p_partkey || '.example' AS host,
                 'https://h' || p_partkey || '.example/sm-a.xml'
                   AS sitemap_url,
                 '2025-08-' || printf('%02d', (p_partkey % 28) + 1)
                   || 'T00:00:00Z' AS lm
          FROM part WHERE p_partkey <= 400
          UNION ALL
          SELECT 'h' || p_partkey || '.example',
                 'https://h' || p_partkey || '.example/sm-b.xml',
                 NULL
          FROM part WHERE p_partkey <= 400
          UNION ALL
          SELECT 'h' || p_partkey || '.example',
                 'https://h' || p_partkey || '.example/sm-c'
                   || (p_partkey % 9) || '.xml',
                 '2025-01-' || printf('%02d', (p_partkey % 28) + 1)
          FROM part WHERE p_partkey <= 400 AND p_partkey % 3 <> 0
        ) ORDER BY host, sitemap_url LIMIT 2000
    """

    # sitemap_discovery_chain: survivors enumerated directly — leaf
    # sm-c and page u2 are stale (pre-watermark lastmod) and must never
    # appear; sm-d exists only for k%4==0 hosts (second Sitemap: line).
    o["sitemap_discovery_chain"] = """
        WITH ks AS (
          SELECT p_partkey AS k FROM part WHERE p_partkey <= 200
        ),
        leaves AS (
          SELECT k, 'sm-a' AS leaf FROM ks
          UNION ALL SELECT k, 'sm-b' FROM ks
          UNION ALL SELECT k, 'sm-d' FROM ks WHERE k % 4 = 0
        ),
        urls AS (
          SELECT k, leaf, 'u1' AS u,
                 TIMESTAMP '2025-07-15 00:00:00' AS lastmod
          FROM leaves
          UNION ALL
          SELECT k, leaf, 'u3', NULL FROM leaves
        )
        SELECT 'h' || k || '.example' AS host,
               'https://h' || k || '.example/' || leaf || '/' || u AS url,
               lastmod
        FROM urls ORDER BY host, url LIMIT 3000
    """

    # warc_gz_roundtrip: gzip framing must be invisible — the oracle
    # is warc_roundtrip's, verbatim.
    o["warc_gz_roundtrip"] = o["warc_roundtrip"]

    # warc_cdx_index: offsets derived ANALYTICALLY — each record's byte
    # length is reconstructed in SQL (same template, strlen = bytes),
    # offset = window sum of preceding records in the file's (uri,
    # date) render order.  Byte-exact layout equivalence, no parsing.
    # warc_wet_extract: the oracle never touches WARC — it rebuilds the
    # HTML wrap and replays the html_to_text regex chain (the
    # html_text_extract oracle's, verbatim) straight off documents, so
    # a drift anywhere in render→parse→text-extract→conversion-frame→
    # re-parse breaks length or digest.  strlen = BYTE length (the é
    # and any multi-byte text chars force octet counting).
    o["warc_wet_extract"] = r"""
        WITH src AS (
          SELECT doc_id,
                 trim(regexp_replace(
                   replace(replace(replace(replace(replace(replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           '<html><head><style>h1{color:red}</style>'
                           || '<script>track(1);</script></head>'
                           || '<body><h1>Doc ' || doc_id || '</h1><p>'
                           || text || ' &amp; fin é</p></body></html>',
                           '<script[^>]*>.*?</script>', ' ', 'isg'),
                         '<style[^>]*>.*?</style>', ' ', 'isg'),
                       '<[^>]+>', ' ', 'sg'),
                     '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                     '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '),
                   '\s+', ' ', 'g')) AS wtext
          FROM documents WHERE doc_id < 500
        )
        SELECT 'conversion' AS warc_type,
               'http://site' || (doc_id % 50) || '.example/doc/' || doc_id
                 AS target_uri,
               '2025-08-' || printf('%02d', (doc_id % 28) + 1)
                 || 'T00:00:00Z' AS warc_date,
               strlen(wtext) AS content_length,
               md5(wtext) AS text_md5
        FROM src ORDER BY target_uri LIMIT 1000
    """

    o["warc_cdx_index"] = r"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN 'qé' || e'\r\n\r\nWARC/1.0\r\n' ||
                           e'WARC-Type: response\r\n' ||
                           e'Content-Length: 3\r\n\r\nxyz\r\n\r\n' ||
                           text
                      ELSE text END AS payload
          FROM documents WHERE doc_id < 500
        ),
        rec AS (
          SELECT doc_id % 7 AS file_id,
                 'http://site' || (doc_id % 50) || '.example/doc/'
                   || doc_id AS uri,
                 'site' || (doc_id % 50) || '.example' AS host,
                 '/doc/' || doc_id AS path,
                 '2025-08-' || printf('%02d', (doc_id % 28) + 1)
                   || 'T00:00:00Z' AS dt,
                 payload
          FROM src
        ),
        rendered AS (
          SELECT *,
                 e'WARC/1.0\r\n' ||
                 e'WARC-Type: response\r\n' ||
                 'WARC-Target-URI: ' || uri || e'\r\n' ||
                 'WARC-Date: ' || dt || e'\r\n' ||
                 'WARC-Record-ID: <urn:md5:' || md5(uri || '|' || dt)
                   || e'>\r\n' ||
                 'Content-Length: ' || strlen(payload) || e'\r\n\r\n' ||
                 payload || e'\r\n\r\n' AS rec
          FROM rec
        ),
        placed AS (
          SELECT *,
                 strlen(rec) AS rec_length,
                 CAST(coalesce(sum(strlen(rec)) OVER (
                   PARTITION BY file_id ORDER BY uri, dt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS rec_offset
          FROM rendered
        )
        SELECT array_to_string(list_reverse(string_split(host, '.')), ',')
                 || ')' || path AS urlkey,
               regexp_replace(dt, '[^0-9]', '', 'g') AS cdx_ts,
               uri AS original,
               md5(payload) AS digest,
               file_id, rec_offset, rec_length
        FROM placed
        ORDER BY urlkey, cdx_ts LIMIT 1000
    """

    # warc_revisit_dedup: independent derivation — no WARC at all.
    # Canonical capture per payload group via row_number over
    # (uri, date) (the engine's min-struct), revisit rows point at the
    # group's first_value and carry length 0.
    o["warc_revisit_dedup"] = r"""
        WITH src AS (
          SELECT 'http://site' || (doc_id % 50) || '.example/doc/'
                   || doc_id AS uri,
                 '2025-08-' || printf('%02d', (doc_id % 28) + 1)
                   || 'T00:00:00Z' AS dt,
                 'doc body ' || (doc_id - doc_id % 3) || ' é' AS payload
          FROM documents WHERE doc_id < 500
        ),
        ranked AS (
          SELECT *,
                 row_number() OVER w AS rn,
                 first_value(uri) OVER w AS canon
          FROM src
          WINDOW w AS (PARTITION BY payload ORDER BY uri, dt)
        )
        SELECT uri AS target_uri,
               CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END
                 AS warc_type,
               CASE WHEN rn = 1 THEN NULL ELSE canon END AS refers_to,
               CASE WHEN rn = 1 THEN strlen(payload) ELSE 0 END
                 AS content_length
        FROM ranked
        ORDER BY target_uri LIMIT 1000
    """

    # robots_group_select: same body construction, then a STRUCTURALLY
    # independent group reconstruction — explode to numbered lines,
    # group id = running count of User-agent lines not preceded by one
    # (lag window), agents/rules aggregated per group, selection =
    # agent-named groups merged else the '*' groups, then the same
    # longest/allow/lexicographic precedence as robots_rfc_match.
    o["robots_group_select"] = r"""
        WITH src AS (
          SELECT p_partkey, p_size AS k1, p_partkey % 7 AS k2,
                 p_partkey % 5 AS k3,
                 ['alpha','beta','gamma','nobody'][(p_partkey % 4) + 1]
                   AS agent
          FROM part WHERE p_partkey <= 300
        ),
        body AS (
          SELECT p_partkey, agent,
                 'Disallow: /pre' || chr(10) ||
                 'User-agent: alpha' || chr(10) ||
                 'Disallow: /own' || k1 || chr(10) ||
                 'User-agent: beta' || chr(10) ||
                 'User-agent: gamma' || chr(10) ||
                 'Disallow: /shared' || k2 || chr(10) ||
                 'Allow: /shared' || k2 || '/pub' || chr(10) ||
                 'User-agent: *' || chr(10) ||
                 'Disallow: /star' || k3 || chr(10) ||
                 'User-agent: alpha' || chr(10) ||
                 'Allow: /own' || k1 || '/pub' || chr(10) AS txt,
                 ['/own' || k1 || '/x',
                  '/own' || k1 || '/pub/f',
                  '/shared' || k2 || '/x',
                  '/shared' || k2 || '/pub/f',
                  '/star' || k3 || '/x',
                  '/pre/x',
                  '/free'] AS paths
          FROM src
        ),
        lines AS (
          SELECT p_partkey,
                 unnest(string_split(txt, chr(10))) AS line,
                 generate_subscripts(string_split(txt, chr(10)), 1) AS i
          FROM body
        ),
        marked AS (
          SELECT *, regexp_matches(line, '^[Uu]ser-[Aa]gent:') AS is_ua
          FROM lines
        ),
        lagged AS (
          SELECT *,
                 coalesce(lag(is_ua) OVER
                   (PARTITION BY p_partkey ORDER BY i), FALSE) AS prev_ua
          FROM marked
        ),
        grp AS (
          SELECT *,
                 sum(CASE WHEN is_ua AND NOT prev_ua
                     THEN 1 ELSE 0 END) OVER
                   (PARTITION BY p_partkey ORDER BY i) AS gid
          FROM lagged
        ),
        agents AS (
          SELECT p_partkey, gid,
                 list(lower(regexp_extract(line,
                   '^[Uu]ser-[Aa]gent:[ \t]*(\S+)', 1))) AS ags
          FROM grp WHERE is_ua GROUP BY p_partkey, gid
        ),
        sel AS (
          SELECT b.p_partkey, a.gid
          FROM body b JOIN agents a ON b.p_partkey = a.p_partkey
          WHERE list_contains(a.ags, b.agent)
        ),
        chosen AS (
          SELECT p_partkey, gid FROM sel
          UNION ALL
          SELECT b.p_partkey, a.gid
          FROM body b JOIN agents a ON b.p_partkey = a.p_partkey
          WHERE list_contains(a.ags, '*')
            AND NOT EXISTS (SELECT 1 FROM sel
                            WHERE sel.p_partkey = b.p_partkey)
        ),
        rules AS (
          SELECT g.p_partkey,
                 lower(regexp_extract(g.line,
                   '^[ \t]*([Aa]llow|[Dd]isallow):', 1)) = 'allow'
                   AS allow,
                 regexp_extract(g.line,
                   '^[ \t]*(?:[Aa]llow|[Dd]isallow):[ \t]*(\S+)', 1)
                   AS pattern
          FROM grp g JOIN chosen c
            ON g.p_partkey = c.p_partkey AND g.gid = c.gid
          WHERE regexp_matches(g.line,
                  '^[ \t]*([Aa]llow|[Dd]isallow):[ \t]*\S')
        ),
        cand AS (
          SELECT p_partkey, agent, unnest(paths) AS path FROM body
        ),
        rx AS (
          SELECT p_partkey, allow, pattern,
                 '^' ||
                 replace(
                   regexp_replace(
                     CASE WHEN pattern LIKE '%$'
                          THEN substr(pattern, 1, length(pattern) - 1)
                          ELSE pattern END,
                     '([.^$+?(){}\[\]|\\\\])', '\\\0', 'g'),
                   '*', '.*')
                 || CASE WHEN pattern LIKE '%$' THEN '$' ELSE '' END AS rex
          FROM rules
        ),
        m AS (
          SELECT c.p_partkey, c.path, r.allow, r.pattern,
                 row_number() OVER (PARTITION BY c.p_partkey, c.path
                   ORDER BY length(r.pattern) DESC, r.allow DESC,
                            r.pattern DESC) AS rn
          FROM cand c JOIN rx r ON c.p_partkey = r.p_partkey
          WHERE regexp_matches(c.path, r.rex)
        )
        SELECT c.p_partkey, c.agent, c.path,
               coalesce(m.allow, TRUE) AS allowed,
               m.pattern AS winner
        FROM cand c
        LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON c.p_partkey = m.p_partkey AND c.path = m.path
        ORDER BY c.p_partkey, c.path LIMIT 2400
    """

    # doc_decontamination: same normalized 8-grams in DuckDB (string
    # join — the engine joins on xxhash64 of the same strings)
    _G8 = " || ' ' || ".join(f"toks[i+{j}]" for j in range(8))
    o["doc_decontamination"] = f"""
        WITH n AS (
          SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
        ),
        g AS (
          SELECT doc_id,
                 unnest(list_distinct([{_G8}
                   for i in range(1, greatest(len(toks) - 8 + 1, 0) + 1)])) AS s
          FROM n
        ),
        ev AS (SELECT * FROM g WHERE doc_id % 29 = 0),
        tr AS (SELECT * FROM g WHERE doc_id % 29 <> 0)
        SELECT tr.doc_id,
               count(DISTINCT tr.s) AS n_shared_grams,
               count(DISTINCT ev.doc_id) AS n_eval_docs
        FROM tr JOIN ev ON tr.s = ev.s
        GROUP BY tr.doc_id ORDER BY tr.doc_id
    """

    # doc_pii_scrub: identical injection + the same Java/RE2-portable
    # patterns replayed with DuckDB's regexp functions
    _EM = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _PH = r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4,8}"
    o["doc_pii_scrub"] = f"""
        SELECT doc_id,
               len(regexp_extract_all(t, '{_EM}')) AS n_emails,
               len(regexp_extract_all(t, '{_PH}')) AS n_phones,
               regexp_replace(
                 regexp_replace(t, '{_EM}', '[EMAIL]', 'g'),
                 '{_PH}', '[PHONE]', 'g') AS scrubbed
        FROM (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' contact user' || doc_id || '@mail-'
                         || (doc_id % 7) || '.example.org now'
                    ELSE '' END
                 || CASE WHEN doc_id % 4 = 0
                    THEN ' call +1 555 10'
                         || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                    ELSE '' END AS t
          FROM documents
        ) ORDER BY doc_id
    """

    # doc_repetition_stats: relational token/bigram modes in DuckDB
    o["doc_repetition_stats"] = f"""
        WITH toks AS (
          SELECT doc_id AS id, unnest({_TOKS}) AS t FROM documents
        ),
        uni AS (
          SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_c,
                 count(*) AS n_distinct
          FROM (SELECT id, t, count(*) AS c FROM toks GROUP BY 1, 2)
          GROUP BY id
        ),
        bigs AS (
          SELECT id, max(c) AS top_big_c,
                 CAST(sum(c) AS BIGINT) AS n_bigrams FROM (
            SELECT doc_id AS id, b, count(*) AS c FROM (
              SELECT doc_id,
                     unnest([toks[i] || ' ' || toks[i+1]
                             for i in range(1, greatest(len(toks) - 1, 0) + 1)]) AS b
              FROM (SELECT doc_id, string_split({_NORM}, ' ') AS toks
                    FROM documents)
            ) GROUP BY 1, 2
          ) GROUP BY id
        )
        SELECT u.id, u.n_tokens,
               round(u.top_c / u.n_tokens, 6) AS top_token_frac,
               round(coalesce(b.top_big_c / b.n_bigrams, 0.0), 6)
                 AS top_bigram_frac,
               round(u.n_distinct / u.n_tokens, 6) AS distinct_ratio
        FROM uni u LEFT JOIN bigs b USING (id) ORDER BY u.id
    """

    # doc_pack_sequences: the chunked running sum must equal the plain
    # window cumsum; pack = floor((cumsum - n_tokens) / budget)
    o["doc_pack_sequences"] = f"""
        SELECT doc_id, n_tokens,
               CAST(floor((c - n_tokens) / 2048.0) AS BIGINT) AS pack_id
        FROM (
          SELECT doc_id, len({_TOKS}) AS n_tokens,
                 sum(len({_TOKS})) OVER (ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM documents
        ) ORDER BY doc_id
    """

    o["doc_token_stats"] = f"""
        SELECT lang, count(*) AS n_docs,
               round(avg(len({_TOKS})), 4) AS avg_tokens,
               max(len({_TOKS})) AS max_tokens
        FROM documents GROUP BY lang ORDER BY lang
    """

    # doc_unigram_logprob: replay the self-trained unigram model — both
    # engines use natural log and IEEE doubles; round(4) absorbs
    # summation-order ulps (same convention as the other avg oracles)
    o["doc_unigram_logprob"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT sum(c) AS n_total FROM freq)
        SELECT doc_id, count(*) AS n_tokens,
               round(avg(ln(n_total) - ln(c)), 4) AS avg_neg_logprob
        FROM toks JOIN freq USING (tok) CROSS JOIN total
        GROUP BY doc_id ORDER BY doc_id LIMIT 500
    """

    # doc_bigram_logprob: positional self-join replaces the engine's
    # lag window; λ=0.5 is binary-exact; round(4) absorbs
    # summation-order ulps (house convention)
    o["doc_bigram_logprob"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok,
                 generate_subscripts({_TOKS}, 1) AS pos
          FROM documents
        ),
        big AS (
          SELECT a.doc_id, a.tok AS prev, b.tok AS tok
          FROM toks a JOIN toks b
            ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ),
        freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT CAST(sum(c) AS DOUBLE) AS n_total FROM freq),
        bfreq AS (
          SELECT prev, tok, count(*) AS cb FROM big GROUP BY prev, tok
        )
        SELECT big.doc_id, count(*) AS n_bigrams,
               round(avg(-ln(
                 0.5 * cb::DOUBLE / fp.c::DOUBLE
                 + 0.5 * ft.c::DOUBLE / n_total
               )), 4) AS avg_neg_logprob
        FROM big
        JOIN bfreq USING (prev, tok)
        JOIN freq fp ON fp.tok = big.prev
        JOIN freq ft ON ft.tok = big.tok
        CROSS JOIN total
        GROUP BY big.doc_id ORDER BY big.doc_id LIMIT 500
    """

    o["doc_lang_id"] = f"""
        SELECT lang,
               CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END AS lang_pred,
               count(*) AS n
        FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred
    """

    o["doc_stopword_ratio"] = f"""
        SELECT doc_id, round({_STOP_RATIO}, 6) AS stop_ratio
        FROM documents ORDER BY doc_id LIMIT 500
    """

    _MTL = (
        f"CASE WHEN len({_TOKS}) > 0 THEN "
        f"list_sum(list_transform({_TOKS}, t -> length(t)))::DOUBLE / len({_TOKS}) "
        "ELSE 0.0 END"
    )
    _PUNCT = (
        "CASE WHEN length(text) > 0 THEN "
        "length(regexp_replace(text, '[^\\.,;:!\\?''\"()\\-]', '', 'g'))::DOUBLE "
        "/ length(text) ELSE 0.0 END"
    )
    o["doc_quality"] = f"""
        SELECT doc_id,
               round(
                 least(({_STOP_RATIO}) * 4, 1.0) * 0.4
                 + (CASE WHEN ({_MTL}) >= 3 AND ({_MTL}) <= 10
                         THEN 1.0 ELSE 0.0 END) * 0.3
                 + greatest(0.0, 1 - ({_PUNCT}) * 5) * 0.2
                 + least(len({_TOKS}) / 20.0, 1.0) * 0.1,
               6) AS quality
        FROM documents ORDER BY doc_id LIMIT 500
    """

    # corpus_curation: the composed pipeline (quality ≥ 0.5 AND lang 'en'
    # AND exact-dedup representative); md5 stands in for the engine's
    # xxhash-based fingerprint — same normalization, same groups.
    o["corpus_curation"] = f"""
        WITH scored AS (
          SELECT doc_id, text,
                 round(
                   least(({_STOP_RATIO}) * 4, 1.0) * 0.4
                   + (CASE WHEN ({_MTL}) >= 3 AND ({_MTL}) <= 10
                           THEN 1.0 ELSE 0.0 END) * 0.3
                   + greatest(0.0, 1 - ({_PUNCT}) * 5) * 0.2
                   + least(len({_TOKS}) / 20.0, 1.0) * 0.1,
                 6) AS quality,
                 CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END
                   AS lang_pred
          FROM documents
        ),
        kept AS (
          SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'
        ),
        reps AS (
          SELECT md5({_NORM}) AS fp, min(doc_id) AS rep_id
          FROM kept GROUP BY 1
        )
        SELECT k.doc_id, k.quality
        FROM kept k JOIN reps r ON k.doc_id = r.rep_id
        ORDER BY k.doc_id
    """

    # corpus_curation_neardup: the same gates, then transitive closure
    # over exact-Jaccard pairs OF THE GATED SUBSET (recursive CTE — the
    # dedup_clusters pattern) and one representative + cluster size per
    # component.  The engine side generates candidates with MinHash-LSH;
    # candidate generation is per-doc, so subset recall ≥ the full-corpus
    # recall already verified hash-green for dedup_minhash_lsh.
    o["corpus_curation_neardup"] = f"""
        WITH RECURSIVE scored AS (
          SELECT doc_id, text,
                 round(
                   least(({_STOP_RATIO}) * 4, 1.0) * 0.4
                   + (CASE WHEN ({_MTL}) >= 3 AND ({_MTL}) <= 10
                           THEN 1.0 ELSE 0.0 END) * 0.3
                   + greatest(0.0, 1 - ({_PUNCT}) * 5) * 0.2
                   + least(len({_TOKS}) / 20.0, 1.0) * 0.1,
                 6) AS quality,
                 CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END
                   AS lang_pred
          FROM documents
        ),
        kept AS (
          SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'
        ),
        n AS (
          SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM kept
        ),
        g AS (
          SELECT doc_id,
                 list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS sh
          FROM n
        ),
        ex AS (SELECT doc_id, unnest(sh) AS s FROM g),
        shsizes AS (SELECT doc_id, len(sh) AS nsh FROM g),
        pairs AS (
          SELECT i.id_a, i.id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
            FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
          ) i
          JOIN shsizes sa ON sa.doc_id = i.id_a
          JOIN shsizes sb ON sb.doc_id = i.id_b
          WHERE i.i::DOUBLE / (sa.nsh + sb.nsh - i.i) >= 0.5
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        reach(root, node) AS (
          SELECT doc_id, doc_id FROM kept
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS doc_id, min(node) AS component
          FROM reach GROUP BY root
        ),
        sizes AS (
          SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
        )
        SELECT c.doc_id, k.quality, s.cluster_size
        FROM comp c
        JOIN kept k USING (doc_id)
        JOIN sizes s ON s.component = c.component
        WHERE c.doc_id = c.component
        ORDER BY c.doc_id
    """

    # corpus_curation_packed: the same curation CTE chain, then the
    # window-cumsum pack assignment over the representatives
    # corpus_split_assign: the same gates + closure CTE chain, then the
    # cluster-keyed md5 bucket — every doc of a component must get the
    # component's split, so a single doc landing in the wrong bucket
    # (leakage) breaks the hash.
    o["corpus_split_assign"] = (
        o["corpus_curation_neardup"].split("SELECT c.doc_id")[0]
        + """
        SELECT c.doc_id, c.component,
               CASE CAST(('0x' ||
                      substr(md5(CAST(c.component AS VARCHAR)), 1, 2))
                      AS INT) % 10
                 WHEN 8 THEN 'val'
                 WHEN 9 THEN 'test'
                 ELSE 'train'
               END AS split
        FROM comp c
        ORDER BY c.doc_id
    """
    )

    o["corpus_curation_packed"] = (
        o["corpus_curation_neardup"].split("SELECT c.doc_id")[0]
        + f""", rep AS (
          SELECT c.doc_id, k.text, s.cluster_size
          FROM comp c
          JOIN kept k USING (doc_id)
          JOIN sizes s ON s.component = c.component
          WHERE c.doc_id = c.component
        ),
        t AS (
          SELECT doc_id, cluster_size, len({_TOKS}) AS n_tokens FROM rep
        )
        SELECT doc_id, cluster_size, n_tokens,
               CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) - n_tokens) / 1024.0) AS BIGINT)
                 AS pack_id
        FROM t ORDER BY doc_id
    """
    )

    # doc_dup_span_stats: independent DuckDB derivation — 5-token spans
    # via list slicing (the engine uses a regex-lookahead window + JVM
    # hashing), document frequency by plain count over distinct
    # (doc, span) rows.
    o["doc_dup_span_stats"] = f"""
        WITH n AS (
          SELECT doc_id, string_split({_NORM}, ' ') AS toks FROM documents
        ),
        g AS (
          SELECT doc_id,
                 list_distinct([array_to_string(toks[i:i+4], ' ')
                                for i in range(1, greatest(len(toks) - 4, 0) + 1)]) AS sp
          FROM n
        ),
        e AS (SELECT doc_id, unnest(sp) AS s FROM g),
        dfreq AS (SELECT s, count(*) AS df FROM e GROUP BY s)
        SELECT e.doc_id,
               count(*) AS n_spans,
               count(*) FILTER (d.df >= 2) AS n_dup_spans,
               round(count(*) FILTER (d.df >= 2)::DOUBLE / count(*), 6)
                 AS dup_ratio
        FROM e JOIN dfreq d ON d.s = e.s
        GROUP BY e.doc_id ORDER BY e.doc_id
    """

    # corpus_mix_sample: same modular mix + stop-ratio language rule
    o["corpus_mix_sample"] = f"""
        SELECT doc_id,
               CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END
                 AS lang_pred
        FROM documents
        WHERE (doc_id * 2654435761) % 100 <
              CASE WHEN {_STOP_RATIO} >= 0.08 THEN 50 ELSE 10 END
        ORDER BY doc_id
    """

    # doc_winnow_fingerprints: independent DuckDB winnowing replay —
    # positions via unnest(range), k=8-gram md5, min over a 4-window,
    # complete windows only (k + w - 1 = 11 chars minimum)
    o["doc_winnow_fingerprints"] = f"""
        WITH n AS (
          SELECT doc_id, {_NORM} AS t FROM documents
          WHERE doc_id < 100 AND length({_NORM}) >= 11
        ),
        p AS (
          SELECT doc_id, pos, md5(substr(t, pos::INT, 8)) AS fp,
                 length(t) - 7 AS npos
          FROM (
            SELECT doc_id, t, unnest(range(1, length(t) - 6)) AS pos FROM n
          )
        ),
        wmin AS (
          SELECT doc_id, pos, npos,
                 min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wfp
          FROM p
        )
        SELECT DISTINCT doc_id, wfp AS fp FROM wmin
        WHERE pos <= npos - 3
        ORDER BY doc_id, fp
    """

    # winnow_near_dup_pairs: same winnowing replay over the FULL corpus,
    # then the inverted-index pair join + containment gate (DuckDB's /
    # on BIGINT is float division, matching Spark)
    o["winnow_near_dup_pairs"] = f"""
        WITH n AS (
          SELECT doc_id, {_NORM} AS t FROM documents
          WHERE length({_NORM}) >= 11
        ),
        p AS (
          SELECT doc_id, pos, md5(substr(t, pos::INT, 8)) AS fp,
                 length(t) - 7 AS npos
          FROM (
            SELECT doc_id, t, unnest(range(1, length(t) - 6)) AS pos FROM n
          )
        ),
        wmin AS (
          SELECT doc_id, pos, npos,
                 min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wfp
          FROM p
        ),
        fps AS (
          SELECT DISTINCT doc_id, wfp AS fp FROM wmin WHERE pos <= npos - 3
        ),
        sizes AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY doc_id),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
          GROUP BY 1, 2
          HAVING count(*) >= 5
        )
        SELECT p.id_a, p.id_b, p.n_shared,
               round(p.n_shared / least(sa.n_fp, sb.n_fp), 6) AS containment
        FROM pairs p
        JOIN sizes sa ON sa.doc_id = p.id_a
        JOIN sizes sb ON sb.doc_id = p.id_b
        WHERE round(p.n_shared / least(sa.n_fp, sb.n_fp), 6) >= 0.5
        ORDER BY id_a, id_b
    """

    # Asia/Hong_Kong has been fixed UTC+8 since 1941 — the interval form
    # avoids a DuckDB ICU dependency while matching from_utc_timestamp
    o["hkt_render"] = """
        SELECT event_id,
               strftime(ts + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS ts
        FROM events ORDER BY event_id LIMIT 500
    """

    o["doc_fingerprint"] = f"""
        SELECT source, count(*) AS n,
               count(DISTINCT md5({_NORM})) AS n_distinct_fp,
               min(md5({_NORM})) AS min_fp
        FROM documents GROUP BY source ORDER BY source
    """

    o["dedup_exact"] = f"""
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (PARTITION BY md5({_NORM})
                                            ORDER BY doc_id) AS rn
          FROM (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text FROM documents
          )
        ) WHERE rn = 1 ORDER BY doc_id
    """

    o["dedup_ngram_jaccard"] = _JACCARD_PAIRS_SQL
    # dedup_minhash_lsh: precision is exact (verified Jaccard) and recall at
    # the observed pair distribution (all true pairs ≥0.9) is ~1-1e-20, so the
    # exact-Jaccard oracle is the correct expected output.
    o["dedup_minhash_lsh"] = _JACCARD_PAIRS_SQL

    # dedup_clusters: transitive closure of the same exact-Jaccard pairs
    # via recursive CTE (UNION dedups, so the walk terminates); component
    # = min reachable doc_id, singletons label themselves.
    o["dedup_clusters"] = f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        reach(root, node) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS doc_id, min(node) AS component
          FROM reach GROUP BY root
        )
        SELECT doc_id, component, doc_id = component AS is_representative
        FROM comp ORDER BY doc_id
    """
    # dedup_simhash: approximate candidate generation — rows-only check.

    o["ann_cosine_topk"] = """
        SELECT query_id, neighbor_id, cos, rank FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 round(list_cosine_similarity(q.embedding::DOUBLE[],
                                              c.embedding::DOUBLE[]), 6) AS cos,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[],
                                                         c.embedding::DOUBLE[]), 6) DESC,
                            c.vec_id ASC) AS rank
          FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
          WHERE q.vec_id < 8
        ) WHERE rank <= 5
        ORDER BY query_id, rank
    """
    # ann_lsh_topk: 32-table multiprobe SRP candidates cover the exact
    # top-5 on these embeddings (recall 1.0, re-ranked with the same
    # rounded cosine + tie-breaks) → the exact oracle applies verbatim
    o["ann_lsh_topk"] = o["ann_cosine_topk"]
    # ann_ivf_topk: with the unbiased (hash-ordered) train sample and
    # n_probe=15 of 16 cells, the probed cells cover the exact top-5 at
    # both sf0.001 and sf0.01 (measured; same re-rank + tie-breaks) → the
    # exact oracle applies verbatim (VERDICT r2 item 2)
    o["ann_ivf_topk"] = o["ann_cosine_topk"]
    # ann_ivf_pq_topk: full probes + refine ≫ k → the ADC shortlist
    # covers the true top-5 and the exact re-rank reproduces brute
    # force (verified at sf0.001 + sf0.01, like the LSH/IVF oracles)
    o["ann_ivf_pq_topk"] = o["ann_cosine_topk"]

    o["embedding_near_dups"] = """
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[]), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 6) >= 0.4
        ORDER BY id_a, id_b
    """

    # semantic_dedup: brute-force rounded-cosine pairs (the same 6-dp
    # rounding the engine thresholds on) + recursive-CTE transitive
    # closure; representatives are the min-id per component, sized.
    o["semantic_dedup"] = """
        WITH RECURSIVE pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]), 6) >= 0.4
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        reach(root, node) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS vec_id, min(node) AS component
          FROM reach GROUP BY root
        ),
        sizes AS (
          SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
        )
        SELECT c.vec_id, s.cluster_size
        FROM comp c JOIN sizes s USING (component)
        WHERE c.vec_id = c.component
        ORDER BY c.vec_id
    """

    o["event_tumbling_windows"] = """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """

    o["event_sessionize"] = """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800 OR
                           lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged
        )
        SELECT user_id, session_no::BIGINT AS session_no, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_no
    """

    # event_sessionize_native: same sessionization rule as
    # event_sessionize (new session strictly past the 1800 s gap —
    # session_window is boundary-inclusive), keyed by the session's
    # min ts (== session_window.start)
    o["event_sessionize_native"] = """
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN floor(epoch(ts)) - lag(floor(epoch(ts))) OVER w > 1800 OR
                           lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        numbered AS (
          SELECT user_id, ts, value,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
               round(sum(value), 4) AS sum_value
        FROM numbered GROUP BY user_id, session_no
        ORDER BY user_id, session_start
    """

    # ---- reference shipped corpus ------------------------------------------
    # independent DuckDB reimplementation of main.py:42-95 over the same
    # 674 shipped JSON records (read_json, not the engine's Spark reader)

    _REF_CONSOLIDATED = """
      raw AS (
        SELECT symbol, action, type, time, title, exchange, url,
               release_time, content,
               replace(filename, '/root/reference/', '') AS file
        FROM read_json('/root/reference/output/*/*.json', format='auto',
          filename=true,
          columns={symbol:'VARCHAR',action:'VARCHAR',type:'VARCHAR',
                   time:'VARCHAR',title:'VARCHAR',exchange:'VARCHAR',
                   url:'VARCHAR',release_time:'VARCHAR',content:'VARCHAR'})
      ),
      consolidated AS (
        SELECT release_time,
               CASE WHEN time IS NULL OR length(time) < 10
                    THEN '2025-09-02' ELSE time END AS time,
               exchange, symbol, type, action, title, url, content,
               content AS content_dup, file,
               CASE WHEN time IS NULL OR length(time) < 10
                    THEN '待确定' ELSE '' END AS comments
        FROM raw
        WHERE (time IS NULL OR time <> '待定')
          AND symbol IS NOT NULL AND action IS NOT NULL AND action <> ''
      )
    """

    o["reference_consolidate"] = f"""
        WITH {_REF_CONSOLIDATED}
        SELECT * FROM consolidated
    """

    def _ref_pivot_sql(type_value: str, roster: list[str]) -> str:
        cells = ",\n               ".join(
            f"max(d) FILTER (exchange = '{e}') AS {e}" for e in roster
        )
        return f"""
        WITH {_REF_CONSOLIDATED},
        recent AS (
          SELECT * FROM consolidated
          WHERE time::DATE >= DATE '2025-08-26'
            AND release_time::TIMESTAMP >= TIMESTAMP '2025-08-19 00:00:00'
        ),
        descr AS (
          SELECT time, exchange, release_time, symbol,
                 comments || action || ' ' ||
                 replace(replace(symbol, '/USDT', ''), 'USDT', '') ||
                 chr(10) AS description
          FROM recent
          WHERE type = '{type_value}'
            AND exchange IN ({", ".join(f"'{e}'" for e in roster)})
        ),
        g AS (
          SELECT time, exchange,
                 string_agg(description, ' '
                            ORDER BY release_time, symbol, description) AS d
          FROM descr GROUP BY time, exchange
        )
        SELECT time,
               {cells}
        FROM g GROUP BY time ORDER BY time
        """

    from cex_crawler_spark.operators.aggregate import FUTURES_CEX, SPOT_CEX

    o["reference_pivot_spot"] = _ref_pivot_sql("现货", SPOT_CEX)
    o["reference_pivot_futures"] = _ref_pivot_sql("合约", FUTURES_CEX)

    # crawl_round_sim: the frontier is pure modular arithmetic over
    # range(n) — regenerated inside the SQL itself (no file handoff), with
    # the scheduler's verdict chain as window functions.
    o["crawl_round_sim"] = _sim_oracle_sql()

    # bloom_semijoin_revenue: the oracle is the PLAIN join — the engine's
    # Bloom prefilter must be invisible in the result.
    o["bloom_semijoin_revenue"] = """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_items,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN (SELECT o_orderkey FROM orders
              WHERE o_orderpriority = '1-URGENT') u
          ON l_orderkey = u.o_orderkey
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    # image_caption_curation / phash_hamming_pairs_sim: the sim-images
    # fixture is regenerated inside the SQL (no file handoff); dedup via
    # QUALIFY row_number == groupBy-min semi-join (same canonical row);
    # the Hamming oracle is the ALL-PAIRS brute force the engine's
    # bucketed generator must reproduce exactly.
    o["image_caption_curation"] = f"""
        WITH {_sim_images_sql()},
        gated AS (
          SELECT * FROM sim_images
          WHERE w >= 64 AND h >= 64
            AND greatest(w, h) <= 3 * least(w, h)
            AND fmt IN ('jpeg', 'png', 'webp')
            AND len(string_split(caption, ' ')) >= 5
        ),
        canon AS (
          SELECT * FROM gated
          QUALIFY row_number() OVER (PARTITION BY phash ORDER BY image_id) = 1
        )
        SELECT fmt, COUNT(*) AS n_images,
               round(avg(w), 2) AS avg_w, round(avg(h), 2) AS avg_h,
               CAST(SUM(len(string_split(caption, ' '))) AS BIGINT)
                 AS caption_tokens
        FROM canon GROUP BY fmt ORDER BY fmt
    """

    o["phash_hamming_pairs_sim"] = f"""
        WITH {_sim_images_sql()}
        SELECT a.image_id AS id_a, b.image_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM sim_images a JOIN sim_images b ON a.image_id < b.image_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ORDER BY id_a, id_b
    """

    # recrawl_schedule: CGM estimator replayed in closed form; priorities
    # derive from the UNROUNDED staleness probability on both sides.
    o["recrawl_schedule"] = f"""
        WITH {_sim_history_sql()},
        scored AS (
          SELECT url_id,
                 -ln((n_visits - n_changed + 0.5) / (n_visits + 0.5))
                   / interval_days AS lam,
                 age_days
          FROM sim_history
        ),
        p AS (
          SELECT url_id, lam, 1 - exp(-lam * age_days) AS p_stale
          FROM scored
        )
        SELECT url_id,
               round(lam, 4) + 0.0 AS lambda_hat,
               round(p_stale, 4) + 0.0 AS p_stale,
               CAST(CASE WHEN p_stale > 0.8 THEN 0
                         WHEN p_stale > 0.4 THEN 1
                         ELSE 2 END AS BIGINT) AS recrawl_priority
        FROM p ORDER BY url_id
    """

    # doc_sliding_chunks: DuckDB replays the same token windows via
    # generate_series + clamping list slices.
    o["doc_sliding_chunks"] = f"""
        WITH t AS (
          SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        s AS (
          SELECT doc_id, toks,
                 unnest(generate_series(0, greatest(len(toks) - 1, 0), 96))
                   AS start
          FROM t
        )
        SELECT doc_id,
               CAST(start / 96 AS BIGINT) AS chunk_idx,
               CAST(len(toks[start + 1 : start + 128]) AS BIGINT) AS n_tokens,
               array_to_string(toks[start + 1 : start + 128], ' ')
                 AS chunk_text
        FROM s ORDER BY doc_id, chunk_idx
    """

    # crawl_trap_hosts: template collapse replayed with DuckDB regexes
    # ('g' flag — DuckDB replaces first-only by default, Spark replaces
    # all); top template via the same (n_urls, template) tiebreak.
    o["crawl_trap_hosts"] = f"""
        WITH {_sim_traps_sql()},
        tpl AS (
          SELECT host,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/]*', ''),
                       '[0-9a-fA-F]{{8,}}', 'H', 'g'),
                     '[0-9]+', 'N', 'g'),
                   '=([^&#/]*)', '=V', 'g') AS template
          FROM sim_traps
        ),
        ts AS (
          SELECT host, template, count(*) AS n_urls
          FROM tpl GROUP BY host, template
        ),
        ranked AS (
          SELECT host, template, n_urls,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY n_urls DESC, template DESC) AS rk,
                 sum(n_urls) OVER (PARTITION BY host) AS host_urls,
                 count(*) OVER (PARTITION BY host) AS n_templates
          FROM ts
        )
        SELECT host, CAST(host_urls AS BIGINT) AS n_urls,
               CAST(n_templates AS BIGINT) AS n_templates,
               template AS top_template,
               round(n_urls / host_urls, 4) AS top_share
        FROM ranked
        WHERE rk = 1 AND host_urls >= 100
          AND round(n_urls / host_urls, 4) > 0.5
        ORDER BY host
    """

    # dust_param_rules: the significance fold replayed with DuckDB list
    # lambdas (string_split is 1-indexed; index 2 is NULL when no '=').
    o["dust_param_rules"] = f"""
        WITH {_sim_dust_sql()},
        {_dust_rules_sql("sim_dust")}
        SELECT host, param, n_groups, n_varied_groups, n_conflict_groups,
               irrelevant
        FROM sim_dust_rules ORDER BY host, param
    """

    # dust_url_collapse: pass-1 rules applied back — kept params sorted,
    # bare base when the kept list is empty.
    o["dust_url_collapse"] = f"""
        WITH {_sim_dust_sql()},
        {_dust_rules_sql("sim_dust")},
        strip_rules AS (
          SELECT host, list(param) AS drop_params
          FROM sim_dust_rules WHERE irrelevant GROUP BY host
        ),
        rewritten AS (
          SELECT p.host, p.url,
                 CASE WHEN len(kept) = 0 THEN p.base
                      ELSE p.base || '?' || array_to_string(kept, '&') END
                   AS canonical_url
          FROM (
            SELECT p.*,
                   coalesce(list_sort(list_filter(p.params,
                     x -> NOT list_contains(
                       coalesce(r.drop_params, CAST([] AS VARCHAR[])),
                       string_split(x, '=')[1]))),
                     CAST([] AS VARCHAR[])) AS kept
            FROM sim_dust_parts p
            LEFT JOIN strip_rules r ON p.host = r.host
          ) p
        )
        SELECT host,
               CAST(count(DISTINCT url) AS BIGINT) AS n_raw_urls,
               CAST(count(DISTINCT canonical_url) AS BIGINT)
                 AS n_canonical_urls
        FROM rewritten GROUP BY host ORDER BY host
    """

    # mirror_host_pairs: the containment fold replayed relationally.
    o["mirror_host_pairs"] = f"""
        WITH {_sim_mirror_sql()},
        {_mirror_pairs_sql("sim_mirror")}
        SELECT host_a, host_b, shared, n_a, n_b, is_mirror
        FROM sim_mirror_pairs ORDER BY host_a, host_b
    """

    # mirror_host_clusters: transitive closure over mirror edges —
    # component = min reachable host string (UNION dedups, so the walk
    # terminates despite the undirected cycle).
    o["mirror_host_clusters"] = f"""
        WITH RECURSIVE {_sim_mirror_sql()},
        {_mirror_pairs_sql("sim_mirror")},
        edges AS (
          SELECT host_a AS src, host_b AS dst FROM sim_mirror_pairs
          WHERE is_mirror
          UNION ALL
          SELECT host_b, host_a FROM sim_mirror_pairs WHERE is_mirror
        ),
        reach(root, node) AS (
          SELECT src, src FROM edges
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT root AS host, min(node) AS canonical_host
        FROM reach GROUP BY root ORDER BY host
    """

    # crawl_byte_budget_take: the chunked cumsum replayed as the plain
    # global window (integer bytes — sums exact; DuckDB sum() → HUGEINT,
    # cast back to BIGINT).
    o["crawl_byte_budget_take"] = """
        WITH cand AS (
          SELECT sid AS url_id,
                 (sid * 2654435761) % 3 AS priority,
                 500 + (sid * 48271) % 5000 AS est_bytes
          FROM (SELECT range AS sid FROM range(4000))
        )
        SELECT url_id, priority, est_bytes,
               CAST(sum(est_bytes) OVER w AS BIGINT) AS cum_bytes,
               (sum(est_bytes) OVER w) <= 2500000 AS taken
        FROM cand
        WINDOW w AS (ORDER BY priority, url_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY priority, url_id
    """

    # frontier_alias_collapse: the full composition — DUST rule learning
    # + strip, mirror containment + transitive closure, host rewrite —
    # in one recursive statement over the same building-block CTEs.
    o["frontier_alias_collapse"] = f"""
        WITH RECURSIVE {_sim_alias_sql()},
        {_dust_rules_sql("sim_alias")},
        strip_rules AS (
          SELECT host, list(param) AS drop_params
          FROM sim_alias_rules WHERE irrelevant GROUP BY host
        ),
        rewritten AS (
          SELECT p.host, p.digest, p.url,
                 CASE WHEN len(kept) = 0 THEN p.base
                      ELSE p.base || '?' || array_to_string(kept, '&') END
                   AS canonical_url
          FROM (
            SELECT p.*,
                   coalesce(list_sort(list_filter(p.params,
                     x -> NOT list_contains(
                       coalesce(r.drop_params, CAST([] AS VARCHAR[])),
                       string_split(x, '=')[1]))),
                     CAST([] AS VARCHAR[])) AS kept
            FROM sim_alias_parts p
            LEFT JOIN strip_rules r ON p.host = r.host
          ) p
        ),
        mir AS (SELECT host, digest FROM rewritten),
        {_mirror_pairs_sql("mir")},
        edges AS (
          SELECT host_a AS src, host_b AS dst FROM mir_pairs WHERE is_mirror
          UNION ALL
          SELECT host_b, host_a FROM mir_pairs WHERE is_mirror
        ),
        reach(root, node) AS (
          SELECT src, src FROM edges
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS host, min(node) AS canonical_host
          FROM reach GROUP BY root
        ),
        final AS (
          SELECT coalesce(c.canonical_host, w.host) AS final_host, w.url,
                 'https://' || coalesce(c.canonical_host, w.host)
                   || regexp_replace(w.canonical_url, '^https://[^/]*', '')
                   AS final_url
          FROM rewritten w LEFT JOIN comp c ON w.host = c.host
        )
        SELECT final_host,
               CAST(count(DISTINCT url) AS BIGINT) AS n_raw_urls,
               CAST(count(DISTINCT final_url) AS BIGINT) AS n_final_urls
        FROM final GROUP BY final_host ORDER BY final_host
    """

    # frontier_frontcode: LCP replayed relationally (position explode →
    # first mismatch), SURT key replay as in warc_cdx_index; raw bytes
    # derive from the ORIGINAL key so the identity lcp+len(suffix)==
    # len(key) is checked by construction, not assumed.
    o["frontier_frontcode"] = f"""
        WITH {_sim_traps_sql()},
        keys AS (
          SELECT DISTINCT array_to_string(list_reverse(string_split(
                   regexp_extract(url, '^[a-z]+://([^/]+)', 1), '.')), ',')
                 || ')' || regexp_extract(url, '^[a-z]+://[^/]*(/.*)$', 1)
                   AS urlkey
          FROM sim_traps
        ),
        blocks AS (SELECT substr(urlkey, 1, 12) AS block, urlkey FROM keys),
        headers AS (
          SELECT block, min(urlkey) AS header FROM blocks GROUP BY block
        ),
        j AS (
          SELECT b.block, b.urlkey, h.header,
                 least(length(b.urlkey), length(h.header)) AS n
          FROM blocks b JOIN headers h USING (block)
        ),
        pos AS (
          SELECT block, urlkey, header,
                 unnest(range(1, n + 1)) AS i
          FROM j
        ),
        mism AS (
          SELECT block, urlkey, min(i) - 1 AS fm
          FROM pos
          WHERE substr(urlkey, CAST(i AS INTEGER), 1)
                  <> substr(header, CAST(i AS INTEGER), 1)
          GROUP BY block, urlkey
        ),
        lcp AS (
          SELECT j.block, j.urlkey, j.header, coalesce(m.fm, j.n) AS lcp
          FROM j LEFT JOIN mism m
            ON j.block = m.block AND j.urlkey = m.urlkey
        )
        SELECT block,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(length(urlkey)) AS BIGINT) AS raw_bytes,
               CAST(sum(length(urlkey) - lcp + 2) + min(length(header))
                    AS BIGINT) AS coded_bytes
        FROM lcp GROUP BY block ORDER BY block
    """

    # recrawl_round_plan: CGM staleness + integer aging + window cumsum
    # — the raw-float ladder compares (p_stale > 0.8/0.4) already proved
    # cross-engine stable in recrawl_schedule; aging and bytes are all
    # integer arithmetic.
    o["recrawl_round_plan"] = f"""
        WITH {_sim_history_sql()},
        scored AS (
          SELECT url_id,
                 CAST(substr(url_id, 4, 8) AS BIGINT) AS sid,
                 1 - exp(-(-ln((n_visits - n_changed + 0.5)
                              / (n_visits + 0.5)) / interval_days)
                         * age_days) AS p_stale
          FROM sim_history
        ),
        ladder AS (
          SELECT url_id, sid, p_stale,
                 CAST(CASE WHEN p_stale > 0.8 THEN 0
                           WHEN p_stale > 0.4 THEN 1
                           ELSE 2 END AS BIGINT) AS recrawl_priority
          FROM scored
        ),
        aged AS (
          SELECT *,
                 greatest(0, recrawl_priority
                   - (greatest(0, 6 - (sid * 40503) % 7) // 2))
                   AS priority,
                 500 + (sid * 48271) % 4000 AS est_bytes
          FROM ladder
        ),
        summed AS (
          SELECT url_id, p_stale, recrawl_priority, priority, est_bytes,
                 sum(est_bytes) OVER (
                   ORDER BY priority * 100000 + sid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_bytes
          FROM aged
        )
        SELECT url_id,
               round(p_stale, 4) + 0.0 AS p_stale,
               recrawl_priority,
               CAST(priority AS BIGINT) AS priority,
               CAST(est_bytes AS BIGINT) AS est_bytes,
               CAST(cum_bytes AS BIGINT) AS cum_bytes,
               cum_bytes <= 1500000 AS taken
        FROM summed ORDER BY priority, url_id
    """

    # host_novelty_steering: global first-seen + latest-round rollup
    # replayed relationally; all-integer permille.
    o["host_novelty_steering"] = f"""
        WITH {_sim_novelty_sql()},
        first AS (
          SELECT digest, min(round) AS first_round
          FROM sim_novelty GROUP BY digest
        ),
        per AS (
          SELECT host, round,
                 count(*) AS n_fetched,
                 sum(CASE WHEN round = first_round THEN 1 ELSE 0 END)
                   AS n_novel
          FROM sim_novelty JOIN first USING (digest)
          GROUP BY host, round
        ),
        latest AS (
          SELECT host, max(round) AS latest_round FROM per GROUP BY host
        )
        SELECT p.host,
               CAST(l.latest_round AS BIGINT) AS latest_round,
               CAST(n_fetched AS BIGINT) AS n_fetched,
               CAST(n_novel AS BIGINT) AS n_novel,
               CAST((1000 * n_novel) // n_fetched AS BIGINT)
                 AS novel_permille,
               (n_fetched >= 20 AND (1000 * n_novel) // n_fetched < 200)
                 AS demote
        FROM per p JOIN latest l
          ON p.host = l.host AND p.round = l.latest_round
        ORDER BY p.host
    """

    # crawl_dispatch_timeline: chunked rank replayed as a plain per-host
    # row_number window; all-integer offsets.
    o["crawl_dispatch_timeline"] = """
        WITH cand AS (
          SELECT sid AS okey, printf('h%d', sid % 5) AS host
          FROM (SELECT range AS sid FROM range(3000))
        ),
        pol AS (
          SELECT printf('h%d', h) AS host, (h + 1) * 100 AS min_delay_ms
          FROM (SELECT range AS h FROM range(5))
        ),
        r AS (
          SELECT c.okey, c.host, p.min_delay_ms,
                 row_number() OVER (PARTITION BY c.host ORDER BY c.okey)
                   AS rk
          FROM cand c JOIN pol p USING (host)
        )
        SELECT okey, host,
               CAST(rk AS BIGINT) AS host_rank,
               CAST((rk - 1) * min_delay_ms AS BIGINT) AS dispatch_ms
        FROM r ORDER BY okey
    """

    # crawl_politeness_audit: lag replay + prefix match; h1's every-10th
    # early fetch yields exactly 49 gap violations (the following gap
    # widens back — only the early one is a violation), h2 plants 25
    # /private/ fetches, single-fetch h3 audits NULL min_gap.
    o["crawl_politeness_audit"] = """
        WITH log AS (
          SELECT printf('h%d', k) AS host,
                 CASE WHEN k = 2 AND i % 20 = 0
                      THEN printf('https://h2/private/%d', i)
                      ELSE printf('https://h%d/p/%d', k, i) END AS url,
                 CASE k WHEN 0 THEN i * 200
                        WHEN 1 THEN i * 300
                          - CASE WHEN i % 10 = 0 AND i > 0
                                 THEN 150 ELSE 0 END
                        WHEN 2 THEN i * 100
                        ELSE i * 1000 END AS fetch_ts_ms
          FROM (SELECT range % 4 AS k, range // 4 AS i FROM range(2000))
          WHERE k <> 3 OR i = 0
        ),
        pol AS (
          SELECT * FROM (VALUES
            ('h0', 200, ['/admin/']),
            ('h1', 300, ['/admin/']),
            ('h2', 100, ['/private/']),
            ('h3', 1000, CAST([] AS VARCHAR[]))
          ) AS t(host, min_delay_ms, robots_disallow)
        ),
        g AS (
          SELECT l.host, l.url, l.fetch_ts_ms, p.min_delay_ms,
                 p.robots_disallow,
                 fetch_ts_ms - lag(fetch_ts_ms) OVER (
                   PARTITION BY l.host ORDER BY fetch_ts_ms, url) AS gap,
                 regexp_extract(l.url,
                   '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
          FROM log l JOIN pol p ON l.host = p.host
        )
        SELECT host,
               CAST(count(*) AS BIGINT) AS n_fetches,
               CAST(sum(CASE WHEN gap IS NOT NULL AND gap < min_delay_ms
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_gap_violations,
               CAST(min(gap) AS BIGINT) AS min_gap_ms,
               CAST(sum(CASE WHEN len(list_filter(robots_disallow,
                              pr -> starts_with(path, pr))) > 0
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_robots_violations,
               (sum(CASE WHEN gap IS NOT NULL AND gap < min_delay_ms
                         THEN 1 ELSE 0 END) = 0
                AND sum(CASE WHEN len(list_filter(robots_disallow,
                              pr -> starts_with(path, pr))) > 0
                             THEN 1 ELSE 0 END) = 0) AS compliant
        FROM g GROUP BY host ORDER BY host
    """

    # image_curriculum_phases: the chunked rank replayed as one global
    # row_number over (difficulty, md5, id); all-integer phase split.
    o["image_curriculum_phases"] = f"""
        WITH {_sim_images_sql()},
        d AS (
          SELECT image_id,
                 len(string_split(caption, ' ')) AS difficulty,
                 md5('42:' || image_id) AS key
          FROM sim_images
        ),
        r AS (
          SELECT image_id, difficulty,
                 row_number() OVER (ORDER BY difficulty, key, image_id) - 1
                   AS rk,
                 count(*) OVER () AS total
          FROM d
        )
        SELECT image_id,
               CAST(difficulty AS BIGINT) AS difficulty,
               CAST(rk AS BIGINT) AS curriculum_rank,
               CAST((rk * 3) // total AS BIGINT) AS phase
        FROM r ORDER BY curriculum_rank
    """

    # sitemap_coverage_gap: the same full-outer reconciliation.
    o["sitemap_coverage_gap"] = """
        WITH dec AS (
          SELECT DISTINCT printf('h%d', sid % 4) AS host,
                          printf('u%d', sid // 4) AS url
          FROM (SELECT range AS sid FROM range(240))
        ),
        dis AS (
          SELECT DISTINCT printf('h%d', sid % 4) AS host,
                          printf('u%d', sid // 4 + 20 + sid % 4) AS url
          FROM (SELECT range AS sid FROM range(240))
        ),
        j AS (
          SELECT coalesce(d1.host, d2.host) AS host,
                 d1.url AS du, d2.url AS su
          FROM dec d1 FULL OUTER JOIN dis d2
            ON d1.host = d2.host AND d1.url = d2.url
        )
        SELECT host,
               CAST(sum(CASE WHEN du IS NOT NULL AND su IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS declared_only,
               CAST(sum(CASE WHEN du IS NULL AND su IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS discovered_only,
               CAST(sum(CASE WHEN du IS NOT NULL AND su IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS both
        FROM j GROUP BY host ORDER BY host
    """

    # doc_block_density: the full regexp chain replayed with DuckDB list
    # lambdas (regexp_replace needs the explicit 'g' flag there — Spark
    # replaces globally by default).
    o["doc_block_density"] = r"""
        WITH docs AS (
          SELECT sid AS doc_id,
            '<div><a href="/h">Home</a> <a href="/n">News</a></div>'
            || '<p>'
            || repeat('alpha beta gamma delta epsilon zeta eta theta. ',
                      CAST(2 + sid % 3 AS INTEGER))
            || '</p>'
            || printf('<p>Read the full analysis at <a href="/x">this page'
                      || '</a> for details on topic %d and the surrounding'
                      || ' market context</p>', sid % 50)
            || CASE WHEN sid % 4 = 0 THEN '<p>ok</p>' ELSE '' END
            || '<div><a href="/p">Privacy</a> <a href="/t">Terms</a></div>'
              AS html
          FROM (SELECT range AS sid FROM range(300))
        ),
        blocks AS (
          SELECT doc_id, string_split_regex(
            regexp_replace(regexp_replace(html,
              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
              '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|br|section|'
            || 'article|nav|header|footer)[^>]*>') AS bs
          FROM docs
        ),
        scored AS (
          SELECT doc_id, list_transform(bs, b -> struct_pack(
            t := trim(regexp_replace(regexp_replace(b,
                   '(?s)<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')),
            ll := len(trim(regexp_replace(regexp_replace(
                    coalesce(array_to_string(regexp_extract_all(b,
                      '(?is)<a[^>]*>(.*?)</a>', 1), ' '), ''),
                    '(?s)<[^>]+>', ' ', 'g'), '\s+', ' ', 'g')))
          )) AS sc
          FROM blocks
        ),
        k AS (
          SELECT doc_id,
                 list_filter(sc, s -> len(struct_extract(s, 't')) > 0) AS ne,
                 list_filter(sc, s -> len(struct_extract(s, 't')) >= 25
                   AND struct_extract(s, 'll') * 100
                       <= len(struct_extract(s, 't')) * 30) AS kept
          FROM scored
        )
        SELECT doc_id,
               coalesce(array_to_string(list_transform(kept,
                 s -> struct_extract(s, 't')), ' '), '') AS content,
               CAST(len(ne) AS BIGINT) AS n_blocks,
               CAST(len(kept) AS BIGINT) AS n_kept
        FROM k ORDER BY doc_id
    """

    # robots_policy_delta: both verdict evaluations replayed with list
    # lambdas over VALUES policy dims.
    o["robots_policy_delta"] = """
        WITH fr AS (
          SELECT printf('h%d', sid % 3) AS host,
                 CASE WHEN sid % 5 = 0
                        THEN printf('https://h%d/private/%d', sid % 3, sid)
                      WHEN sid % 5 = 1
                        THEN printf('https://h%d/beta/%d', sid % 3, sid)
                      ELSE printf('https://h%d/p/%d', sid % 3, sid)
                 END AS url
          FROM (SELECT range AS sid FROM range(1200))
        ),
        oldp AS (
          SELECT * FROM (VALUES
            ('h0', ['/private/']), ('h1', ['/private/', '/beta/']),
            ('h2', CAST([] AS VARCHAR[]))) AS t(host, dis)
        ),
        newp AS (
          SELECT * FROM (VALUES
            ('h0', ['/private/', '/beta/']), ('h1', ['/private/']),
            ('h2', CAST([] AS VARCHAR[]))) AS t(host, dis)
        ),
        ev AS (
          SELECT f.host, f.url,
                 regexp_extract(f.url,
                   '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                 o.dis AS od, n.dis AS nd
          FROM fr f
          LEFT JOIN oldp o ON f.host = o.host
          LEFT JOIN newp n ON f.host = n.host
        ),
        v AS (
          SELECT host, url,
                 coalesce(len(list_filter(od,
                   p -> starts_with(path, p))) > 0, FALSE) AS old_blocked,
                 coalesce(len(list_filter(nd,
                   p -> starts_with(path, p))) > 0, FALSE) AS new_blocked
          FROM ev
        )
        SELECT host, url, old_blocked, new_blocked,
               CASE WHEN NOT old_blocked AND new_blocked
                      THEN 'newly_blocked'
                    WHEN old_blocked AND NOT new_blocked
                      THEN 'newly_allowed' END AS delta
        FROM v ORDER BY host, url
    """

    # canonical_link_collapse: both attribute-order regexps + resolve +
    # argmin replay (row_number over (not-self, url)).
    o["canonical_link_collapse"] = """
        WITH pages AS (
          SELECT CASE WHEN v = 0 THEN printf('https://c.com/art/%d', g)
                      WHEN v % 3 <> 0
                        THEN printf('https://c.com/art/%d?ref=%d', g, v)
                      ELSE printf('https://c.com/alone/%d-%d', g, v)
                 END AS url,
                 CASE WHEN v = 0 THEN printf(
                        '<html><link rel="canonical" href="/art/%d">body</html>', g)
                      WHEN v % 3 = 1 THEN printf(
                        '<html><link rel="canonical" href="/art/%d">alias</html>', g)
                      WHEN v % 3 = 2 THEN printf(
                        '<html><link href="https://c.com/art/%d" rel="canonical">alias</html>', g)
                      ELSE '<html>standalone page, no hint</html>'
                 END AS html
          FROM (SELECT range % 40 AS g, range // 40 AS v FROM range(600))
        ),
        h AS (
          SELECT url,
                 coalesce(
                   nullif(regexp_extract(html,
                     '(?is)<link[^>]*rel\\s*=\\s*["'']canonical["''][^>]*href\\s*=\\s*["'']([^"'']+)["'']', 1), ''),
                   nullif(regexp_extract(html,
                     '(?is)<link[^>]*href\\s*=\\s*["'']([^"'']+)["''][^>]*rel\\s*=\\s*["'']canonical["'']', 1), '')
                 ) AS hint,
                 regexp_extract(url, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1)
                   AS origin
          FROM pages
        ),
        t AS (
          SELECT url,
                 CASE WHEN hint IS NULL THEN url
                      WHEN starts_with(hint, '/') THEN origin || hint
                      ELSE hint END AS canonical_target
          FROM h
        ),
        r AS (
          SELECT canonical_target, url,
                 count(*) OVER (PARTITION BY canonical_target) AS n_aliases,
                 row_number() OVER (
                   PARTITION BY canonical_target
                   ORDER BY CASE WHEN url = canonical_target
                                 THEN 0 ELSE 1 END, url) AS rk
          FROM t
        )
        SELECT canonical_target,
               CAST(n_aliases AS BIGINT) AS n_aliases,
               url AS kept_url
        FROM r WHERE rk = 1 ORDER BY canonical_target
    """

    # crawl_conditional_plan: CGM p_stale to the permille grid, then
    # all-integer byte expectations.
    o["crawl_conditional_plan"] = f"""
        WITH {_sim_history_sql()},
        prior AS (
          SELECT url_id, n_visits, n_changed, interval_days, age_days,
                 CAST(substr(url_id, 4, 8) AS BIGINT) % 3 <> 0
                   AS has_validators,
                 2000 + (CAST(substr(url_id, 4, 8) AS BIGINT) * 48271)
                   % 30000 AS content_bytes
          FROM sim_history
        ),
        cand AS (
          SELECT printf('url%08d', sid) AS url_id
          FROM (SELECT range AS sid FROM range(3500))
        ),
        j AS (
          SELECT c.url_id, p.url_id AS purl, p.has_validators,
                 p.content_bytes,
                 CASE WHEN p.url_id IS NOT NULL AND p.has_validators THEN
                   CAST(round((1 - exp(-(-ln((p.n_visits - p.n_changed + 0.5)
                     / (p.n_visits + 0.5)) / p.interval_days)
                     * p.age_days)) * 1000) AS BIGINT)
                 END AS p_permille
          FROM cand c LEFT JOIN prior p ON c.url_id = p.url_id
        )
        SELECT url_id,
               CASE WHEN purl IS NULL THEN 'full_unseen'
                    WHEN has_validators THEN 'conditional'
                    ELSE 'full_refetch' END AS kind,
               p_permille,
               CASE WHEN purl IS NULL THEN 4096
                    WHEN has_validators
                      THEN 300 + (p_permille * content_bytes) // 1000
                    ELSE content_bytes END AS est_bytes
        FROM j ORDER BY url_id
    """

    # sitemap_changefreq_trust: integer rollup + slack-band verdicts.
    o["sitemap_changefreq_trust"] = """
        WITH hist AS (
          SELECT printf('h%d', k) AS host,
                 10 AS n_visits,
                 CASE k WHEN 0 THEN 10
                        WHEN 1 THEN CASE WHEN sid % 50 = k THEN 1 ELSE 0 END
                        WHEN 2 THEN 10
                        WHEN 3 THEN 0
                        ELSE 10 END AS n_changed,
                 1 AS interval_days
          FROM (SELECT range AS sid, range % 5 AS k FROM range(500))
        ),
        dec AS (
          SELECT * FROM (VALUES
            ('h0', 24000), ('h1', 1000), ('h2', 720000),
            ('h3', 24000), ('h4', 0)) AS t(host, declared_hours_permille)
        ),
        roll AS (
          SELECT host,
                 CAST(sum(n_visits) AS BIGINT) AS n_visits,
                 CAST(sum(n_changed) AS BIGINT) AS n_changes,
                 sum(interval_days * n_visits) AS obs_days
          FROM hist GROUP BY host
        ),
        j AS (
          SELECT r.*, d.declared_hours_permille,
                 CASE WHEN n_changes > 0
                      THEN (1000 * 24 * obs_days) // n_changes
                 END AS observed_hours_permille
          FROM roll r JOIN dec d ON r.host = d.host
        )
        SELECT host, n_visits, n_changes,
               CAST(observed_hours_permille AS BIGINT)
                 AS observed_hours_permille,
               CAST(declared_hours_permille AS BIGINT)
                 AS declared_hours_permille,
               CASE WHEN n_visits < 50 THEN 'unjudged'
                    WHEN n_changes = 0 THEN 'overstated'
                    WHEN observed_hours_permille
                         > 4 * declared_hours_permille THEN 'overstated'
                    WHEN 4 * observed_hours_permille
                         < declared_hours_permille THEN 'understated'
                    ELSE 'consistent' END AS verdict
        FROM j ORDER BY host
    """

    # crawl_soft404_screen: direct replay of the (host, digest) rollup.
    o["crawl_soft404_screen"] = """
        WITH pages AS (
          SELECT printf('h%d', k) AS host,
                 printf('https://h%d/u/%d', k, i) AS url,
                 md5(CASE WHEN k = 1 THEN
                        CASE WHEN i < 150 THEN 'tmpl'
                             ELSE printf('real1-%d', i) END
                      WHEN k = 2 AND i < 5 THEN 'popular'
                      ELSE printf('ok%d-%d', k, i) END) AS digest
          FROM (SELECT range % 4 AS k, range // 4 AS i FROM range(1200))
        )
        SELECT host, digest,
               CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
               count(DISTINCT url) >= 20 AS suspect
        FROM (SELECT DISTINCT host, digest, url FROM pages)
        GROUP BY host, digest ORDER BY host, digest
    """

    # webdataset_manifest: shard layout re-derived (the md5 global
    # order), manifest digest via ordered string_agg.
    o["webdataset_manifest"] = f"""
        WITH {_sim_images_sql()},
        ranked AS (
          SELECT image_id, length(caption) AS cap_bytes,
                 row_number() OVER (
                   ORDER BY md5('42:' || image_id), image_id
                 ) - 1 AS rnk
          FROM sim_images
        ),
        s AS (
          SELECT image_id, cap_bytes,
                 rnk // 256 AS shard_id, rnk % 256 AS idx_in_shard
          FROM ranked
        )
        SELECT CAST(shard_id AS BIGINT) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_samples,
               CAST(sum(cap_bytes) AS BIGINT) AS total_bytes,
               md5(string_agg(image_id, chr(10) ORDER BY idx_in_shard))
                 AS manifest_md5
        FROM s GROUP BY shard_id ORDER BY shard_id
    """

    # dedup_incremental_clusters: closure over ALL pairs (batch1 ∪
    # batch2) — equality proves incremental == from-scratch.
    o["dedup_incremental_clusters"] = """
        WITH RECURSIVE b1 AS (
          SELECT (sid % 100) * 10 + (sid // 100) % 10 AS id_a,
                 (sid % 100) * 10
                   + ((sid // 100) + 1 + (sid % 100) % 3) % 10 AS id_b
          FROM (SELECT range AS sid FROM range(800))
        ),
        b2 AS (
          SELECT CASE WHEN sid < 60 THEN sid * 10
                      ELSE 1000 + sid END AS id_a,
                 CASE WHEN sid < 60 THEN (sid + 40) * 10
                      ELSE 1100 + sid END AS id_b
          FROM (SELECT range AS sid FROM range(80))
        ),
        allp AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM allp
          UNION ALL
          SELECT id_b, id_a FROM allp
        ),
        reach(root, node) AS (
          SELECT src, src FROM edges
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT root AS id, CAST(min(node) AS BIGINT) AS component
        FROM reach GROUP BY root ORDER BY id
    """

    # source_overlap_matrix: winnow replay joined to source, then the
    # mirror containment fold (df cap 10, min_shared 5, pct 50).
    o["source_overlap_matrix"] = f"""
        WITH n AS (
          SELECT doc_id, {_NORM} AS t FROM documents
          WHERE length({_NORM}) >= 11
        ),
        p AS (
          SELECT doc_id, pos, md5(substr(t, pos::INT, 8)) AS fp,
                 length(t) - 7 AS npos
          FROM (
            SELECT doc_id, t, unnest(range(1, length(t) - 6)) AS pos FROM n
          )
        ),
        wmin AS (
          SELECT doc_id, pos, npos,
                 min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)
                   AS wfp
          FROM p
        ),
        fps AS (
          SELECT DISTINCT d.source AS host, w.wfp AS digest
          FROM wmin w JOIN documents d ON w.doc_id = d.doc_id
          WHERE w.pos <= w.npos - 3
        ),
        {_mirror_pairs_sql("fps", min_shared=5, min_containment_pct=50, max_hosts_per_digest=10)}
        SELECT host_a AS source_a, host_b AS source_b, shared, n_a, n_b,
               is_mirror AS syndication_suspect
        FROM fps_pairs ORDER BY source_a, source_b
    """

    # frontier_admission: the two chunked ranks as plain windows.
    o["frontier_admission"] = """
        WITH f AS (
          SELECT sid AS okey, printf('h%d', sid % 8) AS host
          FROM (SELECT range AS sid FROM range(2000))
        ),
        r AS (
          SELECT okey, host,
                 row_number() OVER (PARTITION BY host ORDER BY okey)
                   AS hrank
          FROM f
        ),
        g AS (
          SELECT *,
                 hrank <= 200 AS under_host,
                 sum(CASE WHEN hrank <= 200 THEN 1 ELSE 0 END) OVER (
                   ORDER BY okey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grank
          FROM r
        )
        SELECT okey, host, CAST(hrank AS BIGINT) AS host_rank,
               (under_host AND grank <= 1200) AS admitted,
               CASE WHEN NOT under_host THEN 'host_cap'
                    WHEN grank > 1200 THEN 'global_cap' END AS reject_reason
        FROM g ORDER BY okey
    """

    # image_aug_manifest: md5-byte parameter derivation replayed (hex
    # byte k → ('0x'||substr)::INT — the corpus_split_assign trick).
    o["image_aug_manifest"] = f"""
        WITH {_sim_images_sql()},
        m AS (
          SELECT image_id, epoch,
                 md5('42:' || epoch || ':' || image_id) AS h
          FROM sim_images, (SELECT unnest(range(0, 3)) AS epoch)
        )
        SELECT image_id, CAST(epoch AS BIGINT) AS epoch,
               CAST(('0x' || substr(h, 1, 2))::BIGINT % 2 AS BIGINT)
                 AS flip,
               CAST(('0x' || substr(h, 3, 2))::BIGINT % 4 AS BIGINT)
                 AS rot90,
               CAST(800 + (('0x' || substr(h, 5, 2))::BIGINT * 256
                           + ('0x' || substr(h, 7, 2))::BIGINT) % 200
                    AS BIGINT) AS crop_permille,
               CAST(900 + (('0x' || substr(h, 9, 2))::BIGINT * 256
                           + ('0x' || substr(h, 11, 2))::BIGINT) % 200
                    AS BIGINT) AS brightness_permille
        FROM m ORDER BY image_id, epoch
    """

    # crawl_health_windows: time_bucket + the same integer delay fold.
    o["crawl_health_windows"] = """
        WITH att AS (
          SELECT printf('h%d', k) AS host,
                 CAST(to_timestamp(1756400000 + sid * 7) AS TIMESTAMP) AS ts,
                 50 + (sid * 48271) % 400
                    + CASE WHEN k = 3 THEN 2500 ELSE 0 END AS latency_ms,
                 NOT (k = 5 AND sid % 3 = 0) AS ok
          FROM (SELECT range AS sid, range % 6 AS k FROM range(3000))
        ),
        g AS (
          SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
                 host,
                 CAST(count(*) AS BIGINT) AS n_attempts,
                 CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_errors,
                 CAST(sum(latency_ms) // count(*) AS BIGINT)
                   AS mean_latency_ms
          FROM att GROUP BY 1, 2
        )
        SELECT window_start, host, n_attempts, n_errors, mean_latency_ms,
               CAST(least(60000,
                 CASE WHEN n_errors * 10 > n_attempts * 3
                      THEN least(60000, greatest(200, 3 * mean_latency_ms)) * 2
                      ELSE least(60000, greatest(200, 3 * mean_latency_ms))
                 END) AS BIGINT) AS delay_ms
        FROM g ORDER BY window_start, host
    """

    # frontier_url_hygiene: the same structural checks with DuckDB
    # string/list ops; reasons alphabetical via list_sort.
    _params20 = "&".join(f"k{i}=1" for i in range(20))
    o["frontier_url_hygiene"] = f"""
        WITH f AS (
          SELECT CASE k
                   WHEN 0 THEN printf('https://ok.com/a/%d', sid)
                   WHEN 1 THEN printf('mailto:user%d@x.com', sid)
                   WHEN 2 THEN printf('https://u%d@evil.com/p', sid)
                   WHEN 3 THEN 'https://deep.com' || repeat('/s', 30)
                               || CAST(sid AS VARCHAR)
                   WHEN 4 THEN 'https://long.com/p?x=' || repeat('a', 2100)
                               || CAST(sid AS VARCHAR)
                   ELSE 'https://params.com/p?{_params20}&z='
                        || CAST(sid AS VARCHAR)
                 END AS url
          FROM (SELECT range AS sid, range % 6 AS k FROM range(600))
        ),
        c AS (
          SELECT url,
                 regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
                 regexp_extract(url,
                   '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                 CASE WHEN regexp_extract(url, '\\?(.*)$', 1) = ''
                      THEN CAST([] AS VARCHAR[])
                      ELSE string_split(regexp_extract(url, '\\?(.*)$', 1),
                                        '&') END AS params
          FROM f
        ),
        r AS (
          SELECT url,
                 coalesce(list_sort(list_filter([
                   CASE WHEN scheme NOT IN ('http', 'https')
                        THEN 'scheme' END,
                   CASE WHEN regexp_extract(url,
                          '^[a-z][a-z0-9+.-]*://[^/?#]*@', 0) <> ''
                        THEN 'userinfo' END,
                   CASE WHEN length(url) > 2048 THEN 'length' END,
                   CASE WHEN len(string_split(path, '/')) - 1 > 20
                        THEN 'depth' END,
                   CASE WHEN len(params) > 16 THEN 'params' END
                 ], x -> x IS NOT NULL)), CAST([] AS VARCHAR[])) AS rs
          FROM c
        )
        SELECT url, array_to_string(rs, '+') AS reasons,
               len(rs) > 0 AS blocked
        FROM r ORDER BY url
    """

    # crawl_round_report: the whole scheduler-tier composition as plain
    # windows (host rank → global survivor rank → byte cumsum → per-host
    # dispatch rank), then the per-host rollup.
    o["crawl_round_report"] = """
        WITH f AS (
          SELECT printf('h%d', sid % 6) AS host,
                 ((sid * 2654435761) % 3) * 100000 + sid AS okey,
                 400 + (sid * 48271) % 4000 AS est_bytes
          FROM (SELECT range AS sid FROM range(3000))
        ),
        r1 AS (
          SELECT *, row_number() OVER (PARTITION BY host ORDER BY okey)
                      AS hrank
          FROM f
        ),
        r2 AS (
          SELECT *,
                 sum(CASE WHEN hrank <= 300 THEN 1 ELSE 0 END) OVER (
                   ORDER BY okey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS grank
          FROM r1
        ),
        adm AS (
          SELECT host, okey, est_bytes FROM r2
          WHERE hrank <= 300 AND grank <= 1500
        ),
        b AS (
          SELECT *,
                 sum(est_bytes) OVER (
                   ORDER BY okey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
          FROM adm
        ),
        taken AS (SELECT * FROM b WHERE cum <= 2000000),
        tl AS (
          SELECT host, est_bytes,
                 (row_number() OVER (PARTITION BY host ORDER BY okey) - 1)
                   * (CAST(substr(host, 2, 1) AS BIGINT) + 1) * 100
                   AS dispatch_ms
          FROM taken
        ),
        nf AS (SELECT host, count(*) AS n_frontier FROM f GROUP BY host),
        na AS (SELECT host, count(*) AS n_admitted FROM adm GROUP BY host),
        rep AS (
          SELECT host, count(*) AS n_taken,
                 sum(est_bytes) AS bytes_taken,
                 max(dispatch_ms) AS host_finish_ms
          FROM tl GROUP BY host
        )
        SELECT nf.host,
               CAST(n_frontier AS BIGINT) AS n_frontier,
               CAST(n_admitted AS BIGINT) AS n_admitted,
               CAST(n_taken AS BIGINT) AS n_taken,
               CAST(bytes_taken AS BIGINT) AS bytes_taken,
               CAST(host_finish_ms AS BIGINT) AS host_finish_ms
        FROM nf LEFT JOIN na ON nf.host = na.host
        LEFT JOIN rep ON nf.host = rep.host
        ORDER BY nf.host
    """

    # crawl_fetcher_assignment: the md5-prefix worker hash + rollup.
    o["crawl_fetcher_assignment"] = """
        WITH q AS (
          SELECT printf('q%03d', sid) AS queue_key,
                 5 + (sid * 48271) % 120 AS n_urls,
                 (5 + (sid * 48271) % 120) * (100 + (sid % 7) * 50)
                   AS host_finish_ms
          FROM (SELECT range AS sid FROM range(200))
        ),
        w AS (
          SELECT *,
                 ('0x' || substr(md5(queue_key), 1, 4))::BIGINT % 8
                   AS worker
          FROM q
        )
        SELECT CAST(worker AS BIGINT) AS worker,
               CAST(count(*) AS BIGINT) AS n_queues,
               CAST(sum(n_urls) AS BIGINT) AS n_urls,
               CAST(sum(n_urls) * 50 AS BIGINT) AS svc_bound_ms,
               CAST(max(host_finish_ms) AS BIGINT) AS politeness_bound_ms,
               CAST(greatest(sum(n_urls) * 50, max(host_finish_ms))
                    AS BIGINT) AS wall_lower_bound_ms
        FROM w GROUP BY worker ORDER BY worker
    """

    # image_drift_screen: both integer-permille histograms + the
    # full-outer bucket join replayed over the same sim images.
    o["image_drift_screen"] = f"""
        WITH {_sim_images_sql()},
        ref0 AS (
          SELECT fmt, (w * h) // 65536 AS res_tier FROM sim_images
        ),
        cur0 AS (
          SELECT fmt, (w * h) // 65536 AS res_tier
          FROM sim_images
          WHERE (CAST(substr(image_id, 4, 10) AS BIGINT) * 7) % 10 < 3
             OR (fmt = 'jpeg' AND w <= 320)
        ),
        refh AS (
          SELECT fmt, res_tier,
                 (1000 * count(*)) // (SELECT count(*) FROM ref0)
                   AS ref_permille
          FROM ref0 GROUP BY fmt, res_tier
        ),
        curh AS (
          SELECT fmt, res_tier,
                 (1000 * count(*)) // (SELECT count(*) FROM cur0)
                   AS cur_permille
          FROM cur0 GROUP BY fmt, res_tier
        ),
        j AS (
          SELECT coalesce(r.fmt, c.fmt) AS fmt,
                 coalesce(r.res_tier, c.res_tier) AS res_tier,
                 coalesce(r.ref_permille, 0) AS ref_permille,
                 coalesce(c.cur_permille, 0) AS cur_permille
          FROM refh r FULL OUTER JOIN curh c
            ON r.fmt = c.fmt AND r.res_tier = c.res_tier
        )
        SELECT fmt, CAST(res_tier AS BIGINT) AS res_tier,
               CAST(ref_permille AS BIGINT) AS ref_permille,
               CAST(cur_permille AS BIGINT) AS cur_permille,
               CAST(abs(cur_permille - ref_permille) AS BIGINT)
                 AS delta_permille
        FROM j ORDER BY fmt, res_tier
    """

    # domain_rollup: the registrable-domain heuristic replayed on label
    # arrays (negative list indexing == element_at(-k)).
    from cex_crawler_spark.functions.urlnorm import MULTI_SUFFIXES

    _sfx = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    o["domain_rollup"] = f"""
        WITH {_sim_traps_sql()},
        lab AS (
          SELECT host, string_split(lower(host), '.') AS labels FROM sim_traps
        ),
        dom AS (
          SELECT host,
                 CASE WHEN len(labels) >= 3
                           AND list_contains([{_sfx}],
                                             labels[-2] || '.' || labels[-1])
                      THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                      WHEN len(labels) >= 2
                      THEN labels[-2] || '.' || labels[-1]
                      ELSE lower(host) END AS domain
          FROM lab
        )
        SELECT domain, CAST(count(DISTINCT host) AS BIGINT) AS n_hosts,
               count(*) AS n_urls
        FROM dom GROUP BY domain ORDER BY domain
    """

    # crawl_domain_queues: eTLD+1 collapse replayed with the same label
    # CASE; conservative group rollup (min budget / max delay).
    o["crawl_domain_queues"] = f"""
        WITH pol AS (
          SELECT CASE WHEN sid < 20 THEN printf('s%d.spamfarm.com', sid)
                      WHEN sid < 23 THEN ['www.shop.co.uk',
                                          'cdn.shop.co.uk',
                                          'shop.co.uk'][CAST(sid - 19 AS INTEGER)]
                      ELSE printf('solo%d.org', sid) END AS host,
                 100 + sid * 10 AS budget_per_round,
                 200 + sid * 7 AS min_delay_ms
          FROM (SELECT range AS sid FROM range(30))
        ),
        lab AS (
          SELECT *, string_split(lower(host), '.') AS labels FROM pol
        ),
        dom AS (
          SELECT *,
                 CASE WHEN len(labels) >= 3
                           AND list_contains([{_sfx}],
                                             labels[-2] || '.' || labels[-1])
                      THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                      WHEN len(labels) >= 2
                      THEN labels[-2] || '.' || labels[-1]
                      ELSE lower(host) END AS domain
          FROM lab
        ),
        fan AS (
          SELECT domain, count(*) AS n_hosts_on_domain
          FROM dom GROUP BY domain
        ),
        mapped AS (
          SELECT d.host, d.budget_per_round, d.min_delay_ms,
                 f.n_hosts_on_domain,
                 CASE WHEN f.n_hosts_on_domain > 8 THEN d.domain
                      ELSE d.host END AS queue_key
          FROM dom d JOIN fan f ON d.domain = f.domain
        ),
        grp AS (
          SELECT queue_key,
                 count(*) AS n_hosts_on_queue,
                 min(budget_per_round) AS queue_budget_per_round,
                 max(min_delay_ms) AS queue_min_delay_ms
          FROM mapped GROUP BY queue_key
        )
        SELECT m.host, m.queue_key,
               CAST(m.n_hosts_on_domain AS BIGINT) AS n_hosts_on_domain,
               CAST(g.n_hosts_on_queue AS BIGINT) AS n_hosts_on_queue,
               CAST(g.queue_budget_per_round AS BIGINT)
                 AS queue_budget_per_round,
               CAST(g.queue_min_delay_ms AS BIGINT) AS queue_min_delay_ms
        FROM mapped m JOIN grp g ON m.queue_key = g.queue_key
        ORDER BY m.host
    """

    # image_dedup_clusters: brute-force Hamming pairs + recursive-CTE
    # transitive closure (the same shape as dedup_clusters' oracle).
    o["image_dedup_clusters"] = f"""
        WITH RECURSIVE {_sim_images_sql()},
        pairs AS (
          SELECT a.image_id AS id_a, b.image_id AS id_b
          FROM sim_images a JOIN sim_images b ON a.image_id < b.image_id
          WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(root, node) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS id, min(node) AS component
          FROM reach GROUP BY root
        )
        SELECT component AS representative,
               CAST(count(*) AS BIGINT) AS n_members
        FROM comp GROUP BY component ORDER BY representative
    """

    # image_quality_gates: every gate replayed scan-side; the reasons
    # string is concat_ws over NULL-able pieces in ALPHABETICAL order —
    # identical to the engine's array_sort + array_join since gate
    # names are distinct; aspect = one IEEE multiply, no division.
    o["image_quality_gates"] = f"""
        WITH {_sim_images_sql()},
        t AS (
          SELECT image_id, w, h, fmt,
                 CAST(CASE WHEN trim(caption) = '' THEN 0
                      ELSE len(regexp_split_to_array(trim(caption),
                                                     '[ \\t\\n\\r]+'))
                      END AS INTEGER) AS n_caption_tokens
          FROM sim_images
        ),
        r AS (
          SELECT *,
                 concat_ws(',',
                   CASE WHEN fmt NOT IN ('jpeg', 'png', 'webp')
                        THEN 'bad_format' END,
                   CASE WHEN n_caption_tokens > 8
                        THEN 'caption_long' END,
                   CASE WHEN n_caption_tokens < 3
                        THEN 'caption_short' END,
                   CASE WHEN greatest(w, h) > 3.0 * least(w, h)
                        THEN 'extreme_aspect' END,
                   CASE WHEN least(w, h) < 64
                        THEN 'too_small' END) AS reasons
          FROM t
        )
        SELECT image_id, w, h, fmt, n_caption_tokens,
               reasons = '' AS keep, reasons
        FROM r ORDER BY image_id
    """

    # image_caption_dedup: string-keyed replay of the xxhash64-keyed
    # engine groups (fine absent collisions — the line-scrub precedent);
    # same planted spam/repeat captions, same normalization chain.
    o["image_caption_dedup"] = f"""
        WITH {_sim_images_sql()},
        planted AS (
          SELECT image_id, w, h, fmt,
                 CASE WHEN sid % 5 = 0 THEN 'Stock  Photo image'
                      WHEN sid % 7 = 3 THEN printf('repeat cap %d', sid % 97)
                      ELSE caption END AS caption
          FROM (
            SELECT *, CAST(substr(image_id, 4) AS BIGINT) AS sid
            FROM sim_images
          )
        ),
        norm AS (
          SELECT *,
                 lower(trim(regexp_replace(caption, '[ \\t\\n\\r]+', ' ',
                                           'g'))) AS nc
          FROM planted
        ),
        grp AS (
          SELECT nc, CAST(count(*) AS BIGINT) AS n_caption_images,
                 min(image_id) AS canon
          FROM norm GROUP BY nc
        )
        SELECT i.image_id, i.w, i.h, i.fmt, i.caption,
               g.n_caption_images,
               g.n_caption_images > 1 AS caption_deduped
        FROM norm i
        JOIN grp g ON i.nc = g.nc AND i.image_id = g.canon
        WHERE g.n_caption_images < 8
        ORDER BY i.image_id
    """

    # webdataset_shards: the chunked rank replayed as ONE plain global
    # row_number over the identical md5 key — md5 is the only reason the
    # order is re-derivable outside the JVM (the engine docstring's
    # audit property, exercised here).
    o["webdataset_shards"] = f"""
        WITH {_sim_images_sql()},
        ranked AS (
          SELECT image_id, caption,
                 row_number() OVER (
                   ORDER BY md5('42:' || image_id), image_id
                 ) - 1 AS rnk
          FROM sim_images
        )
        SELECT image_id, caption,
               CAST(rnk // 250 AS BIGINT) AS shard_id,
               CAST(rnk % 250 AS BIGINT) AS idx_in_shard
        FROM ranked ORDER BY shard_id, idx_in_shard
    """

    # host_quality_steering: the quality formula (already proven
    # bit-identical in doc_quality) over the same planted junk, then the
    # micro-quality integer rollup — sums are exact integers, so the one
    # division per stat is IEEE-identical across engines.
    o["host_quality_steering"] = f"""
        WITH planted AS (
          SELECT source,
                 CASE WHEN source IN ('src3', 'src7')
                           AND CAST(doc_id AS BIGINT) % 3 <> 0
                      THEN '!!! ??? ### %% ^^' ELSE text END AS text
          FROM documents
        ),
        scored AS (
          SELECT source AS host,
                 round(
                   least(({_STOP_RATIO}) * 4, 1.0) * 0.4
                   + (CASE WHEN ({_MTL}) >= 3 AND ({_MTL}) <= 10
                           THEN 1.0 ELSE 0.0 END) * 0.3
                   + greatest(0.0, 1 - ({_PUNCT}) * 5) * 0.2
                   + least(len({_TOKS}) / 20.0, 1.0) * 0.1,
                 6) AS quality
          FROM planted
        ),
        agg AS (
          SELECT host, count(*) AS n_docs,
                 CAST(sum(CAST(round(quality * 1000000, 0) AS BIGINT))
                      AS BIGINT) AS sum_qi,
                 CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_low
          FROM scored GROUP BY host
        )
        SELECT host, n_docs,
               round(sum_qi / (n_docs * 1000000.0), 4) AS mean_quality,
               round(n_low / n_docs, 4) AS low_share,
               n_docs >= 5 AND n_low / n_docs >= 0.6 AS demote
        FROM agg ORDER BY host
    """

    # ip_politeness_groups: the same fixture + conservative group
    # rollup in plain SQL (integer CASE-derived ips, min/max/count).
    o["ip_politeness_groups"] = """
        WITH hosts AS (
          SELECT printf('h%02d', sid) AS host,
                 CAST(2 + sid % 5 AS INTEGER) AS budget_per_round,
                 CAST(100 * (1 + sid % 7) AS BIGINT) AS min_delay_ms,
                 CASE WHEN sid % 9 = 0 THEN NULL
                      WHEN sid % 4 < 2 THEN printf('10.0.0.%d', sid % 10)
                      ELSE printf('10.1.%d.%d', sid // 7, sid % 7)
                 END AS ip
          FROM (SELECT range AS sid FROM range(60))
        ),
        keyed AS (
          SELECT *, coalesce(ip, host) AS queue_key FROM hosts
        ),
        grp AS (
          SELECT queue_key,
                 CAST(count(*) AS BIGINT) AS n_hosts_on_queue,
                 min(budget_per_round) AS queue_budget_per_round,
                 max(min_delay_ms) AS queue_min_delay_ms
          FROM keyed GROUP BY queue_key
        )
        SELECT k.host, k.queue_key, g.n_hosts_on_queue,
               g.queue_budget_per_round, g.queue_min_delay_ms
        FROM keyed k JOIN grp g USING (queue_key)
        ORDER BY k.host
    """

    # corpus_temperature_mix / _sample: the same thinning + pow(n,0.7)
    # weight grid + largest-remainder window replay (the
    # crawl_budget_allocation oracle pattern) + per-source row_number
    # over the identical md5 key for the materialized sample.
    _TEMP_MIX_CTES = """
        thinned AS (
          SELECT doc_id, source
          FROM documents
          WHERE (CAST(doc_id AS BIGINT) // 20)
                % (1 + CAST(substr(source, 4) AS BIGINT) % 7) = 0
        ),
        w AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(round(pow(count(*), 0.7) * 1000000, 0) AS BIGINT)
                   AS weight
          FROM thinned GROUP BY source
        ),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w),
        q AS (
          SELECT source, n_docs, weight,
                 (200 * weight) // W AS base,
                 (200 * weight) % W AS rem
          FROM w, tot
        ),
        rr AS (SELECT 200 - sum(base) AS r FROM q),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rn
          FROM q
        ),
        alloc AS (
          SELECT source, n_docs, weight,
                 CAST(base + CASE WHEN rn <= (SELECT r FROM rr)
                                  THEN 1 ELSE 0 END AS BIGINT) AS target
          FROM rk
        )
    """
    o["corpus_temperature_mix"] = f"""
        WITH {_TEMP_MIX_CTES}
        SELECT source, n_docs, weight, target,
               least(target, n_docs) AS target_capped
        FROM alloc ORDER BY source
    """

    # corpus_mix_anneal: the same apportionment once per epoch alpha.
    def _anneal_sql(alphas, total=200):
        parts = ["""thinned AS (
          SELECT doc_id, source
          FROM documents
          WHERE (CAST(doc_id AS BIGINT) // 20)
                % (1 + CAST(substr(source, 4) AS BIGINT) % 7) = 0
        )"""]
        selects = []
        for e, a in enumerate(alphas):
            parts.append(f"""w{e} AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(round(pow(count(*), {a}) * 1000000, 0) AS BIGINT)
                   AS weight
          FROM thinned GROUP BY source
        ),
        tot{e} AS (SELECT CAST(sum(weight) AS BIGINT) AS W FROM w{e}),
        q{e} AS (
          SELECT source, n_docs, weight,
                 ({total} * weight) // W AS base,
                 ({total} * weight) % W AS rem
          FROM w{e}, tot{e}
        ),
        rr{e} AS (SELECT {total} - sum(base) AS r FROM q{e}),
        rk{e} AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rn
          FROM q{e}
        ),
        alloc{e} AS (
          SELECT source, n_docs, weight,
                 CAST(base + CASE WHEN rn <= (SELECT r FROM rr{e})
                                  THEN 1 ELSE 0 END AS BIGINT) AS target
          FROM rk{e}
        )""")
            selects.append(
                f"SELECT CAST({e} AS BIGINT) AS epoch, source, n_docs,"
                f" weight, target, least(target, n_docs) AS target_capped"
                f" FROM alloc{e}"
            )
        return (
            "WITH " + ",\n        ".join(parts) + "\n        "
            + "\n        UNION ALL\n        ".join(selects)
            + "\n        ORDER BY epoch, source"
        )

    o["corpus_mix_anneal"] = _anneal_sql([0.5, 0.7, 1.0])

    # sitemap_priority_seed: per-block extraction + the permille ladder.
    o["sitemap_priority_seed"] = """
        WITH maps AS (
          SELECT printf('h%d', sid) AS host,
                 printf('<urlset>'
                   || '<url><loc>https://h%d/a/%d</loc>'
                   || '<priority>1.0</priority>'
                   || '<lastmod>2025-06-01</lastmod></url>'
                   || '<url><loc>https://h%d/b/%d</loc>'
                   || '<priority>0.2</priority></url>'
                   || '<url><loc>https://h%d/c/%d</loc></url>'
                   || '<url><priority>0.9</priority></url>'
                   || '<url><loc>https://h%d/d/%d</loc>'
                   || '<priority>0.55</priority></url>'
                   || '</urlset>',
                   sid, sid, sid, sid, sid, sid, sid, sid) AS xml
          FROM (SELECT range AS sid FROM range(200))
        ),
        blocks AS (
          SELECT host, unnest(regexp_extract_all(xml,
                   '(?s)<url>(.*?)</url>', 1)) AS b
          FROM maps
        ),
        e AS (
          SELECT host,
                 regexp_extract(b, '<loc>\\s*([^<]*?)\\s*</loc>', 1) AS url,
                 nullif(regexp_extract(b,
                   '<lastmod>\\s*([^<]*?)\\s*</lastmod>', 1), '') AS lm,
                 nullif(regexp_extract(b,
                   '<priority>\\s*([0-9.]+)\\s*</priority>', 1), '') AS pr
          FROM blocks
        )
        SELECT host, url,
               CAST(lm AS TIMESTAMP) AS lastmod,
               coalesce(CAST(round(CAST(pr AS DOUBLE) * 1000) AS BIGINT),
                        500) AS priority_permille,
               CAST(CASE
                 WHEN coalesce(CAST(round(CAST(pr AS DOUBLE) * 1000)
                                    AS BIGINT), 500) >= 800 THEN 0
                 WHEN coalesce(CAST(round(CAST(pr AS DOUBLE) * 1000)
                                    AS BIGINT), 500) >= 400 THEN 1
                 ELSE 2 END AS BIGINT) AS priority
        FROM e WHERE url <> '' ORDER BY host, url
    """

    # image_caption_alignment: the same cosine formula (dot / (‖a‖·‖b‖),
    # two separate sqrts — ulp-faithful to the engine's expression) over
    # the integer fixture vectors.
    o["image_caption_alignment"] = """
        WITH p AS (
          SELECT printf('img%06d', sid) AS image_id,
                 [CAST((sid * (j + 1) * 48271) % 9 - 4 AS DOUBLE)
                  for j in range(8)] AS img,
                 CASE WHEN sid % 3 <> 0 THEN
                   [CAST((sid * (j + 1) * 48271) % 9 - 4
                         + CASE WHEN j = 7 THEN 1 ELSE 0 END AS DOUBLE)
                    for j in range(8)]
                 ELSE
                   [CAST((sid * (j + 1) * 69069 + 5) % 9 - 4 AS DOUBLE)
                    for j in range(8)]
                 END AS txt
          FROM (SELECT range AS sid FROM range(3000))
        ),
        c AS (
          SELECT image_id,
                 list_sum([img[i] * txt[i] for i in range(1, 9)])
                   / (sqrt(list_sum([x * x for x in img]))
                      * sqrt(list_sum([x * x for x in txt]))) AS cos
          FROM p
        )
        SELECT image_id,
               CAST(round(cos * 1000) AS BIGINT) AS align_permille,
               round(cos * 1000) >= 280 AS aligned
        FROM c ORDER BY image_id
    """

    # crawl_budget_by_pagerank: the pagerank chain → integer micro-rank
    # host mass → the apportionment window replay.
    o["crawl_budget_by_pagerank"] = f"""
        WITH {_sim_linkgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        {_pagerank_cte_chain(3)}
        , mass AS (
          SELECT printf('h%02d', id % 20) AS host,
                 CAST(sum(CAST(round(rank * 1000000) AS BIGINT))
                      AS BIGINT) AS weight
          FROM r3 GROUP BY 1
        ),
        tot AS (SELECT sum(weight) AS W FROM mass),
        q AS (
          SELECT host, weight,
                 (1000 * weight) // W AS base,
                 (1000 * weight) % W AS rem
          FROM mass, tot
        ),
        rr AS (SELECT 1000 - sum(base) AS r FROM q),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn
          FROM q
        )
        SELECT host, weight,
               CAST(base + CASE WHEN rn <= (SELECT r FROM rr)
                                THEN 1 ELSE 0 END AS BIGINT) AS budget
        FROM rk ORDER BY host
    """

    # frontier_outlink_screen: direct rollup replay.
    o["frontier_outlink_screen"] = """
        WITH links AS (
          SELECT printf('p%d', k) AS src,
                 CASE WHEN k < 2 THEN printf('t%d-%d', k, i % 30)
                      WHEN k = 2 THEN printf('nav%d', i % 5)
                      ELSE printf('farm%d', i) END AS dst
          FROM (SELECT range % 4 AS k, range // 4 AS i FROM range(1200))
          WHERE k >= 2 OR i < 30
        )
        SELECT src,
               CAST(count(*) AS BIGINT) AS n_outlinks,
               CAST(count(DISTINCT dst) AS BIGINT) AS n_distinct_targets,
               count(DISTINCT dst) > 200 AS farm
        FROM links GROUP BY src ORDER BY src
    """

    o["corpus_temperature_sample"] = f"""
        WITH {_TEMP_MIX_CTES},
        ranked AS (
          SELECT t.doc_id, t.source,
                 row_number() OVER (
                   PARTITION BY t.source
                   ORDER BY md5('42:' || t.doc_id), t.doc_id
                 ) AS rn,
                 least(a.target, a.n_docs) AS cap
          FROM thinned t JOIN alloc a USING (source)
        )
        SELECT doc_id, source FROM ranked
        WHERE rn <= cap ORDER BY source, doc_id
    """

    # frontier_blocklist_screen: the registrable-domain replay (the
    # domain_rollup label-array SQL) left-joined against the same
    # 3-domain blocklist.
    o["frontier_blocklist_screen"] = f"""
        WITH {_sim_traps_sql()},
        lab AS (
          SELECT host, string_split(lower(host), '.') AS labels FROM sim_traps
        ),
        dom AS (
          SELECT host,
                 CASE WHEN len(labels) >= 3
                           AND list_contains([{_sfx}],
                                             labels[-2] || '.' || labels[-1])
                      THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
                      WHEN len(labels) >= 2
                      THEN labels[-2] || '.' || labels[-1]
                      ELSE lower(host) END AS site
          FROM lab
        ),
        bl AS (
          SELECT * FROM (VALUES ('example.co.uk', 'unsafe_content'),
                                ('baz.net', 'takedown'),
                                ('unused.org', 'malware'))
            AS t(domain, reason)
        )
        SELECT d.site, b.domain IS NOT NULL AS blocked,
               b.reason AS block_reason,
               count(*) AS n_urls
        FROM dom d LEFT JOIN bl b ON d.site = b.domain
        GROUP BY 1, 2, 3 ORDER BY d.site
    """

    # robots_cache_staleness: integer-second TTL replay (1080 s steps,
    # 36 h span; 24 h / 1 h thresholds land mid-step so boundary
    # semantics are unambiguous).
    o["robots_cache_staleness"] = """
        WITH meta AS (
          SELECT printf('h%03d', sid) AS host,
                 TIMESTAMP '2025-09-01 12:00:00'
                   - to_seconds(sid * 1080) AS fetched_at,
                 sid % 5 <> 0 AS fetch_ok,
                 CAST(sid * 1080 AS BIGINT) AS age_s
          FROM (SELECT range AS sid FROM range(120))
        )
        SELECT host, fetched_at, fetch_ok, age_s,
               age_s >= CASE WHEN fetch_ok THEN 86400 ELSE 3600 END
                 AS refetch_due
        FROM meta ORDER BY host
    """

    # ivf_codebook_refine: the Lloyd recurrence unrolled as a CTE chain
    # (the pagerank-oracle pattern) over EXPLODED dims — distances and
    # sums are integer-exact, the one division per centroid update is
    # IEEE-identical, so the final codebook matches bit-for-bit.
    def _kmeans_sql_chain(iters=3):
        parts = []
        prev = "c0"
        for i in range(1, iters + 1):
            parts.append(f"""
        d{i} AS (
          SELECT v.vid, c.cell,
                 sum((v.val - c.c) * (v.val - c.c)) AS dist
          FROM vecs v JOIN {prev} c ON v.dim = c.dim
          GROUP BY v.vid, c.cell
        ),
        a{i} AS (
          SELECT vid, cell FROM (
            SELECT vid, cell,
                   row_number() OVER (PARTITION BY vid
                                      ORDER BY dist, cell) AS rn
            FROM d{i}
          ) WHERE rn = 1
        ),
        u{i} AS (
          SELECT a.cell, v.dim,
                 CAST(round(CAST(sum(v.val) AS BIGINT) / count(*), 0)
                      AS BIGINT) AS c
          FROM a{i} a JOIN vecs v USING (vid)
          GROUP BY a.cell, v.dim
        ),
        c{i} AS (
          SELECT p.cell, p.dim, coalesce(u.c, p.c) AS c
          FROM {prev} p LEFT JOIN u{i} u USING (cell, dim)
        )""")
            prev = f"c{i}"
        return ",".join(parts), prev

    _km_chain, _km_final = _kmeans_sql_chain(3)
    o["ivf_codebook_refine"] = f"""
        WITH vecs AS (
          SELECT sid AS vid, dim,
                 CAST(100 * (((sid % 8) * 7 + dim) % 8)
                      + (sid * 48271 + dim * 31) % 11 AS BIGINT) AS val
          FROM (SELECT range AS sid FROM range({KMEANS_N})),
               (SELECT range AS dim FROM range(4))
        ),
        c0 AS (
          SELECT vid AS cell, dim, val AS c FROM vecs WHERE vid < 8
        ),
        {_km_chain},
        df AS (
          SELECT v.vid, c.cell,
                 sum((v.val - c.c) * (v.val - c.c)) AS dist
          FROM vecs v JOIN {_km_final} c ON v.dim = c.dim
          GROUP BY v.vid, c.cell
        ),
        af AS (
          SELECT vid, cell FROM (
            SELECT vid, cell,
                   row_number() OVER (PARTITION BY vid
                                      ORDER BY dist, cell) AS rn
            FROM df
          ) WHERE rn = 1
        ),
        m AS (SELECT cell, count(*) AS n FROM af GROUP BY cell)
        SELECT c.cell, coalesce(m.n, 0) AS n_members, c.dim,
               c.c AS value
        FROM {_km_final} c LEFT JOIN m USING (cell)
        ORDER BY c.cell, c.dim
    """

    # image_export_pipeline: every stage's independent oracle fragment
    # composed in one recursive statement — metadata gates (WHERE),
    # caption screen (string-keyed groups), brute-force Hamming pairs +
    # recursive-CTE closure over the SCREENED subset, md5 row_number
    # shard replay.
    o["image_export_pipeline"] = f"""
        WITH RECURSIVE {_sim_images_sql()},
        planted AS (
          SELECT image_id, w, h, fmt, phash,
                 CASE WHEN sid % 5 = 0 THEN 'Stock  Photo image'
                      WHEN sid % 7 = 3 THEN printf('repeat cap %d', sid % 97)
                      ELSE caption END AS caption
          FROM (
            SELECT *, CAST(substr(image_id, 4) AS BIGINT) AS sid
            FROM sim_images
          )
        ),
        kept AS (
          SELECT * FROM planted
          WHERE least(w, h) >= 64
            AND greatest(w, h) <= 3.0 * least(w, h)
            AND fmt IN ('jpeg', 'png', 'webp')
            AND len(regexp_split_to_array(trim(caption), '[ \\t\\n\\r]+'))
                BETWEEN 2 AND 77
        ),
        norm AS (
          SELECT *,
                 lower(trim(regexp_replace(caption, '[ \\t\\n\\r]+', ' ',
                                           'g'))) AS nc
          FROM kept
        ),
        cgrp AS (
          SELECT nc, count(*) AS n_cap, min(image_id) AS canon
          FROM norm GROUP BY nc
        ),
        screened AS (
          SELECT i.image_id, i.caption, i.phash
          FROM norm i JOIN cgrp g ON i.nc = g.nc AND i.image_id = g.canon
          WHERE g.n_cap < 8
        ),
        pairs AS (
          SELECT a.image_id AS id_a, b.image_id AS id_b
          FROM screened a JOIN screened b ON a.image_id < b.image_id
          WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(root, node) AS (
          SELECT id, id FROM nodes
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS id, min(node) AS component FROM reach GROUP BY root
        ),
        survivors AS (
          SELECT s.image_id, s.caption FROM screened s
          LEFT JOIN comp c ON s.image_id = c.id
          WHERE c.id IS NULL OR c.component = s.image_id
        ),
        ranked AS (
          SELECT image_id, caption,
                 row_number() OVER (
                   ORDER BY md5('42:' || image_id), image_id
                 ) - 1 AS rnk
          FROM survivors
        )
        SELECT image_id, caption,
               CAST(rnk // 100 AS BIGINT) AS shard_id,
               CAST(rnk % 100 AS BIGINT) AS idx_in_shard
        FROM ranked ORDER BY shard_id, idx_in_shard
    """

    # link_graph_pagerank: the same fixed power iteration unrolled as a
    # CTE chain — r{k} from r{k-1}, dangling mass d{k} re-read each step.
    # Expression shapes/order mirror the engine exactly so double
    # arithmetic agrees far below the round(6) published precision.
    # (_pagerank_cte_chain assumes a `dedges(src,dst)` CTE exists.)
    o["link_graph_pagerank"] = f"""
        WITH {_sim_linkgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        {_pagerank_cte_chain(5)}
        SELECT id, round(rank, 6) AS rank FROM r5 ORDER BY id
    """

    # link_graph_opic: the synchronous integer-cash OPIC recurrence
    # unrolled — shares/residues/pool-carry are all BIGINT, so the
    # replay is exact by construction; the ppm grid is one more
    # integer division off the final history total.
    o["link_graph_opic"] = f"""
        WITH {_sim_opicgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        {_opic_cte_chain(6, 1_000_000)},
        tot AS (SELECT CAST(sum(hist) AS BIGINT) AS t FROM s6)
        SELECT id, cash, hist AS history,
               CAST((1000000 * hist) // (SELECT t FROM tot) AS BIGINT) AS imp_ppm
        FROM s6 ORDER BY id
    """

    # pagination_series_map: fixture rebuilt with printf, the SAME RE2
    # alternations for both attribute orders, resolution, then a
    # UNION-distinct recursive walk (d-capped so cycle states
    # terminate); terminal = node with no outgoing edge, position =
    # series_len - distance.
    o["pagination_series_map"] = """
        WITH RECURSIVE ser AS (
          SELECT k, unnest(range(0, 3 + k % 5)) AS j
          FROM (SELECT range AS k FROM range(120))
        ),
        chainp AS (
          SELECT printf('https://site%d.example.com/s%d/p%d', k % 7, k, j) AS url,
                 CASE WHEN j < 2 + k % 5 THEN
                   CASE WHEN k % 2 = 0
                     THEN '<link rel="next" href="' ||
                          CASE WHEN k % 3 = 0 THEN printf('/s%d/p%d', k, j + 1)
                               ELSE printf('https://site%d.example.com/s%d/p%d',
                                           k % 7, k, j + 1) END
                          || '"><p>body</p>'
                     ELSE '<link href="' ||
                          CASE WHEN k % 3 = 0 THEN printf('/s%d/p%d', k, j + 1)
                               ELSE printf('https://site%d.example.com/s%d/p%d',
                                           k % 7, k, j + 1) END
                          || '" rel="next"><p>body</p>' END
                 ELSE '<p>last page</p><link rel="stylesheet" href="/x.css">'
                 END AS html
          FROM ser
        ),
        pages AS (
          SELECT * FROM chainp
          UNION ALL
          SELECT printf('https://loop.example.com/c%d', range),
                 printf('<link rel="next" href="/c%d">', (range + 1) % 3)
          FROM range(3)
        ),
        h AS (
          SELECT url,
                 coalesce(
                   nullif(regexp_extract(html,
                     '(?is)<link[^>]*rel\\s*=\\s*["'']next["''][^>]*href\\s*=\\s*["'']([^"'']+)["'']', 1), ''),
                   nullif(regexp_extract(html,
                     '(?is)<link[^>]*href\\s*=\\s*["'']([^"'']+)["''][^>]*rel\\s*=\\s*["'']next["'']', 1), '')
                 ) AS hint,
                 regexp_extract(url, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1) AS origin
          FROM pages
        ),
        edges AS (
          SELECT url AS src,
                 CASE WHEN hint LIKE '/%' THEN origin || hint ELSE hint END AS dst
          FROM h WHERE hint IS NOT NULL
        ),
        nodes AS (
          SELECT DISTINCT url FROM (
            SELECT src AS url FROM edges
            UNION ALL SELECT dst FROM edges
          )
        ),
        walk AS (
          SELECT url, url AS cur, 0 AS d FROM nodes
          UNION
          SELECT w.url, e.dst, w.d + 1
          FROM walk w JOIN edges e ON e.src = w.cur
          WHERE w.d < 30
        ),
        term AS (
          SELECT url, cur AS sid, d FROM walk
          WHERE cur NOT IN (SELECT src FROM edges)
        ),
        lens AS (
          SELECT sid, CAST(max(d) + 1 AS BIGINT) AS series_len
          FROM term GROUP BY sid
        )
        SELECT n.url, t.sid AS series_id,
               CAST(l.series_len - t.d AS BIGINT) AS position,
               l.series_len, t.sid IS NULL AS in_cycle
        FROM nodes n
        LEFT JOIN term t ON t.url = n.url
        LEFT JOIN lens l ON l.sid = t.sid
        ORDER BY n.url
    """

    # hreflang_alternate_clusters: fixture rebuilt via the same
    # per-(g,v,w) tag expansion + ordered string_agg, whole-tag parse
    # with independent attribute pulls, then the reach(root,node)
    # min-label closure.
    o["hreflang_alternate_clusters"] = """
        WITH RECURSIVE mem AS (
          SELECT g, unnest(range(0, 1 + g % 4)) AS v
          FROM (SELECT range AS g FROM range(80))
        ),
        tags AS (
          SELECT m.g, m.v, w.v AS w,
                 printf('<link rel="alternate" hreflang="%s" href="https://ex%d.org/l%d/a%d">',
                        CASE WHEN w.v = 0 THEN 'en' WHEN w.v = 1 THEN 'de'
                             WHEN w.v = 2 THEN 'fr' ELSE 'ja' END,
                        m.g % 9, w.v, m.g) AS tag
          FROM mem m JOIN mem w ON w.g = m.g
        ),
        htmls AS (
          SELECT g, v, string_agg(tag, '' ORDER BY w) AS base
          FROM tags GROUP BY g, v
        ),
        pages AS (
          SELECT printf('https://ex%d.org/l%d/a%d', g % 9, v, g) AS url,
                 CASE WHEN v = 0 AND g % 5 = 0 THEN '<p>no tags</p>'
                      ELSE base ||
                        CASE WHEN g % 7 <> 3
                             THEN printf('<link href="https://ex%d.org/l0/a%d" hreflang="x-default" rel="alternate">',
                                         g % 9, g)
                             ELSE '' END
                 END AS html
          FROM htmls
        ),
        t AS (
          SELECT url,
                 unnest(regexp_extract_all(html,
                   '(?is)<link[^>]*rel\\s*=\\s*["'']alternate["''][^>]*>', 0)) AS tag
          FROM pages
        ),
        alts AS (
          SELECT url, lang, href FROM (
            SELECT url,
                   lower(regexp_extract(tag, '(?is)hreflang\\s*=\\s*["'']([^"'']+)["'']', 1)) AS lang,
                   regexp_extract(tag, '(?is)href\\s*=\\s*["'']([^"'']+)["'']', 1) AS href
            FROM t
          ) WHERE lang <> '' AND href <> ''
        ),
        edges AS (
          SELECT url AS src, href AS dst FROM alts
          UNION ALL SELECT href, url FROM alts
        ),
        reach(root, node) AS (
          SELECT src, src FROM edges
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        cc AS (SELECT root AS id, min(node) AS component FROM reach GROUP BY root),
        langs AS (
          SELECT href AS id, min(lang) AS lang FROM alts
          WHERE lang <> 'x-default' GROUP BY href
        ),
        sizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component),
        defaults AS (
          SELECT c.component, min(a.href) AS default_url
          FROM alts a JOIN cc c ON c.id = a.url
          WHERE a.lang = 'x-default' GROUP BY c.component
        )
        SELECT c.id AS url, l.lang, c.component AS cluster_id,
               s.cluster_size, d.default_url
        FROM cc c
        LEFT JOIN langs l USING (id)
        JOIN sizes s USING (component)
        LEFT JOIN defaults d USING (component)
        ORDER BY url
    """

    # linkgraph_gap_compression: list_sort + gap comprehension +
    # length(bin()) bit audit (list_sum → DOUBLE in DuckDB, cast).
    o["linkgraph_gap_compression"] = f"""
        WITH {_sim_opicgraph_sql()},
        d AS (SELECT DISTINCT src, dst FROM sim_edges),
        a AS (SELECT src, list_sort(list(dst)) AS ds FROM d GROUP BY src),
        g AS (
          SELECT src, ds,
                 [ds[i] - ds[i-1] for i in range(2, len(ds) + 1)] AS gaps
          FROM a
        )
        SELECT src,
               CAST(len(ds) AS INT) AS n_out,
               ds[1] AS first_dst,
               array_to_string(gaps, '+') AS gaps_str,
               CAST(length(bin(ds[1]))
                    + coalesce(list_sum(list_transform(gaps,
                          x -> length(bin(x)))), 0) AS BIGINT) AS gap_bits,
               CAST(len(ds) * 64 AS BIGINT) AS raw_bits
        FROM g ORDER BY src
    """

    # crawl_fetcher_ring_rebalance: the ring rebuilt with the
    # ('0x'||substr(md5))::BIGINT trick, successor via list_filter +
    # wrap-around coalesce, struct_extract for the worker field.
    o["crawl_fetcher_ring_rebalance"] = """
        WITH q AS (
          SELECT printf('host%d.example.com', range) AS queue_key FROM range(3000)
        ),
        rb AS (
          SELECT ('0x' || substr(md5(worker || ':' || r), 1, 8))::BIGINT AS point,
                 worker
          FROM (SELECT unnest(['w0','w1','w2','w3']) AS worker), range(64) t(r)
        ),
        ra AS (
          SELECT ('0x' || substr(md5(worker || ':' || r), 1, 8))::BIGINT AS point,
                 worker
          FROM (SELECT unnest(['w0','w1','w2','w3','w4']) AS worker), range(64) t(r)
        ),
        ringb AS (
          SELECT list(struct_pack(point := point, worker := worker)
                      ORDER BY point, worker) AS ring FROM rb
        ),
        ringa AS (
          SELECT list(struct_pack(point := point, worker := worker)
                      ORDER BY point, worker) AS ring FROM ra
        ),
        k AS (
          SELECT queue_key,
                 ('0x' || substr(md5(queue_key), 1, 8))::BIGINT AS kp
          FROM q
        ),
        asg AS (
          SELECT queue_key,
                 struct_extract(coalesce(
                   list_filter((SELECT ring FROM ringb), s -> s.point >= kp)[1],
                   (SELECT ring FROM ringb)[1]), 'worker') AS worker_before,
                 struct_extract(coalesce(
                   list_filter((SELECT ring FROM ringa), s -> s.point >= kp)[1],
                   (SELECT ring FROM ringa)[1]), 'worker') AS worker_after
          FROM k
        )
        SELECT queue_key, worker_before, worker_after,
               worker_before <> worker_after AS moved
        FROM asg ORDER BY queue_key
    """

    # crawl_discovery_saturation: arithmetic fixture replay + the
    # distinct/min-first-round/rollup chain (sum → HUGEINT, cast).
    o["crawl_discovery_saturation"] = """
        WITH raw AS (
          SELECT printf('h%d', h) AS host, r AS rnd,
                 CASE WHEN h % 2 = 0
                      THEN printf('https://pool.example.com/t%d',
                                  (h * 977 + r * 131 + j * 17) % 200)
                      ELSE printf('https://h%d.example.com/p%d', h, r * 1000 + j)
                 END AS target
          FROM (SELECT range // 250 AS h, (range // 50) % 5 + 1 AS r,
                       range % 50 AS j
                FROM range(5000))
        ),
        links AS (SELECT DISTINCT host, rnd, target FROM raw),
        firsts AS (SELECT target, min(rnd) AS first_rnd FROM links GROUP BY target),
        per AS (
          SELECT host, rnd,
                 CAST(count(*) AS BIGINT) AS n_links,
                 CAST(sum(CASE WHEN l.rnd = f.first_rnd THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_new
          FROM links l JOIN firsts f USING (target)
          GROUP BY host, rnd
        ),
        latest AS (SELECT host, max(rnd) AS latest_rnd FROM per GROUP BY host)
        SELECT p.host, p.rnd AS round, p.n_links, p.n_new,
               CAST((1000 * p.n_new) // p.n_links AS BIGINT) AS new_permille,
               p.rnd = l.latest_rnd AS is_latest,
               (p.rnd = l.latest_rnd
                AND (1000 * p.n_new) // p.n_links < 300
                AND p.n_links >= 20) AS saturated
        FROM per p JOIN latest l USING (host)
        ORDER BY p.host, p.rnd
    """

    # link_graph_opic_extend: both phases as one integer chain — phase
    # A (s0..s3/p0..p3) over the original graph, then the grown edge
    # set with bs0 seeded from s3 (new nodes at init_cash) and bp0
    # from p3.
    o["link_graph_opic_extend"] = f"""
        WITH {_sim_opicgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        {_opic_cte_chain(3, 1_000_000)},
        extra AS (
          SELECT CASE WHEN range % 2 = 0 THEN 1000 + range % 50
                      ELSE (range * 13) % 500 END AS src,
                 CASE WHEN range % 2 = 0 THEN (range * 7) % 600
                      ELSE 1000 + range % 50 END AS dst
          FROM range(600)
        ),
        dedges2 AS (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM sim_edges
            UNION ALL SELECT src, dst FROM extra
          )
        ),
        {_opic_cte_chain(3, 1_000_000, edges="dedges2", pfx="b",
                         s0_from="s3", p0_from="p3", extra_nodes="nodes")},
        tot AS (SELECT CAST(sum(hist) AS BIGINT) AS t FROM bs3)
        SELECT id, cash, hist AS history,
               CAST((1000000 * hist) // (SELECT t FROM tot) AS BIGINT) AS imp_ppm
        FROM bs3 ORDER BY id
    """

    # linkgraph_bowtie: fixture unions + two depth-capped UNION-distinct
    # reachability walks (forward and transposed), min(d) = BFS layer.
    o["linkgraph_bowtie"] = """
        WITH RECURSIVE edges AS (
          SELECT range AS src, (range + 1) % 40 AS dst FROM range(40)
          UNION ALL SELECT range, (range + 7) % 40 FROM range(40)
          UNION ALL SELECT 100 + range, range % 40 FROM range(50)
          UNION ALL SELECT 150 + range, 100 + range FROM range(20)
          UNION ALL SELECT range % 40, 200 + range FROM range(50)
          UNION ALL SELECT 200 + range, 250 + range FROM range(20)
          UNION ALL SELECT 100 + range, 300 + range FROM range(10)
        ),
        fwd(node, d) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION
          SELECT e.dst, w.d + 1 FROM fwd w JOIN edges e ON e.src = w.node
          WHERE w.d < 30
        ),
        bwd(node, d) AS (
          SELECT CAST(0 AS BIGINT), 0
          UNION
          SELECT e.src, w.d + 1 FROM bwd w JOIN edges e ON e.dst = w.node
          WHERE w.d < 30
        ),
        fmin AS (SELECT node AS id, CAST(min(d) AS BIGINT) AS fwd_depth
                 FROM fwd GROUP BY node),
        bmin AS (SELECT node AS id, CAST(min(d) AS BIGINT) AS bwd_depth
                 FROM bwd GROUP BY node),
        nodes AS (
          SELECT DISTINCT id FROM (
            SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
          )
        )
        SELECT n.id,
               CASE WHEN f.id IS NOT NULL AND b.id IS NOT NULL THEN 'core'
                    WHEN b.id IS NOT NULL THEN 'in'
                    WHEN f.id IS NOT NULL THEN 'out'
                    ELSE 'disconnected' END AS region,
               f.fwd_depth, b.bwd_depth
        FROM nodes n
        LEFT JOIN fmin f ON f.id = n.id
        LEFT JOIN bmin b ON b.id = n.id
        ORDER BY n.id
    """

    # frontier_eviction: plain per-host row_number replay of the
    # chunked rank + integer age/priority policy.
    o["frontier_eviction"] = """
        WITH fr AS (
          SELECT range AS url_id,
                 printf('h%d', range % 37) AS host,
                 (range * 2654435761) % 3 AS priority,
                 (range * 48271) % 12 AS added_round
          FROM range(4000)
        ),
        rk AS (
          SELECT *,
                 greatest(12 - added_round, 0) AS age,
                 row_number() OVER (
                   PARTITION BY host
                   ORDER BY priority * 10000000 + url_id
                 ) AS hrank
          FROM fr
        )
        SELECT url_id, host, priority, added_round,
               CAST(age AS BIGINT) AS age,
               hrank <= 40 AS protected,
               (age >= 6 AND priority >= 1 AND hrank > 40) AS evict,
               CASE WHEN age >= 6 AND priority >= 1 AND hrank > 40
                    THEN 'aged_low_priority' END AS reason
        FROM rk ORDER BY url_id
    """

    # recrawl_outlink_delta: the shifted-window outlink log rebuilt in
    # SQL, latest-two round ranking, set diffs via anti-join-shaped
    # LEFT JOIN ... IS NULL.
    o["recrawl_outlink_delta"] = """
        WITH base AS (
          SELECT doc_id, unnest(range(0, 5)) AS k FROM documents
        ),
        log AS (
          SELECT printf('u%d', doc_id) AS url, 1 AS rnd,
                 printf('https://t.example.com/%d', (doc_id * 7 + k) % 500) AS target
          FROM base
          UNION
          SELECT printf('u%d', doc_id), 2,
                 printf('https://t.example.com/%d',
                        (doc_id * 7 + k + doc_id % 3) % 500)
          FROM base WHERE doc_id % 4 <> 3
        ),
        rounds AS (
          SELECT url, rnd,
                 row_number() OVER (PARTITION BY url ORDER BY rnd DESC) AS rk
          FROM (SELECT DISTINCT url, rnd FROM log)
        ),
        tagged AS (
          SELECT l.url, l.rnd, l.target, r.rk
          FROM log l JOIN rounds r ON r.url = l.url AND r.rnd = l.rnd
          WHERE r.rk <= 2
        ),
        meta AS (
          SELECT url,
                 max(CASE WHEN rk = 1 THEN rnd END) AS round_latest,
                 max(CASE WHEN rk = 2 THEN rnd END) AS round_prev
          FROM rounds WHERE rk <= 2 GROUP BY url
        ),
        added AS (
          SELECT a.url, a.target, 'added' AS change
          FROM tagged a LEFT JOIN tagged b
            ON b.url = a.url AND b.target = a.target AND b.rk = 2
          WHERE a.rk = 1 AND b.url IS NULL
        ),
        removed AS (
          SELECT a.url, a.target, 'removed' AS change
          FROM tagged a LEFT JOIN tagged b
            ON b.url = a.url AND b.target = a.target AND b.rk = 1
          WHERE a.rk = 2 AND b.url IS NULL
        ),
        un AS (SELECT * FROM added UNION ALL SELECT * FROM removed)
        SELECT u.url, u.target, u.change, m.round_latest, m.round_prev,
               m.round_prev IS NULL AS first_seen
        FROM un u JOIN meta m ON m.url = u.url
        ORDER BY u.url, u.change, u.target
    """

    # crawl_retry_after_holds: both Retry-After forms replayed —
    # digits regex, day-name-stripped try_strptime (epoch treats the
    # naive timestamp as UTC, matching the UTC-pinned Spark session),
    # default hold for unusable hints; per-host max/count.
    o["crawl_retry_after_holds"] = """
        WITH resp AS (
          SELECT printf('h%d', range % 20) AS host,
                 CASE WHEN range % 9 = 0 THEN 429
                      WHEN range % 9 IN (1, 2) THEN 503
                      WHEN range % 9 = 3 THEN 429
                      ELSE 200 END AS status,
                 CASE WHEN range % 9 = 0 THEN printf('%d', 10 + range % 50)
                      WHEN range % 9 = 1 THEN
                        (['Mon, 01 Sep 2025 00:02:00 GMT',
                          'Mon, 01 Sep 2025 00:10:00 GMT',
                          'Tue, 02 Sep 2025 12:00:00 GMT',
                          'Mon, 01 Sep 2025 23:59:59 GMT'])[(range % 4 + 1)::INT]
                      WHEN range % 9 = 3 THEN 'soon'
                 END AS retry_after,
                 1756684800000 + range * 1000 AS fetched_ms
          FROM range(400)
        ),
        bp AS (
          SELECT host,
                 CASE
                   WHEN regexp_matches(trim(retry_after), '^[0-9]+$')
                     THEN fetched_ms + CAST(trim(retry_after) AS BIGINT) * 1000
                   WHEN try_strptime(regexp_replace(trim(retry_after),
                          '^[A-Za-z]{3}, ', ''),
                          '%d %b %Y %H:%M:%S GMT') IS NOT NULL
                     THEN CAST(epoch(try_strptime(regexp_replace(trim(retry_after),
                          '^[A-Za-z]{3}, ', ''),
                          '%d %b %Y %H:%M:%S GMT')) AS BIGINT) * 1000
                   ELSE fetched_ms + 60000
                 END AS hold
          FROM resp WHERE status IN (429, 503)
        )
        SELECT host, CAST(max(hold) AS BIGINT) AS hold_until_ms,
               CAST(count(*) AS BIGINT) AS n_backpressure
        FROM bp GROUP BY host ORDER BY host
    """

    # frontier_lifecycle_report: eviction window replay -> cold rows ->
    # the two admit_frontier chunked ranks as plain windows (host rank,
    # then global running count over host-cap survivors) -> flows.
    o["frontier_lifecycle_report"] = """
        WITH fr AS (
          SELECT range AS url_id,
                 printf('h%d', range % 37) AS host,
                 (range * 2654435761) % 3 AS priority,
                 (range * 48271) % 12 AS added_round,
                 (range * 2654435761) % 3 * 10000000 + range AS okey
          FROM range(4000)
        ),
        ev AS (
          SELECT *,
                 greatest(12 - added_round, 0) AS age,
                 row_number() OVER (PARTITION BY host ORDER BY okey) AS hrank
          FROM fr
        ),
        tagged AS (
          SELECT *,
                 (age >= 6 AND priority >= 1 AND hrank > 40) AS evict
          FROM ev
        ),
        cold AS (SELECT url_id, host, priority, okey FROM tagged WHERE evict),
        crk AS (
          SELECT *,
                 row_number() OVER (PARTITION BY host ORDER BY okey) AS chrank
          FROM cold
        ),
        surv AS (
          SELECT *,
                 CASE WHEN chrank <= 20 THEN 1 ELSE 0 END AS gone
          FROM crk
        ),
        grk AS (
          SELECT *,
                 sum(gone) OVER (ORDER BY okey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS grank
          FROM surv
        ),
        readm AS (
          SELECT host,
                 CAST(sum(CASE WHEN gone = 1 AND grank <= 300
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_readmitted
          FROM grk GROUP BY host
        ),
        flows AS (
          SELECT host,
                 CAST(count(*) AS BIGINT) AS n_frontier,
                 CAST(sum(CASE WHEN evict THEN 0 ELSE 1 END) AS BIGINT) AS n_hot,
                 CAST(sum(CASE WHEN evict THEN 1 ELSE 0 END) AS BIGINT) AS n_evicted
          FROM tagged GROUP BY host
        )
        SELECT f.host, f.n_frontier, f.n_hot, f.n_evicted,
               coalesce(r.n_readmitted, 0) AS n_readmitted,
               f.n_evicted - coalesce(r.n_readmitted, 0) AS n_still_cold
        FROM flows f LEFT JOIN readm r USING (host)
        ORDER BY f.host
    """

    # crawl_fairness_audit: the integer Jain formula replayed (sums →
    # HUGEINT, cast).
    o["crawl_fairness_audit"] = """
        WITH counts AS (
          SELECT CASE WHEN range // 40 = 0 THEN 'even'
                      WHEN range // 40 = 1 THEN 'varied'
                      ELSE 'hog' END AS policy,
                 range % 40 AS host,
                 CASE WHEN range // 40 = 0 THEN 25
                      WHEN range // 40 = 1
                        THEN 5 + ((range % 40) * 2654435761) % 30
                      WHEN range % 40 = 0 THEN 961 ELSE 1 END AS n
          FROM range(120)
        ),
        agg AS (
          SELECT policy,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(sum(n) AS BIGINT) AS total,
                 CAST(sum(n * n) AS BIGINT) AS sum_sq
          FROM counts GROUP BY policy
        )
        SELECT policy, n_keys, total, sum_sq,
               CASE WHEN sum_sq = 0 THEN NULL
                    ELSE CAST((total * total * 1000) // (n_keys * sum_sq)
                              AS BIGINT) END AS jain_permille
        FROM agg ORDER BY policy
    """

    # corpus_vocab_growth: same tokenization (_TOKS), min-first-doc per
    # token, bin-length bucket, cumulative over the tiny bucket table.
    o["corpus_vocab_growth"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        st AS (
          SELECT tok, min(doc_id) AS first_doc, count(*) AS occ
          FROM tok GROUP BY tok
        ),
        per AS (
          SELECT CAST(length(bin(first_doc)) AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS new_tokens,
                 CAST(sum(occ) AS BIGINT) AS occ_in_bucket
          FROM st GROUP BY 1
        )
        SELECT bucket,
               CAST(1::BIGINT << bucket AS BIGINT) AS threshold_docs,
               new_tokens,
               CAST(sum(new_tokens) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS vocab_cum,
               occ_in_bucket
        FROM per ORDER BY bucket
    """

    # linkgraph_triangles: the ordered-wedge join replayed relationally.
    o["linkgraph_triangles"] = """
        WITH raw AS (
          SELECT range AS src, (range + 1) % 300 AS dst FROM range(300)
          UNION ALL SELECT range, (range + 2) % 300 FROM range(300)
          UNION ALL SELECT 500 + range // 10, 500 + range % 10
            FROM range(100) WHERE range // 10 < range % 10
          UNION ALL SELECT (range * 17) % 300, (range * 37) % 300 FROM range(150)
        ),
        und AS (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM raw WHERE src <> dst
        ),
        w AS (
          SELECT e1.a, e1.b, e2.b AS c
          FROM und e1 JOIN und e2 ON e2.a = e1.b
        ),
        t AS (
          SELECT w.a, w.b, w.c
          FROM w JOIN und u ON u.a = w.a AND u.b = w.c
        ),
        cr AS (
          SELECT id, count(*) AS triangles FROM (
            SELECT a AS id FROM t
            UNION ALL SELECT b FROM t
            UNION ALL SELECT c FROM t
          ) GROUP BY id
        ),
        dg AS (
          SELECT id, count(*) AS degree FROM (
            SELECT a AS id FROM und UNION ALL SELECT b FROM und
          ) GROUP BY id
        )
        SELECT d.id, CAST(d.degree AS BIGINT) AS degree,
               CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles,
               CASE WHEN d.degree >= 2
                    THEN CAST((2 * coalesce(c.triangles, 0) * 1000)
                              // (d.degree * (d.degree - 1)) AS BIGINT)
               END AS clustering_permille
        FROM dg d LEFT JOIN cr c USING (id)
        ORDER BY d.id
    """

    # search_bm25_topk: full Okapi replay with IDENTICAL expression
    # shapes (idf log form, tf normalization, avgdl division) so the
    # doubles agree far below round(4).
    o["search_bm25_topk"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS term FROM documents
        ),
        post AS (
          SELECT term, doc_id, count(*) AS tf FROM tok
          WHERE term IN ('vector', 'merge', 'window')
          GROUP BY term, doc_id
        ),
        dl AS (SELECT doc_id, len({_TOKS}) AS dl FROM documents),
        consts AS (
          SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
          FROM dl
        ),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        sc AS (
          SELECT p.doc_id,
                 ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                 * (p.tf * (1.2 + 1))
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS part
          FROM post p
          JOIN dfs s USING (term)
          JOIN dl d USING (doc_id), consts c
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                 round(sum(part), 4) AS score
          FROM sc GROUP BY doc_id
        )
        SELECT doc_id, n_hit_terms, score
        FROM agg ORDER BY score DESC, doc_id LIMIT 25
    """

    # search_phrase_match: positional rows via the ls[p] indexing trick
    # over the SAME filtered tokenization, then the next-word join.
    o["search_phrase_match"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS ls FROM documents),
        x AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS p FROM t),
        rows_ AS (SELECT doc_id, p - 1 AS pos, ls[p] AS term FROM x
                  WHERE ls[p] IN ('merge', 'join')),
        m AS (
          SELECT a.doc_id, a.pos AS start
          FROM rows_ a JOIN rows_ b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          WHERE a.term = 'merge' AND b.term = 'join'
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(min(start) AS BIGINT) AS first_pos
        FROM m GROUP BY doc_id ORDER BY doc_id
    """

    # search_postings_compression: postings + the same gap/bin replay
    # as linkgraph_gap_compression, keyed by term.
    o["search_postings_compression"] = f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        post AS (SELECT DISTINCT term, doc_id FROM tok),
        a AS (SELECT term, list_sort(list(doc_id)) AS ds FROM post GROUP BY term),
        g AS (
          SELECT term, ds,
                 [ds[i] - ds[i-1] for i in range(2, len(ds) + 1)] AS gaps
          FROM a
        )
        SELECT term,
               CAST(len(ds) AS INT) AS df,
               ds[1] AS first_doc,
               array_to_string(gaps, '+') AS gaps_str,
               CAST(length(bin(ds[1]))
                    + coalesce(list_sum(list_transform(gaps,
                          x -> length(bin(x)))), 0) AS BIGINT) AS gap_bits,
               CAST(len(ds) * 64 AS BIGINT) AS raw_bits
        FROM g ORDER BY term
    """

    # search_snippets: the phrase CTE + end-inclusive list_slice window.
    o["search_snippets"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS ls FROM documents),
        x AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS p FROM t),
        rows_ AS (SELECT doc_id, p - 1 AS pos, ls[p] AS term FROM x
                  WHERE ls[p] IN ('merge', 'join')),
        m AS (
          SELECT a.doc_id, a.pos AS start
          FROM rows_ a JOIN rows_ b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          WHERE a.term = 'merge' AND b.term = 'join'
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences,
                 CAST(min(start) AS BIGINT) AS first_pos
          FROM m GROUP BY doc_id
        )
        SELECT a.doc_id, a.n_occurrences, a.first_pos,
               array_to_string(list_slice(t.ls,
                 CAST(greatest(a.first_pos - 3, 0) + 1 AS INT),
                 CAST(greatest(a.first_pos - 3, 0) + 8 AS INT)), ' ') AS snippet
        FROM agg a JOIN t ON t.doc_id = a.doc_id
        ORDER BY a.doc_id
    """

    # search_term_suggest: vocab df + VALUES queries + integer
    # levenshtein, ranked (distance, -df, term).
    o["search_term_suggest"] = f"""
        WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
        vocab AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          FROM tok GROUP BY term
        ),
        qs AS (SELECT unnest(['mergee', 'windoow', 'scann']) AS query),
        cand AS (
          SELECT q.query, v.term, v.df,
                 CAST(levenshtein(q.query, v.term) AS INT) AS distance
          FROM vocab v, qs q
          WHERE levenshtein(q.query, v.term) <= 2
        ),
        rk AS (
          SELECT *, row_number() OVER (
                   PARTITION BY query
                   ORDER BY distance, df DESC, term) AS rank
          FROM cand
        )
        SELECT query, CAST(rank AS INT) AS rank, term AS suggestion,
               distance, df
        FROM rk WHERE rank <= 3 ORDER BY query, rank
    """

    # image_hash_search: md5-derived population + single-bit-flip
    # plants, popcount(xor) replay, (hamming, id) top-k.
    o["image_hash_search"] = """
        WITH pop AS (
          SELECT range AS id,
                 ('0x' || substr(md5('img:' || range), 1, 15))::BIGINT AS h
          FROM range(4000)
          UNION ALL
          SELECT 10000 + range,
                 xor(67818912035696880::BIGINT,
                     1::BIGINT << ((range % 56)::INT + 1))
          FROM range(8)
        )
        SELECT id,
               CAST(bit_count(xor(h, 67818912035696880::BIGINT)) AS INT)
                 AS hamming
        FROM pop ORDER BY hamming, id LIMIT 15
    """

    # search_index_merge: the oracle builds FROM SCRATCH over the
    # current (mutated) corpus — equality proves incremental == full.
    o["search_index_merge"] = f"""
        WITH cur AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0
                      THEN text || ' refreshed content marker refreshed'
                      ELSE text END AS text
          FROM documents
        ),
        tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM cur),
        post AS (
          SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY term, doc_id
        )
        SELECT term, doc_id, tf FROM post
        WHERE term IN ('merge', 'vector', 'refreshed')
        ORDER BY term, doc_id
    """

    # linkgraph_kcore: 6 unrolled peel rounds (fixture converges in 3;
    # extra rounds are idempotent) then final in-core degrees.
    o["linkgraph_kcore"] = f"""
        WITH raw AS (
          SELECT range AS src, (range + 1) % 200 AS dst FROM range(200)
          UNION ALL SELECT range, (range + 2) % 200 FROM range(200)
          UNION ALL SELECT 500 + range // 8, 500 + range % 8
            FROM range(64) WHERE range // 8 < range % 8
          UNION ALL SELECT 1000 + range, (range * 3) % 200 FROM range(100)
          UNION ALL SELECT 1000 + range, (range * 7 + 1) % 200 FROM range(100)
          UNION ALL SELECT 1000 + range, (range * 11 + 2) % 200 FROM range(100)
          UNION ALL SELECT 2000, 3000 + range FROM range(4)
        ),
        {_kcore_cte_chain(6, 4)}
        SELECT id, CAST(count(*) AS BIGINT) AS degree_in_core FROM (
          SELECT a AS id FROM e6 UNION ALL SELECT b FROM e6
        ) GROUP BY id ORDER BY id
    """

    # crawl_trending_terms: arithmetic fixture + time_bucket (DuckDB
    # to_timestamp → TIMESTAMPTZ: cast naive for UTC-session parity,
    # the crawl_health_windows pitfall) + counts + row_number.
    o["crawl_trending_terms"] = """
        WITH v AS (
          SELECT ['alpha','beta','gamma','delta','epsilon','zeta'] AS vs
        ),
        pages AS (
          SELECT range AS page_id,
                 CAST(to_timestamp(1756684800 + (range * 97) % 3600)
                      AS TIMESTAMP) AS ts,
                 vs[(range * 7) % 6 + 1] || ' ' || vs[(range * 11) % 6 + 1]
                 || ' ' ||
                 CASE WHEN range >= 200 AND range < 300 THEN 'flashcrash'
                      ELSE vs[(range * 13) % 6 + 1] END AS text
          FROM range(600), v
        ),
        tok AS (
          SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS window_start,
                 unnest(string_split(text, ' ')) AS term
          FROM pages
        ),
        counts AS (
          SELECT window_start, term,
                 CAST(count(*) AS BIGINT) AS n_occurrences
          FROM tok GROUP BY window_start, term
        ),
        rk AS (
          SELECT *, row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_occurrences DESC, term) AS rank
          FROM counts
        )
        SELECT window_start, term, n_occurrences, CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 3
        ORDER BY window_start, rank
    """

    # dedup_cluster_census: the same closure + two rollups.
    o["dedup_cluster_census"] = f"""
        WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL
          SELECT id_b, id_a FROM pairs
        ),
        reach(root, node) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS doc_id, min(node) AS component
          FROM reach GROUP BY root
        ),
        sizes AS (
          SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
          FROM comp GROUP BY component
        )
        SELECT cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
               CAST((cluster_size - 1) * count(*) AS BIGINT)
                 AS docs_removed_if_deduped
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """

    # host_steering_fusion: all four signal replays over the shared
    # fixture composed in one statement (micro-quality ints, digest
    # first-rounds, distinct-target saturation, quantile_disc p95).
    o["host_steering_fusion"] = """
        WITH raw AS (
          SELECT printf('h%d', h) AS host, r, j,
                 CASE WHEN h % 4 = 0 AND j % 10 < 7 THEN 0.2 ELSE 0.8 END AS q,
                 CASE WHEN h % 3 = 0 THEN printf('d%d', h * 100 + j)
                      ELSE printf('d%d', h * 1000 + r * 100 + j) END AS digest,
                 CASE WHEN h % 2 = 0 THEN printf('t%d', h * 50 + j % 20)
                      ELSE printf('t%d', h * 1000 + r * 100 + j) END AS target,
                 CASE WHEN h % 5 = 0 THEN 900 + j * 10 ELSE 80 + j END AS latency_ms,
                 CASE WHEN h % 7 = 0 THEN j % 2 = 0 ELSE TRUE END AS ok
          FROM (SELECT range // 90 AS h, (range // 30) % 3 + 1 AS r,
                       range % 30 AS j
                FROM range(2160))
        ),
        qual AS (
          SELECT host, count(*) AS n,
                 CAST(sum(CASE WHEN q < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
          FROM raw GROUP BY host
        ),
        qv AS (
          SELECT host,
                 (n >= 5 AND CAST(n_low AS DOUBLE) / n >= 0.6) AS quality_demote
          FROM qual
        ),
        firsts AS (SELECT digest, min(r) AS fr FROM raw GROUP BY digest),
        per_round AS (
          SELECT host, r,
                 CAST(count(*) AS BIGINT) AS n_fetched,
                 CAST(sum(CASE WHEN raw.r = f.fr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_novel
          FROM raw JOIN firsts f USING (digest)
          GROUP BY host, r
        ),
        latest AS (SELECT host, max(r) AS lr FROM per_round GROUP BY host),
        nv AS (
          SELECT p.host,
                 (p.n_fetched >= 20
                  AND (1000 * p.n_novel) // p.n_fetched < 200) AS novelty_demote
          FROM per_round p JOIN latest l ON l.host = p.host AND p.r = l.lr
        ),
        links AS (SELECT DISTINCT host, r, target FROM raw),
        tfirst AS (SELECT target, min(r) AS fr FROM links GROUP BY target),
        lper AS (
          SELECT host, r,
                 CAST(count(*) AS BIGINT) AS n_links,
                 CAST(sum(CASE WHEN links.r = t.fr THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new
          FROM links JOIN tfirst t USING (target)
          GROUP BY host, r
        ),
        llatest AS (SELECT host, max(r) AS lr FROM lper GROUP BY host),
        sat AS (
          SELECT p.host,
                 ((1000 * p.n_new) // p.n_links < 300
                  AND p.n_links >= 20) AS saturated
          FROM lper p JOIN llatest l ON l.host = p.host AND p.r = l.lr
        ),
        health AS (
          SELECT host,
                 CAST(quantile_disc(latency_ms, 0.95) AS BIGINT) AS p95,
                 avg(CASE WHEN ok THEN 0.0 ELSE 1.0 END) AS err
          FROM raw GROUP BY host
        ),
        ad AS (
          SELECT host,
                 least(60000, CASE WHEN err > 0.3
                      THEN least(60000, greatest(200, 3 * p95)) * 2
                      ELSE least(60000, greatest(200, 3 * p95)) END) AS delay_ms
          FROM health
        )
        SELECT q.host, q.quality_demote, n.novelty_demote, s.saturated,
               CAST(CASE WHEN q.quality_demote THEN 1 ELSE 0 END
                    + CASE WHEN n.novelty_demote THEN 1 ELSE 0 END
                    + CASE WHEN s.saturated THEN 1 ELSE 0 END AS BIGINT)
                 AS priority_penalty,
               CAST(a.delay_ms AS BIGINT) AS delay_ms
        FROM qv q
        JOIN nv n USING (host)
        JOIN sat s USING (host)
        JOIN ad a USING (host)
        ORDER BY q.host
    """

    # search_standing_alerts: distinct doc-terms x VALUES queries,
    # count == query size.
    o["search_standing_alerts"] = f"""
        WITH qs AS (
          SELECT * FROM (VALUES
            ('q_joins', 'merge'), ('q_joins', 'join'),
            ('q_vec', 'vector'), ('q_vec', 'batch'), ('q_vec', 'scan'),
            ('q_ghost', 'merge'), ('q_ghost', 'zzzabsent')
          ) AS t(query_id, term)
        ),
        need AS (SELECT query_id, count(*) AS need FROM qs GROUP BY query_id),
        dt AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest({_TOKS}) AS term FROM documents
          )
        ),
        hits AS (
          SELECT q.query_id, d.doc_id, CAST(count(*) AS BIGINT) AS n_terms
          FROM dt d JOIN qs q USING (term)
          GROUP BY q.query_id, d.doc_id
        )
        SELECT h.query_id, h.doc_id, h.n_terms
        FROM hits h JOIN need n USING (query_id)
        WHERE h.n_terms = n.need
        ORDER BY h.query_id, h.doc_id
    """

    # search_anchor_boosted: both fields' Okapi replays (own corpus
    # stats each; anchor corpus = order-free string_agg concat), fused
    # with the same literal weights and rounding path.
    o["search_anchor_boosted"] = f"""
        WITH bt AS (SELECT doc_id, {_TOKS} AS ls FROM documents),
        bdl AS (SELECT doc_id, len(ls) AS dl FROM bt),
        bconsts AS (
          SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
          FROM bdl
        ),
        btok AS (SELECT doc_id, unnest(ls) AS term FROM bt),
        bpost AS (
          SELECT term, doc_id, count(*) AS tf FROM btok
          WHERE term IN ('vector', 'merge') GROUP BY term, doc_id
        ),
        bdfs AS (SELECT term, count(*) AS df FROM bpost GROUP BY term),
        bsc AS (
          SELECT p.doc_id,
                 ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                 * (p.tf * (1.2 + 1))
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS part
          FROM bpost p JOIN bdfs s USING (term)
          JOIN bdl d USING (doc_id), bconsts c
        ),
        body AS (
          SELECT doc_id, round(sum(part), 4) AS body_score
          FROM bsc GROUP BY doc_id
        ),
        ar AS (
          SELECT (range * 13) % 600 AS doc_id,
                 (['vector index link', 'merge join deep dive',
                   'fast scan tricks', 'click here',
                   'best vector merge guide'])[(range % 5 + 1)::INT] AS anchor
          FROM range(3000)
        ),
        adocs AS (
          SELECT doc_id, string_agg(anchor, ' ') AS text
          FROM ar GROUP BY doc_id
        ),
        at AS (SELECT doc_id, {_TOKS} AS ls FROM adocs),
        adl AS (SELECT doc_id, len(ls) AS dl FROM at),
        aconsts AS (
          SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
          FROM adl
        ),
        atok AS (SELECT doc_id, unnest(ls) AS term FROM at),
        apost AS (
          SELECT term, doc_id, count(*) AS tf FROM atok
          WHERE term IN ('vector', 'merge') GROUP BY term, doc_id
        ),
        adfs AS (SELECT term, count(*) AS df FROM apost GROUP BY term),
        asc_ AS (
          SELECT p.doc_id,
                 ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                 * (p.tf * (1.2 + 1))
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS part
          FROM apost p JOIN adfs s USING (term)
          JOIN adl d USING (doc_id), aconsts c
        ),
        anch AS (
          SELECT doc_id, round(sum(part), 4) AS anchor_score
          FROM asc_ GROUP BY doc_id
        ),
        fused AS (
          SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
                 coalesce(b.body_score, 0.0) AS body_score,
                 coalesce(a.anchor_score, 0.0) AS anchor_score,
                 round(0.7 * coalesce(b.body_score, 0.0)
                       + 0.3 * coalesce(a.anchor_score, 0.0), 4) AS score
          FROM body b FULL OUTER JOIN anch a ON a.doc_id = b.doc_id
        )
        SELECT doc_id, body_score, anchor_score, score
        FROM fused ORDER BY score DESC, doc_id LIMIT 30
    """

    # sitemap_cross_host_screen: host-extraction + eTLD+1 replay on
    # BOTH ends against the same literal suffix list.
    o["sitemap_cross_host_screen"] = f"""
        WITH decl AS (
          SELECT printf('www.ex%d.co.uk', range % 20) AS host,
                 CASE range % 6
                   WHEN 0 THEN printf('https://www.ex%d.co.uk/sitemap%d.xml',
                                      range % 20, range)
                   WHEN 1 THEN printf('https://cdn.ex%d.co.uk/sm.xml', range % 20)
                   WHEN 2 THEN printf('https://evil%d.com/sm.xml', range % 20)
                   WHEN 3 THEN printf('http://ex%d.co.uk/sm.xml', range % 20)
                   WHEN 4 THEN printf('https://other%d.co.uk/sm.xml', range % 20)
                   ELSE printf('HTTPS://CDN.EX%d.CO.UK:8443/sm.xml', range % 20)
                 END AS sitemap_url
          FROM range(200)
        ),
        ext AS (
          SELECT host, sitemap_url,
                 lower(string_split(
                   regexp_extract(sitemap_url,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1), ':')[1])
                   AS sitemap_host
          FROM decl
        ),
        keyed AS (
          SELECT *,
                 string_split(lower(host), '.') AS hl,
                 string_split(lower(sitemap_host), '.') AS sl
          FROM ext
        ),
        dom AS (
          SELECT host, sitemap_url, sitemap_host,
                 CASE WHEN len(hl) >= 3
                           AND list_contains([{_sfx}], hl[-2] || '.' || hl[-1])
                      THEN hl[-3] || '.' || hl[-2] || '.' || hl[-1]
                      WHEN len(hl) >= 2 THEN hl[-2] || '.' || hl[-1]
                      ELSE lower(host) END AS hsite,
                 CASE WHEN len(sl) >= 3
                           AND list_contains([{_sfx}], sl[-2] || '.' || sl[-1])
                      THEN sl[-3] || '.' || sl[-2] || '.' || sl[-1]
                      WHEN len(sl) >= 2 THEN sl[-2] || '.' || sl[-1]
                      ELSE lower(sitemap_host) END AS ssite
          FROM keyed
        )
        SELECT host, sitemap_url, sitemap_host,
               hsite = ssite AS same_site,
               (hsite = ssite AND sitemap_host <> '') AS accepted
        FROM dom ORDER BY host, sitemap_url
    """

    # search_eval_pr: phrase truth + BM25 top-10 replays composed into
    # the two permille metrics.
    o["search_eval_pr"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS ls FROM documents),
        x AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS p FROM t),
        rows_ AS (SELECT doc_id, p - 1 AS pos, ls[p] AS term FROM x
                  WHERE ls[p] IN ('merge', 'join')),
        truth AS (
          SELECT DISTINCT a.doc_id
          FROM rows_ a JOIN rows_ b
            ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
          WHERE a.term = 'merge' AND b.term = 'join'
        ),
        dl AS (SELECT doc_id, len(ls) AS dl FROM t),
        consts AS (
          SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
          FROM dl
        ),
        tok AS (SELECT doc_id, unnest(ls) AS term FROM t),
        post AS (
          SELECT term, doc_id, count(*) AS tf FROM tok
          WHERE term IN ('merge', 'join') GROUP BY term, doc_id
        ),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        sc AS (
          SELECT p.doc_id,
                 ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                 * (p.tf * (1.2 + 1))
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS part
          FROM post p JOIN dfs s USING (term)
          JOIN dl d USING (doc_id), consts c
        ),
        agg AS (
          SELECT doc_id, round(sum(part), 4) AS score
          FROM sc GROUP BY doc_id
        ),
        top AS (
          SELECT doc_id FROM agg ORDER BY score DESC, doc_id LIMIT 10
        ),
        m AS (
          SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
                 (SELECT CAST(count(*) AS BIGINT)
                  FROM top WHERE doc_id IN (SELECT doc_id FROM truth)) AS n_hits
        )
        SELECT 'merge join' AS query, CAST(10 AS INT) AS k, n_truth, n_hits,
               CAST((1000 * n_hits) // 10 AS BIGINT) AS p_at_k_permille,
               CASE WHEN n_truth = 0 THEN NULL
                    ELSE CAST((1000 * n_hits) // n_truth AS BIGINT)
               END AS recall_permille
        FROM m
    """

    # frontier_feed_merge / census: the same arithmetic feeds replayed.
    o["frontier_feed_merge"] = """
        WITH feeds AS (
          SELECT printf('https://ex.com/u%d', range) AS url, 2 AS priority,
                 'links' AS source FROM range(1500)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 2),
                 CAST(range * 2 // 500 AS INT), 'sitemap' FROM range(1000)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 10 + 7), 1, 'hreflang'
          FROM range(200)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 5), 2, 'redirects'
          FROM range(400)
          UNION ALL
          SELECT printf('https://ex.com/u%d', 2000 + range), 0, 'redirects'
          FROM range(100)
        )
        SELECT url, CAST(min(priority) AS INT) AS priority,
               CAST(count(DISTINCT source) AS INT) AS n_feeds,
               array_to_string(list_sort(list(DISTINCT source)), '+') AS sources
        FROM feeds GROUP BY url ORDER BY url
    """

    o["frontier_feed_census"] = """
        WITH feeds AS (
          SELECT printf('https://ex.com/u%d', range) AS url, 2 AS priority,
                 'links' AS source FROM range(1500)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 2),
                 CAST(range * 2 // 500 AS INT), 'sitemap' FROM range(1000)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 10 + 7), 1, 'hreflang'
          FROM range(200)
          UNION ALL
          SELECT printf('https://ex.com/u%d', range * 5), 2, 'redirects'
          FROM range(400)
          UNION ALL
          SELECT printf('https://ex.com/u%d', 2000 + range), 0, 'redirects'
          FROM range(100)
        ),
        per AS (SELECT DISTINCT url, source FROM feeds),
        counts AS (SELECT url, count(*) AS nf FROM per GROUP BY url)
        SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(CASE WHEN c.nf = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_exclusive,
               CAST((1000 * sum(CASE WHEN c.nf = 1 THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS exclusive_permille
        FROM per p JOIN counts c USING (url)
        GROUP BY source ORDER BY source
    """

    # linkgraph_hopplot: three depth-capped walks, min(d) = BFS layer,
    # histogram + running sum over the tiny depth table.
    o["linkgraph_hopplot"] = f"""
        WITH RECURSIVE {_sim_opicgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        walk(pv, node, d) AS (
          SELECT p, CAST(p AS BIGINT), 0
          FROM (SELECT unnest([0, 7, 13]) AS p)
          UNION
          SELECT w.pv, e.dst, w.d + 1
          FROM walk w JOIN dedges e ON e.src = w.node
          WHERE w.d < 8
        ),
        lay AS (
          SELECT pv, node, min(d) AS depth FROM walk
          GROUP BY pv, node
        ),
        per AS (
          SELECT CAST(pv AS BIGINT) AS pv, CAST(depth AS BIGINT) AS depth,
                 CAST(count(*) AS BIGINT) AS n_nodes
          FROM lay GROUP BY pv, depth
        )
        SELECT pv AS "pivot", depth, n_nodes,
               CAST(sum(n_nodes) OVER (PARTITION BY pv ORDER BY depth
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_nodes
        FROM per ORDER BY pv, depth
    """

    # robots_render_roundtrip: the policy arithmetic DIRECTLY — no
    # render, no parse — so equality proves the roundtrip identity.
    o["robots_render_roundtrip"] = """
        SELECT printf('h%d', range) AS host,
               CASE WHEN range % 2 = 0
                    THEN printf('/p%d', range % 5) || '+' || '/admin'
                    ELSE printf('/x%d', range) END AS prefixes,
               CASE WHEN range % 3 <> 0
                    THEN CAST(1 + range % 4 AS BIGINT) END AS crawl_delay_s,
               printf('https://h%d.ex.com/sm1.xml', range)
               || CASE WHEN range % 5 = 0
                       THEN '+' || printf('https://h%d.ex.com/sm2.xml', range)
                       ELSE '' END AS sitemaps
        FROM range(60) ORDER BY host
    """

    # sitemap_render_roundtrip: entry arithmetic directly — no XML.
    o["sitemap_render_roundtrip"] = """
        WITH mem AS (
          SELECT range // 5 AS h, range % 5 AS j FROM range(200)
        )
        SELECT printf('h%d', h) AS host,
               printf('https://h%d.ex.com/p%d', h, j) AS url,
               CASE WHEN j % 2 = 0
                    THEN TIMESTAMP '2025-09-01 00:00:00'
                         + ((h + j) % 27) * INTERVAL 1 DAY
               END AS lastmod,
               CAST(CASE WHEN j % 3 <> 1 THEN ((h + j) % 10) * 100
                         ELSE 500 END AS BIGINT) AS priority_permille,
               CAST(CASE WHEN (CASE WHEN j % 3 <> 1 THEN ((h + j) % 10) * 100
                                    ELSE 500 END) >= 800 THEN 0
                         WHEN (CASE WHEN j % 3 <> 1 THEN ((h + j) % 10) * 100
                                    ELSE 500 END) >= 400 THEN 1
                         ELSE 2 END AS BIGINT) AS priority
        FROM mem ORDER BY host, url
    """

    # crawl_serve_pipeline: curation CTEs + Okapi replay over the
    # representative corpus.
    o["crawl_serve_pipeline"] = f"""
        WITH scored AS (
          SELECT doc_id, text,
                 round(
                   least(({_STOP_RATIO}) * 4, 1.0) * 0.4
                   + (CASE WHEN ({_MTL}) >= 3 AND ({_MTL}) <= 10
                           THEN 1.0 ELSE 0.0 END) * 0.3
                   + greatest(0.0, 1 - ({_PUNCT}) * 5) * 0.2
                   + least(len({_TOKS}) / 20.0, 1.0) * 0.1,
                 6) AS quality,
                 CASE WHEN {_STOP_RATIO} >= 0.08 THEN 'en' ELSE 'other' END
                   AS lang_pred
          FROM documents
        ),
        kept AS (
          SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'
        ),
        reps AS (
          SELECT md5({_NORM}) AS fp, min(doc_id) AS rep_id
          FROM kept GROUP BY 1
        ),
        corpus AS (
          SELECT k.doc_id, k.text
          FROM kept k JOIN reps r ON k.doc_id = r.rep_id
        ),
        t AS (SELECT doc_id, {_TOKS} AS ls FROM corpus),
        dl AS (SELECT doc_id, len(ls) AS dl FROM t),
        consts AS (
          SELECT count(*) AS n_docs, sum(dl)::DOUBLE / count(*) AS avgdl
          FROM dl
        ),
        tok AS (SELECT doc_id, unnest(ls) AS term FROM t),
        post AS (
          SELECT term, doc_id, count(*) AS tf FROM tok
          WHERE term IN ('vector', 'merge') GROUP BY term, doc_id
        ),
        dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
        sc AS (
          SELECT p.doc_id,
                 ln(1.0 + (c.n_docs - s.df + 0.5) / (s.df + 0.5))
                 * (p.tf * (1.2 + 1))
                 / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / c.avgdl)) AS part
          FROM post p JOIN dfs s USING (term)
          JOIN dl d USING (doc_id), consts c
        ),
        agg AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
                 round(sum(part), 4) AS score
          FROM sc GROUP BY doc_id
        )
        SELECT doc_id, n_hit_terms, score
        FROM agg ORDER BY score DESC, doc_id LIMIT 15
    """

    # corpus_perplexity_buckets: the unigram replay -> identical
    # double-rounding chain -> quantile_cont tertiles -> buckets.
    o["corpus_perplexity_buckets"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT sum(c) AS n_total FROM freq),
        lp AS (
          SELECT doc_id,
                 CAST(round(round(avg(ln(n_total) - ln(c)), 4) * 1000)
                      AS BIGINT) AS mi
          FROM toks JOIN freq USING (tok) CROSS JOIN total
          GROUP BY doc_id
        ),
        cuts AS (
          SELECT quantile_cont(mi, 0.3333333333333333) AS q1,
                 quantile_cont(mi, 0.6666666666666666) AS q2
          FROM lp
        )
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(mi) AS BIGINT) AS min_mi,
               CAST(max(mi) AS BIGINT) AS max_mi
        FROM (
          SELECT l.mi,
                 CASE WHEN l.mi <= c.q1 THEN 'head'
                      WHEN l.mi <= c.q2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM lp l, cuts c
        ) GROUP BY bucket ORDER BY bucket
    """

    # corpus_ccnet_sample: buckets + the ('0x'||substr(md5))::INT coin.
    o["corpus_ccnet_sample"] = f"""
        WITH toks AS (
          SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
        ),
        freq AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        total AS (SELECT sum(c) AS n_total FROM freq),
        lp AS (
          SELECT doc_id,
                 CAST(round(round(avg(ln(n_total) - ln(c)), 4) * 1000)
                      AS BIGINT) AS mi
          FROM toks JOIN freq USING (tok) CROSS JOIN total
          GROUP BY doc_id
        ),
        cuts AS (
          SELECT quantile_cont(mi, 0.3333333333333333) AS q1,
                 quantile_cont(mi, 0.6666666666666666) AS q2
          FROM lp
        ),
        tagged AS (
          SELECT l.doc_id, l.mi,
                 CASE WHEN l.mi <= c.q1 THEN 'head'
                      WHEN l.mi <= c.q2 THEN 'middle'
                      ELSE 'tail' END AS bucket
          FROM lp l, cuts c
        )
        SELECT doc_id, bucket, mi FROM tagged
        WHERE bucket = 'head'
           OR (bucket = 'middle'
               AND ('0x' || substr(md5('ccnet:' || doc_id), 1, 2))::INT % 2 = 0)
        ORDER BY doc_id
    """

    # frontier_robots_deadweight: prefix test + rollup replay.
    o["frontier_robots_deadweight"] = """
        WITH fr AS (
          SELECT printf('h%d', range % 25) AS host,
                 CASE WHEN range % 5 < 2 THEN printf('/private/p%d', range)
                      WHEN range % 5 = 2 THEN printf('/tmp/s%d', range)
                      ELSE printf('/articles/a%d', range) END AS path
          FROM range(5000)
        ),
        rules AS (
          SELECT printf('h%d', range) AS host,
                 CASE WHEN range % 3 = 0 THEN ['/private/', '/tmp/']
                      WHEN range % 3 = 1 THEN ['/private/']
                      ELSE [] END AS prefixes
          FROM range(25)
        ),
        j AS (
          SELECT f.host,
                 CASE WHEN len(list_filter(r.prefixes,
                        p -> starts_with(f.path, p))) > 0
                      THEN 1 ELSE 0 END AS blocked
          FROM fr f JOIN rules r USING (host)
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_frontier,
               CAST(sum(blocked) AS BIGINT) AS n_blocked,
               CAST((1000 * sum(blocked)) // count(*) AS BIGINT)
                 AS deadweight_permille
        FROM j GROUP BY host ORDER BY host
    """

    # link_spam_mass: PageRank chain + seed-biased TrustRank chain over
    # the spam-farm fixture, joined into the mass-estimation verdict —
    # both recurrences unrolled with engine-identical expression shapes
    # (the suspect boolean thresholds the UNROUNDED ratio in both).
    o["link_spam_mass"] = f"""
        WITH {_sim_trustgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM trust_edges),
        {_pagerank_cte_chain(4)},
        tseeds AS (SELECT range AS id FROM range({SIM_TRUST_SEEDS})),
        {_trustrank_cte_chain(4)}
        SELECT r.id,
               round(r.rank, 6) AS rank,
               round(t.trust, 6) AS trust,
               round((r.rank - t.trust) / r.rank, 6) AS rel_mass,
               (r.rank - t.trust) / r.rank >= 0.95 AS spam_suspect
        FROM r4 r JOIN t4 t ON t.id = r.id
        ORDER BY r.id
    """

    # recrawl_change_magnitude: the 2-round mutated log rebuilt in SQL,
    # shingled with the inverted-index jaccard machinery (distinct
    # 3-shingles per (url, rk), common = equi-join rk1×rk2 per url),
    # permille all-integer.
    o["recrawl_change_magnitude"] = f"""
        WITH log AS (
          SELECT doc_id AS url, 1 AS rnd, text FROM documents
          UNION ALL
          SELECT doc_id, 2,
                 CASE WHEN doc_id % 4 = 0 THEN text
                      WHEN doc_id % 4 = 1
                        THEN text || ' appended update note number ' || doc_id
                      ELSE substr(text, 1, CAST(length(text) // 2 AS INT))
                           || ' entirely new rewritten second half with fresh vocabulary '
                           || doc_id END
          FROM documents WHERE doc_id % 4 <> 3
        ),
        ranked AS (
          SELECT url, rnd, text,
                 row_number() OVER (PARTITION BY url ORDER BY rnd DESC) AS rk
          FROM log
        ),
        n AS (
          SELECT url, rnd, rk, string_split({_NORM}, ' ') AS toks
          FROM ranked WHERE rk <= 2
        ),
        g AS (
          SELECT url, rnd, rk,
                 list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS sh
          FROM n
        ),
        e AS (SELECT url, rk, unnest(sh) AS s FROM g),
        common AS (
          SELECT a.url, count(*) AS n_common
          FROM e a JOIN e b ON b.url = a.url AND b.s = a.s
          WHERE a.rk = 1 AND b.rk = 2
          GROUP BY a.url
        ),
        l AS (SELECT url, rnd AS round_latest, len(sh) AS n_latest FROM g WHERE rk = 1),
        p AS (SELECT url, rnd AS round_prev, len(sh) AS n_prev FROM g WHERE rk = 2)
        SELECT l.url, l.round_latest, p.round_prev, l.n_latest, p.n_prev,
               CASE WHEN p.url IS NULL THEN NULL
                    ELSE coalesce(c.n_common, 0) END AS n_common,
               (p.url IS NULL) AS first_seen,
               CASE WHEN p.url IS NULL THEN NULL
                    WHEN l.n_latest + p.n_prev - coalesce(c.n_common, 0) = 0 THEN 0
                    ELSE 1000 - (1000 * coalesce(c.n_common, 0))
                         // (l.n_latest + p.n_prev - coalesce(c.n_common, 0)) END
                 AS change_permille
        FROM l
        LEFT JOIN p ON p.url = l.url
        LEFT JOIN common c ON c.url = l.url
        ORDER BY l.url
    """

    # meta_robots_screen: the directive-token and nofollow-link parse
    # replayed with DuckDB's RE2 over the same patterns; token array =
    # both meta orders' contents comma-joined then split/trim/lower
    # (identical to the engine's concat_ws shape, empty tokens inert).
    o["meta_robots_screen"] = rf"""
        WITH {_sim_meta_pages_sql()},
        parsed AS (
          SELECT url,
                 list_transform(
                   string_split(
                     coalesce(array_to_string(regexp_extract_all(html,
                       '(?i)<meta\s+name="robots"\s+content="([^"]*)"', 1), ','), '')
                     || ',' ||
                     coalesce(array_to_string(regexp_extract_all(html,
                       '(?i)<meta\s+content="([^"]*)"\s+name="robots"', 1), ','), ''),
                     ','),
                   x -> trim(lower(x))) AS d,
                 len(regexp_extract_all(html, '<a\s+href="([^"]+)"', 1)) AS n_links,
                 len(regexp_extract_all(html,
                   '(?i)<a\s+href="([^"]+)"[^>]*\srel="[^"]*nofollow[^"]*"', 1)) AS n_nf
          FROM sim_meta_pages
        )
        SELECT url,
               (list_contains(d, 'noindex') OR list_contains(d, 'none')) AS noindex,
               (list_contains(d, 'nofollow') OR list_contains(d, 'none')) AS nofollow,
               n_links,
               CASE WHEN list_contains(d, 'nofollow') OR list_contains(d, 'none')
                    THEN 0 ELSE n_links - n_nf END AS n_follow_links
        FROM parsed
        ORDER BY url
    """

    # link_graph_degree_stats: nodes × (out,in) degree with 0 for
    # absent, histogrammed — a direct relational replay.
    o["link_graph_degree_stats"] = f"""
        WITH {_sim_trustgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM trust_edges),
        nodes AS (
          SELECT DISTINCT src AS id FROM dedges
          UNION SELECT DISTINCT dst FROM dedges
        ),
        outd AS (SELECT src AS id, count(*) AS d FROM dedges GROUP BY src),
        ind AS (SELECT dst AS id, count(*) AS d FROM dedges GROUP BY dst),
        hist AS (
          SELECT 'out' AS side, coalesce(o.d, 0) AS degree
          FROM nodes n LEFT JOIN outd o ON o.id = n.id
          UNION ALL
          SELECT 'in', coalesce(i.d, 0)
          FROM nodes n LEFT JOIN ind i ON i.id = n.id
        )
        SELECT side, degree, count(*) AS n_nodes
        FROM hist GROUP BY side, degree
        ORDER BY side, degree
    """

    # link_graph_hits: the HITS mutual recursion unrolled (auth from
    # previous hubs, hub from current auths, L2 norm each half-step).
    o["link_graph_hits"] = f"""
        WITH {_sim_linkgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        {_hits_cte_chain(3)}
        SELECT h.id, round(h.hub, 6) AS hub, round(a.auth, 6) AS auth
        FROM h3 h JOIN a3 a ON a.id = h.id
        ORDER BY h.id
    """

    # crawl_depth_labels: independent algorithm — recursive walk
    # enumerating (url, depth) states; UNION (distinct) bounds the state
    # space at nodes × (max_depth+1) so cycles terminate, min(depth) is
    # the BFS distance, the depth < 4 guard is the crawl-depth bound.
    o["crawl_depth_labels"] = f"""
        WITH RECURSIVE {_sim_linkgraph_sql()},
        dedges AS (SELECT DISTINCT src, dst FROM sim_edges),
        walk AS (
          SELECT CAST(0 AS BIGINT) AS url, CAST(0 AS BIGINT) AS depth
          UNION
          SELECT e.dst AS url, w.depth + 1 AS depth
          FROM walk w JOIN dedges e ON e.src = w.url
          WHERE w.depth < 4
        )
        SELECT url, min(depth) AS depth FROM walk
        GROUP BY url ORDER BY url
    """

    # doc_line_scrub: same fixture (8-word lines + planted header/footer),
    # independent scrub replay — df counts GROUP BY the line STRING (the
    # engine groups by xxhash64(line); equal absent 64-bit collisions),
    # canonical first occurrence via row_number over (doc_id, pos).
    o["doc_line_scrub"] = """
        WITH base AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        lined AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 3 = 0
                       THEN 'nav home products contact' || chr(10) ELSE '' END)
                 || array_to_string(
                      [array_to_string(list_slice(toks, i*8 + 1, i*8 + 8), ' ')
                       for i in range(0, (len(toks) - 1) // 8 + 1)], chr(10))
                 || (CASE WHEN doc_id % 5 = 0
                          THEN chr(10) || 'copyright example corp all rights reserved'
                          ELSE '' END) AS text
          FROM base
        ),
        l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined),
        x AS (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS p FROM l),
        ln AS (SELECT doc_id, p - 1 AS pos, ls[p] AS line FROM x),
        st AS (SELECT line, count(*) AS line_df FROM ln GROUP BY line),
        firsts AS (
          SELECT line, doc_id AS fid, pos AS fpos
          FROM (SELECT line, doc_id, pos,
                       row_number() OVER (PARTITION BY line
                                          ORDER BY doc_id, pos) AS rn
                FROM ln)
          WHERE rn = 1
        ),
        kept AS (
          SELECT n.doc_id, n.pos, n.line
          FROM ln n
          JOIN st USING (line)
          JOIN firsts f USING (line)
          WHERE st.line_df <= 1 OR (n.doc_id = f.fid AND n.pos = f.fpos)
        ),
        reb AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id)
        SELECT t.doc_id, coalesce(r.text, '') AS text, t.n_lines,
               coalesce(r.n_kept, 0) AS n_kept
        FROM tot t LEFT JOIN reb r USING (doc_id)
        ORDER BY t.doc_id
    """

    # doc_host_template_scrub: host-keyed replay on line STRINGS —
    # per-(host, doc, line) distinct for df counts, integer
    # cross-multiplied share bar, anti-join scrub, ordered rebuild.
    o["doc_host_template_scrub"] = """
        WITH base AS (
          SELECT doc_id, 'h' || (doc_id % 20) AS host,
                 string_split(text, ' ') AS toks
          FROM documents
        ),
        lined AS (
          SELECT doc_id, host,
                 (CASE WHEN (doc_id % 20) % 3 = 0
                       THEN 'site h' || (doc_id % 20) || ' navigation menu' || chr(10)
                       ELSE '' END)
                 || array_to_string(
                      [array_to_string(list_slice(toks, i*8 + 1, i*8 + 8), ' ')
                       for i in range(0, (len(toks) - 1) // 8 + 1)], chr(10))
                 || (CASE WHEN doc_id % 2 = 0
                          THEN chr(10) || 'global cookie banner accept decline'
                          ELSE '' END) AS text
          FROM base
        ),
        l AS (SELECT doc_id, host, string_split(text, chr(10)) AS ls FROM lined),
        x AS (SELECT doc_id, host, ls, unnest(range(1, len(ls) + 1)) AS p FROM l),
        ln AS (SELECT doc_id, host, p - 1 AS pos, ls[p] AS line FROM x),
        hd AS (SELECT host, count(*) AS host_docs FROM lined GROUP BY host),
        pd AS (SELECT DISTINCT host, doc_id, line FROM ln),
        st AS (SELECT host, line, count(*) AS line_docs FROM pd GROUP BY host, line),
        tpl AS (
          SELECT st.host, st.line
          FROM st JOIN hd USING (host)
          WHERE st.line_docs >= 3 AND st.line_docs * 1000 >= 400 * hd.host_docs
        ),
        kept AS (
          SELECT n.doc_id, n.pos, n.line
          FROM ln n LEFT JOIN tpl t ON t.host = n.host AND t.line = n.line
          WHERE t.line IS NULL
        ),
        reb AS (
          SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
                 count(*) AS n_kept
          FROM kept GROUP BY doc_id
        ),
        tot AS (SELECT doc_id, host, count(*) AS n_lines FROM ln GROUP BY doc_id, host)
        SELECT t.doc_id, t.host, coalesce(r.text, '') AS text, t.n_lines,
               coalesce(r.n_kept, 0) AS n_kept,
               t.n_lines - coalesce(r.n_kept, 0) AS n_template
        FROM tot t LEFT JOIN reb r USING (doc_id)
        ORDER BY t.doc_id
    """

    # image_batch_packing: independent formulation — bucket argmin via
    # cross join + row_number (the engine uses array_min over structs),
    # packing via a plain per-bucket window cumsum (the engine uses the
    # chunked decomposition).  Distances are IEEE divisions of exact
    # integer cross-products in BOTH engines, so no transcendental-ulp
    # bucket flips; ties order by (d, i) in both.
    o["image_batch_packing"] = """
        WITH imgs AS (
          SELECT range AS image_id,
                 160 + (range * 37) % 768 AS w,
                 160 + (range * 53) % 768 AS h
          FROM range(600)
        ),
        ratios AS (
          SELECT * FROM (VALUES (0, 1, 2), (1, 3, 4), (2, 1, 1),
                                (3, 4, 3), (4, 2, 1)) AS t(i, p, q)
        ),
        cand AS (
          SELECT image_id, w, h, i,
                 greatest(w * q, h * p) / least(w * q, h * p) AS d
          FROM imgs CROSS JOIN ratios
        ),
        pick AS (
          SELECT image_id, w, h, CAST(i AS BIGINT) AS ar_bucket
          FROM (SELECT *, row_number() OVER (PARTITION BY image_id
                                             ORDER BY d, i) AS rn
                FROM cand)
          WHERE rn = 1
        )
        SELECT image_id, ar_bucket, w * h AS n_px,
               CAST(floor((sum(w * h) OVER (PARTITION BY ar_bucket
                             ORDER BY image_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - w * h) / 1500000) AS BIGINT) AS pack_id
        FROM pick
        ORDER BY image_id
    """

    # image_decontamination: brute-force cross join (600×20 is nothing
    # for the oracle) — independent of the engine's pigeonhole blocking,
    # which is exact at radius 3 by construction, so the two must agree.
    o["image_decontamination"] = """
        WITH corpus AS (
          SELECT range AS image_id,
                 xor(xor(range * 2654435761, (range * 48271) << 30),
                     range << 47) AS phash
          FROM range(600)
        ),
        ev AS (
          SELECT range AS eval_id,
                 xor(
                   xor(xor((range*17) * 2654435761,
                           ((range*17) * 48271) << 30),
                       (range*17) << 47),
                   (CASE WHEN range % 2 = 0
                         THEN CASE range % 4 WHEN 0 THEN 0 WHEN 2 THEN 3
                              ELSE 1 END
                         ELSE 511 END) << (range % 40)
                 ) AS phash
          FROM range(20)
        ),
        m AS (
          SELECT c.image_id, e.eval_id,
                 bit_count(xor(c.phash, e.phash)) AS ham
          FROM corpus c CROSS JOIN ev e
          WHERE bit_count(xor(c.phash, e.phash)) <= 3
        )
        SELECT image_id, count(DISTINCT eval_id) AS n_eval_matches,
               CAST(min(ham) AS BIGINT) AS best_hamming
        FROM m GROUP BY image_id ORDER BY image_id
    """

    # image_curation_packed: brute-force pair + recursive-CTE closure
    # (independent of pigeonhole blocking + path halving), survivor
    # anti-join, then the independent argmin-bucket + window-cumsum
    # packing replay — one SQL statement spanning the whole capstone.
    o["image_curation_packed"] = f"""
        WITH RECURSIVE {_sim_images_sql()},
        prs AS (
          SELECT a.image_id AS id_a, b.image_id AS id_b
          FROM sim_images a JOIN sim_images b ON a.image_id < b.image_id
          WHERE bit_count(xor(a.phash, b.phash)) <= 3
        ),
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM prs
          UNION ALL
          SELECT id_b, id_a FROM prs
        ),
        rnodes AS (SELECT DISTINCT src AS id FROM edges),
        reach(root, node) AS (
          SELECT id, id FROM rnodes
          UNION
          SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.node
        ),
        comp AS (
          SELECT root AS id, min(node) AS component
          FROM reach GROUP BY root
        ),
        survivors AS (
          SELECT s.*, CAST(substr(s.image_id, 4) AS BIGINT) AS ord
          FROM sim_images s
          WHERE s.image_id NOT IN (SELECT id FROM comp WHERE id <> component)
        ),
        ratios AS (
          SELECT * FROM (VALUES (0, 1, 2), (1, 3, 4), (2, 1, 1),
                                (3, 4, 3), (4, 2, 1)) AS t(i, p, q)
        ),
        cand AS (
          SELECT s.image_id, s.ord, s.w, s.h, r.i,
                 greatest(s.w * r.q, s.h * r.p)
                 / least(s.w * r.q, s.h * r.p) AS d
          FROM survivors s CROSS JOIN ratios r
        ),
        pick AS (
          SELECT image_id, ord, w, h, CAST(i AS BIGINT) AS ar_bucket
          FROM (SELECT *, row_number() OVER (PARTITION BY image_id
                                             ORDER BY d, i) AS rn
                FROM cand)
          WHERE rn = 1
        )
        SELECT image_id, ar_bucket, CAST(w * h AS BIGINT) AS n_px,
               CAST(floor((sum(w * h) OVER (PARTITION BY ar_bucket
                             ORDER BY ord
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - w * h) / 1500000) AS BIGINT) AS pack_id
        FROM pick
        ORDER BY image_id
    """

    # crawl_budget_allocation: plain global-window largest-remainder
    # replay (the engine uses the bucketed distributed selection) —
    # integer div/mod make the two bit-identical by construction.
    o["crawl_budget_allocation"] = """
        WITH w AS (
          SELECT printf('h%03d.example.com', CAST(range AS INT)) AS host,
                 1 + (range * 48271) % 997 AS weight
          FROM range(200)
        ),
        tot AS (SELECT sum(weight) AS W FROM w),
        q AS (
          SELECT host, weight,
                 (10000 * weight) // W AS base,
                 (10000 * weight) % W AS rem
          FROM w, tot
        ),
        rr AS (SELECT 10000 - sum(base) AS r FROM q),
        rk AS (
          SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rn
          FROM q
        )
        SELECT host, weight,
               CAST(base + CASE WHEN rn <= (SELECT r FROM rr)
                                THEN 1 ELSE 0 END AS BIGINT) AS budget
        FROM rk ORDER BY host
    """

    # anchor_text_consensus: independent mode — row_number over
    # (count DESC, anchor ASC) picks the modal anchor (the engine uses
    # min over (−count, anchor) structs); same fixture arithmetic.
    o["anchor_text_consensus"] = """
        WITH l AS (
          SELECT printf('https://s%d.example.com/p', range % 200) AS src_url,
                 printf('https://t%d.example.com/', (range * 261) % 80) AS href,
                 ['click here', 'official site', 'read more', 'home'][
                   CAST(CASE WHEN range % 3 < 2 THEN ((range * 261) % 80) % 4
                             ELSE (range * 7) % 4 END AS INT) + 1
                 ] AS anchor
          FROM range(2000)
        ),
        c AS (
          SELECT href, anchor, count(*) AS c FROM l GROUP BY href, anchor
        ),
        top AS (
          SELECT href, anchor AS top_anchor, c AS top_n
          FROM (SELECT *, row_number() OVER (PARTITION BY href
                                             ORDER BY c DESC, anchor) AS rn
                FROM c)
          WHERE rn = 1
        ),
        agg AS (
          SELECT href, count(*) AS n_links,
                 count(DISTINCT src_url) AS n_srcs
          FROM l GROUP BY href
        )
        SELECT a.href, a.n_links, a.n_srcs, t.top_anchor, t.top_n,
               round(t.top_n / a.n_links, 6) AS top_share
        FROM agg a JOIN top t ON t.href = a.href
        ORDER BY a.href
    """

    # redirect_resolution: independent algorithm — a recursive CTE walks
    # every chain one hop at a time; UNION (distinct) makes cycle walks
    # revisit known states and terminate.  A url is resolved iff some
    # reached node has no outgoing edge (functional graph → at most one
    # such node per url); cycle members/tails never reach one → NULL.
    o["redirect_resolution"] = f"""
        WITH RECURSIVE {_sim_redirects_sql()},
        walk AS (
          SELECT src AS url, dst AS cur FROM redirect_edges
          UNION
          SELECT w.url, e.dst
          FROM walk w JOIN redirect_edges e ON w.cur = e.src
        ),
        resolved AS (
          SELECT url, cur AS final_url FROM walk
          WHERE cur NOT IN (SELECT src FROM redirect_edges)
        )
        SELECT s.src AS url, r.final_url,
               r.final_url IS NOT NULL AS resolved
        FROM redirect_edges s LEFT JOIN resolved r ON s.src = r.url
        ORDER BY url
    """

    # page_link_extract: same <a href> regex per group, list_zip + unnest
    # (DuckDB regexp_extract_all takes the group index like Spark's).
    o["page_link_extract"] = f"""
        WITH {_sim_pages_sql()},
        z AS (
          SELECT url AS src_url,
                 list_zip(
                   regexp_extract_all(html, '<a\\s+href="([^"]+)"[^>]*>([^<]*)</a>', 1),
                   regexp_extract_all(html, '<a\\s+href="([^"]+)"[^>]*>([^<]*)</a>', 2)
                 ) AS pairs
          FROM sim_pages
        ),
        e AS (SELECT src_url, unnest(pairs) AS p FROM z)
        SELECT src_url, struct_extract(p, 1) AS href,
               struct_extract(p, 2) AS anchor
        FROM e ORDER BY src_url, href, anchor
    """

    # sitemap_frontier_seed: per-<url>-block isolation replayed ('s' flag
    # = dotall, blocks cross newlines), empty lastmod → NULL timestamp.
    o["sitemap_frontier_seed"] = f"""
        WITH {_sim_sitemaps_sql()},
        b AS (
          SELECT host,
                 unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1, 's')) AS blk
          FROM sim_sitemaps
        ),
        p AS (
          SELECT host,
                 trim(regexp_extract(blk, '<loc>\\s*([^<]*?)\\s*</loc>', 1)) AS url,
                 nullif(regexp_extract(blk, '<lastmod>\\s*([^<]*?)\\s*</lastmod>', 1), '') AS lm
          FROM b
        )
        SELECT host, url, CAST(lm AS TIMESTAMP) AS lastmod
        FROM p WHERE url <> '' ORDER BY host, url
    """

    # payload_sniff_format: the magic-byte CASE replayed on the hex text
    # (the engine sniffs true binary; prefixes are what it hex()es back).
    o["payload_sniff_format"] = f"""
        WITH {_sim_payloads_sql()}
        SELECT payload_id,
               CASE
                 WHEN substr(hexstr, 1, 8) = '52494646'
                      AND substr(hexstr, 17, 8) = '57454250' THEN 'webp'
                 WHEN substr(hexstr, 1, 16) = '89504E470D0A1A0A' THEN 'png'
                 WHEN substr(hexstr, 1, 8) = '47494638' THEN 'gif'
                 WHEN substr(hexstr, 1, 6) = 'FFD8FF' THEN 'jpeg'
                 WHEN substr(hexstr, 1, 4) = '424D' THEN 'bmp'
                 ELSE 'unknown'
               END AS fmt
        FROM sim_payloads ORDER BY payload_id
    """

    # dedup_incremental: the inverted-index Jaccard join restricted to
    # batch × corpus (batch = md5 first hex digit in 0-2).
    o["dedup_incremental"] = f"""
        WITH n AS (
          SELECT doc_id, string_split({_NORM}, ' ') AS toks,
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2') AS is_batch
          FROM documents
        ),
        g AS (
          SELECT doc_id, is_batch,
                 list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS sh
          FROM n
        ),
        e AS (SELECT doc_id, is_batch, unnest(sh) AS s FROM g),
        sizes AS (SELECT doc_id, len(sh) AS n FROM g),
        inter AS (
          SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id, count(*) AS i
          FROM e b JOIN e c ON b.s = c.s
          WHERE b.is_batch AND NOT c.is_batch
          GROUP BY 1, 2
        )
        SELECT batch_id, corpus_id,
               round(i::DOUBLE / (sb.n + sc.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes sb ON sb.doc_id = batch_id
        JOIN sizes sc ON sc.doc_id = corpus_id
        WHERE i::DOUBLE / (sb.n + sc.n - i) >= 0.5
        ORDER BY batch_id, corpus_id
    """

    # crawl_backoff_schedule: trailing-failure fold replayed with the
    # same conditional aggregates; 300·2^(k−1) is exact in doubles so
    # the BIGINT casts agree despite DuckDB rounding vs Spark truncating.
    o["crawl_backoff_schedule"] = f"""
        WITH {_sim_attempts_sql()},
        agg AS (
          SELECT url_hash,
                 max(CASE WHEN ok THEN fetch_ts END) AS last_ok,
                 max(fetch_ts) AS last_attempt
          FROM sim_attempts GROUP BY url_hash
        ),
        k AS (
          SELECT a.url_hash, a.last_ok, a.last_attempt,
                 sum(CASE WHEN NOT s.ok AND (a.last_ok IS NULL
                                             OR s.fetch_ts > a.last_ok)
                          THEN 1 ELSE 0 END) AS consecutive_failures
          FROM agg a JOIN sim_attempts s USING (url_hash)
          GROUP BY 1, 2, 3
        )
        SELECT url_hash,
               CAST(consecutive_failures AS BIGINT) AS consecutive_failures,
               consecutive_failures >= 4 AS give_up,
               CASE
                 WHEN consecutive_failures >= 4 THEN NULL
                 WHEN consecutive_failures = 0 THEN last_attempt
                 ELSE last_attempt + to_seconds(CAST(least(
                        300 * pow(2.0, consecutive_failures - 1),
                        86400.0) AS BIGINT))
               END AS next_attempt
        FROM k ORDER BY url_hash
    """

    # crawl_adaptive_delay: percentile_approx is exact below sketch
    # compression and picks the discrete order statistic → quantile_disc
    # (the doc_length_quantiles_approx equivalence, verified at 3 SFs);
    # delay arithmetic is all-integer so the engines agree bit-for-bit.
    o["crawl_adaptive_delay"] = f"""
        WITH {_sim_health_sql()},
        agg AS (
          SELECT host,
                 quantile_disc(latency_ms, 0.95) AS p95_latency_ms,
                 avg(CASE WHEN ok THEN 0.0 ELSE 1.0 END) AS error_rate,
                 count(*) AS n_attempts
          FROM sim_health GROUP BY host
        ),
        d AS (
          SELECT *,
                 least(60000, greatest(200, 3 * p95_latency_ms)) AS base
          FROM agg
        )
        SELECT host,
               CAST(p95_latency_ms AS BIGINT) AS p95_latency_ms,
               round(error_rate, 4) AS error_rate,
               CAST(n_attempts AS BIGINT) AS n_attempts,
               CAST(least(60000, CASE WHEN error_rate > 0.3
                                      THEN base * 2 ELSE base END)
                    AS BIGINT) AS delay_ms
        FROM d ORDER BY host
    """

    # robots_sitemap_discovery: same body construction + (?m) regex.
    o["robots_sitemap_discovery"] = """
        WITH bodies AS (
          SELECT p_partkey,
                 'User-agent: *
Disallow: /tmp
'
                 || CASE WHEN p_size % 4 <> 0
                    THEN printf('Sitemap: https://h%d.example.com/sitemap.xml
', p_size) ELSE '' END
                 || CASE WHEN p_partkey % 3 = 0
                    THEN printf('sitemap: https://h%d.example.com/sitemap-news.xml
', p_partkey % 11) ELSE '' END AS txt
          FROM part
        )
        SELECT p_partkey,
               unnest(list_distinct(
                 regexp_extract_all(txt, '(?m)^[Ss]itemap:[ \\t]*(\\S+)', 1)
               )) AS sitemap_url
        FROM bodies
        ORDER BY p_partkey, sitemap_url
    """

    # doc_tfidf_topk: tf·ln(N/df) rounded to 4 before ranking in BOTH
    # engines — ln is ~1-ulp accurate, so unrounded scores could
    # rank-flip near-ties between JVM and DuckDB.
    o["doc_tfidf_topk"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        ),
        tf AS (
          SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
        ),
        dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        nd AS (SELECT count(*) AS n FROM documents),
        scored AS (
          SELECT doc_id, token,
                 round(tf * ln((SELECT n FROM nd)::DOUBLE / df), 4) AS score
          FROM tf JOIN dfreq USING (token)
        ),
        ranked AS (
          SELECT doc_id, token, score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, token DESC) AS rank
          FROM scored
        )
        SELECT doc_id, token, score, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank
    """

    # frontier_discovery_pipeline: the full discovery loop replayed —
    # link extraction, 3-iteration pagerank, sitemap seeds, rounded-rank
    # median buckets, template-collapse trap demotion.
    o["frontier_discovery_pipeline"] = f"""
        WITH {_sim_pages_sql()},
        {_sim_sitemaps_sql()},
        links AS (
          SELECT url AS src_url,
                 unnest(regexp_extract_all(
                   html, '<a\\s+href="([^"]+)"[^>]*>([^<]*)</a>', 1)) AS href
          FROM sim_pages
        ),
        dedges AS (SELECT DISTINCT src_url AS src, href AS dst FROM links),
        {_pagerank_cte_chain(3)},
        pr AS (SELECT id AS url, round(rank, 6) AS rank FROM r3),
        seeds AS (
          SELECT trim(regexp_extract(blk, '<loc>\\s*([^<]*?)\\s*</loc>', 1)) AS url
          FROM (
            SELECT unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1, 's')) AS blk
            FROM sim_sitemaps
          )
          WHERE trim(regexp_extract(blk, '<loc>\\s*([^<]*?)\\s*</loc>', 1)) <> ''
        ),
        discovered AS (
          SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
          FROM (SELECT href AS url FROM links UNION SELECT url FROM seeds)
        ),
        joined AS (
          SELECT d.url, d.host, p.rank
          FROM discovered d LEFT JOIN pr p ON p.url = d.url
        ),
        med AS (SELECT quantile_cont(rank, 0.5) AS m FROM joined),
        ranked AS (
          SELECT url, host,
                 CASE WHEN rank IS NULL THEN 1
                      WHEN rank >= (SELECT m FROM med) THEN 0
                      ELSE 2 END AS priority
          FROM joined
        ),
        tpl AS (
          SELECT host,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/]*', ''),
                       '[0-9a-fA-F]{{8,}}', 'H', 'g'),
                     '[0-9]+', 'N', 'g'),
                   '=([^&#/]*)', '=V', 'g') AS template
          FROM ranked
        ),
        ts AS (SELECT host, template, count(*) AS n FROM tpl GROUP BY 1, 2),
        hostagg AS (
          SELECT host, sum(n) AS n_urls, max(n) AS top_n
          FROM ts GROUP BY host
        ),
        trapped AS (
          SELECT host FROM hostagg
          WHERE n_urls >= 20 AND round(top_n / n_urls, 4) > 0.5
        )
        SELECT r.url, r.host,
               CAST(r.priority + CASE WHEN t.host IS NOT NULL THEN 10 ELSE 0 END
                    AS BIGINT) AS priority
        FROM ranked r LEFT JOIN trapped t ON t.host = r.host
        ORDER BY 3, 1
    """

    # image_features: engine-synthesized image payloads (no DuckDB view,
    # pixel decoding not SQL-expressible) — rows-only check.
    return o
