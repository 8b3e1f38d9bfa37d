"""Link discovery / frontier expansion — SURVEY §2.1 S8.

The reference discovers new URLs by parsing fetched pages for anchor tags
(/root/reference/exchange/bingx.py:40-78, lbank.py:22-104, etc.) and
feeding them back into its crawl. The engine's analog: every fetched
seed page (path ``/a/…``) deterministically yields 0–2 child links under
``/c/{ref}`` on the same host; children are canonicalized and unioned
into the next round's frontier, where the seen anti-join dedups
rediscoveries.  One level deep (child pages yield no links), so the
frontier growth is bounded — the recursion guard a real crawler gets
from depth limits.

The child-derivation is a pure function of (host, image_id) — Catalyst
expressions here, and a byte-identical Python twin for the replayer
oracle (py_expand_children).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import xxh64_str
from ..functions.urlnorm import py_canonicalize_url, with_canonical_url
from ..synth import POST_FETCH_TIME_HOSTS, SECTIONS, BASE_TIME

CHILD_SEQ_BASE = 1_000_000_000
MAX_CHILDREN = 3  # n_children = hash % 3 → 0..2, E[children]=1


def _u(tag: str):
    """Unsigned-ish hash expr matching payload._u (xxh64 of 'tag|x')."""
    return lambda col: F.xxhash64(F.concat(F.lit(tag + "|"), col))


def expand_links(
    fetched: DataFrame, child_space: int = 1000, n_payloads: int = 1000
) -> DataFrame:
    """Child frontier rows for fetched seed pages.

    ``fetched`` needs columns: canonical_url, host, image_id, seed_id,
    status.  Output matches FRONTIER_COLS.
    """
    parents = fetched.filter(
        (F.col("status") == "fetched") & F.col("canonical_url").contains("/a/")
    )
    n_children = F.pmod(_u("nchild")(F.col("image_id")), F.lit(MAX_CHILDREN))
    exploded = parents.withColumn(
        "k", F.explode(F.sequence(F.lit(0), (n_children - 1).cast("int")))
    ).filter(n_children > 0)

    child_ref = F.pmod(
        F.xxhash64(
            F.concat(F.lit("child"), F.col("k").cast("string"), F.lit("|"),
                     F.col("image_id"))
        ),
        F.lit(child_space),
    )
    url = F.format_string(
        "https://%s.example.com/c/%d", F.col("host"), child_ref
    )
    section = F.element_at(
        F.array(*[F.lit(s) for s in SECTIONS]),
        (F.pmod(child_ref, F.lit(3)) + 1).cast("int"),
    )
    release_time = F.to_timestamp(F.lit(BASE_TIME)) - F.make_interval(
        days=F.pmod(child_ref, F.lit(13))
    )
    image_id = F.format_string(
        "img%010d",
        F.pmod(_u("cimg")(child_ref.cast("string")), F.lit(n_payloads)),
    )
    rows = exploded.select(
        url.alias("url"),
        F.col("host"),
        section.alias("section"),
        # discovered links crawl at the default level, after same-level
        # seeds only by (section, seq); a scoring crawler would set this
        F.lit(0).cast("long").alias("priority"),
        (F.col("seed_id") * 8 + F.col("k") + F.lit(CHILD_SEQ_BASE)).alias("seed_id"),
        F.format_string("Linked article %d", child_ref).alias("title"),
        release_time.alias("release_time"),
        image_id.alias("image_id"),
        (~F.col("host").isin(POST_FETCH_TIME_HOSTS)).alias("time_known_prefetch"),
        F.lit(None).cast("string").alias("duplicate_of"),
        (child_ref + F.lit(CHILD_SEQ_BASE)).alias("seq"),
    )
    return with_canonical_url(rows)


def py_expand_children(
    row: dict, child_space: int = 1000, n_payloads: int = 1000
) -> list[dict]:
    """Replayer twin of :func:`expand_links` for one fetched row."""
    from datetime import datetime, timedelta

    if row["status"] != "fetched" or "/a/" not in row["canonical_url"]:
        return []
    image_id = row["image_id"]
    # python's % on a signed int equals Spark's pmod for positive modulus
    n = xxh64_str(f"nchild|{image_id}") % MAX_CHILDREN
    out = []
    base = datetime.strptime(BASE_TIME, "%Y-%m-%d %H:%M:%S")
    for k in range(n):
        ref = xxh64_str(f"child{k}|{image_id}") % child_space
        url = f"https://{row['host']}.example.com/c/{ref}"
        canon = py_canonicalize_url(url)
        out.append(
            {
                "url": url,
                "canonical_url": canon,
                "url_hash": xxh64_str(canon),
                "host": row["host"],
                "section": SECTIONS[ref % 3],
                "priority": 0,
                "seed_id": row["seed_id"] * 8 + k + CHILD_SEQ_BASE,
                "title": f"Linked article {ref}",
                "release_time": base - timedelta(days=ref % 13),
                "image_id": "img%010d" % (xxh64_str(f"cimg|{ref}") % n_payloads),
                "time_known_prefetch": row["host"] not in POST_FETCH_TIME_HOSTS,
                "duplicate_of": None,
                "seq": ref + CHILD_SEQ_BASE,
            }
        )
    return out


# ------------------------------------------- multi-feed discovery merge

def merge_discovery_feeds(feeds: DataFrame) -> DataFrame:
    """(url, priority, n_feeds, sources) — fold the discovery FEEDS
    (link extraction, sitemaps, hreflang alternates, redirect
    canonicals, …) into one frontier insert batch: per URL, the best
    (minimum) priority wins and provenance is kept as a sorted
    '+'-joined source list — the audit column that later lets
    ``feed_yield_census`` price each feed.

    ``feeds``: (url, priority, source) rows, urls canonicalized
    upstream.  One map-combinable groupBy on url (min, count-distinct
    via collect_set bounded by the handful of feed names).
    """
    return feeds.groupBy("url").agg(
        F.min("priority").alias("priority"),
        F.size(F.collect_set("source")).alias("n_feeds"),
        F.array_join(F.sort_array(F.collect_set("source")), "+").alias(
            "sources"
        ),
    )


def feed_yield_census(feeds: DataFrame) -> DataFrame:
    """(source, n_urls, n_exclusive, exclusive_permille) — the
    marginal utility of each discovery feed: how many URLs only THAT
    feed surfaced.  'Is parsing sitemaps still worth it' is a
    measured answer, not a belief — a feed whose exclusive share
    decays to zero is pure duplicate work and can be demoted to a
    verification-only cadence.

    Shape: distinct (url, source) → per-url feed count → per-source
    rollup; all map-combinable.
    """
    per = feeds.select("url", "source").distinct()
    counts = per.groupBy("url").agg(F.count("*").alias("__n_feeds"))
    return (
        per.join(counts, "url")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum((F.col("__n_feeds") == 1).cast("long")).alias("n_exclusive"),
        )
        .withColumn(
            "exclusive_permille",
            F.expr("(1000 * n_exclusive) div n_urls"),
        )
    )
