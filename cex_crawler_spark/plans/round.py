"""One crawl round — the engine's core logical plan.

Replaces the reference's per-exchange sequential loop
(/root/reference/main.py:148-186 + each exchange's run_scraping) with one
declarative DataFrame plan per round:

    frontier ──anti-join seen (Bloom-prefiltered)──► candidates
             ──politeness window rank──► {robots, stale, dup, scheduled, deferred}
    scheduled ──mapInPandas fetch──► payloads ──validate──► fetched/stale
    commit: frontier' (deferred), seen+Δ, results+Δ, metrics+Δ, lineage+Δ

All five tables commit atomically via the SnapshotCatalog manifest, so a
kill at any point resumes from the previous round bit-identically.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import APPEND, OVERWRITE, SnapshotCatalog
from ..operators.fetch import fetch_and_validate
from ..operators.politeness import (
    STATUS_DEFERRED,
    STATUS_DUP,
    STATUS_FETCHED,
    STATUS_ROBOTS,
    STATUS_SCHEDULED,
    STATUS_STALE,
    schedule_round,
)
from ..operators.seen import (
    BloomFilter64,
    CuckooFilter64,
    anti_join_seen,
    build_bloom,
    build_cuckoo,
)
from ..functions.urlnorm import with_canonical_url

# frontier columns persisted across rounds
FRONTIER_COLS = [
    "url", "canonical_url", "url_hash", "host", "section", "priority", "seq",
    "seed_id", "title", "release_time", "image_id", "time_known_prefetch",
    "duplicate_of",
]

RESULT_COLS = [
    "round", "host", "host_seq", "url", "url_hash", "status", "caption",
    "valid", "psnr_db",
]

# frontier hive-partition fan-out: pmod(xxhash64(host), N).  Host-targeted
# scans (recrawl one host, inspect a host's backlog) prune to 1/N of the
# files; the full-frontier round scan reads everything either way.
HOST_BUCKETS = 16


def with_host_bucket(df: DataFrame, n_buckets: int = HOST_BUCKETS) -> DataFrame:
    # int cast: hive partition-column inference reads the directory value
    # back as IntegerType, and the empty-snapshot fallback writes the
    # column as DATA — the cast keeps both paths the same type (ADVICE r2)
    return df.withColumn(
        "host_bucket", F.pmod(F.xxhash64("host"), F.lit(n_buckets)).cast("int")
    )


def ingest_seeds(seeds: DataFrame) -> DataFrame:
    """Canonicalize + hash raw seed rows into frontier shape.  Seed
    sources without an explicit ``priority`` get level 0 (the reference
    semantics, where section order is the only priority)."""
    if "priority" not in seeds.columns:
        seeds = seeds.withColumn("priority", F.lit(0).cast("long"))
    return with_canonical_url(seeds).select(*FRONTIER_COLS)


def save_bloom_sidecar(
    catalog: SnapshotCatalog, version: int, bloom: BloomFilter64,
    n_expected: int,
) -> None:
    """Persist the Bloom bitmap next to the manifest version it covers.

    Resume previously cold-rebuilt the filter from the FULL seen table —
    a scan whose cost grows with crawl age (VERDICT r3 item 4).  The
    bitmap is written (atomic tmp+rename) to ``_bloom/v<N>.bin`` and
    referenced from manifest ``v<N>`` via :meth:`SnapshotCatalog.amend`
    AFTER the round's seen-delta was OR-merged, so a persisted bitmap is
    always a SUPERSET of that manifest's seen keys (a bloom missing keys
    would break the anti-join's exactness; a superset only costs extra
    join probes).  A kill between commit and this amend leaves the
    manifest without a ``bloom`` entry → the resume path falls back to
    the cold rebuild, so correctness never depends on the sidecar.
    """
    d = catalog.root / "_bloom"
    d.mkdir(exist_ok=True)
    path = d / f"v{version:06d}.bin"
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(bloom.bits.tobytes())
    os.rename(tmp, path)
    catalog.amend(
        version,
        {"bloom": {"file": path.name, "m": bloom.m, "k": bloom.k,
                   "n_expected": n_expected}},
    )


def save_cuckoo_sidecar(
    catalog: SnapshotCatalog, version: int, cf: CuckooFilter64,
    n_expected: int,
) -> None:
    """Cuckoo analog of :func:`save_bloom_sidecar` — same superset
    invariant, same kill-window fallback (a manifest without a
    ``cuckoo`` entry cold-rebuilds from the seen table).  The table
    serializes like the bitmap (atomic tmp+rename under ``_bloom/``);
    the manifest entry records the geometry so resume can reject a
    sidecar sized for a different ``n_expected``."""
    d = catalog.root / "_bloom"
    d.mkdir(exist_ok=True)
    path = d / f"v{version:06d}.cuckoo.bin"
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(cf.table.tobytes())
    os.rename(tmp, path)
    catalog.amend(
        version,
        {"cuckoo": {"file": path.name, "n_buckets": cf.n_buckets,
                    "n_expected": n_expected}},
    )


def load_cuckoo_sidecar(
    catalog: SnapshotCatalog, n_expected: int
) -> CuckooFilter64 | None:
    """Reconstruct the persisted cuckoo filter for the CURRENT manifest,
    or ``None`` when absent / mis-sized / missing on disk."""
    entry = catalog.manifest().get("cuckoo")
    if not entry or entry["n_expected"] != n_expected:
        return None
    path = catalog.root / "_bloom" / entry["file"]
    if not path.exists():
        return None
    table = np.frombuffer(path.read_bytes(), dtype=np.uint16).reshape(
        entry["n_buckets"], CuckooFilter64.SLOTS
    )
    cf = CuckooFilter64(n_expected, table=table.copy())
    if cf.n_buckets != entry["n_buckets"]:
        return None
    return cf


def load_bloom_sidecar(
    catalog: SnapshotCatalog, n_expected: int
) -> BloomFilter64 | None:
    """Reconstruct the persisted Bloom filter for the CURRENT manifest,
    or ``None`` when absent / sized for a different ``n_expected`` /
    missing on disk — callers then cold-rebuild from the seen table."""
    entry = catalog.manifest().get("bloom")
    if not entry or entry["n_expected"] != n_expected:
        return None
    path = catalog.root / "_bloom" / entry["file"]
    if not path.exists():
        return None
    bits = np.frombuffer(path.read_bytes(), dtype=np.uint8).copy()
    bf = BloomFilter64(n_expected, bits=bits)
    if bf.m != entry["m"] or bf.k != entry["k"]:
        return None
    return bf


def run_round(
    spark: SparkSession,
    catalog: SnapshotCatalog,
    host_policy: DataFrame,
    watermark: str,
    round_id: int,
    bloom: BloomFilter64 | CuckooFilter64 | None = None,
    salt_buckets: int = 16,
    fetch_parallelism: int | None = None,
    expand: bool = False,
    bloom_expected: int = 1_000_000,
) -> dict:
    """Execute one round against catalog state; returns round stats.

    When ``bloom`` is given it is OR-updated in place with this round's
    seen delta as part of the round — built from the still-cached
    results delta, not re-read from the just-written parquet (r1 spent
    an extra read job per round on that).

    Every Spark job the round launches is tagged with job group
    ``round-<id>`` so the per-round job count is observable via the
    status tracker (fixed per-round job count is the scaling lever the
    8→32 profile identified; tests pin an upper bound)."""
    spark.sparkContext.setJobGroup(
        f"round-{round_id}", f"crawl round {round_id}", False
    )
    frontier = catalog.read(spark, "frontier")
    if "priority" not in frontier.columns:
        # catalogs persisted before the priority column existed resume at
        # the default level; without this, candidates.select(*FRONTIER_COLS)
        # below (the next-round frontier rewrite) raises AnalysisException —
        # the scheduler-side fallback alone only patched its local copy
        # (ADVICE r4 medium)
        frontier = frontier.withColumn("priority", F.lit(0).cast("long"))
    seen = catalog.read(spark, "seen") if catalog.has_table("seen") else None

    # NOTE: the scheduling DAG re-reads the frontier from several branches
    # (the narrow projection plus the two wide id-joins below), but each
    # branch prunes columns at the scan, so the re-scans are cheaper than
    # materializing a wide cache of candidates (measured: +9s/round at 1M
    # rows with a persist here).
    candidates = anti_join_seen(frontier, seen, "url_hash", bloom)
    round_caches: list = []
    decisions = schedule_round(
        candidates, host_policy, watermark, salt_buckets, caches=round_caches
    )
    # one pass, many consumers (results / frontier' / metrics) → cache.
    # decisions is NARROW (politeness.py): wide frontier columns are
    # joined back below only for the rows that need them — the scheduled
    # minority (fetch needs image_id) and the deferred remainder (the
    # next-round frontier).  r2 instead joined every verdict to the wide
    # rows up front: a full-width shuffle of both sides that the 8→32
    # scaling profile identified as pure fixed-stage latency.
    decisions = decisions.persist()

    # one observe() pass piggy-backed on the results write replaces the
    # r2 post-commit metrics-parquet re-read job (VERDICT r2 items 1/7)
    from pyspark.sql import Observation

    # unnamed → auto-unique; a resumed round re-using an id in the same
    # session must not collide on the listener name
    obs = Observation()
    all_statuses = [
        STATUS_ROBOTS, STATUS_STALE, STATUS_DUP, STATUS_SCHEDULED,
        STATUS_DEFERRED,
    ]
    observed = decisions.observe(
        obs, *[F.count_if(F.col("status") == s).alias(s) for s in all_statuses]
    )

    # the fetch input comes STRAIGHT from the decisions cache — the
    # narrow projection carries image_id + the post-fetch freshness
    # columns precisely so no join back to the wide frontier is needed
    # here (r3.0 joined a sched_ids set against the frontier lineage;
    # on a drain round that meant an extra full scan + a six-figure-row
    # broadcast build)
    scheduled = decisions.filter(F.col("status") == STATUS_SCHEDULED)
    # fused fetch→decode→validate: bytes never leave the Python worker,
    # and results persist captions + verdicts, never raw payloads
    # (matching the reference, which stores extracted records only —
    # /root/reference/deepseek_analyzer.py:225-242)
    validated = fetch_and_validate(scheduled, parallelism=fetch_parallelism)
    verdicts = validated.select(
        F.col("url_hash").alias("uh"), "caption", "valid", "psnr_db"
    )

    fetched = (
        scheduled
        .join(verdicts, F.col("url_hash") == F.col("uh"))
        .drop("uh")
        # post-fetch freshness (weex/bitunix/blofin semantics): budget was
        # consumed, but stale rows are placeholdered, caption dropped
        .withColumn(
            "status",
            F.when(
                (~F.col("time_known_prefetch"))
                & (F.col("release_time") < F.to_timestamp(F.lit(watermark))),
                STATUS_STALE,
            ).otherwise(STATUS_FETCHED),
        )
        .withColumn(
            "caption",
            F.when(F.col("status") == STATUS_FETCHED, F.col("caption")),
        )
    )

    results_delta = fetched.select(
        F.lit(round_id).alias("round"),
        "host",
        "host_seq",
        F.col("canonical_url").alias("url"),
        "url_hash",
        "status",
        "caption",
        "valid",
        "psnr_db",
    ).unionByName(
        # `observed` (not `decisions`): the terminal-status filter sits
        # ABOVE the CollectMetrics node, so this leg's scan inside the
        # results write streams every decision row through the observe()
        # counters — the round stats cost zero extra jobs
        observed.filter(
            ~F.col("status").isin(STATUS_SCHEDULED, STATUS_DEFERRED)
        ).select(
            F.lit(round_id).alias("round"),
            "host",
            F.lit(None).cast("long").alias("host_seq"),
            F.col("canonical_url").alias("url"),
            "url_hash",
            "status",
            F.lit(None).cast("string").alias("caption"),
            F.lit(None).cast("boolean").alias("valid"),
            F.lit(None).cast("double").alias("psnr_db"),
        )
    ).persist()

    # seen semantics: fetched + stale placeholders exist as "files"
    # (reference exchange/binance.py:242-255); robots/dup rows are terminal
    # in results but not part of the reference-comparable seen set.
    seen_delta = (
        results_delta.filter(F.col("status").isin(STATUS_FETCHED, STATUS_STALE))
        .select("url_hash", "url")
        .distinct()
    )

    # deferred rows keep their wide frontier columns via an ANTI-join
    # against the (small) non-deferred id set — the deferred majority
    # never shuffles; candidates re-scan with pruning + a broadcast probe
    non_deferred_ids = decisions.filter(
        F.col("status") != STATUS_DEFERRED
    ).select("seed_id")
    new_frontier = candidates.select(*FRONTIER_COLS).join(
        non_deferred_ids, "seed_id", "left_anti"
    ).select(*FRONTIER_COLS)
    if expand:
        # S8 link discovery: fetched seed pages emit child URLs into the
        # next round's frontier; the seen anti-join dedups rediscoveries
        from ..operators.expand import expand_links

        children = expand_links(fetched).select(*FRONTIER_COLS)
        new_frontier = new_frontier.unionByName(children)

    frontier_write = with_host_bucket(new_frontier)

    def frontier_plan() -> DataFrame:
        # resolved AFTER the serial results write: when the observe()
        # counters show nothing deferred (and expansion can't add
        # children), the next frontier is empty BY CONSTRUCTION — write
        # it from the schema instead of re-scanning the whole frontier
        # through the anti-join just to emit zero rows (the final round
        # of every drain hits this)
        if not expand and obs.get.get(STATUS_DEFERRED, 0) == 0:
            return spark.createDataFrame([], frontier_write.schema)
        return frontier_write

    # metrics + lineage share ONE pre-aggregation over the decisions
    # cache — (host, part, status) is a superset key of both, so each
    # table is a re-group of the tiny grain rows (hosts × partitions ×
    # statuses) instead of its own full shuffle over the cache (r6; the
    # emitted rows are identical: counts sum, budget/min_delay are
    # host-constant from the policy join, url_hash min/max compose).
    grain = (
        decisions.withColumn("part", F.spark_partition_id())
        .groupBy("host", "part", "status")
        .agg(
            F.count("*").alias("__n"),
            F.min("url_hash").alias("__min_uh"),
            F.max("url_hash").alias("__max_uh"),
            F.first("budget_per_round").alias("__budget"),
            F.first("min_delay_ms").alias("__delay"),
        )
        .persist()
    )
    round_caches.append(grain)
    metrics_delta = grain.groupBy(
        F.lit(round_id).alias("round"), "host", "status"
    ).agg(
        F.sum("__n").alias("n"),
        F.first("__budget").alias("budget_per_round"),
        F.first("__delay").alias("min_delay_ms"),
    )
    # per-partition lineage: which executor partition carried which rows
    lineage_delta = grain.groupBy(
        F.lit(round_id).alias("round"), "part", "status"
    ).agg(
        F.sum("__n").alias("rows"),
        F.min("__min_uh").alias("min_url_hash"),
        F.max("__max_uh").alias("max_url_hash"),
    )

    # no pre-commit action: the results write IS the round's driving job
    # (schedule → fetch → union run as one job, filling both caches AND
    # the observe() stat counters), the other four writes overlap in
    # threads over those caches — r1 paid a full extra barrier
    # collecting metrics before the fetch could start
    version = catalog.commit(
        round_id,
        {
            "results": (results_delta, APPEND),
            "frontier": (frontier_plan, OVERWRITE),
            "seen": (seen_delta, APPEND),
            "metrics": (metrics_delta, APPEND),
            "lineage": (lineage_delta, APPEND),
        },
        extra={"watermark": watermark},
        partition_by={"frontier": ["host_bucket"]},
        # results first: its write runs the fetch stage and pins the
        # decisions + results caches the parallel writes then scan
        serial_first=["results"],
    )
    # the observe() counters filled during the results write ARE the
    # round stats — no metrics re-read, no extra collect job (r2 paid a
    # parquet read job per round here)
    stats: dict[str, int] = {
        s: int(n) for s, n in obs.get.items() if n
    }
    stats.setdefault("deferred", 0)
    catalog.amend(version, {"stats": stats})
    if bloom is not None:
        # incremental filter maintenance folded into the round.  The
        # delta keys are read back from the seen files THIS commit just
        # wrote (manifest paths[-1] — a tiny columnar scan of one
        # round's delta) rather than re-running the distinct over the
        # persisted results_delta: the re-aggregation was a full shuffle
        # of the cached partitions per round, the read-back is one
        # column of one delta directory (r6; the values are identical
        # by construction — it IS the written seen_delta)
        delta_path = catalog.manifest()["tables"]["seen"]["paths"][-1]
        delta_keys = spark.read.parquet(delta_path)
        if isinstance(bloom, CuckooFilter64):
            bloom.merge(build_cuckoo(delta_keys, "url_hash", bloom_expected))
            save_cuckoo_sidecar(catalog, version, bloom, bloom_expected)
        else:
            bloom.merge(build_bloom(delta_keys, "url_hash", bloom_expected))
            # persist the merged bitmap against this round's manifest so a
            # resume loads it instead of re-scanning the whole seen table
            save_bloom_sidecar(catalog, version, bloom, bloom_expected)
    decisions.unpersist()
    results_delta.unpersist()
    for cached in round_caches:
        cached.unpersist()
    return stats
