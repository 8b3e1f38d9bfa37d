"""Resumability: a crawl interrupted after k rounds and re-invoked produces
the bit-identical final state of an uninterrupted run (the manifest commit
is the checkpoint — SURVEY §2.12 exactly-once semantics)."""

from pyspark.sql import functions as F

from cex_crawler_spark.catalog import SnapshotCatalog
from cex_crawler_spark.plans.driver import bootstrap, crawl
from cex_crawler_spark.synth import gen_frontier, gen_host_policy

WATERMARK = "2025-08-29 00:00:00"


def _final_state(spark, catalog):
    res = sorted(
        (r["round"], r["host"], r["host_seq"] or -1, r["url"], r["status"],
         r["caption"] or "")
        for r in catalog.read(spark, "results").collect()
    )
    seen = sorted(r["url_hash"] for r in catalog.read(spark, "seen").collect())
    return res, seen


def test_interrupted_resume_bit_identical(spark, tmp_path):
    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat_a = SnapshotCatalog(tmp_path / "uninterrupted")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)

    cat_b = SnapshotCatalog(tmp_path / "interrupted")
    bootstrap(cat_b, seeds, WATERMARK)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=2, use_bloom=False)  # "kill"
    assert not cat_b.read(spark, "frontier").isEmpty()
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=30, use_bloom=False)  # resume

    assert _final_state(spark, cat_a) == _final_state(spark, cat_b)


def test_resume_with_bloom_matches_no_bloom(spark, tmp_path):
    """Bloom prefilter (rebuilt on resume) never changes the outcome."""
    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat_a = SnapshotCatalog(tmp_path / "nobloom")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)

    cat_b = SnapshotCatalog(tmp_path / "bloom")
    bootstrap(cat_b, seeds, WATERMARK)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=2,
          bloom_expected=5000)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=30,
          bloom_expected=5000)

    assert _final_state(spark, cat_a) == _final_state(spark, cat_b)


def test_resume_loads_persisted_bloom_no_seen_rescan(spark, tmp_path, monkeypatch):
    """VERDICT r3 item 4: each round persists its merged Bloom bitmap
    with the manifest, so a resume loads ~1 MB from disk instead of
    re-scanning the whole seen table (a cost that grows with crawl age).
    The cold rebuild must NOT run; the loaded bitmap must cover every
    committed seen key (no false negatives possible); the final state
    must still equal the no-bloom ground truth; vacuum must prune old
    sidecars without touching the live one."""
    import numpy as np

    import cex_crawler_spark.plans.driver as drv
    from cex_crawler_spark.plans.round import load_bloom_sidecar

    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat = SnapshotCatalog(tmp_path / "bloomsidecar")
    bootstrap(cat, seeds, WATERMARK)
    crawl(spark, cat, policy, WATERMARK, max_rounds=2, bloom_expected=5000)

    def no_rebuild(*a, **k):
        raise AssertionError("resume cold-rebuilt the bloom from the seen table")

    # round-level delta builds (round.build_bloom) stay intact; only the
    # driver's cold-rebuild path is fenced off
    monkeypatch.setattr(drv, "build_bloom", no_rebuild)
    crawl(spark, cat, policy, WATERMARK, max_rounds=30, bloom_expected=5000)

    bf = load_bloom_sidecar(cat, 5000)
    assert bf is not None
    keys = np.array(
        [r["url_hash"] for r in cat.read(spark, "seen").collect()],
        dtype=np.int64,
    )
    assert keys.size > 0 and bf.might_contain(keys).all()
    # sized-for-a-different-crawl sidecars are rejected (fallback path)
    assert load_bloom_sidecar(cat, 9999) is None

    deleted = cat.vacuum(keep_versions=1)
    assert any("_bloom" in d for d in deleted)
    assert load_bloom_sidecar(cat, 5000) is not None

    cat_a = SnapshotCatalog(tmp_path / "nobloom_truth")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)
    assert _final_state(spark, cat_a) == _final_state(spark, cat)


def test_task_failure_retry_exactly_once(spark, tmp_path, monkeypatch):
    """VERDICT r4 item 1 — the executor-side exactly-once half: a fetch
    TASK attempt that crashes after emitting partial output must be
    discarded and retried by Spark (local[4,2] session), and the final
    committed results/seen must be bit-identical to a clean run — no
    duplicated rows from the dead attempt, no lost rows."""
    import functools

    import cex_crawler_spark.plans.round as rnd
    from cex_crawler_spark.operators.fetch import fetch_and_validate

    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat_a = SnapshotCatalog(tmp_path / "clean")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)

    latch = tmp_path / "fault_latch"
    monkeypatch.setattr(
        rnd,
        "fetch_and_validate",
        functools.partial(fetch_and_validate, fault_latch=str(latch)),
    )
    cat_b = SnapshotCatalog(tmp_path / "faulted")
    bootstrap(cat_b, seeds, WATERMARK)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=30, use_bloom=False)

    assert latch.exists()  # the fault actually fired (and only once)
    assert _final_state(spark, cat_a) == _final_state(spark, cat_b)


def test_resume_pre_priority_catalog(spark, tmp_path):
    """ADVICE r4 (medium): a catalog persisted BEFORE the priority
    column existed must resume — both the scheduler and the next-round
    frontier rewrite (candidates.select(*FRONTIER_COLS)) need the
    default-level guard, and the drain must finish bit-identical to an
    uninterrupted run (gen_frontier seeds are all priority 0, so legacy
    default-0 semantics are exactly the modern plan's)."""
    from cex_crawler_spark.catalog import OVERWRITE

    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat_a = SnapshotCatalog(tmp_path / "truth")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)

    cat_b = SnapshotCatalog(tmp_path / "legacy")
    bootstrap(cat_b, seeds, WATERMARK)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=2, use_bloom=False)
    # simulate the legacy layout: rewrite the frontier without priority
    legacy = cat_b.read(spark, "frontier").drop("priority")
    assert "priority" not in legacy.columns
    cat_b.commit(cat_b.current_round(), {"frontier": (legacy, OVERWRITE)})
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=30, use_bloom=False)

    assert _final_state(spark, cat_a) == _final_state(spark, cat_b)


def test_crawl_with_periodic_compaction_identical(spark, tmp_path):
    """compact_every folds small-file compaction into the crawl loop:
    the final state must be bit-identical to an uncompacted crawl, the
    append tables must end with few consolidated paths, the bloom
    sidecar reference must survive compaction (resume keeps using it),
    and a kill+resume across a compaction point must still converge."""
    from cex_crawler_spark.plans.round import load_bloom_sidecar

    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    cat_a = SnapshotCatalog(tmp_path / "plain")
    bootstrap(cat_a, seeds, WATERMARK)
    crawl(spark, cat_a, policy, WATERMARK, max_rounds=30, use_bloom=False)
    n_rounds = len(cat_a.read(spark, "results").select("round").distinct().collect())
    assert n_rounds >= 3  # enough rounds for compaction to trigger repeatedly

    cat_b = SnapshotCatalog(tmp_path / "compacted")
    bootstrap(cat_b, seeds, WATERMARK)
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=2,
          bloom_expected=5000, compact_every=1)  # "kill" after 2 rounds
    assert len(cat_b.manifest()["tables"]["seen"]["paths"]) == 1
    assert load_bloom_sidecar(cat_b, 5000) is not None  # survived compact
    crawl(spark, cat_b, policy, WATERMARK, max_rounds=30,
          bloom_expected=5000, compact_every=1)  # resume across compaction

    assert _final_state(spark, cat_a) == _final_state(spark, cat_b)
    assert len(cat_b.manifest()["tables"]["results"]["paths"]) <= 3


def test_round_job_count_bounded(spark, tmp_path):
    """The per-round Spark job count is the fixed cost that dominates
    small rounds (PLANS.md) — pin an upper bound so a refactor that
    silently adds per-round jobs fails here rather than in BENCH."""
    from cex_crawler_spark.catalog import SnapshotCatalog
    from cex_crawler_spark.plans.driver import bootstrap, crawl
    from cex_crawler_spark.synth import gen_frontier, gen_host_policy

    cat = SnapshotCatalog(tmp_path / "jobcount")
    bootstrap(cat, gen_frontier(spark, 300, n_payloads=50), "2025-08-29 00:00:00")
    tracker = spark.sparkContext.statusTracker()
    # job groups accumulate per session — count only THIS crawl's jobs
    before = set(tracker.getJobIdsForGroup("round-0"))
    crawl(spark, cat, gen_host_policy(spark), "2025-08-29 00:00:00",
          max_rounds=1)
    jobs = set(tracker.getJobIdsForGroup("round-0")) - before
    # measured 49 with AQE on (every adaptive query stage is its own
    # job; 5 actions x their stage chains) — and unlike r2's 48, this
    # count now INCLUDES the four InheritableThread table writes that
    # previously escaped the job group, plus the narrow-verdict plan
    # dropped the wide status join and the metrics re-read job.  The
    # bound catches a refactor that silently multiplies per-round
    # actions.
    assert 0 < len(jobs) <= 54, f"round-0 launched {len(jobs)} jobs"


def test_requeue_refetches_invalidated_urls(spark, tmp_path):
    """The cuckoo delete path end-to-end: after a full drain, requeue()
    un-sees a batch of fetched URLs; the next crawl re-fetches EXACTLY
    that batch (same crawl decisions on the second pass), everything
    else stays seen, and the sweep is idempotent."""
    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    from cex_crawler_spark.plans.driver import requeue

    cat = SnapshotCatalog(tmp_path / "requeue")
    bootstrap(cat, seeds, WATERMARK)
    crawl(spark, cat, policy, WATERMARK, max_rounds=30, use_bloom=False)
    assert cat.read(spark, "frontier").isEmpty()
    results1 = cat.read(spark, "results").collect()
    fetched1 = {r["url_hash"] for r in results1 if r["status"] == "fetched"}

    # invalidate a slice of the FETCHED urls, in seed shape
    target = (
        seeds.join(
            cat.read(spark, "results")
            .filter(F.col("status") == "fetched")
            .select("url"),
            "url",
        )
        .orderBy("seq")
        .limit(20)
    )
    n_target = target.count()
    assert n_target > 0
    stats = requeue(spark, cat, target)
    assert stats["requeued"] > 0
    assert stats["unseen"] == stats["requeued"]

    # idempotent: the same sweep again adds nothing new
    stats2 = requeue(spark, cat, target)
    assert stats2["requeued"] == 0 and stats2["unseen"] == 0

    crawl(spark, cat, policy, WATERMARK, max_rounds=30, use_bloom=False)
    results2 = cat.read(spark, "results").collect()
    # rows added by the second crawl = totals minus the first pass
    from collections import Counter

    delta = Counter(
        (r["url_hash"], r["status"]) for r in results2
    ) - Counter((r["url_hash"], r["status"]) for r in results1)
    # every re-fetched row is one of the invalidated urls, and each
    # invalidated url was fetched again exactly once
    refetched = {h for (h, s), c in delta.items() if s == "fetched"}
    assert all(h in fetched1 for h in refetched)
    assert sum(c for (h, s), c in delta.items() if s == "fetched") == stats[
        "requeued"
    ]
    # seen set is back to covering every fetched url exactly once
    seen = sorted(r["url_hash"] for r in cat.read(spark, "seen").collect())
    assert len(seen) == len(set(seen))


def test_cuckoo_crawl_lifecycle_matches_no_filter(spark, tmp_path):
    """filter_kind='cuckoo' as a first-class crawl mode: interrupted
    crawl resumes from the cuckoo sidecar, a requeue sweep tightens the
    live filter, and the final state is bit-identical to the same
    lifecycle run with no prefilter at all (exactness never depends on
    the filter)."""
    from cex_crawler_spark.operators.seen import CuckooFilter64
    from cex_crawler_spark.plans.driver import requeue
    from cex_crawler_spark.plans.round import load_cuckoo_sidecar

    seeds = gen_frontier(spark, 250, n_payloads=60)
    policy = gen_host_policy(spark).withColumn("budget_per_round", F.lit(30))

    def lifecycle(path, **crawl_kw):
        cat = SnapshotCatalog(path)
        bootstrap(cat, seeds, WATERMARK)
        crawl(spark, cat, policy, WATERMARK, max_rounds=2, **crawl_kw)  # kill
        crawl(spark, cat, policy, WATERMARK, max_rounds=30, **crawl_kw)
        target = (
            seeds.join(
                cat.read(spark, "results")
                .filter(F.col("status") == "fetched")
                .select("url"),
                "url",
            )
            .orderBy("seq")
            .limit(15)
        )
        cuckoo = None
        if crawl_kw.get("filter_kind") == "cuckoo":
            cuckoo = load_cuckoo_sidecar(cat, 5000)
            assert isinstance(cuckoo, CuckooFilter64)  # sidecar resume works
        requeue(spark, cat, target, cuckoo=cuckoo)
        crawl(spark, cat, policy, WATERMARK, max_rounds=30, **crawl_kw)
        return cat

    cat_c = lifecycle(tmp_path / "cuckoo", filter_kind="cuckoo",
                      bloom_expected=5000)
    cat_n = lifecycle(tmp_path / "nofilter", use_bloom=False)
    assert _final_state(spark, cat_c) == _final_state(spark, cat_n)


def test_fetch_memo_null_and_dup_image_ids(spark):
    """r6 fetch memoization: duplicate image_ids get the (identical)
    memoized verdict, a NULL image_id still yields the fetch-failed row
    (factorize's na sentinel must not alias it to another verdict)."""
    from pyspark.sql import types as T

    from cex_crawler_spark.operators.fetch import fetch_and_validate

    rows = [(1, "img0000000001"), (2, None), (3, "img0000000001")]
    schema = T.StructType(
        [
            T.StructField("url_hash", T.LongType()),
            T.StructField("image_id", T.StringType()),
        ]
    )
    out = {
        r["url_hash"]: r
        for r in fetch_and_validate(
            spark.createDataFrame(rows, schema)
        ).collect()
    }
    assert out[2]["fetch_ok"] is False and out[2]["valid"] is False
    assert out[1]["fetch_ok"] is True and out[3]["fetch_ok"] is True
    # duplicate ids must agree on every verdict column
    assert out[1].asDict() == {**out[3].asDict(), "url_hash": 1}
