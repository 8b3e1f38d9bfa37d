"""Proportional crawl-budget allocation — largest-remainder method.

A polite crawler has a global fetch budget per round (politeness.py
enforces the per-host pacing; THIS decides how many fetches each host
deserves).  Splitting ``total`` proportionally to per-host weight
(frontier mass, PageRank mass, change rate …) with plain rounding
either over- or under-shoots; the largest-remainder (Hamilton) method
is the standard exact apportionment: floor everyone's quota, then give
the leftover +1s to the largest fractional remainders.

Everything here is INTEGER arithmetic — quota_i = (total·w_i) div W and
remainder_i = (total·w_i) mod W — so results are bit-identical across
engines (no float division anywhere) and the DuckDB oracle can replay
it with a plain window.

Scale shape: the host table is dim-sized but can still be 10^8 rows at
web scale, so the top-r remainder selection does NOT use a global
window (single-task sort).  Instead: bucket remainders by value
(scan-side), count per bucket (tiny aggregate → driver), walk the
bucket histogram to find the boundary bucket, award +1 wholesale to
better buckets, and rank ONLY the boundary bucket's rows — one task
over ~n/B rows — the classic distributed exact-selection shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def allocate_budget(
    weights: DataFrame,
    key_col: str,
    weight_col: str,
    total: int,
    n_value_buckets: int = 1024,
) -> DataFrame:
    """(key, weight, budget) with sum(budget) == ``total`` exactly.

    ``weight_col`` must be non-negative integers (counts, scaled
    ranks); rows with weight 0 get budget 0.  Ties in the fractional
    remainder break on ascending ``key`` — fully deterministic.
    """
    w = weights.select(
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("W")).collect()[0]["W"]
    if not tot:
        return w.withColumn("budget", F.lit(0).cast("long")).withColumnRenamed(
            "key", key_col
        ).withColumnRenamed("weight", weight_col)
    # integer quota/remainder: exact, no float division anywhere
    # distributed exact top-r by (rem DESC, key ASC): value-bucket the
    # remainders, award whole buckets above the boundary, window-rank
    # only the boundary bucket (~n/B rows in one task)
    q = w.select(
        "key",
        "weight",
        F.expr(f"(CAST({total} AS BIGINT) * weight) div {tot}").alias("base"),
        F.expr(f"(CAST({total} AS BIGINT) * weight) % {tot}").alias("rem"),
    ).withColumn(
        "__b",
        F.expr(f"(rem * {n_value_buckets}) div {tot}").cast("int"),
    ).persist()
    r = total - q.agg(F.sum("base")).collect()[0][0]
    hist = {
        row["__b"]: row["c"]
        for row in q.groupBy("__b").agg(F.count("*").alias("c")).collect()
    }
    need, boundary = int(r), None
    for b in sorted(hist, reverse=True):
        if hist[b] <= need:
            need -= hist[b]
        else:
            boundary = b
            break
    if boundary is None:
        # every row gets +1 down to the last bucket (r == n rows case)
        bonus = q.select("key").withColumn("__x", F.lit(1))
    else:
        wb = Window.partitionBy("__b").orderBy(
            F.col("rem").desc(), F.col("key").asc()
        )
        in_boundary = (
            q.filter(F.col("__b") == boundary)
            .withColumn("__rn", F.row_number().over(wb))
            .filter(F.col("__rn") <= need)
            .select("key")
        )
        bonus = (
            q.filter(F.col("__b") > boundary)
            .select("key")
            .unionByName(in_boundary)
            .withColumn("__x", F.lit(1))
        )
    out = (
        q.join(bonus, "key", "left")
        .select(
            F.col("key").alias(key_col),
            F.col("weight").alias(weight_col),
            (F.col("base") + F.coalesce(F.col("__x"), F.lit(0)))
            .cast("long")
            .alias("budget"),
        )
    )
    # pin the (dim-sized) result, release the temp cache — same
    # lifecycle contract as dedup._materialize_release (ADVICE r1)
    out = out.localCheckpoint(eager=True)
    q.unpersist()
    return out


def temperature_mix(
    corpus: DataFrame,
    source_col: str,
    alpha: float,
    total: int,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-based source resampling targets (the multilingual /
    multi-source mixing rule, e.g. mBERT/XLM-R α-sampling): a source
    with n_i documents gets a share ∝ n_i^α — α = 1 keeps natural
    proportions, α → 0 flattens toward uniform, the standard knob that
    stops a dominant source (English web) from drowning the tail.

    Returns one row per source: ``(source, n_docs, weight, target,
    target_capped)`` where targets come from the SAME largest-remainder
    apportionment as the crawl budget (sum(target) == total exactly)
    and ``target_capped = min(target, n_docs)`` — the no-replacement
    bound a selection can actually satisfy (upsampling past a source's
    mass is the trainer's epoch-repeat job, not the sampler's;
    sum(target_capped) may undershoot total when a tiny source hits
    its cap — callers wanting exact totals re-run on the slack).

    n_i^α is the one float op (rounded onto a 1/weight_scale grid
    before the INTEGER apportionment, the TF-IDF rank-stability
    discipline); everything after is allocate_budget's all-integer
    path.  One source-sized aggregate + the dim-sized allocation.
    """
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = corpus.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_docs")
    )
    weights = counts.withColumn(
        "weight",
        F.round(F.pow(F.col("n_docs"), F.lit(alpha)) * weight_scale)
        .cast("long"),
    )
    alloc = allocate_budget(weights, "source", "weight", total).select(
        "source", F.col("budget").alias("target")
    )
    return (
        weights.join(alloc, "source")
        .withColumn(
            "target_capped", F.least(F.col("target"), F.col("n_docs"))
        )
        .select("source", "n_docs", "weight", "target", "target_capped")
    )


def take_stratified(
    corpus: DataFrame,
    targets: DataFrame,
    source_col: str,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Materialize a per-source sample: the first ``target_capped``
    documents of each source under the deterministic md5(seed:id)
    order (unbiased w.r.t. any corpus attribute, reproducible for
    audit).  ``targets`` is :func:`temperature_mix` output (or any
    (source, target_capped) dim) — broadcast onto the corpus scan.

    The per-source rank is a window PARTITIONED by source — parallelism
    = n_sources, each task ≤ the largest source; for a corpus whose
    single largest source outgrows one task, swap in the md5-prefix
    chunked rank (packing.assign_shards) per source.
    """
    from pyspark.sql.window import Window

    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    ranked = corpus.withColumn("__key", key).withColumn(
        "__rn",
        F.row_number().over(
            Window.partitionBy(source_col).orderBy("__key", id_col)
        ),
    )
    t = targets.select(
        F.col("source").alias(source_col), "target_capped"
    )
    return (
        ranked.join(F.broadcast(t), source_col)
        .filter(F.col("__rn") <= F.col("target_capped"))
        .drop("__key", "__rn", "target_capped")
    )


def take_byte_budget(
    candidates: DataFrame,
    order_col: str,
    bytes_col: str,
    budget: int,
    chunk_width: int = 8192,
) -> DataFrame:
    """Bandwidth-aware round sizing: annotate the maximal PREFIX of the
    candidate list, in ``order_col`` order, whose cumulative expected
    bytes fit the round's download budget.

    URL-count budgets (politeness.py budget_per_round) treat a 2 KB
    robots probe and a 40 MB image page as equal spend; a crawler
    provisioned in bytes/round takes the priority-ordered prefix whose
    byte total fits instead.  The cut is a CONTIGUOUS prefix — priority
    order is sacred, so a cheap low-priority URL never jumps a costly
    high-priority one (this is deliberately not a knapsack).

    ``order_col``: unique numeric ordering key (e.g. priority composed
    with url_id).  ``bytes_col``: non-negative expected size — per-host
    mean content length from the fetch log, with a global-mean fallback
    for unseen hosts.  Cumulative sums use the chunked decomposition
    (packing.chunked_running_sum): no global window, parallelism =
    candidates/chunk_width.

    Returns ``candidates`` + ``cum_bytes`` (running total INCLUDING the
    row) + ``taken`` (cum_bytes ≤ budget).  For non-negative sizes the
    taken set is a prefix by monotonicity; the first row that would
    cross the budget — and everything after it — stays queued for the
    next round.
    """
    from cex_crawler_spark.operators.packing import chunked_running_sum

    summed = chunked_running_sum(
        candidates, order_col, bytes_col, chunk_width, out_col="cum_bytes"
    )
    return summed.withColumn("taken", F.col("cum_bytes") <= F.lit(budget))


def anneal_mix_schedule(
    corpus: DataFrame,
    source_col: str,
    total: int,
    alphas: list[float],
) -> DataFrame:
    """Per-epoch annealed mixing schedule: epoch e samples with
    ``alphas[e]`` — the curriculum-style variant of α-sampling where
    training starts flat (small α: every source heard) and anneals
    toward natural proportions (α → 1: the true distribution dominates
    late training).  One :func:`temperature_mix` per epoch, union-ed
    with the epoch id; the per-epoch plans stay independently
    largest-remainder-exact (sum(target) == total each epoch).

    ``alphas`` is a bounded Python list (epochs, not data), so the loop
    is driver-side plan construction — the executed plan is one
    source-sized aggregate reused across |alphas| dim-sized allocations.
    """
    if not alphas:
        raise ValueError("alphas must be non-empty")
    out = None
    for e, a in enumerate(alphas):
        plan = temperature_mix(corpus, source_col, a, total).withColumn(
            "epoch", F.lit(e).cast("long")
        )
        out = plan if out is None else out.unionByName(plan)
    return out
