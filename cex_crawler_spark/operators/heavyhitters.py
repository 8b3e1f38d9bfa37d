"""Exact heavy hitters over an unbounded key space — Misra-Gries
candidate pruning + exact recount.

``groupBy(token).count()`` is already map-side combinable, but its
partial state and shuffle are O(distinct keys per partition): over a
100 TB corpus's n-gram vocabulary (trillions of distinct keys, almost
all singletons) the partials ARE the data, and the aggregate spills and
shuffles the whole vocabulary to answer a question about its top 0.1 %.

The classic fix (Misra & Gries 1982; Metwally's Space-Saving variant)
bounds per-partition state at ``k`` counters: stream the partition
through a counter dict; when it overflows, subtract the overflow
quantile from every counter and drop the non-positive ones.  Every
shrink destroys ≥ (k+1) units of mass, so cumulative decrement ≤
n_p/(k+1) — any key with partition count > n_p/(k+1) SURVIVES.  A key
with global fraction > f has partition fraction > f somewhere
(pigeonhole), so with k ≥ 1/f the union of per-partition summaries is a
guaranteed SUPERSET of the true heavy hitters.  Pass 2 makes the result
exact: semi-join the corpus against the (tiny, broadcast) candidate set
and count only those keys — shuffle O(candidates), never O(vocabulary).

MG runs in ``mapInPandas`` (Arrow batches; `value_counts` + bounded dict
merge per batch — per-batch vectorized, dict ops bounded by k + batch
distinct), which is the legitimate use of the Python path: Catalyst has
no bounded-state aggregate to express this.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mg_candidates(
    df: DataFrame, col: str, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned (one row per
    surviving key per partition; dedup happens at the consumer).
    Superset guarantee: every key with global count > n/(k+1) appears."""
    import pandas as pd

    field = df.schema[col]

    def mg(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for pdf in batches:
            for key, c in pdf[col].value_counts().items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                vals = sorted(counters.values())
                dec = vals[len(counters) - k - 1]
                counters = {
                    t: c - dec for t, c in counters.items() if c > dec
                }
        yield pd.DataFrame({col: list(counters.keys())})

    from pyspark.sql.types import StructType

    return df.select(col).mapInPandas(
        mg, schema=StructType([field])
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_fraction: float,
    k: int | None = None,
) -> DataFrame:
    """EXACT keys (and counts) whose frequency is ≥ ``min_fraction`` of
    the rows, with per-task state bounded by ``k`` counters.

    ``k`` defaults to ``ceil(2/min_fraction)`` — comfortably above the
    1/f superset bound, still tiny (f = 0.1 % → 2,000 counters).  The
    whole plan is declarative: candidate semi-join is broadcast, the
    threshold rides a one-row total as a broadcast cross join — no
    driver-side collect anywhere.  Output: ``col``, ``cnt``,
    ``fraction`` (rounded to 6), descending by count.
    """
    if k is None:
        k = int(2.0 / min_fraction) + 1
    cands = mg_candidates(df, col, k).distinct()
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    exact = (
        df.join(F.broadcast(cands), col, "leftsemi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(min_fraction) * F.col("__total")))
        .select(
            col,
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("fraction"),
        )
        .orderBy(F.desc("cnt"), col)
    )
