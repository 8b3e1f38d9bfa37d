"""Temporal joins — the as-of (point-in-time) join Spark lacks natively.

The task brief calls out as-of/range joins as operators to re-express
Spark-first.  A naive translation is a range-condition join
(``l.ts >= r.ts`` + per-key max), which Catalyst executes as a
broadcast-nested-loop or an exploding inequality join — O(pairs in
range) intermediate rows, a scale killer on years of history.

This implementation is the UNION + WINDOW form instead: tag both
inputs, union them (schema-aligned, missing columns null), and carry
the right side's values forward with ``last(ignorenulls)`` over an
unbounded-preceding window ordered by ``(ts, side)``; left rows then
read the latest right value at-or-before their timestamp.  Cost: ONE
shuffle on the join keys, O(n) rows end to end, no range explosion —
and per-key skew behaves like any other window (the keys partition).

DuckDB's native ``ASOF JOIN`` provides the independent oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Attach to every ``left`` row the ``value_cols`` of the single
    ``right`` row with the greatest ``ts_col`` ≤ the left row's
    ``ts_col``, matching on the ``on`` keys (backward as-of, inclusive).
    Left rows with no prior right row get nulls (left-outer semantics).

    Caller contract: ``right`` must be unique per ``(*on, ts_col)``
    (pre-aggregate if not — ties would be nondeterministic in ANY as-of
    implementation), and ``value_cols`` must not collide with ``left``
    column names.
    """
    r = right.select(*on, ts_col, *value_cols).withColumn(
        "__side", F.lit(0)
    )
    unified = left.withColumn("__side", F.lit(1)).unionByName(
        r, allowMissingColumns=True
    )
    # right rows order BEFORE left rows at the same timestamp
    # (__side 0 < 1), which is exactly the inclusive "at-or-before"
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unified
    for c in value_cols:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).drop("__side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    pt_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Join every point row to every interval row containing it
    (``start ≤ pt ≤ end``, plus optional equi-``keys``) — the range
    join, bucketized.

    Spark executes a bare inequality join as a broadcast-nested-loop
    or cartesian: O(points × intervals) comparisons.  This form
    explodes each interval into the ``bucket_width``-sized buckets it
    covers and hash-joins points to interval-buckets on
    ``(keys..., bucket)``, then applies the exact range filter — the
    candidate set is only the pairs whose bucket overlaps, the join is
    a plain shuffled hash join, and skew follows bucket population
    (AQE-splittable).  Shuffle: O(points + intervals × span/width).
    Pick ``bucket_width`` ≈ the typical interval length so intervals
    explode into O(1) buckets each.

    ``pt_col``/``start_col``/``end_col`` must be integral (cast
    timestamps to epoch days/seconds first).  Column names of the two
    inputs must be disjoint.
    """
    keys = keys or []
    ib = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width),
                F.floor(F.col(end_col) / bucket_width),
            )
        ),
    )
    pb = points.withColumn("__b", F.floor(F.col(pt_col) / bucket_width))
    joined = pb.join(ib, keys + ["__b"])
    return joined.filter(
        (F.col(pt_col) >= F.col(start_col)) & (F.col(pt_col) <= F.col(end_col))
    ).drop("__b")
