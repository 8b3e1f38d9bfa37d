"""Consolidated-export aggregation layer — the reference's
``save_accoucements_to_csv`` (/root/reference/main.py:42-95) as
DataFrame ops.

Input rows are the persisted announcement records
(release_time, time, exchange, symbol, type, action, title, url, content)
— /root/reference/exchange/binance.py:274-280.  Reproduced semantics:

- drop rows where ``time == '待定'`` (main.py:57);
- flag ``comments = '待确定'`` when time is null/short, then default the
  time to the run date (main.py:58-60);
- drop rows with null symbol or null/empty action (main.py:66);
- keep ``time >= today-7d`` and ``release_time >= today-OFFSET_DAYS``
  (main.py:72-73) — cutoffs are explicit parameters, not wall-clock;
- sort by (release_time desc, exchange desc) (main.py:63 — the reference
  sorts its ``release_date`` copy of release_time);
- the output column list duplicates ``content`` (main.py:65) — preserved
  behind a flag because the shipped announcements.csv confirms it;
- description = comments + action + ' ' + symbol-stripped-of-USDT + '\\n'
  (main.py:77), group-concatenated per (time, exchange) with EXPLICIT
  ordering (the reference relies on pandas group order; we make it
  deterministic by sorting on a sequence key), then pivoted to one
  column per exchange (main.py:78-94) with the full exchange list so
  empty exchanges still appear (main.py:82-84).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import HOSTS

PENDING = "待定"
UNCONFIRMED = "待确定"


def consolidate_announcements(
    rows: DataFrame,
    run_date: str,
    offset_days: int = 14,
    keep_duplicate_content: bool = True,
) -> DataFrame:
    """The consolidated CSV view (main.py:42-73)."""
    # pandas `df[df.time != '待定']` KEEPS NaN rows (main.py:57); SQL's
    # three-valued logic would drop them — keep nulls explicitly
    df = rows.filter((F.col("time") != PENDING) | F.col("time").isNull())
    df = df.withColumn(
        "comments",
        F.when(
            F.col("time").isNull() | (F.length("time") < 10), UNCONFIRMED
        ).otherwise(F.lit("")),
    ).withColumn(
        "time",
        F.when(
            F.col("time").isNull() | (F.length("time") < 10), F.lit(run_date)
        ).otherwise(F.col("time")),
    )
    df = df.filter(
        F.col("symbol").isNotNull()
        & F.col("action").isNotNull()
        & (F.col("action") != "")
    )
    df = df.filter(
        (F.to_date("time") >= F.date_sub(F.to_date(F.lit(run_date)), 7))
        & (
            F.to_date("release_time")
            >= F.date_sub(F.to_date(F.lit(run_date)), offset_days)
        )
    )
    cols = [
        "release_time", "time", "exchange", "symbol", "type", "action",
        "title", "url", "content",
    ]
    if keep_duplicate_content:
        # main.py:65 lists content twice; alias the second copy so Spark
        # accepts it (the CSV header quirk is an export-time concern)
        sel = [F.col(c) for c in cols] + [F.col("content").alias("content_dup")]
    else:
        sel = [F.col(c) for c in cols]
    sel.append(F.col("comments"))
    return df.select(*sel).orderBy(F.desc("release_time"), F.desc("exchange"))


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV sink (reference K4/K5: main.py:67,85,94 ``to_csv``).

    ``single_file=True`` coalesces to one part for export parity with the
    reference's one-file CSVs; leave False at scale.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def description_col() -> F.Column:
    """main.py:77 row description."""
    return F.concat(
        F.col("comments"),
        F.col("action"),
        F.lit(" "),
        F.regexp_replace(F.col("symbol"), "/?USDT", ""),
        F.lit("\n"),
    )


def pivot_by_exchange(
    consolidated: DataFrame,
    type_value: str,
    exchanges: list[str] | None = None,
) -> DataFrame:
    """Spot/futures pivot (main.py:78-94): rows = time, cols = exchange,
    cell = ordered group-concat of descriptions.

    Ordering inside a cell is explicit — (release_time, symbol) — where
    the reference inherits pandas' input order (SURVEY §2.6 A1 warns
    collect_list is shuffle-nondeterministic).
    """
    exchanges = exchanges or HOSTS
    base = (
        consolidated.filter(F.col("type") == type_value)
        .withColumn("description", description_col())
        .groupBy("time", "exchange")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("release_time", "symbol", "description")
                        )
                    ),
                    lambda s: s["description"],
                ),
                " ",
            ).alias("description")
        )
    )
    return (
        base.groupBy("time")
        .pivot("exchange", exchanges)
        .agg(F.first("description"))
        .orderBy("time")
    )
