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
- the consolidated CSV is written BEFORE any date filter (main.py:67);
  the 7-day/``OFFSET_DAYS`` window (main.py:72-73) applies only to the
  spot/futures pivots — split out as :func:`filter_recent` with explicit
  cutoff parameters, not wall-clock;
- sort by (release_date desc, exchange desc) (main.py:63 — the reference
  sorts a DATE-truncated copy of release_time);
- the output column list duplicates ``content`` (main.py:65) — preserved
  behind a flag because the shipped announcements.csv confirms it;
- description = comments + action + ' ' + symbol with '/USDT' then
  'USDT' literal-replaced away + '\\n' (main.py:77), group-concatenated
  per (time, exchange) with EXPLICIT ordering (the reference relies on
  pandas group order; we make it deterministic by sorting on a sequence
  key), then pivoted to one column per exchange (main.py:78-94) with the
  full exchange list so empty exchanges still appear (main.py:82-84);
  the reference's pivot emits present exchanges alphabetically then
  appends absent ones in roster order (pandas pivot sorts labels;
  main.py:82-84 appends) — :func:`reference_column_order` reproduces it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import HOSTS

PENDING = "待定"
UNCONFIRMED = "待确定"

# main.py:39-40 — exchange rosters for the spot/futures pivots
SPOT_CEX = ["binance", "bingx", "bitget", "bybit", "gate", "mexc", "lbank",
            "upbit", "bithumb", "coinex"]
FUTURES_CEX = ["binance", "bingx", "bitunix", "blofin", "bitget", "btcc",
               "bybit", "gate", "mexc", "okx", "lbank", "weex"]


def consolidate_announcements(
    rows: DataFrame,
    run_date: str,
    keep_duplicate_content: bool = True,
) -> DataFrame:
    """The consolidated CSV view (main.py:42-67) — NO date window; the
    reference writes announcements.csv before filtering (main.py:67).

    If the input carries a ``file`` column (main.py:51 tags each record
    with its source path) it is preserved in the reference's column
    position (main.py:65)."""
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
    if "file" in rows.columns:
        sel.append(F.col("file"))
    sel.append(F.col("comments"))
    # main.py:61-63 sorts by the DATE of release_time desc, then exchange
    # desc (stable within ties — we add release_time for determinism)
    return df.select(*sel).orderBy(
        F.desc(F.to_date("release_time")), F.desc("exchange"),
        F.desc("release_time"),
    )


def filter_recent(df: DataFrame, run_date: str, offset_days: int = 14) -> DataFrame:
    """The pivot-stage date window (main.py:70-73): keep
    ``time >= run_date-7d`` and ``release_time >= run_date-offset_days``."""
    return df.filter(
        (F.to_date("time") >= F.date_sub(F.to_date(F.lit(run_date)), 7))
        & (
            F.to_date("release_time")
            >= F.date_sub(F.to_date(F.lit(run_date)), offset_days)
        )
    )


def export_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV sink (reference K4/K5: main.py:67,85,94 ``to_csv``).

    ``single_file=True`` coalesces to one part for export parity with the
    reference's one-file CSVs; leave False at scale.  Quotes escape by
    DOUBLING (escape='"', RFC 4180 / pandas ``to_csv`` convention) so the
    newline- and quote-heavy content column round-trips through any
    standard CSV reader — Spark's default backslash escaping does not.
    """
    out = df.coalesce(1) if single_file else df
    (
        out.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        # the writer TRIMS cell whitespace by default — lossless export
        # must keep the reference content byte-identical
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


EXPORT_TZ = "Asia/Hong_Kong"


def hkt_export_view(
    df: DataFrame,
    ts_cols: tuple[str, ...] = ("release_time",),
    tz: str = EXPORT_TZ,
    fmt: str = "yyyy-MM-dd HH:mm:ss",
) -> DataFrame:
    """Render UTC timestamp columns as the reference's HKT strings at the
    EXPORT edge (binance.py:239 ``tz_convert('Asia/Hong_Kong')``,
    utils.py:13, main.py:54 use Asia/Hong_Kong / Asia/Shanghai — same
    offset).  Engine internals stay UTC (session.py pins UTC for oracle
    parity); only engine-crawled data needs this — the shipped corpus
    already carries HKT strings, which pass through untouched."""
    out = df
    for c in ts_cols:
        out = out.withColumn(
            c, F.date_format(F.from_utc_timestamp(F.col(c), tz), fmt)
        )
    return out


def description_col() -> F.Column:
    """main.py:77 row description — the symbol strip is two sequential
    LITERAL global replaces ('/USDT' first, then 'USDT'), exactly as
    ``str.replace`` chains in the reference."""
    return F.concat(
        F.col("comments"),
        F.col("action"),
        F.lit(" "),
        F.replace(
            F.replace(F.col("symbol"), F.lit("/USDT"), F.lit("")),
            F.lit("USDT"),
            F.lit(""),
        ),
        F.lit("\n"),
    )


def reference_column_order(
    pivoted: DataFrame, exchanges: list[str]
) -> list[str]:
    """Reference pivot-CSV column order (main.py:81-84): pandas pivot
    sorts the PRESENT exchange labels alphabetically, then the roster
    loop appends ABSENT exchanges in roster order.  Presence = the
    column has any non-null cell; one tiny driver-side aggregate."""
    counts = pivoted.select(
        [F.count(e).alias(e) for e in exchanges]
    ).collect()[0]
    present = sorted(e for e in exchanges if counts[e] > 0)
    absent = [e for e in exchanges if counts[e] == 0]
    return ["time"] + present + absent


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
        # main.py:78,87 — roster membership filters ROWS (a non-roster
        # exchange must not contribute pivot rows, only absent columns)
        consolidated.filter(
            (F.col("type") == type_value) & F.col("exchange").isin(exchanges)
        )
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
