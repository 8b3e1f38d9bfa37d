"""Golden tests for the consolidated-export layer against a pandas oracle
that reimplements /root/reference/main.py:42-95 line-by-line (SURVEY §5.4)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cex_crawler_spark.operators.aggregate import (
    PENDING,
    UNCONFIRMED,
    consolidate_announcements,
    filter_recent,
    pivot_by_exchange,
)

RUN_DATE = "2025-09-12"

ROWS = [
    # (release_time, time, exchange, symbol, type, action, title, url, content)
    ("2025-09-10 08:00:00", "2025-09-11 00:00:00", "binance", "ABC/USDT", "spot", "list", "t1", "u1", "c1"),
    ("2025-09-09 08:00:00", "2025-09-09 12:00:00", "bybit", "DEFUSDT", "spot", "delist", "t2", "u2", "c2"),
    ("2025-09-08 08:00:00", PENDING, "okx", "GHI/USDT", "spot", "list", "t3", "u3", "c3"),      # dropped: 待定
    ("2025-09-08 08:00:00", None, "gate", "JKL/USDT", "futures", "list", "t4", "u4", "c4"),       # null time → 待确定 + today
    ("2025-09-07 08:00:00", "short", "mexc", "MNO/USDT", "futures", "delist", "t5", "u5", "c5"),  # short time → 待确定 + today
    ("2025-09-06 08:00:00", "2025-09-07 00:00:00", "bitget", None, "spot", "list", "t6", "u6", "c6"),     # null symbol → drop
    ("2025-09-05 08:00:00", "2025-09-06 00:00:00", "lbank", "PQR/USDT", "spot", "", "t7", "u7", "c7"),    # empty action → drop
    ("2025-08-01 08:00:00", "2025-09-10 00:00:00", "upbit", "STU/USDT", "spot", "list", "t8", "u8", "c8"),  # stale release → drop
    ("2025-09-10 08:00:00", "2025-08-20 00:00:00", "btcc", "VWX/USDT", "spot", "list", "t9", "u9", "c9"),  # old time → drop
    ("2025-09-11 09:00:00", "2025-09-11 00:00:00", "binance", "XYZ/USDT", "spot", "list", "t10", "u10", "c10"),
]

SCHEMA = T.StructType(
    [
        T.StructField("release_time", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("exchange", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("action", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def pandas_oracle(rows, run_date: str, offset_days: int = 14,
                  recent_only: bool = False) -> pd.DataFrame:
    """main.py:42-73 semantics, reimplemented independently in pandas.
    ``recent_only`` applies the pivot-stage date window (main.py:70-73);
    the consolidated CSV itself is unfiltered (main.py:67)."""
    df = pd.DataFrame(rows, columns=[f.name for f in SCHEMA.fields])
    df = df[df["time"] != PENDING].copy()
    short = df["time"].isna() | (df["time"].str.len() < 10)
    df["comments"] = ""
    df.loc[short, "comments"] = UNCONFIRMED
    df.loc[short, "time"] = run_date
    df = df[df["symbol"].notna() & df["action"].notna() & (df["action"] != "")]
    if recent_only:
        t = pd.to_datetime(df["time"], format="mixed").dt.date
        rt = pd.to_datetime(df["release_time"]).dt.date
        today = pd.Timestamp(run_date).date()
        df = df[(t >= today - pd.Timedelta(days=7))
                & (rt >= today - pd.Timedelta(days=offset_days))]
    return df.sort_values(["release_time", "exchange"], ascending=False)


@pytest.fixture(scope="module")
def consolidated(spark):
    src = spark.createDataFrame(ROWS, SCHEMA)
    return consolidate_announcements(src, RUN_DATE).toPandas()


def test_recent_window_matches_pandas_oracle(spark):
    src = spark.createDataFrame(ROWS, SCHEMA)
    got = filter_recent(
        consolidate_announcements(src, RUN_DATE), RUN_DATE
    ).toPandas()
    oracle = pandas_oracle(ROWS, RUN_DATE, recent_only=True)
    assert sorted(got["url"]) == sorted(oracle["url"])


def test_consolidated_matches_pandas_oracle(consolidated):
    oracle = pandas_oracle(ROWS, RUN_DATE)
    got = consolidated
    assert list(got["url"]) == list(oracle["url"])
    assert list(got["comments"]) == list(oracle["comments"])
    assert list(got["time"]) == list(oracle["time"])


def test_duplicated_content_column_preserved(consolidated):
    # main.py:65 lists `content` twice — the export keeps both copies
    assert "content" in consolidated.columns
    assert "content_dup" in consolidated.columns
    assert list(consolidated["content"]) == list(consolidated["content_dup"])


def test_pivot_columns_complete(spark):
    """Every exchange appears as a pivot column even with zero rows
    (main.py:82-84 right-join semantics)."""
    from cex_crawler_spark.synth import HOSTS

    src = spark.createDataFrame(ROWS, SCHEMA)
    cons = filter_recent(consolidate_announcements(src, RUN_DATE), RUN_DATE)
    piv = pivot_by_exchange(cons, "spot")
    assert set(HOSTS) <= set(piv.columns)
    pdf = piv.toPandas()
    # binance row for 2025-09-11 group-concats both listings, USDT stripped
    row = pdf[pdf["time"] == "2025-09-11 00:00:00"]
    assert len(row) == 1
    assert "list ABC" in row.iloc[0]["binance"]
    assert "list XYZ" in row.iloc[0]["binance"]
    assert "USDT" not in row.iloc[0]["binance"]


def test_pivot_cell_ordering_deterministic(spark):
    """Cell concat order is (release_time, symbol) — repeated runs equal."""
    src = spark.createDataFrame(ROWS, SCHEMA).repartition(7)
    cons = filter_recent(consolidate_announcements(src, RUN_DATE), RUN_DATE)
    a = pivot_by_exchange(cons, "spot").toPandas()
    b = pivot_by_exchange(cons, "spot").toPandas()
    pd.testing.assert_frame_equal(a, b)


def test_hkt_export_view(spark):
    """UTC engine timestamps render as the reference's HKT strings at the
    export edge (binance.py:239): the shipped corpus stores
    '2025-08-25 16:00:06' HKT for the UTC instant 08:00:06."""
    from cex_crawler_spark.operators.aggregate import hkt_export_view

    df = spark.createDataFrame(
        [("2025-08-25 08:00:06",), ("2025-12-31 20:30:00",)],
        "release_time string",
    ).withColumn("release_time", F.to_timestamp("release_time"))
    got = [r["release_time"] for r in hkt_export_view(df).collect()]
    assert got == ["2025-08-25 16:00:06", "2026-01-01 04:30:00"]
