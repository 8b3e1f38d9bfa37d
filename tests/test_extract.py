"""Extractor (U2) fixture cases mirroring the reference fallback analyzer
(/root/reference/deepseek_analyzer.py:149-199 semantics)."""

import pytest
from pyspark.sql import functions as F

from cex_crawler_spark.functions.extract import extract_announcements

CASES = [
    # (text, expected list of (symbol, action, type, time))
    (
        "Binance will list ABC/USDT on 2025-03-04",
        [("ABC/USDT", "list", "spot", "2025-03-04")],
    ),
    (
        "Delisting of XYZ/USDT perpetual futures on 2025-05-06",
        [("XYZ/USDT", "delist", "futures", "2025-05-06")],
    ),
    (
        "上架 SYM1/USDT 和 SYM2/USDT 合约",
        [("SYM1/USDT", "list", "futures", ""), ("SYM2/USDT", "list", "futures", "")],
    ),
    # delist keywords win over list keywords (reference checks delist first)
    (
        "Listing removal: AAA/USDT will be delisted 2025-01-02",
        [("AAA/USDT", "delist", "spot", "2025-01-02")],
    ),
    # max 3 symbols (deepseek_analyzer.py:182)
    (
        "list A1/USDT B2/USDT C3/USDT D4/USDT on 2025-07-08",
        [
            ("A1/USDT", "list", "spot", "2025-07-08"),
            ("B2/USDT", "list", "spot", "2025-07-08"),
            ("C3/USDT", "list", "spot", "2025-07-08"),
        ],
    ),
    ("Scheduled maintenance notice", []),          # no action keyword
    ("Listing announcement without symbols", []),  # no symbol
    ("ABC/USDT price update", []),                 # symbol but no action
]


@pytest.mark.parametrize("text,expected", CASES)
def test_extractor_case(spark, text, expected):
    df = spark.createDataFrame([(text,)], "text string").select(
        F.explode(extract_announcements(F.col("text"))).alias("a")
    )
    got = [
        (r["a"]["symbol"], r["a"]["action"], r["a"]["type"], r["a"]["time"])
        for r in df.collect()
    ]
    assert got == expected
