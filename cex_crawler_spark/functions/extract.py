"""Keyword/regex announcement extraction — the reference's fallback
analyzer (U2) as pure column expressions.

Reference semantics (/root/reference/deepseek_analyzer.py:149-199):
keyword lists decide listing/delisting, a symbol regex pulls up to 3
``AAA/BBB`` pairs, a date regex pulls the first date, 合约/futures cues
pick the type; listings and delistings are concatenated into one flat
list (deepseek_analyzer.py:233).  The LLM path (U1) is out of scope in
a no-network sandbox — this deterministic extractor IS the semantics we
reproduce, vectorized JVM-side (no Python).

Output: array<struct<symbol,action,type,time>> — explode() to rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# keyword lists mirroring deepseek_analyzer.py:152-157
LISTING_KW = ["list", "listing", "launch", "上架", "上线", "新增"]
DELISTING_KW = ["delist", "delisting", "removal", "remove", "下架", "终止", "退市"]
FUTURES_KW = ["futures", "perpetual", "合约", "永续"]

SYMBOL_RX = r"([A-Z0-9]{2,10}/[A-Z]{2,10})"
DATE_RX = r"(\d{4}-\d{2}-\d{2})"


def _contains_any(text: Column, kws: list[str]) -> Column:
    low = F.lower(text)
    cond = F.lit(False)
    for k in kws:
        cond = cond | low.contains(k.lower())
    return cond


def extract_announcements(text: Column, max_symbols: int = 3) -> Column:
    """array<struct<symbol,action,type,time>> per the reference fallback."""
    symbols = F.slice(
        F.array_distinct(F.regexp_extract_all(text, F.lit(SYMBOL_RX), 1)),
        1,
        max_symbols,
    )
    time = F.regexp_extract(text, DATE_RX, 1)
    is_list = _contains_any(text, LISTING_KW)
    is_delist = _contains_any(text, DELISTING_KW)
    typ = F.when(_contains_any(text, FUTURES_KW), "futures").otherwise("spot")
    action = (
        F.when(is_delist, "delist").when(is_list, "list").otherwise(F.lit(None))
    )
    row = lambda s: F.struct(  # noqa: E731
        s.alias("symbol"), action.alias("action"), typ.alias("type"),
        time.alias("time"),
    )
    return F.when(
        action.isNotNull() & (F.size(symbols) > 0),
        F.transform(symbols, row),
    ).otherwise(F.array().cast("array<struct<symbol:string,action:string,type:string,time:string>>"))
