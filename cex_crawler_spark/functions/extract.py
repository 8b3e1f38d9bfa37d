"""Keyword/regex announcement extraction — the reference's fallback
analyzer (U2) as pure column expressions.

Faithful to /root/reference/deepseek_analyzer.py:149-199
(``_fallback_analysis``), exactly:

- keyword families are matched as substrings of ``lower(text)``
  (deepseek_analyzer.py:156,181,190).  NOTE the reference quirk that
  ``'listing' in text`` is ALSO true for texts containing
  ``'delisting'`` (substring) — so English delisting announcements emit
  BOTH listing and delisting rows there, and here.
- listing and delisting branches are INDEPENDENT ``if`` blocks
  (deepseek_analyzer.py:181-197): when both families hit, both row
  sets are emitted, each over the same first-3 symbols.
- symbols come from ``[A-Z]{2,10}/[A-Z]{2,10}|[A-Z]{2,10}-[A-Z]{2,10}``
  over ``upper(text)`` (deepseek_analyzer.py:163-164) — letters only
  (no digits), slash or dash pairs, duplicates preserved, first 3 in
  document order (``symbols[:3]``, deepseek_analyzer.py:182,191).
- time is the FIRST match of ``\\d{4}年\\d{1,2}月\\d{1,2}日`` or
  ``\\d{4}-\\d{1,2}-\\d{1,2}`` over the raw text, else 时间未明确
  (deepseek_analyzer.py:167-168,187).
- type is 合约 when any of 合约/永续/futures/perpetual appears in
  ``lower(text)``, else 现货 (both the spot-cue branch and the default
  return 现货 — deepseek_analyzer.py:171-178).
- actions are the reference's own tokens 上架/下架; the saved record is
  listings followed by delistings (deepseek_analyzer.py:233).

The LLM path (U1) is out of scope in a no-network sandbox — this
deterministic extractor IS the semantics we reproduce, vectorized
JVM-side (no Python).  Output: array<struct<symbol,action,type,time>>
— explode() to rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# keyword lists: deepseek_analyzer.py:159-160 verbatim
LISTING_KW = ["上架", "上线", "新增", "开放交易", "开始交易", "listing"]
DELISTING_KW = ["下架", "下线", "停止交易", "终止交易", "delisting", "removal"]
# determine_type futures cues: deepseek_analyzer.py:173
FUTURES_KW = ["合约", "永续", "futures", "perpetual"]

# deepseek_analyzer.py:163 — letters only, slash or dash
SYMBOL_RX = r"[A-Z]{2,10}/[A-Z]{2,10}|[A-Z]{2,10}-[A-Z]{2,10}"
# deepseek_analyzer.py:167 — Chinese dates and non-zero-padded ISO dates
DATE_RX = r"\d{4}年\d{1,2}月\d{1,2}日|\d{4}-\d{1,2}-\d{1,2}"

NO_TIME = "时间未明确"
ROW_TYPE = "array<struct<symbol:string,action:string,type:string,time:string>>"


def _contains_any(low: Column, kws: list[str]) -> Column:
    cond = F.lit(False)
    for k in kws:
        cond = cond | low.contains(k.lower())
    return cond


def extract_announcements(text: Column, max_symbols: int = 3) -> Column:
    """array<struct<symbol,action,type,time>> per the reference fallback.

    Listing rows first, then delisting rows (both sets when both keyword
    families match), each over the same first-``max_symbols`` symbols.
    """
    low = F.lower(text)
    # findall keeps duplicates and document order; [:3] (no distinct!)
    symbols = F.slice(
        F.regexp_extract_all(F.upper(text), F.lit(SYMBOL_RX), 0), 1, max_symbols
    )
    first_date = F.regexp_extract(text, DATE_RX, 0)
    time = F.when(first_date == "", F.lit(NO_TIME)).otherwise(first_date)
    typ = F.when(_contains_any(low, FUTURES_KW), "合约").otherwise("现货")

    def rows(action: str) -> Column:
        return F.transform(
            symbols,
            lambda s: F.struct(
                s.alias("symbol"),
                F.lit(action).alias("action"),
                typ.alias("type"),
                time.alias("time"),
            ),
        )

    empty = F.array().cast(ROW_TYPE)
    listing_rows = F.when(_contains_any(low, LISTING_KW), rows("上架")).otherwise(empty)
    delisting_rows = (
        F.when(_contains_any(low, DELISTING_KW), rows("下架")).otherwise(empty)
    )
    return F.concat(listing_rows, delisting_rows)
