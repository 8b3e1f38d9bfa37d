"""Pluggable announcement-extraction strategy — the U1 shape.

The reference analyzes each article with an LLM call
(/root/reference/deepseek_analyzer.py:64-102, ``analyze_announcement``)
and falls back to its rule-based ``_fallback_analysis`` on API failure
(deepseek_analyzer.py:95-102 → 149-199).  The LLM path itself is out of
scope in a no-network, deterministic sandbox (SURVEY §2.10), but the
STRATEGY seam is not: this module factors extraction behind a tiny
interface so a model-backed batch extractor slots in exactly where the
rule-based one runs, without touching any query or pipeline code.

Spark-first contracts:

- an extractor maps a text column to the shared typed result column
  (``array<struct<symbol,action,type,time>>`` — functions/extract.py),
  so every downstream consumer (explode → consolidate → pivot) is
  strategy-agnostic;
- :class:`RuleExtractor` is pure Catalyst (the reference-exact U2
  semantics, zero Python in the hot path);
- :class:`PandasBatchExtractor` is the U1 slot: an Arrow-batched pandas
  UDF whose callable sees a whole batch of texts at once — in
  production that callable issues ONE model/RPC call per batch (never
  per row); in tests it is a deterministic mock;
- :class:`FallbackExtractor` composes primary-with-fallback per row
  (null primary result → fallback result), mirroring the reference's
  LLM→rules degradation.
"""

from __future__ import annotations

import abc
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .extract import ROW_TYPE, extract_announcements


class AnnouncementExtractor(abc.ABC):
    """Strategy: text column → typed announcements column (ROW_TYPE)."""

    @abc.abstractmethod
    def announcements(self, text: Column) -> Column:
        ...

    def apply(
        self, df: DataFrame, text_col: str = "text",
        out_col: str = "announcements",
    ) -> DataFrame:
        return df.withColumn(out_col, self.announcements(F.col(text_col)))


class RuleExtractor(AnnouncementExtractor):
    """Reference-exact keyword/regex extraction (U2) as Catalyst exprs."""

    def __init__(self, max_symbols: int = 3):
        self.max_symbols = max_symbols

    def announcements(self, text: Column) -> Column:
        return extract_announcements(text, self.max_symbols)


class PandasBatchExtractor(AnnouncementExtractor):
    """Model-backed extraction slot (U1): ``fn`` receives a pandas
    Series of texts (one Arrow batch) and returns a same-length Series
    of row-lists matching ROW_TYPE (``None`` entries mean "no answer" —
    compose with :class:`FallbackExtractor` to degrade to rules).

    ``fn`` must be deterministic for replay/resume correctness; a
    production implementation would batch texts into one model request
    per Arrow batch and parse the response here.
    """

    def __init__(self, fn: Callable[[pd.Series], pd.Series]):
        self._udf = F.pandas_udf(fn, ROW_TYPE)

    def announcements(self, text: Column) -> Column:
        return self._udf(text)


class FallbackExtractor(AnnouncementExtractor):
    """``primary`` result unless null, else ``fallback`` — the
    reference's analyze→fallback degradation (deepseek_analyzer.py:95-102)
    as one row-level coalesce (both branches stay vectorized)."""

    def __init__(
        self, primary: AnnouncementExtractor, fallback: AnnouncementExtractor
    ):
        self.primary = primary
        self.fallback = fallback

    def announcements(self, text: Column) -> Column:
        return F.coalesce(
            self.primary.announcements(text),
            self.fallback.announcements(text),
        )


def default_extractor() -> AnnouncementExtractor:
    """The sandbox default: deterministic rule extraction (the reference
    runs LLM-first, but its output is non-deterministic and needs
    network — SURVEY §2.10 excludes both)."""
    return RuleExtractor()
