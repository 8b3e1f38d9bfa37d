"""Front-coded URL-key storage — the seen-set / CDX compression tier.

A 10^10-URL seen-set stored as raw strings is ~1 TB of mostly repeated
prefixes: SURT keys (sources/warc.py surt_urlkey) sort a registrable
domain's whole subtree into one contiguous range, so adjacent keys
share long prefixes by construction.  Web archives exploit exactly this
(ZipNum/CDX blocks, Lucene term dictionaries): group sorted keys into
blocks and store each key as (shared-prefix length, suffix).

This implementation codes every key against its BLOCK HEADER (the
block's minimum key), not against the previous row.  Prev-row coding
compresses slightly better but decoding is a sequential recurrence
through the block (each key needs the previous key reconstructed
first) — a dependency chain Spark cannot parallelize except by handing
whole blocks to Python.  Header-relative coding decodes as
``substr(header, 1, lcp) || suffix`` — pure scan-side Catalyst with no
intra-block dependency, which is the right trade at 100 TB: storage
drops by the shared-prefix mass (the dominant term for SURT keys) and
decode stays embarrassingly parallel.

Blocks are keyed by a fixed-length key prefix — order-aligned by
construction (no range-sampling pass, the chunked-rank discipline) and
deterministic, so the layout replays bit-for-bit in any engine.
``block_prefix_len`` tunes block granularity: longer prefixes → more,
smaller blocks (pick so the hottest host subtree splits; the header
cost is one string per block).

Everything is Catalyst: the LCP is a bounded fold over character
positions (``aggregate(sequence(...))``, fan-out = key length), blocks
aggregate map-side, headers ride a broadcast join.  No UDF, no global
sort — only a per-block min.

Reference analog: none — the reference keeps its seen-set as an
in-memory Python set per process (/root/reference/base_scraper.py);
this is the storage layer that replaces it at frontier scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cex_crawler_spark.sources.warc import surt_urlkey

#: assumed on-disk cost of the lcp field per entry (2-byte varint)
LCP_FIELD_BYTES = 2


def lcp_length(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of two strings — a bounded
    fold over character positions: ``acc`` advances to ``i`` only while
    every position so far matched (once a mismatch freezes ``acc`` below
    ``i-1`` it can never advance again)."""
    n = F.least(F.length(a), F.length(b))
    folded = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: F.when(
            (acc == i - 1) & (F.substr(a, i, F.lit(1)) == F.substr(b, i, F.lit(1))),
            i,
        ).otherwise(acc),
    )
    # sequence(1, 0) is DESCENDING [1, 0], not empty — guard n == 0
    return F.when(n < 1, F.lit(0)).otherwise(folded)


def frontcode_urls(
    frontier: DataFrame,
    url_col: str = "url",
    block_prefix_len: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Code the frontier's DISTINCT SURT keys (a seen-set is a set).

    Returns ``(coded, headers)``:
      coded   — (block, lcp, suffix) one row per distinct key; the
                header's own row codes as (len(header), '').
      headers — (block, header) one row per block, broadcast-sized at
                sane prefix lengths.
    """
    keys = (
        frontier.select(surt_urlkey(F.col(url_col)).alias("urlkey"))
        .distinct()
        .withColumn(
            "block", F.substring(F.col("urlkey"), 1, block_prefix_len)
        )
    )
    headers = keys.groupBy("block").agg(F.min("urlkey").alias("header"))
    coded = (
        keys.join(F.broadcast(headers), "block")
        .withColumn("lcp", lcp_length(F.col("urlkey"), F.col("header")))
        .withColumn(
            "suffix",
            F.col("urlkey").substr(
                F.col("lcp") + 1, F.length("urlkey") - F.col("lcp")
            ),
        )
        .select("block", "lcp", "suffix")
    )
    return coded, headers


def decode_frontcoded(coded: DataFrame, headers: DataFrame) -> DataFrame:
    """Reconstruct the exact key set: ``substr(header, 1, lcp) ||
    suffix`` — scan-side, no intra-block dependency chain (the point of
    header-relative coding)."""
    return (
        coded.join(F.broadcast(headers), "block")
        .select(
            F.concat(
                F.col("header").substr(F.lit(1), F.col("lcp")), F.col("suffix")
            ).alias("urlkey")
        )
    )


def frontcode_stats(coded: DataFrame, headers: DataFrame) -> DataFrame:
    """Per-block storage accounting in exact integers: raw = the decoded
    key mass, coded = header + per-entry (suffix + lcp field).  Counts
    are CHARACTERS (== bytes for ASCII SURT keys) so they compose with
    the char-based lcp: len(key) == lcp + len(suffix) exactly."""
    entry = coded.groupBy("block").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.length("suffix") + F.col("lcp")).alias("__raw"),
        F.sum(
            F.length("suffix") + F.lit(LCP_FIELD_BYTES)
        ).alias("__entries"),
    )
    return (
        entry.join(F.broadcast(headers), "block")
        .select(
            "block",
            "n_urls",
            F.col("__raw").alias("raw_bytes"),
            (F.col("__entries") + F.length("header")).alias(
                "coded_bytes"
            ),
        )
    )
