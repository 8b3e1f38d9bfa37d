"""URL-seen set: exact anti-join + broadcast Bloom prefilter.

Reference semantics: the seen set IS the output directory — a URL is
"seen" iff its JSON file exists (/root/reference/exchange/binance.py:253-255),
and stale placeholders count (/root/reference/exchange/binance.py:242-244).

Engine design (north rule: bloom/cuckoo URL-seen at 10^10 scale):

- EXACTNESS comes from a left-anti join of the frontier against the
  ``seen(url_hash)`` table — never from the Bloom filter alone.
- The Bloom filter is a broadcast PREFILTER: at 10^10 seen URLs the
  anti-join's shuffle dominates round cost, and most frontier rows in a
  steady-state crawl are already-seen (links are rediscovered
  constantly).  ``might_contain == False`` rows — the vast majority of
  genuinely-new URLs — skip the shuffle entirely; only possible-positives
  flow into the anti-join.  False positives therefore cost one extra
  join probe, never a dropped URL (property-tested).
- The filter is built distributively: one ``mapInPandas`` pass emits a
  per-partition bitmap (numpy bit-ops over int64 arrays, no per-row
  Python), OR-reduced on the driver (k bitmaps of m/8 bytes — the
  treeAggregate pattern), then broadcast.  Per-round DELTAS are merged
  by the same OR, so the filter is maintained incrementally instead of
  rebuilt (SURVEY §2.11: the one custom aggregate the engine needs).

A cuckoo filter (supporting deletes) is not needed: the crawl never
un-sees a URL.  The interface keeps ``merge``/``contains`` abstract so a
cuckoo variant can slot in if delete semantics ever appear.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_M64 = (1 << 64) - 1


class BloomFilter64:
    """Bloom filter over int64 keys; double hashing, numpy-vectorized."""

    def __init__(self, n_expected: int, fpp: float = 0.03, bits: np.ndarray | None = None):
        if bits is not None:
            self.m = int(bits.size) * 8
            self.bits = bits
        else:
            m = max(64, int(-n_expected * math.log(fpp) / (math.log(2) ** 2)))
            self.m = ((m + 63) // 64) * 64
            self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        self.k = max(1, int(round(self.m / max(n_expected, 1) * math.log(2))))
        self.k = min(self.k, 8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions via double hashing of the int64 key."""
        h = keys.astype(np.uint64)
        h1 = h ^ (h >> np.uint64(33))
        h1 = (h1 * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(_M64)
        h2 = (h1 >> np.uint64(29)) | np.uint64(1)  # odd → full-period stride
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_many(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1).astype(bool)

    def merge(self, other: "BloomFilter64") -> "BloomFilter64":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(
    df: DataFrame, key_col: str, n_expected: int, fpp: float = 0.03
) -> BloomFilter64:
    """Distributed Bloom build: per-partition bitmaps, driver OR-reduce."""
    proto = BloomFilter64(n_expected, fpp)
    m, k = proto.m, proto.k

    def partition_bitmap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter64(n_expected, fpp)
        assert (bf.m, bf.k) == (m, k)
        seen_any = False
        for pdf in it:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            if keys.size:
                bf.add_many(keys)
                seen_any = True
        if seen_any:
            yield pd.DataFrame({"bitmap": [bf.bits.tobytes()]})

    parts = (
        df.select(key_col)
        .mapInPandas(
            partition_bitmap,
            schema=T.StructType([T.StructField("bitmap", T.BinaryType())]),
        )
        .collect()
    )
    for row in parts:
        proto.bits |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return proto


def bloom_prefilter(df: DataFrame, key_col: str, bf: BloomFilter64) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (definitely_new, possibly_seen) via a broadcast Bloom.

    ``definitely_new`` rows skip the anti-join shuffle; ``possibly_seen``
    rows go through the exact anti-join.  The bitmap travels as a Spark
    broadcast variable, deserialized once per executor.
    """
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((bf.bits.tobytes(), bf.m, bf.k))

    @F.pandas_udf(T.BooleanType())
    def might_contain(keys: pd.Series) -> pd.Series:
        bits_bytes, m, k = b.value
        local = BloomFilter64(1, bits=np.frombuffer(bits_bytes, dtype=np.uint8))
        local.m, local.k = m, k
        return pd.Series(local.might_contain(keys.to_numpy(dtype=np.int64)))

    flagged = df.withColumn("__maybe_seen", might_contain(F.col(key_col)))
    return (
        flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen"),
        flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen"),
    )


def anti_join_seen(
    frontier: DataFrame,
    seen: DataFrame | None,
    key_col: str = "url_hash",
    bloom: BloomFilter64 | None = None,
) -> DataFrame:
    """Rows of ``frontier`` whose ``key_col`` is NOT in ``seen`` — exact.

    With a Bloom prefilter, only possible-positives shuffle; without one,
    a plain left-anti join (Catalyst picks broadcast-anti when ``seen``
    is small).
    """
    if seen is None:
        return frontier
    seen_keys = seen.select(key_col).distinct()
    if bloom is None:
        return frontier.join(seen_keys, key_col, "left_anti")
    definitely_new, possibly_seen = bloom_prefilter(frontier, key_col, bloom)
    survivors = possibly_seen.join(seen_keys, key_col, "left_anti")
    return definitely_new.unionByName(survivors)
