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

The north rule names a CUCKOO-FILTER FALLBACK FOR DELETES: the one
crawl operation Bloom cannot express is *un-seeing* a URL — freshness
invalidation / forced re-crawl, where a previously-fetched URL must
become schedulable again.  ``CuckooFilter64`` (partial-key cuckoo
hashing, Fan et al. CoNEXT'14) supports that: 4-slot buckets of 16-bit
fingerprints at ≤0.95 load ≈ 2.2 B/key (vs Bloom's ~0.9 B/key at 3%
fpp), built distributively like the Bloom (per-partition tables, driver
batch-merge) and applied through the same prefilter + exact-anti-join
contract via ``invalidate_seen`` — deletes always hit the exact seen
TABLE and the filter together, so a fingerprint collision between a
deleted and a kept key costs one extra join probe (possible false
positive), never a duplicate fetch.  At 10^10 keys either filter is
tens of GB — too big for one broadcast — so the scale path shards the
filter by the frontier's ``host_bucket`` partitioning (each task loads
only its shard); the single-filter form below is the per-shard unit.
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


class CuckooFilter64:
    """Cuckoo filter over int64 keys — the delete-capable seen filter.

    Partial-key cuckoo hashing (Fan et al., CoNEXT'14): each key stores a
    16-bit fingerprint in one of two buckets, ``i1 = h(key)`` and
    ``i2 = i1 ^ h(fp)`` — the XOR form lets an entry relocate knowing
    only (bucket, fp), which is what makes eviction (and merge) work.

    Contract (what makes ``delete`` safe): ``add_many`` is called ONCE
    per unique key — the crawl adds a url_hash exactly when it
    transitions to seen — and duplicate copies from *distinct* keys that
    collide on (bucket, fp) are kept as separate copies, so deleting one
    key removes exactly one copy and never produces a false negative for
    the other (the collision survivor still matches).  Deleting a key
    that was never added is undefined, as in the paper.
    """

    SLOTS = 4
    _MAX_KICKS = 500

    def __init__(self, n_expected: int, table: np.ndarray | None = None):
        if table is not None:
            self.table = table
        else:
            n_buckets = 64
            while n_buckets * self.SLOTS * 0.95 < max(n_expected, 1):
                n_buckets <<= 1
            self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.n_buckets = int(self.table.shape[0])
        self.mask = np.uint64(self.n_buckets - 1)

    def _fp_hash(self, fp: np.ndarray) -> np.ndarray:
        """Bucket offset from a fingerprint (uint64 in, masked out)."""
        return (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) & self.mask

    def _fp_index(self, keys: np.ndarray):
        h = keys.astype(np.uint64)
        h = h ^ (h >> np.uint64(33))
        h = (h * np.uint64(0xFF51AFD7ED558CCD)) & np.uint64(_M64)
        fp = ((h >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(
            np.uint16
        )  # 1..65535 — 0 is the empty-slot sentinel
        i1 = h & self.mask
        i2 = i1 ^ self._fp_hash(fp)
        return fp, i1.astype(np.int64), i2.astype(np.int64)

    def _group_ranks(self, buckets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(stable order, rank-within-equal-bucket-run) for scatter safety."""
        order = np.argsort(buckets, kind="stable")
        bs = buckets[order]
        starts = np.r_[0, np.flatnonzero(np.diff(bs)) + 1]
        lens = np.diff(np.r_[starts, bs.size])
        ranks = np.arange(bs.size) - np.repeat(starts, lens)
        return order, ranks

    def _insert_batch(self, fp: np.ndarray, i1: np.ndarray, i2: np.ndarray) -> None:
        """Place (fp, {i1, i2}) entries: two vectorized direct-placement
        passes (the overwhelmingly common path below the load limit),
        then a per-entry eviction walk for the stragglers."""
        for which in (0, 1):
            if fp.size == 0:
                break
            cand = i1 if which == 0 else i2
            occ = (self.table != 0).sum(axis=1).astype(np.int64)
            order, ranks = self._group_ranks(cand)
            bs, fps = cand[order], fp[order]
            fits = ranks < (self.SLOTS - occ[bs])
            # (row, slot) pairs are distinct by construction: within a
            # bucket run, slot = current occupancy + rank 0,1,2,…
            self.table[bs[fits], occ[bs[fits]] + ranks[fits]] = fps[fits]
            keep = ~fits
            fp = fps[keep]
            i1, i2 = i1[order][keep], i2[order][keep]
        for j in range(fp.size):
            self._insert_one(int(fp[j]), int(i1[j]))

    def _insert_one(self, fp: int, i: int) -> None:
        for kick in range(self._MAX_KICKS):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                self.table[i, empty[0]] = fp
                return
            j = kick % self.SLOTS  # deterministic eviction (no RNG anywhere)
            fp, self.table[i, j] = int(self.table[i, j]), fp
            i = int(
                np.uint64(i) ^ self._fp_hash(np.array([fp], dtype=np.uint64))[0]
            )
        raise RuntimeError(
            "cuckoo filter over capacity — size n_expected for the seen set "
            f"(load {(self.table != 0).mean():.2f}, {self.n_buckets} buckets)"
        )

    def add_many(self, keys: np.ndarray) -> None:
        keys = np.unique(np.asarray(keys, dtype=np.int64))
        fp, i1, i2 = self._fp_index(keys)
        self._insert_batch(fp, i1, i2)

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_index(np.asarray(keys, dtype=np.int64))
        return ((self.table[i1] == fp[:, None]) | (self.table[i2] == fp[:, None])).any(
            axis=1
        )

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Remove ONE copy per unique key; bool mask of keys found.

        Scalar per key — 'remove exactly one copy' under duplicate
        (bucket, fp) hits is not scatter-expressible; invalidation
        batches are orders of magnitude smaller than inserts, and at
        shard scale they run inside the shard's own partition.
        """
        keys = np.unique(np.asarray(keys, dtype=np.int64))
        fp, i1, i2 = self._fp_index(keys)
        found = np.zeros(keys.size, dtype=bool)
        for j in range(keys.size):
            for i in (int(i1[j]), int(i2[j])):
                s = np.flatnonzero(self.table[i] == fp[j])
                if s.size:
                    self.table[i, s[0]] = 0
                    # left-pack the row: the batch-insert scatter places
                    # new copies at slot occupancy+rank, which assumes
                    # occupied slots are contiguous from slot 0
                    row = self.table[i]
                    nz = row[row != 0]
                    row[:] = 0
                    row[: nz.size] = nz
                    found[j] = True
                    break
        return found

    def merge(self, other: "CuckooFilter64") -> "CuckooFilter64":
        """Union by re-placing the other table's copies (same geometry).

        An entry sitting in its i2 re-derives i1 = i2 ^ h(fp), so every
        copy carries both candidate buckets — the same vectorized batch
        insert as ``add_many`` applies.
        """
        assert self.n_buckets == other.n_buckets
        rows, slots = np.nonzero(other.table)
        fp = other.table[rows, slots]
        alt = (rows.astype(np.uint64) ^ self._fp_hash(fp)).astype(np.int64)
        self._insert_batch(fp, rows.astype(np.int64), alt)
        return self


def build_cuckoo(
    df: DataFrame, key_col: str, n_expected: int
) -> CuckooFilter64:
    """Distributed cuckoo build: per-partition tables, driver batch-merge.

    Same shape as :func:`build_bloom`; the merge is a vectorized
    re-placement instead of a bitwise OR (cuckoo tables don't OR), so
    size ``n_expected`` for the FULL key count — every partition table
    shares the full-size geometry and the driver union stays below the
    load limit.  Small filters (same threshold as :func:`build_bloom`)
    skip the partition tables and add the Arrow-collected keys directly.
    """
    proto = CuckooFilter64(n_expected)
    if n_expected <= _DRIVER_BUILD_MAX:
        keys = _collect_keys(df, key_col)
        if keys.size:
            proto.add_many(keys)
        return proto

    def partition_table(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cf = CuckooFilter64(n_expected)
        seen_any = False
        for pdf in it:
            keys = pdf[key_col].to_numpy(dtype=np.int64)
            if keys.size:
                cf.add_many(keys)
                seen_any = True
        if seen_any:
            yield pd.DataFrame({"table": [cf.table.tobytes()]})

    parts = (
        df.select(key_col)
        .mapInPandas(
            partition_table,
            schema=T.StructType([T.StructField("table", T.BinaryType())]),
        )
        .collect()
    )
    for row in parts:
        t = np.frombuffer(row["table"], dtype=np.uint16).reshape(
            proto.n_buckets, CuckooFilter64.SLOTS
        )
        proto.merge(CuckooFilter64(n_expected, table=t.copy()))
    return proto


def invalidate_seen(
    seen: DataFrame,
    urls: DataFrame,
    cuckoo: CuckooFilter64,
    key_col: str = "url_hash",
) -> DataFrame:
    """Un-see ``urls`` — the delete path Bloom cannot express.

    Removes the keys from the exact seen TABLE (anti-join) and from the
    cuckoo filter (in place) in one step, keeping the invariant the
    prefilter relies on: the filter's member set is always a superset of
    the table's — a collision-induced extra copy costs one join probe
    (false positive), never a missed seen row.  The invalidated URLs
    become schedulable in the next round, which re-fetches them — the
    re-crawl semantics (freshness expiry / payload-invalidation sweeps)
    the north rule's cuckoo fallback exists for.
    """
    keys = np.array(
        [r[key_col] for r in urls.select(key_col).distinct().collect()],
        dtype=np.int64,
    )
    cuckoo.delete_many(keys)
    return seen.join(urls.select(key_col).distinct(), key_col, "left_anti")


# Below this n_expected the filter is built by collecting the raw keys
# (8 B/key over Arrow) and one vectorized driver-side add_many; above it
# the per-partition-bitmap reduce takes over.  The key collect moves
# rows × 8 B; the bitmap path moves partitions × m/8 B — at bench scale
# (400 k expected, ~200 post-AQE partitions of a 128-partition fetch
# stage) that is 0.7 MB vs ~80 MB, and the gap WIDENS with n_expected
# until the key count itself threatens driver memory (8 B × 64 M =
# 512 MB, the cap below; tune via env on bigger drivers).
_DRIVER_BUILD_MAX = int(
    __import__("os").environ.get("SPARK_GRAFT_FILTER_DRIVER_BUILD_MAX",
                                 str(64_000_000))
)


def _collect_keys(df: DataFrame, key_col: str) -> np.ndarray:
    pdf = df.select(key_col).toPandas()
    return pdf[key_col].to_numpy(dtype=np.int64)


def build_bloom(
    df: DataFrame, key_col: str, n_expected: int, fpp: float = 0.03
) -> BloomFilter64:
    """Bloom build: driver add_many over Arrow-collected keys for filters
    up to ``$SPARK_GRAFT_FILTER_DRIVER_BUILD_MAX`` expected keys, else
    per-partition bitmaps OR-reduced on the driver."""
    proto = BloomFilter64(n_expected, fpp)
    if n_expected <= _DRIVER_BUILD_MAX:
        keys = _collect_keys(df, key_col)
        if keys.size:
            proto.add_many(keys)
        return proto
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


def cuckoo_prefilter(
    df: DataFrame, key_col: str, cf: CuckooFilter64
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (definitely_new, possibly_seen) via a broadcast
    cuckoo filter — same contract as :func:`bloom_prefilter`, for crawls
    that need the delete path (:func:`invalidate_seen`)."""
    sc = df.sparkSession.sparkContext
    b = sc.broadcast((cf.table.tobytes(), cf.n_buckets))

    @F.pandas_udf(T.BooleanType())
    def might_contain(keys: pd.Series) -> pd.Series:
        tbl, nb = b.value
        local = CuckooFilter64(
            1,
            table=np.frombuffer(tbl, dtype=np.uint16).reshape(
                nb, CuckooFilter64.SLOTS
            ),
        )
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
    bloom: BloomFilter64 | CuckooFilter64 | None = None,
) -> DataFrame:
    """Rows of ``frontier`` whose ``key_col`` is NOT in ``seen`` — exact.

    With a prefilter (Bloom, or cuckoo when the crawl un-sees URLs),
    only possible-positives shuffle; without one, a plain left-anti join
    (Catalyst picks broadcast-anti when ``seen`` is small).
    """
    if seen is None:
        return frontier
    seen_keys = seen.select(key_col).distinct()
    if bloom is None:
        return frontier.join(seen_keys, key_col, "left_anti")
    prefilter = (
        cuckoo_prefilter if isinstance(bloom, CuckooFilter64) else bloom_prefilter
    )
    definitely_new, possibly_seen = prefilter(frontier, key_col, bloom)
    survivors = possibly_seen.join(seen_keys, key_col, "left_anti")
    return definitely_new.unionByName(survivors)
