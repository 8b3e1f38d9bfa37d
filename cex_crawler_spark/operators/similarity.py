"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — exact brute-force top-k, all JVM-side
  (zip_with/aggregate dot products, window rank).  The correctness
  baseline; O(queries × corpus) — fine when the query set is small or
  the corpus fits a broadcast.
- :func:`lsh_cosine_topk` — sign-random-projection LSH: bucket by the
  hyperplane sign bits, search only same-bucket (or near-bucket)
  candidates.  The 100 TB path: shuffle is O(n) on a small bucket key
  instead of a cross join.  Recall < 1 by design; verified in tests
  against the brute-force baseline.
- :func:`embedding_near_dup_pairs` — all pairs with cosine ≥ threshold
  (embedding-space near-dup dedup).

Projection hyperplanes are generated from a fixed seed (deterministic
across executors, no stored model).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self) by cosine.

    Emits (query_id, neighbor_id, cos) with deterministic tie-breaks
    (cos desc, neighbor_id asc).  The query side is broadcast — the
    corpus is never cross-joined against itself at scale.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def srp_bucket_udf(dim: int, n_planes: int = 12, seed: int = 13):
    """Sign-random-projection bucket id as a vectorized pandas UDF."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return bucket


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 13,
) -> DataFrame:
    """Approximate top-k: candidates share the SRP bucket, then exact
    cosine rank within candidates.  One equi-join on the bucket key."""
    bucket = srp_bucket_udf(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", bucket(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", bucket(F.col("cv")))
    scored = (
        c.join(q, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold.

    use_lsh=False: exact — a broadcast-matrix nested loop with a numpy
    GEMM inner (each Arrow batch of rows multiplies against the
    broadcast corpus matrix), so the O(n²) flops run at BLAS speed and
    the shuffle is O(n).  Valid while the corpus matrix fits a broadcast
    (~10M × 64 doubles ≈ 5 GB); beyond that, use_lsh=True.
    use_lsh=True: SRP-bucketed candidates — the 100 TB path.
    """
    from collections.abc import Iterator

    v = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if use_lsh:
        bucket = srp_bucket_udf(dim)
        v = v.withColumn("bucket", bucket(F.col("v")))
        joined = v.alias("a").join(
            v.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        return (
            joined.withColumn("cos", F.round(cosine(F.col("a.v"), F.col("b.v")), 6))
            .filter(F.col("cos") >= threshold)
            .select(
                F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos"
            )
        )

    rows = v.collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    b = df.sparkSession.sparkContext.broadcast((ids, mat))

    schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        corpus_ids, corpus = b.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            batch_ids = pdf["id"].to_numpy(dtype=np.int64)
            m = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            cos = np.round(m @ corpus.T, 6)
            # id_a < id_b halves the output; threshold on the rounded value
            mask = (cos >= threshold) & (batch_ids[:, None] < corpus_ids[None, :])
            ai, bj = np.nonzero(mask)
            yield pd.DataFrame(
                {
                    "id_a": batch_ids[ai],
                    "id_b": corpus_ids[bj],
                    "cos": cos[ai, bj],
                }
            )

    return v.mapInPandas(run, schema=schema)
