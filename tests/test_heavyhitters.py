"""Misra-Gries heavy hitters: exactness vs naive counts, the superset
guarantee under adversarial spread, bounded candidate volume."""

import pytest
from pyspark.sql import functions as F

from cex_crawler_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_candidates,
)


@pytest.fixture(scope="module")
def zipf(spark):
    """60k rows, Zipf-ish: key j owns ~1/(j+1) share; long singleton
    tail (the vocabulary shape where groupBy state is the bottleneck)."""
    df = (
        spark.range(60_000)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("w0"))
            .when(F.col("id") % 3 == 0, F.lit("w1"))
            .when(F.col("id") % 5 == 0, F.lit("w2"))
            .when(F.col("id") % 7 == 0, F.lit("w3"))
            .otherwise(F.concat(F.lit("tail"), F.col("id").cast("string")))
            .alias("tok")
        )
        .repartition(8)
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def _exact(df, frac):
    total = df.count()
    return (
        df.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= -(-total * frac // 1))
        .withColumn("fraction", F.round(F.col("cnt") / F.lit(total), 6))
    )


@pytest.mark.parametrize("frac", [0.01, 0.05, 0.3])
def test_exact_vs_naive(spark, zipf, frac):
    got = heavy_hitters(zipf, "tok", frac)
    want = _exact(zipf, frac)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.select("tok", "cnt", "fraction").collect())
    )


def test_superset_guarantee_adversarial(spark):
    """A heavy key diluted evenly across partitions, drowned locally by
    per-partition noise, must still surface: its partition share exceeds
    n_p/(k+1) everywhere, so MG keeps it in every partition."""
    df = (
        spark.range(40_000)
        .select(
            F.when(F.col("id") % 20 == 0, F.lit("needle"))  # 5% globally
            .otherwise(F.concat(F.lit("n"), F.col("id").cast("string")))
            .alias("tok")
        )
        .repartition(16)
    )
    got = heavy_hitters(df, "tok", 0.05, k=41)  # k just past 2/f
    rows = {r.tok: r.cnt for r in got.collect()}
    assert rows == {"needle": 2000}


def test_candidate_volume_bounded(spark, zipf):
    """The scale claim: candidates ≤ k per partition — the exact pass
    never sees the vocabulary."""
    k = 50
    n_parts = zipf.rdd.getNumPartitions()
    assert mg_candidates(zipf, "tok", k).count() <= k * n_parts


def test_small_k_still_exact(spark, zipf):
    """k at the documented 2/f default is sufficient; a generous k must
    not change the answer (both exact by construction)."""
    a = heavy_hitters(zipf, "tok", 0.05)
    b = heavy_hitters(zipf, "tok", 0.05, k=5000)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
