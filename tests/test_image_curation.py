"""Sim image table + LAION-style curation + Hamming pair queries."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

import __spark_entry__ as entry


def test_sim_images_spark_duckdb_parity(spark):
    """The fixture must be bit-identical across engines — every oracle
    built on it depends on that."""
    sdf = (
        entry.gen_sim_images(spark)
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    ddf = (
        duckdb.sql(
            "WITH " + entry._sim_images_sql() + " SELECT * FROM sim_images ORDER BY image_id"
        )
        .df()
        .astype({c: sdf[c].dtype for c in sdf.columns})
    )
    pd.testing.assert_frame_equal(sdf, ddf, check_dtype=False)


def test_curation_output_invariants(spark):
    q = entry.queries()["image_caption_curation"]
    rows = q(spark, "/root/testdata/sf0.001").collect()
    fmts = [r["fmt"] for r in rows]
    assert "gif" not in fmts and len(fmts) == len(set(fmts))
    assert all(r["n_images"] > 0 and r["avg_w"] >= 64 and r["avg_h"] >= 64 for r in rows)


def test_curation_dedups_planted_phash_dups(spark):
    """Every 13th image copies the previous phash — post-curation the
    canonical set must hold at most one image per phash."""
    imgs = entry.gen_sim_images(spark)
    toks = F.size(F.split(F.col("caption"), " "))
    gated = imgs.filter(
        (F.col("w") >= 64)
        & (F.col("h") >= 64)
        & (F.greatest("w", "h") <= 3 * F.least("w", "h"))
        & F.col("fmt").isin("jpeg", "png", "webp")
        & (toks >= 5)
    )
    keep = gated.groupBy("phash").agg(F.min("image_id").alias("image_id"))
    canon = gated.join(keep, ["phash", "image_id"], "left_semi")
    n_gated, n_canon = gated.count(), canon.count()
    n_distinct = gated.select("phash").distinct().count()
    assert n_canon == n_distinct < n_gated


def test_hamming_pairs_include_planted_dups(spark):
    """Exact-dup rows (Hamming 0) and clean near-dup rows (Hamming 1)
    must all surface — the pigeonhole guarantee at radius ≤ 3."""
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in entry.queries()["phash_hamming_pairs_sim"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    found0 = found1 = 0
    for sid in range(13, entry.SIM_IMG_N, 13):
        key = (f"img{sid - 1:010d}", f"img{sid:010d}")
        if sid % 29 != 0 and (sid - 1) % 29 != 0:  # neither side re-based
            assert pairs.get(key) == 0, key
            found0 += 1
    for sid in range(29, entry.SIM_IMG_N, 29):
        if sid % 13 == 0 or (sid - 2) % 13 == 0 or (sid - 1) % 13 == 0:
            continue  # base row itself re-based → pair not Hamming-near
        key = (f"img{sid - 2:010d}", f"img{sid:010d}")
        assert pairs.get(key) == 1, key
        found1 += 1
    assert found0 > 200 and found1 > 80
