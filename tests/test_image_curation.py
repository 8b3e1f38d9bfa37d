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


class TestAspectPacking:
    def test_aspect_bucket_assignment(self, spark):
        from cex_crawler_spark.operators.multimodal import aspect_bucket

        rows = [  # (w, h, expected bucket idx in the default grid)
            (100, 200, 0),   # exactly 1:2
            (300, 400, 1),   # exactly 3:4
            (512, 512, 2),   # square
            (400, 300, 3),   # 4:3
            (200, 100, 4),   # 2:1
            (95, 200, 0),    # taller than 1:2 clamps to the end bucket
            (1000, 95, 4),   # ultra-wide clamps to 2:1
            (370, 400, 1),   # between 3:4 (0.75) and 1:1 → nearer 0.925? no: 0.925 is nearer 1.0 in log space
        ]
        # fix the last expectation analytically: ln(0.925) = -0.078 vs
        # distance to ln(0.75) = 0.210 → bucket 2 (square)
        rows[-1] = (370, 400, 2)
        df = spark.createDataFrame(
            [(w, h) for w, h, _ in rows], "w long, h long"
        )
        got = [
            r["b"]
            for r in df.select(
                aspect_bucket("w", "h").alias("b")
            ).collect()
        ]
        assert got == [e for _, _, e in rows]

    def test_aspect_bucket_tie_breaks_low_index(self, spark):
        from cex_crawler_spark.operators.multimodal import aspect_bucket

        # w/h = 2 is log-equidistant from 1:1 and 4:1 → lowest index wins
        df = spark.createDataFrame([(2, 1)], "w long, h long")
        b = df.select(
            aspect_bucket("w", "h", ratios=((1, 1), (4, 1))).alias("b")
        ).first()["b"]
        assert b == 0

    def test_pack_images_restarts_per_bucket(self, spark):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        from cex_crawler_spark.operators.multimodal import pack_images

        imgs = spark.range(600).select(
            F.col("id").alias("image_id"),
            (160 + (F.col("id") * 37) % 768).alias("w"),
            (160 + (F.col("id") * 53) % 768).alias("h"),
        )
        packed = pack_images(imgs, budget_px=1_500_000)
        pdf = packed.select("image_id", "ar_bucket", "n_px", "pack_id").toPandas()
        assert len(pdf) == 600
        assert (pdf["n_px"] == (160 + pdf["image_id"] * 37 % 768) * (160 + pdf["image_id"] * 53 % 768)).all()
        # every bucket's packing starts at pack 0 and is contiguous &
        # non-decreasing in image_id order
        for _, g in pdf.sort_values("image_id").groupby("ar_bucket"):
            packs = g["pack_id"].tolist()
            assert packs[0] == 0
            assert all(b - a in (0, 1) for a, b in zip(packs, packs[1:]))
        # matches the naive per-bucket global-window cumsum exactly
        naive = (
            packed.withColumn(
                "c",
                F.sum("n_px").over(
                    Window.partitionBy("ar_bucket")
                    .orderBy("image_id")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "want", F.floor((F.col("c") - F.col("n_px")) / F.lit(1_500_000))
            )
        )
        bad = naive.filter(F.col("want") != F.col("pack_id")).count()
        assert bad == 0
        # overflow bound: a pack exceeds budget by < its largest member
        stats = packed.groupBy("ar_bucket", "pack_id").agg(
            F.sum("n_px").alias("px"), F.max("n_px").alias("mx")
        )
        assert stats.filter(F.col("px") >= 1_500_000 + F.col("mx")).count() == 0
