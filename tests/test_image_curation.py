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


class TestQualityGates:
    def _run(self, spark, rows, **kw):
        from cex_crawler_spark.operators.multimodal import image_quality_gates

        df = spark.createDataFrame(
            rows, "image_id string, w int, h int, fmt string, caption string"
        )
        out = image_quality_gates(df, **kw)
        return out, {r["image_id"]: r for r in out.collect()}

    def test_each_gate_fires_and_reasons_compose(self, spark):
        rows = [
            ("ok", 256, 256, "jpeg", "a red fox jumping"),
            ("small", 32, 64, "jpeg", "a red fox jumping"),
            ("wide", 800, 200, "png", "a red fox jumping"),     # 800 > 3*200
            ("edge", 600, 200, "png", "a red fox jumping"),     # 600 = 3*200 → pass
            ("gif", 256, 256, "gif", "a red fox jumping"),
            ("terse", 256, 256, "webp", "photo"),
            ("empty", 256, 256, "webp", "   "),
            ("wordy", 256, 256, "jpeg", " ".join(["tok"] * 78)),
            ("both", 16, 16, "gif", "x"),
        ]
        out, got = self._run(spark, rows)
        assert got["ok"]["keep"] and got["ok"]["reasons"] == []
        assert got["small"]["reasons"] == ["too_small"]
        assert got["wide"]["reasons"] == ["extreme_aspect"]
        assert got["edge"]["keep"]
        assert got["gif"]["reasons"] == ["bad_format"]
        assert got["terse"]["reasons"] == ["caption_short"]
        assert got["terse"]["n_caption_tokens"] == 1
        assert got["empty"]["n_caption_tokens"] == 0
        assert got["wordy"]["reasons"] == ["caption_long"]
        # multi-failure rows report EVERY reason, sorted
        assert got["both"]["reasons"] == [
            "bad_format", "caption_short", "too_small",
        ]
        # scan-side: zero Exchange in the plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_thresholds_are_parameters(self, spark):
        rows = [("a", 100, 100, "bmp", "one two three")]
        _, got = self._run(
            spark, rows, min_side=100, max_aspect=1.0,
            allowed_fmts=("bmp",), min_caption_tokens=3,
            max_caption_tokens=3,
        )
        assert got["a"]["keep"]


class TestCaptionScreen:
    def test_spam_dropped_dedup_keeps_canonical(self, spark):
        from cex_crawler_spark.operators.multimodal import caption_screen

        rows = (
            # spam: same alt-text on 8 distinct images → all dropped
            [(f"spam{i:02d}", f"Stock Photo {'' if i % 2 else ' '}image")
             for i in range(8)]
            # dup group of 3 with case/whitespace variants → min id kept
            + [("dupC", "A Red  Fox"), ("dupA", "a red fox"),
               ("dupB", "A red fox ")]
            # unique captions ride through untouched
            + [("solo1", "sunset over water"), ("solo2", "a cat")]
        )
        df = spark.createDataFrame(rows, ["image_id", "caption"])
        out = caption_screen(df, spam_min_images=8)
        got = {r["image_id"]: r for r in out.collect()}
        assert not any(k.startswith("spam") for k in got)
        assert set(got) == {"dupA", "solo1", "solo2"}
        assert got["dupA"]["n_caption_images"] == 3
        assert got["dupA"]["caption_deduped"]
        assert got["solo1"]["n_caption_images"] == 1
        assert not got["solo1"]["caption_deduped"]
        # survivor keeps its ORIGINAL caption text, not the normal form
        assert got["dupA"]["caption"] == "a red fox"

    def test_threshold_boundary(self, spark):
        from cex_crawler_spark.operators.multimodal import caption_screen

        rows = [(f"i{i}", "seven wide") for i in range(7)] + [
            ("j", "other cap")
        ]
        out = caption_screen(
            spark.createDataFrame(rows, ["image_id", "caption"]),
            spam_min_images=8,
        )
        got = {r["image_id"]: r for r in out.collect()}
        # 7 < 8 → NOT spam: canonical survives
        assert "i0" in got and got["i0"]["n_caption_images"] == 7
        assert set(got) == {"i0", "j"}


class TestAugManifest:
    def test_deterministic_independent_and_bounded(self, spark):
        from cex_crawler_spark.operators.multimodal import (
            augmentation_manifest,
        )

        imgs = spark.range(200).select(
            F.format_string("im%04d", F.col("id")).alias("image_id")
        )
        a = augmentation_manifest(imgs, n_epochs=2).collect()
        b = augmentation_manifest(imgs, n_epochs=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        rows = {(r["image_id"], r["epoch"]): r.asDict() for r in a}
        assert len(rows) == 400
        for r in rows.values():
            assert r["flip"] in (0, 1)
            assert 0 <= r["rot90"] <= 3
            assert 800 <= r["crop_permille"] <= 999
            assert 900 <= r["brightness_permille"] <= 1099
        # epochs differ for (almost) every image — params are per-epoch
        diff = sum(
            1
            for i in range(200)
            if rows[(f"im{i:04d}", 0)]["crop_permille"]
            != rows[(f"im{i:04d}", 1)]["crop_permille"]
        )
        assert diff > 150
        # seed changes the whole manifest
        c = augmentation_manifest(imgs, n_epochs=2, seed=7).collect()
        assert sorted(map(tuple, a)) != sorted(map(tuple, c))
