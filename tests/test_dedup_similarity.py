"""Dedup + similarity operators: recall/precision against exact baselines."""

import pytest
from pyspark.sql import functions as F

from cex_crawler_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_candidates,
)
from cex_crawler_spark.operators.multimodal import (
    extract_image_features,
    resize_images,
    sample_video_frames,
)
from cex_crawler_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_cosine_topk,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


class TestDedup:
    def test_exact_dedup_keeps_min_id(self, spark, docs):
        d = docs.select("doc_id", "text")
        dup = d.withColumn("doc_id", F.col("doc_id") + 10_000)
        noisy = d.withColumn("text", F.concat(F.upper("text"), F.lit("  ")))
        tripled = d.unionByName(dup).unionByName(
            noisy.withColumn("doc_id", F.col("doc_id") + 20_000)
        )
        kept = exact_dedup(tripled, "text", "doc_id")
        ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
        # normalization is lowercase+whitespace-collapse → all three copies
        # collapse to the original 500 min ids
        assert ids == sorted(r["doc_id"] for r in d.select("doc_id").collect())

    def test_duplicate_span_stats_planted_boilerplate(self, spark):
        """Linear substring-dedup screen: a 5-token boilerplate line
        shared by two docs is counted as duplicated in both; unique
        spans are not; docs shorter than k drop out (oracle-consistent)."""
        from cex_crawler_spark.operators.dedup import duplicate_span_stats

        boiler = "all rights reserved by example corp"
        rows = [
            (0, f"alpha beta gamma delta epsilon {boiler}"),
            (1, f"one two three four five six {boiler}"),
            (2, "totally unrelated words in this document here"),
            (3, "too short"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: (r["n_spans"], r["n_dup_spans"])
            for r in duplicate_span_stats(df, "text", "doc_id", k=5).collect()
        }
        assert 3 not in out                       # < 5 tokens → no spans
        assert out[2][1] == 0                     # nothing shared
        # the 6-token boilerplate contributes 2 shared 5-grams per doc
        assert out[0][1] == 2 and out[1][1] == 2
        assert out[0][0] == 7 and out[1][0] == 8  # (tokens - k + 1) spans

    def test_scrub_duplicated_lines_keep_first(self, spark):
        """C4-style line scrub: a footer shared by 3 docs survives only
        at its canonical first occurrence; unique lines are untouched;
        a doc of pure boilerplate comes back EMPTY, not dropped; line
        order inside each doc is preserved."""
        from cex_crawler_spark.operators.dedup import scrub_duplicated_lines

        footer = "subscribe to our newsletter"
        rows = [
            (0, f"alpha one\n{footer}\nalpha two"),
            (1, f"{footer}\nbeta body text"),
            (2, f"gamma opening\ngamma closing\n{footer}"),
            (3, footer),  # would be pure boilerplate… but df rules
        ]
        # footer df = 4 > max_df=1 → scrubbed except first occurrence,
        # which is min(id,pos) = (0,1)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: (r["text"], r["n_lines"], r["n_kept"])
            for r in scrub_duplicated_lines(df, "text", "doc_id").collect()
        }
        assert out[0] == (f"alpha one\n{footer}\nalpha two", 3, 3)
        assert out[1] == ("beta body text", 2, 1)
        assert out[2] == ("gamma opening\ngamma closing", 3, 2)
        assert out[3] == ("", 1, 0)

    def test_scrub_duplicated_lines_drop_all_and_max_df(self, spark):
        """keep_first=False drops boilerplate everywhere; max_df=2
        tolerates a line shared by exactly two docs."""
        from cex_crawler_spark.operators.dedup import scrub_duplicated_lines

        rows = [
            (0, "shared pair line\nunique a"),
            (1, "shared pair line\nunique b"),
            (2, "triple line\nunique c"),
            (3, "triple line\nunique d"),
            (4, "triple line\nunique e"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["id"]: r["text"]
            for r in scrub_duplicated_lines(
                df, "text", "doc_id", max_df=2, keep_first=False
            ).collect()
        }
        # df=2 pair survives in both; df=3 triple dropped everywhere
        assert out[0] == "shared pair line\nunique a"
        assert out[1] == "shared pair line\nunique b"
        assert out[2] == "unique c" and out[3] == "unique d" and out[4] == "unique e"

    def test_ngram_max_df_drop_semantics(self, spark):
        """Pin what the max_df stop-shingle guard DOES to Jaccard
        (VERDICT r3 item 6): a shingle above the document-frequency cap
        is removed from EVERY doc's set before the join, so Jaccard is
        computed over the surviving shingles only — pairs can appear OR
        disappear relative to the uncapped semantics, and the docstring's
        "changes semantics" warning is now an asserted contract.

        k=1 word shingles; 'stop' appears in 3 docs (df=3 > max_df=2):
        - (0,1) share it → dropping it LOWERS Jaccard 2/4 → 1/3 (pair lost);
        - only doc2 of (2,3) has it → dropping it RAISES Jaccard
          1/4 → 1/2 (pair gained).
        """
        rows = [
            (0, "stop a b"),
            (1, "stop a c"),
            (2, "stop x"),
            (3, "x y"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        def pairs(max_df):
            return {
                (r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs(
                    df, "text", "doc_id", k=1, threshold=0.5, max_df=max_df
                ).collect()
            }

        uncapped = pairs(None)
        assert uncapped == {(0, 1): 0.5}
        capped = pairs(2)
        assert capped == {(2, 3): 0.5}

    def test_winnow_shared_substring_guarantee(self, spark):
        """Winnowing's core property (Schleimer et al. §2): ANY shared
        substring of length ≥ w + k − 1 produces at least one shared
        fingerprint; disjoint texts share none (md5 collisions aside)."""
        from cex_crawler_spark.operators.dedup import winnow_fingerprints

        shared = "the quick brown fox jumps over the lazy dog"
        rows = [
            (0, f"prefix alpha {shared} suffix beta"),
            (1, f"other words entirely {shared} more tail content"),
            (2, "completely disjoint text with no overlap at all zzz"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps: dict[int, set] = {0: set(), 1: set(), 2: set()}
        for r in winnow_fingerprints(df, "text", "doc_id", k=8, w=4).collect():
            fps[r["id"]].add(r["fp"])
        assert fps[0] & fps[1]          # shared substring → shared fp
        assert not (fps[0] & fps[2])
        assert not (fps[1] & fps[2])
        # density: the sketch is much smaller than the full k-gram set
        n_pos = len(rows[0][1]) - 8 + 1
        assert len(fps[0]) < n_pos / 2

    def test_winnow_near_dup_pairs_planted(self, spark):
        """VERDICT r4 item 6: the cross-doc composition must surface a
        planted near-dup (high containment) and not pair disjoint docs;
        a boilerplate-only overlap stays below the containment gate."""
        from cex_crawler_spark.operators.dedup import winnow_near_dup_pairs

        body = (
            "the quick brown fox jumps over the lazy dog while the "
            "seven wild geese fly south for the winter every year"
        )
        boiler = "all rights reserved contact us at example dot com"
        rows = [
            (0, f"{body} extra tail words here {boiler}"),
            (1, f"{body} different ending entirely {boiler}"),   # near-dup of 0
            (2, f"completely unrelated content about spark shuffle "
                f"partitions and adaptive execution plans {boiler}"),
            (3, "tiny"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in winnow_near_dup_pairs(
                df, "text", "doc_id", min_shared=2, min_containment=0.5
            ).collect()
        }
        assert (0, 1) in got and got[(0, 1)] >= 0.5
        assert all(p == (0, 1) for p in got)  # boilerplate pairs gated out

    def test_minhash_recall_vs_exact(self, spark, docs):
        exact = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(
                docs, "text", "doc_id", k=3, threshold=0.5, max_df=None
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "text", "doc_id", num_hashes=64, bands=32,
                shingle_k=3, threshold=0.5,
            ).collect()
        }
        assert lsh <= exact          # precision 1.0 (verified jaccard)
        assert len(exact) > 0
        assert len(lsh) / len(exact) >= 0.9  # recall at observed pair mix

    def test_simhash_near_dup_signal(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (0, base),
            (1, base + " extra"),          # near-dup of 0
            (2, "completely different words about spark shuffles and joins"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_dedup_candidates(df, "text", "doc_id").collect()
        }
        assert pairs.get((0, 1), 99) <= 10

    def test_image_phash_near_dups_planted(self, spark):
        """The generalized multi-block Hamming bucketing over image
        perceptual hashes: a zero-mean pixel jitter (re-encode noise)
        keeps every original/edited pair within the 4-block pigeonhole
        radius, and the candidate join recovers 100% of them."""
        from cex_crawler_spark.operators.dedup import (
            hamming_near_dup_candidates,
        )
        from cex_crawler_spark.operators.multimodal import (
            extract_image_features,
            jitter_images,
        )
        from cex_crawler_spark.synth import gen_payloads

        base = gen_payloads(spark, 40)
        variants = jitter_images(base).withColumn(
            "image_id", F.concat(F.col("image_id"), F.lit("_j"))
        )
        feats = extract_image_features(
            base.select("image_id", "bytes", "fmt").unionByName(
                variants.select("image_id", "bytes", "fmt")
            )
        ).filter(F.col("decode_ok"))
        pairs = {
            (r["id_a"], r["id_b"])
            for r in hamming_near_dup_candidates(feats, "phash", "image_id")
            .filter(F.col("hamming") <= 3)
            .collect()
        }
        planted = {
            p for p in pairs
            if p[0] + "_j" == p[1] or p[1] + "_j" == p[0]
        }
        assert len(planted) == 40

    def test_simhash_twin_parity(self, spark, docs):
        """JVM-side token hashing (xxhash64 seed 42) must reproduce the
        pure-Python twin bit-for-bit — the guarantee that moving the
        per-token hash out of Python (VERDICT r3 item 1) changed the
        execution plan, not the fingerprint."""
        from cex_crawler_spark.operators.dedup import py_simhash64, simhash64

        rows = docs.select(
            "doc_id", "text", simhash64(F.col("text")).alias("sh")
        ).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["sh"] == py_simhash64(r["text"]), r["doc_id"]
        edge = spark.createDataFrame(
            [(0, None), (1, ""), (2, "   "), (3, "ONE one OnE")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["sh"]
            for r in edge.select(
                "doc_id", simhash64(F.col("text")).alias("sh")
            ).collect()
        }
        assert got[0] == 0 and got[1] == 0 and got[2] == 0
        assert got[3] == py_simhash64("one one one")
        # Unicode whitespace (ADVICE r4): Java's bare \s is ASCII-only,
        # Python str.split() is not — the (?U) split must keep the twins
        # bit-identical on NBSP / line-sep / ideographic-space corpora
        uni = spark.createDataFrame(
            [
                (0, "alpha\u00a0beta\u00a0gamma"),      # NBSP
                (1, "alpha\u2028beta\u2029gamma"),      # line/para sep
                (2, "alpha\u3000beta\u2009gamma"),      # ideographic+thin
                (3, "\u00a0 lead and trail \u00a0"),
            ],
            "doc_id long, text string",
        )
        for r in uni.select(
            "text", simhash64(F.col("text")).alias("sh")
        ).collect():
            assert r["sh"] == py_simhash64(r["text"]), repr(r["text"])

    def test_simhash_multiblock_guarantee(self, spark, docs):
        """Pigeonhole property: EVERY pair at Hamming ≤ n_blocks−1 = 3 is
        a candidate (the r1 single-prefix block missed top-bit diffs)."""
        from cex_crawler_spark.operators.dedup import simhash64

        hashes = {
            r["doc_id"]: r["sh"]
            for r in docs.select(
                "doc_id", simhash64(F.col("text")).alias("sh")
            ).collect()
        }
        cand = {
            (r["id_a"], r["id_b"])
            for r in simhash_dedup_candidates(docs, "text", "doc_id").collect()
        }
        ids = sorted(hashes)
        close = {
            (a, b)
            for i, a in enumerate(ids)
            for b in ids[i + 1:]
            if bin((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).count("1") <= 3
        }
        assert close <= cand


class TestSimilarity:
    def test_lsh_topk_recall_vs_exact(self, spark, emb):
        """Multi-table + multiprobe SRP: every query fills to k and recall
        vs brute force is ≥ 0.9 (VERDICT r1 gate — the single-table
        variant returned 11/40 rows)."""
        q = emb.filter(F.col("vec_id") < 8)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        lsh = {
            (r["query_id"], r["neighbor_id"])
            for r in lsh_cosine_topk(emb, q, k=5, dim=64).collect()
        }
        assert len(exact) == 40
        assert len(lsh) == 40  # every query yields a full top-k
        assert len(lsh & exact) / len(exact) >= 0.9

    def test_lsh_topk_scores_are_exact(self, spark, emb):
        """The re-rank recomputes true cosines — LSH only prunes."""
        from cex_crawler_spark.operators.similarity import cosine

        q = emb.filter(F.col("vec_id") < 4)
        lsh = lsh_cosine_topk(emb, q, k=10, dim=64).toPandas()
        pairs = spark.createDataFrame(lsh[["query_id", "neighbor_id", "cos"]])
        v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        joined = (
            pairs.join(v.withColumnRenamed("vec_id", "query_id").withColumnRenamed("v", "qv"), "query_id")
            .join(v.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("v", "cv"), "neighbor_id")
            .withColumn("exact_cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
        )
        assert joined.filter(F.col("cos") != F.col("exact_cos")).count() == 0

    def test_ivf_empty_corpus_raises_clearly(self):
        """ADVICE r3: an empty embeddings table must fail with a clear
        message at the training step, not crash later in the k-means
        argmax over a zero-column matrix."""
        import numpy as np

        from cex_crawler_spark.operators.similarity import _kmeans_centroids

        with pytest.raises(ValueError, match="empty"):
            _kmeans_centroids(np.zeros((0, 8)), n_centroids=4)

    def test_ivf_topk_recall_vs_exact(self, spark, emb):
        """IVF cells + 12/16 probes: full top-k per query, recall ≥ 0.9.
        (Near-uniform random embeddings are the adversarial case for any
        partition-based ANN — true neighbors of a random vector have low
        cosine and scatter across cells, so the probe count here is far
        above what clustered real embeddings need.)"""
        from cex_crawler_spark.operators.similarity import ivf_cosine_topk

        q = emb.filter(F.col("vec_id") < 8)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        ivf = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_cosine_topk(
                emb, q, k=5, n_centroids=16, n_probe=12
            ).collect()
        }
        assert len(ivf) == 40
        assert len(ivf & exact) / len(exact) >= 0.9

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_ivf_oracle_probe_covers_exact_topk(self, spark, sf):
        """The oracle precondition, at BOTH SFs (the r2 LSH lesson:
        recall is SF-dependent — the local parity twin runs sf0.001, the
        driver runs sf0.01): at the query's n_probe=15 the IVF result
        EQUALS the exact top-k, ranks included."""
        from cex_crawler_spark.operators.similarity import ivf_cosine_topk

        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 8)
        exact = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in cosine_topk(emb, q, k=5).collect()
        )
        ivf = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ivf_cosine_topk(
                emb, q, k=5, n_centroids=16, n_probe=15
            ).collect()
        )
        assert ivf == exact

    def test_ivf_pq_topk_recall_vs_exact(self, spark, emb):
        """IVF-PQ at economical settings (12/16 probes, refine=64): the
        20-byte-code ADC shortlist + exact re-rank keeps recall ≥ 0.9
        vs brute force on the adversarial near-uniform embeddings."""
        from cex_crawler_spark.operators.similarity import ivf_pq_cosine_topk

        q = emb.filter(F.col("vec_id") < 8)
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in cosine_topk(emb, q, k=5).collect()
        }
        pq = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_pq_cosine_topk(
                emb, q, k=5, n_centroids=16, n_probe=12,
                m_subspaces=16, n_codes=16, refine=64,
            ).collect()
        }
        assert len(pq) == 40
        assert len(pq & exact) / len(exact) >= 0.9

    @pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
    def test_ivf_pq_oracle_setting_covers_exact_topk(self, spark, sf):
        """The ann_ivf_pq_topk oracle precondition at BOTH SFs: at full
        probes + refine=192 the PQ shortlist contains the true top-5, so
        the exact re-rank EQUALS brute force, ranks included."""
        from cex_crawler_spark.operators.similarity import ivf_pq_cosine_topk

        emb = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 8)
        exact = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in cosine_topk(emb, q, k=5).collect()
        )
        pq = sorted(
            (r["query_id"], r["neighbor_id"], r["rank"])
            for r in ivf_pq_cosine_topk(
                emb, q, k=5, n_centroids=16, n_probe=16,
                m_subspaces=16, n_codes=16, refine=192,
            ).collect()
        )
        assert pq == exact

    def test_near_dup_lsh_precision(self, spark, emb):
        """LSH candidates are exact-verified → always a subset of exact.
        (No recall bound asserted at threshold 0.4: a 66°-apart 'pair'
        is not angularly near, which is exactly the regime SRP prunes —
        the recall gate lives on true near-dups below.)"""
        exact = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(emb, threshold=0.4).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, use_lsh=True
            ).collect()
        }
        assert lsh <= exact  # precision 1.0 (exact cosine verify)
        assert len(exact) > 0

    def test_near_dup_lsh_recall_on_planted_dups(self, spark, emb):
        """Plant a tiny-perturbation copy of every vector (cos ≈ 0.9999)
        — the LSH path must recover ≥ 95% of the planted pairs."""
        n = emb.count()
        dup = emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform(
                "embedding", lambda x, i: x * 1.001 + 0.003 * ((i % 5) - 2)
            ).alias("embedding"),
        )
        both = emb.select("vec_id", "embedding").unionByName(dup)
        found = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                both, threshold=0.99, use_lsh=True
            ).collect()
        }
        planted = {(i, i + 100000) for i in range(n)}
        hit = len(found & planted)
        assert hit / n >= 0.95

    def test_near_dup_size_gate_switches_to_lsh(self, spark, emb):
        """use_lsh=None + a tiny max_exact_rows must auto-pick the LSH
        plan (no driver-side matrix): result equals the explicit LSH run."""
        gated = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, max_exact_rows=10
            ).collect()
        }
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, use_lsh=True
            ).collect()
        }
        assert gated == lsh

    def test_near_dup_row_hint_decides_gate_without_count_job(self, spark, emb):
        """approx_rows picks the path WITHOUT a count job (at 100 TB a
        .count() is a full scan spent on a branch decision).  With a
        large hint the LSH plan is chosen and building it launches ZERO
        Spark jobs; the result matches the explicit-LSH run."""
        tracker = spark.sparkContext.statusTracker()
        spark.sparkContext.setJobGroup("hint-gate", "gate decision", False)
        try:
            hinted = embedding_near_dup_pairs(
                emb, threshold=0.4, approx_rows=10**9
            )
            jobs = tracker.getJobIdsForGroup("hint-gate")
        finally:
            spark.sparkContext.setJobGroup("", "", False)
        assert jobs == [], f"gate decision launched jobs: {jobs}"
        lsh = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                emb, threshold=0.4, use_lsh=True
            ).collect()
        }
        assert {(r["id_a"], r["id_b"]) for r in hinted.collect()} == lsh


class TestConnectedComponents:
    """Pairs → clusters: transitive collapse, singleton handling, and
    convergence on a chain (the worst case for label propagation)."""

    def test_transitive_chain_collapses(self, spark):
        from cex_crawler_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
            "id_a long, id_b long",
        )
        comp = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        assert comp == {
            1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
        }

    def test_long_path_converges(self, spark):
        """A pure path is label propagation's worst case (the min label
        advances ONE hop per iteration), so a path whose diameter is
        just under the default max_iters proves both convergence and
        the early-exit bound."""
        from cex_crawler_spark.operators.dedup import connected_components

        n = 24  # diameter must fit the default max_iters
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a long, id_b long"
        )
        comp = connected_components(pairs)
        assert comp.filter(F.col("component") != 0).count() == 0
        assert comp.count() == n + 1

    def test_adversarial_chain_graph_10k(self, spark):
        """VERDICT r3 item 3: a 10⁴-node path graph (diameter 9999) must
        converge within the default 25 iterations — path halving makes
        iterations O(log diameter); plain one-hop propagation would need
        ~10⁴ sequential driver actions here."""
        from cex_crawler_spark.operators.dedup import connected_components

        n = 10_000
        pairs = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        # driver_max=0 pins the DISTRIBUTED path — the convergence bound
        # under test; the r6 small-graph union-find would otherwise take
        # over below its 200k-edge threshold
        comp = connected_components(pairs, driver_max=0)
        assert comp.count() == n
        assert comp.filter(F.col("component") != 0).count() == 0

    def test_driver_unionfind_matches_distributed(self, spark):
        """r6 small-graph fast path: the driver-side union-find must
        emit exactly the distributed min-label propagation's labels."""
        from cex_crawler_spark.operators.dedup import connected_components

        rows = [(i * 37 % 101, (i * 37 % 101) + (i % 7) + 1) for i in range(300)]
        pairs = spark.createDataFrame(rows, "id_a long, id_b long")
        fast = {
            (r["id"], r["component"])
            for r in connected_components(pairs, driver_max=10**6).collect()
        }
        dist = {
            (r["id"], r["component"])
            for r in connected_components(pairs, driver_max=0).collect()
        }
        assert fast == dist

    def test_nonconvergence_raises_not_silent(self, spark):
        """ADVICE r3: exhausting max_iters must raise, never hand back
        silently split components (distributed path; the driver path
        has no iteration budget to exhaust)."""
        from cex_crawler_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(pairs, max_iters=2, driver_max=0)

    def test_representatives_keep_min_and_singletons(self, spark):
        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
        )

        docs = spark.range(6).select(F.col("id").alias("doc_id"))
        pairs = spark.createDataFrame(
            [(0, 3), (3, 5)], "id_a long, id_b long"
        )
        out = dedup_cluster_representatives(docs, pairs, "doc_id").collect()
        by_id = {r["doc_id"]: (r["component"], r["is_representative"]) for r in out}
        assert by_id == {
            0: (0, True), 1: (1, True), 2: (2, True),
            3: (0, False), 4: (4, True), 5: (0, False),
        }


class TestLeakageSafeSplits:
    def test_split_keys_on_cluster_not_doc(self, spark):
        """Planted near-dup clusters must land whole in one split;
        hashing raw doc ids (the naive split) demonstrably scatters
        members of the SAME cluster across train/val/test — the
        eval-leakage failure corpus_split_assign exists to prevent."""
        from pyspark.sql import functions as F

        from cex_crawler_spark.operators.dedup import (
            dedup_cluster_representatives,
            minhash_lsh_pairs,
        )

        rows = [
            (
                i,
                " ".join(f"w{i // 3}x{j}" for j in range(30))
                + f" m{i % 3} tail{i % 3}",
            )
            for i in range(12)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=32,
            shingle_k=3, threshold=0.5,
        )
        labeled = dedup_cluster_representatives(docs, pairs, "doc_id")

        def bucket(col):
            return (
                F.conv(
                    F.substring(F.md5(col.cast("string")), 1, 2), 16, 10
                ).cast("int")
                % 10
            )

        got = labeled.select(
            "doc_id",
            "component",
            bucket(F.col("component")).alias("by_cluster"),
            bucket(F.col("doc_id")).alias("by_doc"),
        ).collect()
        comps = {}
        for r in got:
            comps.setdefault(r["component"], []).append(r)
        # the planted clusters actually formed
        assert sorted(comps) == [0, 3, 6, 9]
        assert all(len(v) == 3 for v in comps.values())
        leaks = 0
        for members in comps.values():
            # cluster-keyed: one bucket per cluster, by construction
            assert len({m["by_cluster"] for m in members}) == 1
            # doc-keyed counterfactual: members scatter
            leaks += len({m["by_doc"] for m in members}) > 1
        assert leaks >= 3  # ids 0..11: every cluster but one scatters


class TestBucketCaps:
    """Degenerate-key guard: 10⁴ identical docs make ONE bucket; without
    a cap the self-join emits ~5·10⁷ pairs (quadratic).  With the cap the
    run is bounded in time and output, and the cluster keeps exactly
    C(cap, 2) representative pairs."""

    def _identical_docs(self, spark, n=10_000):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the same boilerplate page text repeated verbatim").alias(
                "text"
            ),
        )

    def test_minhash_cap_bounds_identical_corpus(self, spark):
        docs = self._identical_docs(spark)
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16,
            threshold=0.5, bucket_cap=32,
        )
        n = pairs.count()
        # every surviving pair is within the 32 kept representatives
        assert n == 32 * 31 // 2
        assert pairs.filter(F.col("id_a") >= 32).count() == 0

    def test_simhash_cap_bounds_identical_corpus(self, spark):
        docs = self._identical_docs(spark)
        cand = simhash_dedup_candidates(docs, "text", "doc_id", bucket_cap=32)
        assert cand.count() == 32 * 31 // 2

    def test_embedding_lsh_cap_bounds_identical_corpus(self, spark):
        one = [0.1] * 64
        vecs = spark.range(5_000).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(x) for x in one]).alias("embedding"),
        )
        pairs = embedding_near_dup_pairs(
            vecs, threshold=0.99, use_lsh=True, bucket_cap=32
        )
        assert pairs.count() == 32 * 31 // 2

    def test_default_cap_is_above_small_corpora(self, spark, docs):
        """The default cap must not change results on realistic corpora
        (the oracle corpus is far below 100k rows/bucket)."""
        capped = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "text", "doc_id", num_hashes=64, bands=32, threshold=0.5
            ).collect()
        }
        uncapped = {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "text", "doc_id", num_hashes=64, bands=32,
                threshold=0.5, bucket_cap=None,
            ).collect()
        }
        assert capped == uncapped


class TestMultimodal:
    def test_image_features(self, spark):
        from cex_crawler_spark.synth import gen_payloads

        p = gen_payloads(spark, 30)
        feats = extract_image_features(p).toPandas()
        assert len(feats) == 30
        assert feats["decode_ok"].all()
        assert ((feats["mean_r"] > 64) & (feats["mean_r"] < 192)).all()
        # phash recomputed from decode matches the stored payload phash
        stored = {r["image_id"]: r["phash"] for r in p.select("image_id", "phash").collect()}
        png = feats[feats["fmt"] == "png"]
        assert all(stored[r.image_id] == r.phash for r in png.itertuples())

    def test_resize(self, spark):
        from cex_crawler_spark.synth import gen_payloads

        p = gen_payloads(spark, 5)
        out = resize_images(p, 8, 8).toPandas()
        assert (out["w"] == 8).all() and (out["h"] == 8).all()
        from cex_crawler_spark.functions.imaging import png_decode

        for b in out["bytes"]:
            assert png_decode(bytes(b)).shape == (8, 8, 3)

    def test_video_frame_sampling(self, spark):
        """Every-Nth-frame sampling round-trips pixels exactly and emits
        PNG frames the image operators can consume directly."""
        import numpy as np

        from cex_crawler_spark.functions.imaging import (
            png_decode,
            rawv_encode,
            reference_pixels,
        )

        frames = {
            vid: [reference_pixels(f"{vid}:{i}", 16, 12) for i in range(75)]
            for vid in ("v1", "v2", "v3")
        }
        v = spark.createDataFrame(
            [(vid, bytearray(rawv_encode(fs))) for vid, fs in frames.items()],
            "video_id string, bytes binary",
        )
        out = sample_video_frames(v, every_n=30).toPandas()
        assert sorted(
            (r.video_id, r.frame_no) for r in out.itertuples()
        ) == [(vid, f) for vid in ("v1", "v2", "v3") for f in (0, 30, 60)]
        assert (out["n_frames"] == 75).all()
        assert (out["w"] == 16).all() and (out["h"] == 12).all()
        for r in out.itertuples():
            assert np.array_equal(
                png_decode(bytes(r.frame_png)), frames[r.video_id][r.frame_no]
            )

    def test_video_sampling_seeks_not_scans(self, spark):
        """The rawv index makes sampling random-access: corrupting every
        NON-sampled frame's bytes must not affect the output — proof the
        operator never decodes frames it drops (the property a real
        ffmpeg keyframe-seek path shares)."""
        import struct

        import numpy as np

        from cex_crawler_spark.functions.imaging import (
            png_decode,
            rawv_encode,
            reference_pixels,
        )

        frames = [reference_pixels(f"s:{i}", 8, 8) for i in range(10)]
        data = rawv_encode(frames)
        corrupted = bytearray(data)
        for i in range(10):
            if i % 5 == 0:
                continue  # keep the sampled frames (0, 5)
            off, size = struct.unpack(">II", data[12 + 8 * i : 20 + 8 * i])
            corrupted[off : off + size] = b"\x00" * size
        v = spark.createDataFrame(
            [("v1", bytes(corrupted))], "video_id string, bytes binary"
        )
        out = sample_video_frames(v, every_n=5).toPandas()
        assert sorted(out["frame_no"]) == [0, 5]
        for r in out.itertuples():
            assert np.array_equal(
                png_decode(bytes(r.frame_png)), frames[r.frame_no]
            )

    def test_audio_features(self, spark):
        """Known PCM signals give the analytically expected features."""
        import numpy as np

        from cex_crawler_spark.functions.imaging import rawa_encode
        from cex_crawler_spark.operators.multimodal import audio_features

        sr = 8000
        t = np.arange(2 * sr) / sr
        sine = 0.5 * np.sin(2 * np.pi * 100 * t)  # 2 s, 100 Hz, amp 0.5
        silence = np.zeros(sr // 2)
        a = spark.createDataFrame(
            [
                ("sine", bytearray(rawa_encode(sine, sr))),
                ("silence", bytearray(rawa_encode(silence, sr))),
            ],
            "audio_id string, bytes binary",
        )
        out = {r.audio_id: r for r in audio_features(a).collect()}
        s = out["sine"]
        assert s.sample_rate == sr and abs(s.duration_s - 2.0) < 1e-9
        assert abs(s.rms - 0.5 / np.sqrt(2)) < 1e-3   # sine RMS = A/√2
        assert abs(s.peak - 0.5) < 1e-3
        # 100 Hz crosses zero 200×/s → rate ≈ 200/8000
        assert abs(s.zero_cross_rate - 200 / sr) < 1e-3
        z = out["silence"]
        assert z.rms == 0.0 and z.peak == 0.0 and abs(z.duration_s - 0.5) < 1e-9


class TestDecontamination:
    def test_planted_leak_detected_boundary_exact(self, spark):
        """A verbatim 8-gram flags the doc; 7 shared consecutive tokens
        do NOT (the k boundary is exact); unrelated docs stay clean."""
        from cex_crawler_spark.operators.dedup import decontamination_matches

        bench = "the quick brown fox jumps over the lazy dog tonight"
        toks = bench.split()
        ev = spark.createDataFrame([(0, bench)], "doc_id long, text string")
        tr = spark.createDataFrame(
            [
                (1, "intro words " + " ".join(toks[:8]) + " trailing text"),
                (2, "intro words " + " ".join(toks[:7]) + " trailing text"),
                (3, "completely different content with no overlap at all"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in decontamination_matches(tr, ev).collect()}
        assert set(out) == {1}
        assert out[1]["n_shared_grams"] == 1 and out[1]["n_eval_docs"] == 1

    def test_hamming_decontamination_radius_exact(self, spark):
        """Image decontamination: corpus phashes within Hamming ≤ 3 of
        any eval phash flag (exact dup, 1-bit and 3-bit re-encodes);
        a 4-bit variant and unrelated hashes stay clean; one corpus row
        near TWO eval rows counts both."""
        from cex_crawler_spark.operators.dedup import (
            hamming_decontamination_matches,
        )

        base = 0x1234_5678_9ABC_DEF0
        corpus = spark.createDataFrame(
            [
                (0, base),                     # exact dup of eval 0
                (1, base ^ 0b1),               # Hamming 1
                (2, base ^ 0b10101),           # Hamming 3
                (3, base ^ 0b1111),            # Hamming 4 → clean
                (4, 0x0F0F_0F0F_0F0F_0F0F),    # unrelated
                (5, (base ^ (1 << 40)) ^ 0b1), # H2 from eval0, H1 from eval1
            ],
            "image_id long, phash long",
        )
        ev = spark.createDataFrame(
            [(0, base), (1, base ^ (1 << 40))],
            "eval_id long, phash long",
        )
        out = {
            r["id"]: (r["n_eval_matches"], r["best_hamming"])
            for r in hamming_decontamination_matches(
                corpus, ev, "phash", "image_id", eval_id_col="eval_id"
            ).collect()
        }
        assert out == {
            0: (2, 0),  # exact vs eval0, H1 vs eval1
            1: (2, 1),  # H1 vs eval0, H2 vs eval1
            2: (1, 3),  # H3 vs eval0 only (H4 vs eval1)
            5: (2, 1),  # H2 vs eval0, H1 vs eval1
        }


class TestKmeansLattice:
    def _vecs(self, spark, n=240):
        # 3 well-separated integer clusters on 4 dims + small noise
        centers = [[0, 0, 0, 0], [1000, 0, 1000, 0], [0, 1000, 0, 1000]]
        rows = [
            (i, [centers[i % 3][d] + (i * 7 + d) % 5 for d in range(4)])
            for i in range(n)
        ]
        return rows, spark.createDataFrame(rows, "vec_id long, vec array<long>")

    def test_converges_to_planted_clusters(self, spark):
        from cex_crawler_spark.operators.similarity import kmeans_lattice

        rows, df = self._vecs(spark)
        # deliberately poor init: three points from ONE cluster's corner
        init = [rows[0][1], rows[3][1], rows[6][1]]
        assigned, cents = kmeans_lattice(df, init, iters=4)
        # recovered centroids sit within noise range of true centers
        recovered = sorted(tuple(c) for c in cents)
        for got, want in zip(
            recovered,
            sorted([(0, 0, 0, 0), (1000, 0, 1000, 0), (0, 1000, 0, 1000)]),
        ):
            assert all(abs(g - w) <= 4 for g, w in zip(got, want)), (got, want)
        # assignment is exactly the planted partition
        got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
        by_cluster = {}
        for vid, cell in got.items():
            by_cluster.setdefault(vid % 3, set()).add(cell)
        assert all(len(cells) == 1 for cells in by_cluster.values())
        assert len(set().union(*by_cluster.values())) == 3

    def test_matches_numpy_twin_exactly(self, spark):
        """Integer lattice ⇒ the recurrence is exact: engine == numpy
        replay bit-for-bit (assignments AND centroids)."""
        import numpy as np

        from cex_crawler_spark.operators.similarity import kmeans_lattice

        rows, df = self._vecs(spark, n=90)
        init = [rows[0][1], rows[1][1], rows[2][1]]
        assigned, cents = kmeans_lattice(df, init, iters=3)

        X = np.array([v for _, v in rows], dtype=np.int64)
        C = np.array(init, dtype=np.int64)
        for _ in range(3):
            d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # argmin ties → lowest index, same rule
            for j in range(3):
                m = X[a == j]
                if len(m):
                    # round half-up like Spark/DuckDB round()
                    C[j] = np.floor(m.mean(axis=0) + 0.5).astype(np.int64)
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        assert [list(c) for c in C] == [list(map(int, c)) for c in cents]
        got = {r["vec_id"]: r["cell"] for r in assigned.collect()}
        assert got == {i: int(a[i]) for i in range(90)}

    def test_empty_cell_keeps_centroid(self, spark):
        from cex_crawler_spark.operators.similarity import kmeans_lattice

        df = spark.createDataFrame(
            [(0, [0, 0]), (1, [2, 2])], "vec_id long, vec array<long>"
        )
        # third centroid is unreachable → must survive verbatim
        far = [10**6, 10**6]
        _, cents = kmeans_lattice(df, [[0, 0], [2, 2], far], iters=2)
        assert cents[2] == far


class TestIncrementalComponents:
    def test_merge_untouched_and_new_nodes(self, spark):
        """Day-2 pairs merge two standing clusters (smaller min wins),
        untouched clusters keep their labels, brand-new nodes cluster
        fresh — and the result equals CC from scratch over all pairs."""
        from cex_crawler_spark.operators.dedup import (
            connected_components,
            incremental_components,
        )

        b1 = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
        )
        b2 = spark.createDataFrame(
            [(3, 10), (100, 101)], "id_a long, id_b long"
        )
        inc = {
            r["id"]: r["component"]
            for r in incremental_components(
                connected_components(b1), b2
            ).collect()
        }
        full = {
            r["id"]: r["component"]
            for r in connected_components(b1.unionByName(b2)).collect()
        }
        assert inc == full
        # merged cluster took the global min
        assert inc[11] == 1 and inc[3] == 1
        # untouched cluster kept its day-1 label
        assert inc[21] == 20
        # new nodes clustered fresh
        assert inc[101] == 100


# ----------------------------------------- host-scoped template scrub

class TestHostTemplates:
    def _fixture(self, spark):
        docs = [
            (1, "A", "chrome line\nunique one"),
            (2, "A", "chrome line\nunique two"),
            (3, "A", "chrome line\nunique three"),
            # same string on ONE doc of host B — content there, not chrome
            (4, "B", "chrome line\nother text"),
            (5, "B", "bbb\nccc"),
            (6, "B", "bbb\nddd"),
        ]
        return spark.createDataFrame(docs, ["id", "host", "text"])

    def test_detection_is_host_scoped(self, spark):
        from cex_crawler_spark.operators.dedup import host_template_lines

        t = host_template_lines(
            self._fixture(spark), "text", "id", "host",
            min_docs=3, min_share_permille=500,
        )
        got = {(r["host"], r["line"]) for r in t.collect()}
        # A's chrome (3/3 docs) detected; B's single copy is NOT; B's
        # bbb (2/3 = 666 permille) fails min_docs=3
        assert got == {("A", "chrome line")}

    def test_min_docs_vs_share_thresholds(self, spark):
        from cex_crawler_spark.operators.dedup import host_template_lines

        t = host_template_lines(
            self._fixture(spark), "text", "id", "host",
            min_docs=2, min_share_permille=500,
        )
        got = {(r["host"], r["line"]) for r in t.collect()}
        assert got == {("A", "chrome line"), ("B", "bbb")}
        # share bar above 2/3 kills bbb again
        t2 = host_template_lines(
            self._fixture(spark), "text", "id", "host",
            min_docs=2, min_share_permille=700,
        )
        assert {(r["host"], r["line"]) for r in t2.collect()} == {
            ("A", "chrome line")
        }

    def test_scrub_removes_own_host_chrome_only(self, spark):
        from cex_crawler_spark.operators.dedup import (
            host_template_lines, scrub_host_templates,
        )

        df = self._fixture(spark)
        t = host_template_lines(df, "text", "id", "host",
                                min_docs=3, min_share_permille=500)
        out = {r["id"]: r for r in
               scrub_host_templates(df, t, "text", "id", "host").collect()}
        assert out[1]["text"] == "unique one"
        assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
        assert out[1]["n_template"] == 1
        # host B keeps its single 'chrome line' — the host scope
        assert out[4]["text"] == "chrome line\nother text"
        assert out[4]["n_template"] == 0


def test_hamming_search_topk_ranks_planted_neighbors(spark):
    from cex_crawler_spark.operators.similarity import hamming_search_topk

    q = 0x0F0F0F0F0F0F0F0F
    rows = [(0, q)] + [(i, q ^ (1 << i)) for i in range(1, 5)] + [
        (99, ~q & 0x7FFFFFFFFFFFFFFF)
    ]
    df = spark.createDataFrame(rows, ["id", "h"])
    got = hamming_search_topk(df, q, k=5).collect()
    assert [r["id"] for r in got] == [0, 1, 2, 3, 4]
    assert [r["hamming"] for r in got] == [0, 1, 1, 1, 1]
