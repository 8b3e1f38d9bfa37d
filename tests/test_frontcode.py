"""Front-coded URL-key storage (operators/frontcode.py)."""

from pyspark.sql import functions as F

from cex_crawler_spark.operators.frontcode import (
    decode_frontcoded,
    frontcode_stats,
    frontcode_urls,
    lcp_length,
)
from cex_crawler_spark.sources.warc import surt_urlkey


def test_lcp_length_cases(spark):
    cases = [
        ("abc", "abd", 2),
        ("abc", "abc", 3),
        ("ab", "abc", 2),   # one string a strict prefix of the other
        ("abc", "ab", 2),
        ("xyz", "abc", 0),
        ("a", "", 0),
        ("", "", 0),
    ]
    df = spark.createDataFrame(
        [(a, b, e) for a, b, e in cases], "a string, b string, expect int"
    )
    got = df.select(
        "a", "b", "expect", lcp_length(F.col("a"), F.col("b")).alias("lcp")
    ).collect()
    for r in got:
        assert r["lcp"] == r["expect"], (r["a"], r["b"], r["lcp"])


def _frontier(spark):
    import __spark_entry__ as e

    return e.gen_sim_trap_frontier(spark)


def test_roundtrip_exact(spark):
    """decode(code(keys)) reproduces the distinct SURT key set exactly —
    byte-for-byte, including the header rows (lcp = len(header),
    suffix = '')."""
    f = _frontier(spark)
    coded, headers = frontcode_urls(f, block_prefix_len=12)
    decoded = sorted(
        r["urlkey"] for r in decode_frontcoded(coded, headers).collect()
    )
    original = sorted(
        r["k"]
        for r in f.select(surt_urlkey(F.col("url")).alias("k"))
        .distinct()
        .collect()
    )
    assert decoded == original
    # every block's header codes as the empty-suffix row
    hdr_rows = coded.filter(F.col("suffix") == "").count()
    assert hdr_rows >= headers.count()


def test_compression_and_identity(spark):
    """Coded bytes beat raw on prefix-heavy SURT keys, and the exact
    identity raw == sum(lcp + len(suffix)) holds per block."""
    coded, headers = frontcode_urls(_frontier(spark), block_prefix_len=12)
    stats = frontcode_stats(coded, headers).collect()
    assert stats
    for r in stats:
        assert r["coded_bytes"] < r["raw_bytes"], r
    total_raw = sum(r["raw_bytes"] for r in stats)
    total_coded = sum(r["coded_bytes"] for r in stats)
    # the trap frontier's templated paths share long prefixes
    assert total_coded < 0.7 * total_raw


def test_adversarial_block_contents(spark):
    """A key can be SHORTER than its block header (it still codes and
    decodes), and keys that are strict prefixes of each other coexist."""
    urls = [
        "https://a.com/a/long/common/path/x",
        "https://a.com/a/long/common/path/xy",
        "https://a.com/b",
        "https://a.com/a",
        "https://a.com/a/long",
    ]
    f = spark.createDataFrame([(u,) for u in urls], "url string")
    coded, headers = frontcode_urls(f, block_prefix_len=6)
    decoded = sorted(
        r["urlkey"] for r in decode_frontcoded(coded, headers).collect()
    )
    expect = sorted(
        r["k"]
        for r in f.select(surt_urlkey(F.col("url")).alias("k")).distinct().collect()
    )
    assert decoded == expect


class TestCurriculumOrder:
    def test_matches_naive_global_window_and_phase_sizes(self, spark):
        """Chunked curriculum rank == the single-task global window;
        phases are difficulty-monotone and equal-sized ±1."""
        from pyspark.sql.window import Window

        from cex_crawler_spark.operators.packing import curriculum_order

        df = spark.range(700).select(
            F.format_string("s%04d", F.col("id")).alias("sid"),
            (F.col("id") % 9).alias("difficulty"),
        )
        got = curriculum_order(df, "sid", "difficulty", n_phases=4)
        key = F.md5(F.concat(F.lit("42:"), F.col("sid")))
        naive = df.withColumn(
            "r",
            F.row_number().over(Window.orderBy("difficulty", key, "sid")) - 1,
        )
        assert sorted(
            (r["sid"], r["curriculum_rank"]) for r in got.collect()
        ) == sorted((r["sid"], r["r"]) for r in naive.collect())
        sizes = {
            r["phase"]: r["n"]
            for r in got.groupBy("phase").agg(F.count("*").alias("n")).collect()
        }
        assert set(sizes) == {0, 1, 2, 3}
        assert max(sizes.values()) - min(sizes.values()) <= 1
        # difficulty never decreases along the rank
        rows = sorted(
            (r["curriculum_rank"], r["difficulty"]) for r in got.collect()
        )
        assert all(a[1] <= b[1] for a, b in zip(rows, rows[1:]))

    def test_equal_difficulty_is_shuffled_not_id_ordered(self, spark):
        from cex_crawler_spark.operators.packing import curriculum_order

        df = spark.range(200).select(
            F.format_string("s%04d", F.col("id")).alias("sid"),
            F.lit(1).alias("difficulty"),
        )
        got = [
            r["sid"]
            for r in curriculum_order(df, "sid", "difficulty", n_phases=2)
            .orderBy("curriculum_rank")
            .collect()
        ]
        assert got != sorted(got)  # md5 shuffle broke id order
        # but deterministically: same seed, same order
        again = [
            r["sid"]
            for r in curriculum_order(df, "sid", "difficulty", n_phases=2)
            .orderBy("curriculum_rank")
            .collect()
        ]
        assert got == again


class TestFrontcodeProperty:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _url = st.from_regex(
        r"https://[a-z]{1,6}\.(com|org|co\.uk)/[a-z0-9/._~-]{0,40}",
        fullmatch=True,
    )

    @given(st.lists(_url, min_size=1, max_size=25))
    @settings(max_examples=8, deadline=None)
    def test_roundtrip_arbitrary_urls(self, urls):
        """Property: decode(code(S)) == SURT(S) for arbitrary URL sets —
        blocks, headers, prefix-of-header keys, singleton blocks, the
        lot."""
        from cex_crawler_spark.operators.frontcode import (
            decode_frontcoded,
            frontcode_urls,
        )
        from cex_crawler_spark.sources.warc import surt_urlkey

        spark = _spark_singleton()
        f = spark.createDataFrame([(u,) for u in urls], "url string")
        coded, headers = frontcode_urls(f, block_prefix_len=7)
        decoded = sorted(
            r["urlkey"] for r in decode_frontcoded(coded, headers).collect()
        )
        expect = sorted(
            r["k"]
            for r in f.select(surt_urlkey(F.col("url")).alias("k"))
            .distinct()
            .collect()
        )
        assert decoded == expect


def _spark_singleton():
    from cex_crawler_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)
