"""DUST parameter-significance learning (operators/dust.py)."""

from pyspark.sql import functions as F

from cex_crawler_spark.operators.dust import (
    param_significance,
    strip_learned_params,
)


def _verdicts(rules_df):
    return {
        (r["host"], r["param"]): r.asDict() for r in rules_df.collect()
    }


def _sim_log(spark):
    import __spark_entry__ as e

    return e.gen_sim_dust_log(spark)


def test_pass1_verdicts(spark):
    """Pass 1 learns the params whose residuals the log actually fixes:
    sessionid (shop) and v (cdn) strip; page/ref hide behind the session
    id (no evidence — conservative keep); lang never varies; sort
    conflicts (it changes content)."""
    v = _verdicts(param_significance(_sim_log(spark), min_groups=3))
    assert v[("shop.example.com", "sessionid")]["irrelevant"]
    assert v[("cdn.example.net", "v")]["irrelevant"]
    # hidden behind sessionid: zero varied groups, kept
    assert v[("shop.example.com", "page")]["n_varied_groups"] == 0
    assert not v[("shop.example.com", "page")]["irrelevant"]
    assert not v[("shop.example.com", "ref")]["irrelevant"]
    # constant param: no evidence either way, kept
    assert v[("news.example.org", "lang")]["n_varied_groups"] == 0
    assert not v[("news.example.org", "lang")]["irrelevant"]
    # genuinely significant: conflicts observed, kept
    assert v[("news.example.org", "sort")]["n_conflict_groups"] > 0
    assert not v[("news.example.org", "sort")]["irrelevant"]


def test_iterative_pass2_uncovers_hidden_tracker(spark):
    """The DUST iteration: once pass-1 strips the session id, ref's
    residual groups become visible (many values, one digest) and pass 2
    flags it — while page now shows CONFLICTS (it determines content)
    and stays kept.  This is the paper's iterative refinement expressed
    as re-running the operator on rewritten URLs."""
    log = _sim_log(spark)
    rules1 = param_significance(log, min_groups=3)
    pass2_input = strip_learned_params(log, rules1).select(
        "host", F.col("canonical_url").alias("url"), "digest"
    )
    v2 = _verdicts(param_significance(pass2_input, min_groups=3))
    assert v2[("shop.example.com", "ref")]["irrelevant"]
    assert v2[("shop.example.com", "page")]["n_conflict_groups"] > 0
    assert not v2[("shop.example.com", "page")]["irrelevant"]
    # sessionid is gone from pass-2 input entirely
    assert ("shop.example.com", "sessionid") not in v2


def test_strip_rewrites_and_canonicalizes_order(spark):
    """Stripping drops exactly the learned params, sorts survivors (so
    param-order aliases collapse), leaves bare URLs and rule-less hosts
    untouched apart from the sort."""
    rules = spark.createDataFrame(
        [("h.com", "sid", 5, 5, 0, True), ("h.com", "page", 5, 5, 5, False)],
        "host string, param string, n_groups long, n_varied_groups long,"
        " n_conflict_groups long, irrelevant boolean",
    )
    frontier = spark.createDataFrame(
        [
            ("h.com", "https://h.com/a?b=2&sid=99&a=1"),
            ("h.com", "https://h.com/a?a=1&b=2&sid=7"),
            ("h.com", "https://h.com/a?sid=7"),
            ("h.com", "https://h.com/plain"),
            ("other.com", "https://other.com/x?z=1&y=2"),
        ],
        "host string, url string",
    )
    got = {
        r["url"]: r["canonical_url"]
        for r in strip_learned_params(frontier, rules).collect()
    }
    assert got["https://h.com/a?b=2&sid=99&a=1"] == "https://h.com/a?a=1&b=2"
    assert got["https://h.com/a?a=1&b=2&sid=7"] == "https://h.com/a?a=1&b=2"
    assert got["https://h.com/a?sid=7"] == "https://h.com/a"
    assert got["https://h.com/plain"] == "https://h.com/plain"
    assert got["https://other.com/x?z=1&y=2"] == "https://other.com/x?y=2&z=1"


def test_conflict_anywhere_blocks_strip(spark):
    """One conflicting residual group vetoes the rule no matter how many
    clean groups exist — content loss is never worth alias collapse."""
    rows = []
    # param q: 4 clean groups (digest fixed while q varies) ...
    for g in range(4):
        for val in range(3):
            rows.append(("h.com", f"https://h.com/p{g}?q={val}", f"d{g}"))
    # ... and ONE group where q changes the digest
    rows += [
        ("h.com", "https://h.com/px?q=0", "dx0"),
        ("h.com", "https://h.com/px?q=1", "dx1"),
    ]
    log = spark.createDataFrame(rows, "host string, url string, digest string")
    v = _verdicts(param_significance(log, min_groups=3))
    row = v[("h.com", "q")]
    assert row["n_varied_groups"] == 5
    assert row["n_conflict_groups"] == 1
    assert not row["irrelevant"]


class TestDustProperties:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _param = st.sampled_from(["sid", "ref", "page", "q", "utm"])
    _url = st.builds(
        lambda path, kvs: "https://h.com/" + path + (
            ("?" + "&".join(f"{k}={v}" for k, v in kvs)) if kvs else ""
        ),
        st.from_regex(r"[a-z0-9/]{0,15}", fullmatch=True),
        st.lists(
            st.tuples(_param, st.integers(0, 99).map(str)),
            max_size=5,
        ),
    )

    @given(st.lists(_url, min_size=1, max_size=20))
    @settings(max_examples=6, deadline=None)
    def test_strip_is_idempotent(self, urls):
        """Property: stripping learned rules twice equals once — the
        rewrite is a projection (sorted survivors, listed keys gone),
        so canonical URLs are a fixpoint.  This is what makes iterative
        DUST learning safe to re-run on already-canonical frontiers."""
        from cex_crawler_spark.operators.dust import strip_learned_params

        spark = _dust_spark()
        rules = spark.createDataFrame(
            [("h.com", "sid", 9, 9, 0, True), ("h.com", "utm", 9, 9, 0, True)],
            "host string, param string, n_groups long, n_varied_groups"
            " long, n_conflict_groups long, irrelevant boolean",
        )
        f = spark.createDataFrame([("h.com", u) for u in urls],
                                  "host string, url string")
        once = strip_learned_params(f, rules).select(
            "host", F.col("canonical_url").alias("url")
        )
        twice = strip_learned_params(once, rules)
        rows = twice.select("url", "canonical_url").collect()
        for r in rows:
            assert r["url"] == r["canonical_url"], r
            assert "sid=" not in r["canonical_url"]
            assert "utm=" not in r["canonical_url"]


def _dust_spark():
    from cex_crawler_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)
