"""URL-template trap screen (operators/traps.py) + registrable domains."""

from pyspark.sql import functions as F

from cex_crawler_spark.functions.urlnorm import registrable_domain
from cex_crawler_spark.operators.traps import template_stats, trap_hosts, url_template


def test_url_template_collapses_variable_parts(spark):
    cases = {
        "https://h.com/cal/2024/12": "/cal/N/N",
        "https://h.com/item/99817": "/item/N",
        "https://h.com/s/deadbeef01": "/s/H",
        "https://h.com/page?id=7&sort=asc&x=9": "/page?id=V&sort=V&x=V",
        "https://h.com:8080/a/5/b": "/a/N/b",
        "https://h.com/plain/path": "/plain/path",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["t"]
        for r in df.select("url", url_template(F.col("url")).alias("t")).collect()
    }
    assert got == cases


def test_trap_hosts_flags_concentrated_host_only(spark):
    rows = [("trap.com", f"https://trap.com/cal/{i}/{i % 7}") for i in range(200)]
    rows += [("ok.com", f"https://ok.com/{kind}/{i}")
             for i in range(200) for kind in ("a", "b", "c", "d")][:200]
    rows += [("small.com", f"https://small.com/cal/{i}/2") for i in range(20)]
    df = spark.createDataFrame(rows, "host string, url string")
    got = trap_hosts(df, min_urls=100, max_top_template_share=0.5).collect()
    assert [r["host"] for r in got] == ["trap.com"]
    r = got[0]
    assert r["n_urls"] == 200 and r["n_templates"] == 1
    assert r["top_template"] == "/cal/N/N" and r["top_share"] == 1.0
    # small.com is 100% one template but under min_urls → not flagged


def test_template_stats_is_map_side_aggregate(spark):
    df = spark.createDataFrame(
        [("h", "https://h/x/1"), ("h", "https://h/x/2")], "host string, url string"
    )
    plan = template_stats(df)._jdf.queryExecution().executedPlan().toString()
    # partial aggregate before the exchange — no corpus-wide shuffle of raw URLs
    assert "HashAggregate" in plan


def test_registrable_domain_rules(spark):
    cases = {
        "shop.example.com": "example.com",
        "news.example.co.uk": "example.co.uk",
        "EXAMPLE.CO.UK": "example.co.uk",
        "a.b.c.com.au": "c.com.au",
        "foo.org": "foo.org",
        "localhost": "localhost",
        "deep.sub.domain.net": "domain.net",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases
