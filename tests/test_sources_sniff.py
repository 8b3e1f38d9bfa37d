"""Sitemap parsing + magic-byte sniffing + incremental dedup."""

from pyspark.sql import functions as F

from cex_crawler_spark.functions.imaging import png_encode
from cex_crawler_spark.functions.sniff import sniff_format
from cex_crawler_spark.operators.dedup import (
    incremental_jaccard_matches,
    ngram_jaccard_pairs,
)
from cex_crawler_spark.sources.sitemap import parse_sitemaps

import numpy as np


def test_sitemap_missing_lastmod_does_not_shift(spark):
    # entry 2 omits <lastmod>: the naive all-locs×all-lastmods zip would
    # pair entry 3's lastmod with entry 2
    xml = """<?xml version="1.0"?>
    <urlset>
      <url><loc>https://s/1</loc><lastmod>2025-01-01</lastmod></url>
      <url><loc>https://s/2</loc></url>
      <url><loc> https://s/3 </loc><lastmod>2025-03-03</lastmod></url>
      <url><lastmod>2025-04-04</lastmod></url>
    </urlset>"""
    df = spark.createDataFrame([("s", xml)], ["host", "xml"])
    rows = {r["url"]: r["lastmod"] for r in parse_sitemaps(df).collect()}
    assert set(rows) == {"https://s/1", "https://s/2", "https://s/3"}
    assert rows["https://s/2"] is None
    assert str(rows["https://s/3"]).startswith("2025-03-03")
    assert str(rows["https://s/1"]).startswith("2025-01-01")


def test_sitemap_index_expands_children(spark):
    """Sitemap-index: <sitemap> block isolation (same shift trap as
    <url> blocks), flipped tag order inside a block, empty-loc drop."""
    from cex_crawler_spark.sources.sitemap import expand_sitemap_index

    xml = """<?xml version="1.0"?>
    <sitemapindex>
      <sitemap><loc>https://s/a.xml</loc><lastmod>2025-01-01</lastmod></sitemap>
      <sitemap><loc>https://s/b.xml</loc></sitemap>
      <sitemap><lastmod>2025-03-03</lastmod><loc> https://s/c.xml </loc></sitemap>
      <sitemap><loc></loc></sitemap>
    </sitemapindex>"""
    df = spark.createDataFrame([("s", xml)], ["host", "xml"])
    rows = {
        r["sitemap_url"]: r["lastmod"]
        for r in expand_sitemap_index(df).collect()
    }
    assert set(rows) == {"https://s/a.xml", "https://s/b.xml", "https://s/c.xml"}
    assert rows["https://s/b.xml"] is None
    assert str(rows["https://s/a.xml"]).startswith("2025-01-01")
    assert str(rows["https://s/c.xml"]).startswith("2025-03-03")


def test_sniff_real_png_and_magic_bytes(spark):
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    payloads = [
        ("real_png", bytearray(png_encode(arr))),
        ("jpeg", bytearray(b"\xff\xd8\xff\xe1rest")),
        ("gif", bytearray(b"GIF87atrailer")),
        ("webp", bytearray(b"RIFF\x01\x02\x03\x04WEBPVP8 ")),
        ("bmp", bytearray(b"BMxxxx")),
        ("unknown", bytearray(b"\x00\x01\x02\x03\x04\x05")),
        ("riff_not_webp", bytearray(b"RIFF\x01\x02\x03\x04WAVEfmt ")),
        ("short", bytearray(b"\x89P")),
    ]
    df = spark.createDataFrame(payloads, ["name", "data"])
    got = {r["name"]: r["fmt"] for r in df.select("name", sniff_format(F.col("data")).alias("fmt")).collect()}
    assert got == {
        "real_png": "png",
        "jpeg": "jpeg",
        "gif": "gif",
        "webp": "webp",
        "bmp": "bmp",
        "unknown": "unknown",
        "riff_not_webp": "unknown",
        "short": "unknown",
    }


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_incremental_matches_planted(spark):
    corpus = _docs(spark, [
        ("c1", "the quick brown fox jumps over the lazy dog again and again"),
        ("c2", "completely unrelated corpus text about spark shuffles"),
    ])
    batch = _docs(spark, [
        ("b1", "the quick brown fox jumps over the lazy dog again and again today"),
        ("b2", "nothing in common with anything stored before"),
    ])
    out = incremental_jaccard_matches(corpus, batch, k=3, threshold=0.5, max_df=None)
    rows = [(r["batch_id"], r["corpus_id"]) for r in out.collect()]
    assert rows == [("b1", "c1")]


def test_incremental_is_directed_subset_of_pairs(spark):
    # splitting a corpus and screening one half against the other must
    # give exactly the cross-split subset of the full pair operator
    texts = [
        (f"d{i}", f"shared prefix tokens alpha beta gamma delta {i % 3} tail {i}")
        for i in range(12)
    ]
    all_docs = _docs(spark, texts)
    pairs = ngram_jaccard_pairs(all_docs, "text", "doc_id", k=3, threshold=0.4, max_df=None)
    want = set()
    for r in pairs.collect():
        a_batch = int(r["id_a"][1:]) % 2 == 0
        b_batch = int(r["id_b"][1:]) % 2 == 0
        if a_batch != b_batch:
            b, c = (r["id_a"], r["id_b"]) if a_batch else (r["id_b"], r["id_a"])
            want.add((b, c))
    batch = all_docs.filter(F.col("doc_id").substr(2, 10).cast("int") % 2 == 0)
    corpus = all_docs.filter(F.col("doc_id").substr(2, 10).cast("int") % 2 == 1)
    got = {
        (r["batch_id"], r["corpus_id"])
        for r in incremental_jaccard_matches(corpus, batch, k=3, threshold=0.4, max_df=None).collect()
    }
    assert got == want and len(want) > 0


def test_robots_sitemap_directive(spark):
    from cex_crawler_spark.functions.robots import parse_robots_sitemaps

    body = (
        "User-agent: googlebot\nDisallow: /x\n"
        "Sitemap: https://a/s1.xml\n"
        "User-agent: *\nsitemap: https://a/s2.xml\n"
        "Sitemap: https://a/s1.xml\n"  # duplicate must collapse
        "NotSitemap: https://a/no.xml\n"
    )
    df = spark.createDataFrame([(body,)], ["robots_txt"])
    got = sorted(df.select(parse_robots_sitemaps(F.col("robots_txt")).alias("s")).first()["s"])
    assert got == ["https://a/s1.xml", "https://a/s2.xml"]


def test_tfidf_top_terms(spark):
    import math

    from cex_crawler_spark.functions.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            ("a", "common common rare1 rare1 rare1"),
            ("b", "common rare2"),
            ("c", "common common common"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, "text", "doc_id", k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append((r["rank"], r["token"], r["score"]))
    # 'common' appears in all 3 docs → ln(3/3)=0 score everywhere;
    # rare terms dominate their docs
    assert by_doc["a"][0][1] == "rare1"
    assert by_doc["a"][0][2] == round(3 * math.log(3 / 1), 4)
    assert by_doc["b"][0][1] == "rare2"
    # doc c has only a zero-scored term; it still ranks (rank 1)
    assert by_doc["c"][0] == (1, "common", 0.0)
    # k=2 cap respected
    assert all(len(v) <= 2 for v in by_doc.values())
