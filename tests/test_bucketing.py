"""Bucketed co-located joins — the 100 TB shuffle-elision evidence.

The scale design (SURVEY §4 / README) calls for bucketing the big
fact tables on their join keys so repeated joins read pre-shuffled,
co-located buckets instead of exchanging 100 TB per join.  This test
pins the actual Spark behavior: two tables bucketed+sorted on the same
key join with NO Exchange (and no extra Sort) in the physical plan.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}'")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    stats = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("text_len")
    )
    for df, name in ((docs, "docs"), (stats, "stats")):
        (
            # repartition on the bucket column first → ONE file per
            # bucket, so the reader can trust the per-bucket sort order
            # (multiple files per bucket force a re-sort before SMJ)
            df.repartition(8, "doc_id")
            .write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(f"bkt.{name}")
        )
    yield spark.table("bkt.docs"), spark.table("bkt.stats")
    spark.sql("DROP TABLE IF EXISTS bkt.docs")
    spark.sql("DROP TABLE IF EXISTS bkt.stats")
    spark.sql("DROP DATABASE IF EXISTS bkt")


def test_bucketed_join_elides_shuffle_and_sort(spark, bucketed_tables):
    a, b = bucketed_tables
    # force the sort-merge path (the tables are tiny, so AQE would
    # broadcast) and freeze the plan for inspection
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        joined = a.join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the whole point at 100 TB: bucketed scans satisfy the join's
        # required DISTRIBUTION, so neither side shuffles — the network
        # exchange of the fact table is gone.  (A per-partition Sort
        # remains: Spark ≥ 3 ignores the written per-bucket order unless
        # the legacy outputOrdering flag is set, because a bucket split
        # across files is only partially sorted — a cheap local sort vs
        # a cluster-wide exchange.)
        assert "Exchange" not in plan
        assert joined.count() == a.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_unbucketed_join_pays_the_shuffle(spark, bucketed_tables):
    """Control: the same join over plain parquet DOES exchange — the
    delta the bucketed layout buys."""
    a = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    b = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("text_len")
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = a.join(b, "doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
