"""Structured Streaming wiring: the streaming windowed agg must equal the
batch plan's result when drained with availableNow (same builder, SURVEY
§2.12)."""

import pandas as pd
from pyspark.sql import functions as F

from cex_crawler_spark.streaming.events import (
    stream_windowed_event_counts,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = (
        windowed_event_counts(events, "1 hour")
        .orderBy("window_start", "event_type")
        .toPandas()
    )

    # readStream requires a directory source
    src_dir = tmp_path / "events"
    src_dir.mkdir()
    import shutil

    shutil.copy(f"{SF}/events.parquet", src_dir / "part-0.parquet")
    stream = stream_windowed_event_counts(
        spark, str(src_dir), events.schema, "1 hour", "2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from win_counts")
        .orderBy("window_start", "event_type")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), batch.reset_index(drop=True)
    )


def test_sessionize_gap_semantics(spark):
    from datetime import datetime

    from cex_crawler_spark.streaming.events import sessionize_events

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
        (1, datetime(2024, 1, 1, 0, 10, 0), 2.0),   # same session (10m gap)
        (1, datetime(2024, 1, 1, 1, 0, 0), 3.0),    # new session (50m gap)
        (2, datetime(2024, 1, 1, 0, 0, 0), 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_no"]): (r["n_events"], r["sum_value"])
        for r in sessionize_events(df, gap_minutes=30).collect()
    }
    assert got == {(1, 1): (2, 3.0), (1, 2): (1, 3.0), (2, 1): (1, 4.0)}


def test_stream_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: each url_hash emitted EXACTLY once across
    micro-batches (per-host seen state persists between triggers)."""
    src = tmp_path / "frontier_stream"
    src.mkdir()
    schema = "host string, url_hash long, canonical_url string"
    b1 = [("h1", 1, "u1"), ("h1", 2, "u2"), ("h2", 10, "u10"), ("h1", 1, "u1")]
    b2 = [("h1", 2, "u2"), ("h1", 3, "u3"), ("h2", 10, "u10"), ("h2", 11, "u11")]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(
        str(src / "b1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(
        str(src / "b2")
    )
    from cex_crawler_spark.streaming.frontier_stream import stream_first_seen

    out = stream_first_seen(
        spark, str(src) + "/*", schema, max_files_per_trigger=1
    )
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen").collect()
    emitted = [(r["host"], r["url_hash"]) for r in rows]
    # exactly once per distinct (host, url_hash) — across batches too
    assert sorted(emitted) == sorted(
        {("h1", 1), ("h1", 2), ("h1", 3), ("h2", 10), ("h2", 11)}
    )


def test_stream_catalog_sink_exactly_once(spark, tmp_path):
    """Idempotent foreachBatch into the snapshot catalog: a drained
    stream's rows land exactly once; a REPLAYED batch id (what Spark
    does after a crash between sink commit and checkpoint write) is a
    no-op; a restart with the same checkpoint processes only NEW files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cex_crawler_spark.catalog import SnapshotCatalog
    from cex_crawler_spark.streaming.sink import (
        make_batch_writer,
        stream_append_exactly_once,
    )

    events = pq.read_table(f"{SF}/events.parquet")
    half = events.num_rows // 2
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(events.slice(0, half), src / "part-0.parquet")

    cat = SnapshotCatalog(tmp_path / "cat")
    schema = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = stream_append_exactly_once(
        stream, cat, "events_sink", str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    assert cat.read(spark, "events_sink").count() == half
    mark1 = cat.manifest()["stream_batches"]["events_sink"]
    v1 = cat.manifest()["version"]

    # crash-replay simulation: re-offer an already-committed batch id
    writer = make_batch_writer(cat, "events_sink")
    writer(spark.read.parquet(str(src)), mark1)
    assert cat.manifest()["version"] == v1          # no new commit
    assert cat.read(spark, "events_sink").count() == half  # no dup rows

    # the high-water mark must survive an interleaved NON-stream commit
    # (durable manifest property), or a crash-replay after it would
    # double-append
    from cex_crawler_spark.catalog import OVERWRITE

    cat.commit(0, {"other": (spark.range(3).toDF("id"), OVERWRITE)})
    assert cat.manifest()["stream_batches"]["events_sink"] == mark1
    writer(spark.read.parquet(str(src)), mark1)
    assert cat.read(spark, "events_sink").count() == half

    # restart with the same checkpoint: only the NEW file is processed
    pq.write_table(events.slice(half), src / "part-1.parquet")
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = stream_append_exactly_once(
        stream2, cat, "events_sink", str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert cat.read(spark, "events_sink").count() == events.num_rows
    assert cat.manifest()["stream_batches"]["events_sink"] > mark1


def test_health_stream_equals_batch(spark, tmp_path):
    """Host-health windows: the streaming plan over a parquet source
    produces exactly the batch builder's rows (shared-builder
    discipline), including the integer delay fold."""
    from cex_crawler_spark.streaming.health import (
        host_health_windows,
        stream_host_health,
    )

    sid = F.col("id")
    attempts = spark.range(600).select(
        F.format_string("h%d", sid % 3).alias("host"),
        F.to_timestamp(F.from_unixtime(F.lit(1756400000) + sid * 11)).alias("ts"),
        (60 + (sid * 48271) % 300).cast("long").alias("latency_ms"),
        (sid % 7 != 0).alias("ok"),
    )
    src = tmp_path / "att"
    attempts.coalesce(1).write.parquet(str(src))
    batch = (
        host_health_windows(attempts, "10 minutes")
        .orderBy("window_start", "host")
        .toPandas()
    )
    stream = stream_host_health(
        spark, str(src), attempts.schema, "10 minutes", "30 minutes"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("health_win")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from health_win")
        .orderBy("window_start", "host")
        .toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), batch.reset_index(drop=True)
    )
    # the doubled-delay branch fires somewhere (h-hosts with sid%7 errors
    # cross 0.3 only in sparse windows) — assert the clamp bounds instead
    assert (got["delay_ms"] >= 200).all() and (got["delay_ms"] <= 60000).all()


def test_trending_terms_stream_equals_batch(spark, tmp_path):
    from cex_crawler_spark.streaming.trending import (
        stream_trending_terms, trending_term_windows,
    )

    pages = spark.range(300).select(
        F.col("id").alias("page_id"),
        F.timestamp_seconds(F.lit(1756684800) + (F.col("id") * 61) % 1800).alias("ts"),
        F.concat_ws(
            " ",
            F.when(F.col("id") % 3 == 0, "burst").otherwise("calm"),
            F.lit("base"),
        ).alias("text"),
    )
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    batch = {(str(r["window_start"]), r["term"]): r["n_occurrences"]
             for r in trending_term_windows(pages, "10 minutes").collect()}
    sdf = stream_trending_terms(
        spark, src, spark.read.parquet(src).schema, "10 minutes"
    )
    qname = "trending_test"
    qy = (
        sdf.writeStream.format("memory").queryName(qname)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qy.awaitTermination(120)
    got = {(str(r["window_start"]), r["term"]): r["n_occurrences"]
           for r in spark.sql(f"SELECT * FROM {qname}").collect()}
    assert got == batch and len(batch) > 0


def test_standing_alerts_stream_equals_batch(spark, tmp_path):
    from cex_crawler_spark.operators.index import standing_alerts
    from cex_crawler_spark.streaming.trending import stream_standing_alerts

    docs = spark.createDataFrame(
        [(1, "merge join wins"), (2, "merge only"), (3, "join merge join"),
         (4, "nothing relevant")],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "pages")
    docs.write.parquet(src)
    queries = spark.createDataFrame(
        [("q1", "merge"), ("q1", "join"), ("q2", "merge")],
        ["query_id", "term"],
    )
    batch = {(r["query_id"], r["doc_id"]) for r in
             standing_alerts(docs, "text", "doc_id", queries).collect()}
    sdf = stream_standing_alerts(
        spark, src, spark.read.parquet(src).schema, queries
    )
    qy = (
        sdf.writeStream.format("memory").queryName("alerts_test")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    qy.awaitTermination(120)
    got = {(r["query_id"], r["doc_id"]) for r in
           spark.sql("SELECT * FROM alerts_test").collect()}
    assert got == batch and len(batch) == 5
