"""Exactly-once streaming sink into the snapshot catalog.

Structured Streaming's own exactly-once story covers built-in sinks;
for a custom transactional store the documented pattern is an
IDEMPOTENT ``foreachBatch``: Spark may replay a micro-batch after a
restart (the checkpoint records offsets, not the sink's commit), so the
sink must recognize an already-committed ``batch_id`` and skip it.
Here the high-water batch id rides IN the catalog manifest itself, so
the "did this batch land?" check and the data commit are one atomic
manifest flip — a crash between parquet write and manifest link leaves
nothing visible, a crash after it makes the replay a no-op.

Scope: the high-water key is per-table.  ``stream_batches`` is a
DURABLE manifest property — :meth:`SnapshotCatalog.commit` carries it
forward through every commit (tested), so interleaved crawl-round or
compaction commits cannot erase the guard (without inheritance, a
sink-commit → other-commit → crash sequence would replay the last
batch as new: double append).  Two different streams appending the
same table need one sink instance (or the catalog's commit-conflict
retry) to serialize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..catalog import APPEND, SnapshotCatalog


def stream_append_exactly_once(
    stream_df: DataFrame,
    catalog: SnapshotCatalog,
    table: str,
    checkpoint_dir: str,
    round_id: int = 0,
):
    """Attach an idempotent catalog-append sink; returns the started query.

    Use ``.awaitTermination()`` on the result (tests drive it with
    ``availableNow`` so the stream drains and stops on its own).
    """
    writer = make_batch_writer(catalog, table, round_id)
    return (
        stream_df.writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(checkpoint_dir))
        .trigger(availableNow=True)
        .start()
    )


def make_batch_writer(
    catalog: SnapshotCatalog, table: str, round_id: int = 0
):
    """The idempotent ``foreachBatch`` function, exposed for direct
    testing: a replayed ``batch_id`` at or below the manifest's
    high-water mark MUST be a no-op."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        m = catalog.manifest()
        marks = dict(m.get("stream_batches", {}))
        if batch_id <= marks.get(table, -1):
            return  # replay of an already-committed batch
        marks[table] = batch_id
        catalog.commit(
            round_id,
            {table: (df, APPEND)},
            extra={"stream_batches": marks},
        )

    return write_batch
