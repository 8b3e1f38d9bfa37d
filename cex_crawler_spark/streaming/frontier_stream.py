"""Streaming frontier ingestion — a continuously-fed crawl frontier.

The reference re-discovers URLs on every cron run and relies on the
output directory to skip them (/root/reference/exchange/binance.py:253-255).
The streaming twin consumes frontier rows as they arrive and emits each
URL exactly once across micro-batches: per-host seen state maintained by
``applyInPandasWithState`` — the engine's one ARBITRARY-stateful
streaming operator (the windowed/sessionized analogs in events.py are
built-in-operator streams).

State design: group by host (the same key the politeness scheduler
shuffles on), state = the host's seen url_hash array.  At 10^10-URL
scale the per-host state would be the Bloom bitmap rather than the raw
hash list — the operator's contract (first occurrence wins, exactly
once across batches) is what the test pins.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FIRST_SEEN_OUTPUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("canonical_url", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("hashes", T.ArrayType(T.LongType()))]
)


def _first_seen_fn(key, pdfs, state: GroupState):
    seen = set(state.get[0]) if state.exists else set()
    chunks = []
    for pdf in pdfs:
        fresh = pdf[~pdf["url_hash"].isin(seen)].drop_duplicates("url_hash")
        if len(fresh):
            seen.update(int(h) for h in fresh["url_hash"])
            chunks.append(fresh[["host", "url_hash", "canonical_url"]])
    state.update((sorted(seen),))
    if chunks:
        yield pd.concat(chunks)


def stream_first_seen(
    spark, frontier_dir: str, schema, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming URL-seen dedup: each url_hash is emitted exactly once
    (first arrival wins), with per-host state carried across
    micro-batches.  Returns the streaming DataFrame; callers attach
    writeStream (tests use memory sink + availableNow)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frontier_dir)
    )
    return (
        stream.groupBy("host")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=FIRST_SEEN_OUTPUT,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
