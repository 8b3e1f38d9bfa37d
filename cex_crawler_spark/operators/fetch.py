"""Batched fetch stage — Arrow-vectorized, replacing per-row browser loops.

The reference fetches one URL at a time inside a Playwright browser with
2-5 s sleeps (/root/reference/exchange/base_scraper.py:78-164).  The
engine's fetch is a ``mapInPandas`` stage over the scheduled batch:
each Arrow batch of frontier rows yields payload rows (bytes + metadata
+ caption).  In production this function body would issue concurrent
HTTP requests per batch; in the sandbox it calls the deterministic
payload synthesizer (payload.payload_for) — same plumbing, no network.

Scale notes:
- the batch is ``repartition(url_hash)``-spread so no executor fetches
  one hot host's whole budget alone;
- Arrow batch size is capped in session config so wide binary rows
  don't blow worker memory;
- fetch errors surface as a ``fetch_ok`` column, never as task failures
  (the reference's try/except-continue, exchange/binance.py:286-288 —
  a poison URL must not kill a 10^10-row job).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql import functions as F

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("fetch_ok", T.BooleanType()),
    ]
)


def fetch_batch(scheduled: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Fetch payloads for scheduled rows → (url_hash, payload…, fetch_ok)."""
    src = scheduled.select("url_hash", "image_id")
    if parallelism:
        src = src.repartition(parallelism, F.col("url_hash"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..payload import payload_for

        for pdf in it:
            rows = []
            for uh, image_id in zip(pdf["url_hash"], pdf["image_id"]):
                try:
                    p = payload_for(image_id)
                    p["url_hash"] = int(uh)
                    p["fetch_ok"] = True
                except Exception:
                    p = {
                        "url_hash": int(uh), "image_id": image_id, "bytes": None,
                        "w": None, "h": None, "fmt": None, "caption": None,
                        "phash": None, "fetch_ok": False,
                    }
                rows.append(p)
            out = pd.DataFrame(rows, columns=[f.name for f in FETCH_RESULT_SCHEMA])
            yield out

    return src.mapInPandas(run, schema=FETCH_RESULT_SCHEMA)
