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
    """Fetch payloads for scheduled rows → (url_hash, payload…, fetch_ok).

    The input arrives partitioned BY HOST (the politeness window's
    partitioning) — a hot host would serialize its whole budget through
    one Python worker.  Always repartition on url_hash so fetch work
    spreads over every core; the shuffled columns are 16 bytes/row.
    """
    src = scheduled.select("url_hash", "image_id")
    if parallelism is None:
        parallelism = scheduled.sparkSession.sparkContext.defaultParallelism
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


FETCH_VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("fetch_ok", T.BooleanType()),
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def _trip_fault_latch(path: str) -> bool:
    """Atomically create ``path``; returns True exactly ONCE across all
    task attempts and worker processes (O_EXCL), False ever after.

    Test-only crash injection (VERDICT r4 item 1): lets a test make one
    task attempt die mid-stream and prove the retried attempt leaves
    results/seen bit-identical to a clean run — the executor-side half
    of the exactly-once story (the driver-kill half is tests/test_resume).
    """
    import os

    try:
        os.close(os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        return True
    except FileExistsError:
        return False


def fetch_and_validate(
    scheduled: DataFrame,
    parallelism: int | None = None,
    fault_latch: str | None = None,
) -> DataFrame:
    """Fused fetch→decode→validate in ONE Python stage.

    The raw image bytes never cross the JVM↔Python Arrow boundary:
    fetching, decoding, the PSNR check and caption check all happen
    inside the same worker, and only the 60-byte verdict row returns.
    Splitting fetch and validate into two stages would ship every
    payload across Arrow twice — measured 2× slower at 1M URLs.

    ``fault_latch``: path for :func:`_trip_fault_latch` — when set, the
    first task attempt to finish a batch crashes AFTER yielding its
    output, exercising Spark's discard-and-retry of partial task output.
    """
    src = scheduled.select("url_hash", "image_id")
    if parallelism is None:
        # 4 tasks per core: with exactly one task per core a single
        # straggler stretches the whole stage; payload work varies per
        # row, so slack partitions smooth the tail
        parallelism = 4 * scheduled.sparkSession.sparkContext.defaultParallelism
    src = src.repartition(parallelism, F.col("url_hash"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imaging import decode_image, psnr
        from ..payload import caption_for, payload_for, reference_decode
        from .validate import PSNR_THRESHOLD_DB

        for pdf in it:
            rows = []
            for uh, image_id in zip(pdf["url_hash"], pdf["image_id"]):
                try:
                    p = payload_for(image_id)
                    decoded = decode_image(p["bytes"], p["fmt"])
                    ref = reference_decode(image_id)
                    p_db = min(psnr(decoded, ref), 1e9)
                    pixels_ok = bool(p_db >= PSNR_THRESHOLD_DB) and decoded.shape == ref.shape
                    caption_ok = p["caption"] == caption_for(image_id)
                    rows.append(
                        {
                            "url_hash": int(uh), "image_id": image_id,
                            "w": p["w"], "h": p["h"], "fmt": p["fmt"],
                            "caption": p["caption"], "phash": p["phash"],
                            "fetch_ok": True, "pixels_ok": pixels_ok,
                            "caption_ok": caption_ok, "psnr_db": float(p_db),
                            "valid": pixels_ok and caption_ok,
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "url_hash": int(uh), "image_id": image_id,
                            "w": None, "h": None, "fmt": None, "caption": None,
                            "phash": None, "fetch_ok": False, "pixels_ok": False,
                            "caption_ok": False, "psnr_db": 0.0, "valid": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FETCH_VERDICT_SCHEMA])
            if fault_latch is not None and _trip_fault_latch(fault_latch):
                # crash AFTER partial output left this attempt: Spark must
                # discard it and replay the whole partition on retry
                raise RuntimeError(
                    "injected one-time task fault (fetch_and_validate)"
                )

    return src.mapInPandas(run, schema=FETCH_VERDICT_SCHEMA)
