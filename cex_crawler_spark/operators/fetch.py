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
    one Python worker.  Repartition on image_id: work still spreads over
    every core (hash-distributed), and all rows sharing a payload land in
    ONE task, so the per-task memo below fetches each distinct resource
    exactly once instead of once per referencing URL (guide §8: decide /
    compute on the distinct key, attach to the heavy row set once).  With
    unique-per-URL resources this degrades to exactly the old behaviour.
    """
    src = scheduled.select("url_hash", "image_id")
    if parallelism is None:
        parallelism = scheduled.sparkSession.sparkContext.defaultParallelism
    src = src.repartition(parallelism, F.col("image_id"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..payload import payload_for

        _FAIL = {
            "bytes": None, "w": None, "h": None, "fmt": None,
            "caption": None, "phash": None, "fetch_ok": False,
        }
        memo: dict[str, dict] = {}

        def fetch_one(image_id: str) -> dict:
            p = memo.get(image_id)
            if p is None:
                try:
                    p = payload_for(image_id)
                    p["fetch_ok"] = True
                except Exception:
                    p = dict(_FAIL, image_id=image_id)
                memo[image_id] = p
            return p

        cols = [f.name for f in FETCH_RESULT_SCHEMA]
        for pdf in it:
            payloads = [fetch_one(i) for i in pdf["image_id"]]
            out = pd.DataFrame(
                {
                    "url_hash": pdf["url_hash"].astype("int64"),
                    **{
                        c: [p[c] for p in payloads]
                        for c in cols
                        if c != "url_hash"
                    },
                },
                columns=cols,
            )
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
        # 2 tasks per core: slack partitions still smooth per-row payload
        # variance, but every extra task is also one more output file in
        # the results write and one more partition in every downstream
        # scan of the round's caches — measured on the 200k drain, 4×
        # cost ~3 s over 2× with no tail benefit (r6)
        parallelism = 2 * scheduled.sparkSession.sparkContext.defaultParallelism
    # image_id partitioning (not url_hash): the verdict is a pure function
    # of the resource, so landing every row of a payload in one task lets
    # the per-task memo fetch+validate each distinct resource ONCE and
    # attach the verdict to all referencing URLs — §8's "compute on the
    # small key, move the decision to the heavy rows" applied to fetch.
    # Distribution stays hash-even over cores; with unique-per-URL
    # resources (the production shape) the memo simply never hits.
    src = src.repartition(parallelism, F.col("image_id"))

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.imaging import decode_image, psnr
        from ..payload import caption_for, payload_for, reference_decode
        from .validate import PSNR_THRESHOLD_DB

        _FAIL = (None, None, None, None, None, False, False, False, 0.0, False)
        memo: dict[str, tuple] = {}

        def verdict_for(image_id: str) -> tuple:
            v = memo.get(image_id)
            if v is None:
                try:
                    p = payload_for(image_id)
                    decoded = decode_image(p["bytes"], p["fmt"])
                    ref = reference_decode(image_id)
                    p_db = min(psnr(decoded, ref), 1e9)
                    pixels_ok = (
                        bool(p_db >= PSNR_THRESHOLD_DB)
                        and decoded.shape == ref.shape
                    )
                    caption_ok = p["caption"] == caption_for(image_id)
                    v = (
                        p["w"], p["h"], p["fmt"], p["caption"], p["phash"],
                        True, pixels_ok, caption_ok, float(p_db),
                        pixels_ok and caption_ok,
                    )
                except Exception:
                    v = _FAIL
                memo[image_id] = v
            return v

        val_cols = [f.name for f in FETCH_VERDICT_SCHEMA][2:]
        for pdf in it:
            # factorize → one verdict per DISTINCT id in the batch (memo
            # carries across batches); column-wise assembly via np.take
            # replaces the old dict-per-row DataFrame build (~10× less
            # Python-side work per row even without memo hits).
            # use_na_sentinel=False keeps a null image_id as its own
            # "unique" (verdict_for then yields the fetch-failed row,
            # matching the per-row path) instead of code −1, which
            # np.take would silently alias to the LAST unique's verdict
            codes, uniques = pd.factorize(
                pdf["image_id"], use_na_sentinel=False
            )
            verdicts = [verdict_for(i) for i in uniques]
            out = {"url_hash": pdf["url_hash"].astype("int64"),
                   "image_id": pdf["image_id"]}
            for ci, name in enumerate(val_cols):
                col = np.empty(len(uniques), dtype=object)
                for ui, v in enumerate(verdicts):
                    col[ui] = v[ci]
                out[name] = col.take(codes) if len(uniques) else col
            yield pd.DataFrame(out)
            if fault_latch is not None and _trip_fault_latch(fault_latch):
                # crash AFTER partial output left this attempt: Spark must
                # discard it and replay the whole partition on retry
                raise RuntimeError(
                    "injected one-time task fault (fetch_and_validate)"
                )

    return src.mapInPandas(run, schema=FETCH_VERDICT_SCHEMA)
