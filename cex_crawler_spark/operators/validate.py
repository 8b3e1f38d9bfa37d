"""Payload validation — the per-row invariant from BASELINE input_hint.

For every fetched payload: decode the ``bytes`` column, compare against
the reference decode (recomputed from the image_id seed — no golden
files), and assert

- decoded-pixel allclose: exact for png, PSNR ≥ 40 dB for lossy formats;
- caption equality vs the reference caption.

Vectorized: one pandas UDF over Arrow batches (numpy decode + PSNR per
image inside the batch loop), no per-row Python UDFs.  The reference has
no analog — it trusts fetches blindly (SURVEY §2.11 U5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PSNR_THRESHOLD_DB = 40.0

_VAL_SCHEMA = T.StructType(
    [
        T.StructField("pixels_ok", T.BooleanType()),
        T.StructField("caption_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
    ]
)


@F.pandas_udf(_VAL_SCHEMA)
def _validate_udf(
    image_id: pd.Series, byts: pd.Series, fmt: pd.Series, caption: pd.Series
) -> pd.DataFrame:
    from ..functions.imaging import decode_image, psnr
    from ..payload import caption_for, reference_decode

    px_ok, cap_ok, psnrs = [], [], []
    for iid, b, f_, cap in zip(image_id, byts, fmt, caption):
        try:
            decoded = decode_image(bytes(b), f_)
            ref = reference_decode(iid)
            p = psnr(decoded, ref)
            px_ok.append(bool(p >= PSNR_THRESHOLD_DB) and decoded.shape == ref.shape)
        except Exception:
            p = 0.0
            px_ok.append(False)
        psnrs.append(np.float64(min(p, 1e9)))  # inf → capped for parquet friendliness
        cap_ok.append(cap == caption_for(iid))
    return pd.DataFrame({"pixels_ok": px_ok, "caption_ok": cap_ok, "psnr_db": psnrs})


def validate_payloads(fetched: DataFrame) -> DataFrame:
    """Append pixels_ok / caption_ok / psnr_db / valid columns."""
    v = _validate_udf(
        F.col("image_id"), F.col("bytes"), F.col("fmt"), F.col("caption")
    )
    return (
        fetched.withColumn("__v", v)
        .withColumn("pixels_ok", F.col("__v.pixels_ok"))
        .withColumn("caption_ok", F.col("__v.caption_ok"))
        .withColumn("psnr_db", F.col("__v.psnr_db"))
        .withColumn("valid", F.col("pixels_ok") & F.col("caption_ok"))
        .drop("__v")
    )


def politeness_audit(
    fetch_log: DataFrame,
    policy: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "fetch_ts_ms",
) -> DataFrame:
    """Compliance audit over an EXECUTED round's fetch log — the
    verification side of politeness (the scheduler promises delays and
    robots compliance; this proves the executor kept them, the check a
    crawl operator runs before pointing fingers at a blocked IP).

    Per host: ``n_gap_violations`` counts consecutive-fetch gaps below
    the host's ``min_delay_ms`` (gaps order by timestamp with the URL as
    a deterministic tiebreak), ``n_robots_violations`` counts fetched
    URLs whose path matches a ``robots_disallow`` prefix (the same
    scan-side ``exists`` the scheduler uses — one rule evaluation per
    row), ``min_gap_ms`` is NULL for single-fetch hosts, and
    ``compliant`` requires both counts at zero.

    The lag window partitions by host — an audit log is one ROUND's
    fetches (budget-bounded per host), not the corpus; for auditing a
    whole crawl's history at once, run per round or swap in the chunked
    rank.  All integer arithmetic; policy rides a broadcast join.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(host_col).orderBy(ts_col, url_col)
    d = (
        fetch_log.join(F.broadcast(policy), host_col, "left")
        .withColumn("__gap", F.col(ts_col) - F.lag(ts_col).over(w))
        .withColumn(
            "__path",
            F.regexp_extract(
                F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1
            ),
        )
        .withColumn(
            "__robots_bad",
            F.coalesce(
                F.exists(
                    F.col("robots_disallow"),
                    lambda p: F.startswith(F.col("__path"), p),
                ),
                F.lit(False),
            ),
        )
    )
    return (
        d.groupBy(host_col)
        .agg(
            F.count("*").alias("n_fetches"),
            F.sum(
                (
                    F.col("__gap").isNotNull()
                    & (F.col("__gap") < F.col("min_delay_ms"))
                ).cast("long")
            ).alias("n_gap_violations"),
            F.min("__gap").alias("min_gap_ms"),
            F.sum(F.col("__robots_bad").cast("long")).alias(
                "n_robots_violations"
            ),
        )
        .withColumn(
            "compliant",
            (F.col("n_gap_violations") == 0)
            & (F.col("n_robots_violations") == 0),
        )
    )


def fairness_index(
    df: DataFrame, count_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Jain's fairness index over an allocation column, on the permille
    grid: J = (Σx)² / (n·Σx²), 1000 = perfectly even, →1000/n as one
    key hogs everything.  The scheduler-audit scalar for "did this
    round starve anyone": dispatch counts, byte budgets and politeness
    makespans all feed it.  All-integer — (Σx)²·1000 div (n·Σx²) —
    so the metric is bit-identical in any engine (the usual float
    formulation isn't).  One map-combinable aggregate per group.

    Returns (group_cols..., n_keys, total, sum_sq, jain_permille).
    """
    gb = df.groupBy(*(group_cols or []))
    x = F.col(count_col)
    agg = gb.agg(
        F.count("*").alias("n_keys"),
        F.sum(x).alias("total"),
        F.sum(x * x).alias("sum_sq"),
    )
    return agg.withColumn(
        "jain_permille",
        F.when(F.col("sum_sq") == 0, F.lit(None).cast("long")).otherwise(
            F.expr("(total * total * 1000) div (n_keys * sum_sq)")
        ),
    )
