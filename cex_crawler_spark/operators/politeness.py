"""Politeness scheduler — the window-ranked token bucket.

Reference semantics being reproduced (SURVEY §2.7): each host crawls its
list strictly sequentially (``for i, announcement in enumerate``,
/root/reference/exchange/binance.py:233), sections concatenated in a
fixed order (listings then delistings, exchange/binance.py:225), with
~1 fetch per 2-5 s per host (exchange/base_scraper.py:160-164) and NO
cross-host ordering (processes run in parallel, main.py:176-186).

Engine mapping: the per-round fetch batch for a host is the top
``budget_per_round`` rows of that host's frontier ordered by
``(section_rank, seq, url_hash)`` — rank order IS crawl order, so the
per-host sequence is deterministic and matches the reference replay.
Delays become declarative budgets; ``min_delay_ms`` is recorded in
lineage, never slept.

Skew at scale: one host can hold 50%+ of a 10^10-row frontier, and
``row_number() OVER (PARTITION BY host)`` would funnel it into a single
task.  Since only the top-B rows per host can ever be scheduled, ranking
runs in two phases: (1) rank within ``(host, salt)`` buckets — salt =
``pmod(url_hash, S)`` spreads the hot host over S tasks — keeping at
most B rows per bucket, then (2) rank the surviving ≤ S·B rows per host
exactly.  Phase-2 input is tiny regardless of frontier size, so the
hot-host window never sees more than S·B rows.

Statuses decided here (precedence mirrors the reference loop order —
time filter before existence check, binance.py:240-255):
- ``robots_blocked``: path matches a robots disallow prefix (engine
  addition per the north rule; terminal, never fetched).
- ``stale_placeholder``: release_time older than the watermark AND known
  pre-fetch — written to results without consuming fetch budget
  (binance.py:242-243).  Hosts that only learn release_time after the
  fetch (weex/bitunix/blofin, exchange/weex.py:156-164) are NOT filtered
  here; their stale rows consume budget and are placeholdered post-fetch.
- ``dup_skipped``: same canonical URL appears earlier in this round
  (the reference's second ``os.path.exists`` hit).
- ``scheduled``: rank ≤ budget; ``host_seq`` = rank (the crawl order).
- ``deferred``: schedulable but over budget — stays in the frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..synth import SECTIONS

STATUS_ROBOTS = "robots_blocked"
STATUS_STALE = "stale_placeholder"
STATUS_DUP = "dup_skipped"
STATUS_SCHEDULED = "scheduled"
STATUS_DEFERRED = "deferred"
STATUS_FETCHED = "fetched"


def section_rank(col=None):
    """Fixed section processing order: spot → futures → delisting."""
    if col is None:
        col = F.col("section")
    m = {s: i for i, s in enumerate(SECTIONS)}
    expr = F.lit(len(m))
    for s, i in m.items():
        expr = F.when(col == s, F.lit(i)).otherwise(expr)
    return expr


def schedule_round(
    candidates: DataFrame,
    host_policy: DataFrame,
    watermark: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Assign a status (and host_seq for scheduled rows) to every candidate.

    ``candidates``: frontier rows already anti-joined against the seen
    set, carrying canonical_url + url_hash.  ``watermark``: 'YYYY-MM-DD
    HH:MM:SS' UTC cutoff (explicit parameter — never wall-clock).
    """
    c = (
        candidates.join(F.broadcast(host_policy), "host", "left")
        .withColumn("section_rank", section_rank())
        .withColumn(
            "path", F.regexp_extract(F.col("canonical_url"), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
        )
    )
    robots_hit = F.exists(
        F.col("robots_disallow"), lambda p: F.startswith(F.col("path"), p)
    )
    stale_prefetch = F.col("time_known_prefetch") & (
        F.col("release_time") < F.to_timestamp(F.lit(watermark))
    )

    dup_w = Window.partitionBy("url_hash").orderBy("section_rank", "seq", "seed_id")
    c = (
        c.withColumn("__robots", F.coalesce(robots_hit, F.lit(False)))
        .withColumn("__stale", stale_prefetch)
        .withColumn("__dup_rn", F.row_number().over(dup_w))
    )

    terminal = (
        F.when(F.col("__robots"), STATUS_ROBOTS)
        .when(F.col("__stale"), STATUS_STALE)
        .when(F.col("__dup_rn") > 1, STATUS_DUP)
    )
    c = c.withColumn("__terminal", terminal)

    schedulable = c.filter(F.col("__terminal").isNull())

    # phase 1: salted per-(host, salt) rank — caps the hot host at S tasks
    salt = F.pmod(F.col("url_hash"), F.lit(salt_buckets))
    w1 = Window.partitionBy("host", "__salt").orderBy(
        "section_rank", "seq", "url_hash"
    )
    pre = (
        schedulable.withColumn("__salt", salt)
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= F.col("budget_per_round"))
        .drop("__salt", "__r1")
    )
    # phase 2: exact per-host rank over ≤ S·B survivors
    w2 = Window.partitionBy("host").orderBy("section_rank", "seq", "url_hash")
    ranked = pre.withColumn("__rank", F.row_number().over(w2))
    scheduled = ranked.filter(F.col("__rank") <= F.col("budget_per_round")).select(
        F.col("url_hash").alias("__sched_hash"),
        F.col("__rank").alias("host_seq"),
    )

    # scheduled is ≤ budget × n_hosts rows — broadcastable for realistic host
    # counts; with millions of hosts AQE picks the join side at runtime, so
    # no explicit hint.
    out = (
        c.join(scheduled, c.url_hash == F.col("__sched_hash"), "left")
        .withColumn(
            "status",
            F.coalesce(
                F.col("__terminal"),
                F.when(F.col("host_seq").isNotNull(), STATUS_SCHEDULED).otherwise(
                    STATUS_DEFERRED
                ),
            ),
        )
        .drop("__sched_hash", "__robots", "__stale", "__dup_rn", "__terminal", "path")
    )
    return out
