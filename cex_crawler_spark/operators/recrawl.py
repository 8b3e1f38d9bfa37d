"""Change-rate-driven recrawl scheduling (Cho & Garcia-Molina).

A frontier at 10^10 URLs cannot re-fetch everything; it has to decide
WHICH seen URLs to spend the politeness budget on.  The classic answer
(Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003)
models each page as a Poisson change process and estimates its rate
from the crawl's own revisit history: with ``n`` visits at interval
``Δ`` days of which ``X`` detected a change, the bias-reduced estimator

    λ̂ = −ln( (n − X + 0.5) / (n + 0.5) ) / Δ          [CGM §4.2]

(the +0.5 continuity correction keeps λ̂ finite when every visit saw a
change).  The probability the page is stale ``age`` days after the last
fetch is then ``p = 1 − exp(−λ̂ · age)``, and the scheduler simply
spends its budget on the highest-p URLs.

Everything here is pure Catalyst column arithmetic over a per-URL
history summary — one narrow row per URL (the fold of the results
table's (url_hash, fetch_ts, content_fp) lineage, itself a
map-combinable aggregate) — so the op is scan-side, shuffle-free, and
composes directly with the engine's scheduler: `recrawl_priority`
emits the same `priority:long` (lower = sooner) that
`operators/politeness.py:schedule_round` already orders rounds by.

The reference engine re-crawls on a fixed wall-clock loop with no
change model (/root/reference/main.py runs each exchange scraper on a
schedule); this is the scale-aware replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# p_stale thresholds → the scheduler's priority ladder (lower = sooner).
# Deterministic constants, not tunables-by-RNG (SURVEY §2.10).
HOT_P = 0.8
WARM_P = 0.4


def change_rate(n_visits: Column, n_changed: Column, interval_days: Column) -> Column:
    """λ̂ per day — the CGM bias-reduced MLE; finite for X == n."""
    return -F.log(
        (n_visits - n_changed + F.lit(0.5)) / (n_visits + F.lit(0.5))
    ) / interval_days


def staleness_probability(lambda_hat: Column, age_days: Column) -> Column:
    """P(page changed since last fetch) under the Poisson model."""
    return 1 - F.exp(-lambda_hat * age_days)


def change_rate_priorities(
    history: DataFrame,
    visits_col: str = "n_visits",
    changed_col: str = "n_changed",
    interval_col: str = "interval_days",
    age_col: str = "age_days",
) -> DataFrame:
    """Annotate a per-URL revisit-history summary with ``lambda_hat``,
    ``p_stale`` and a scheduler-ready ``recrawl_priority`` (0 = hot,
    1 = warm, 2 = cold — feeds `schedule_round`'s priority-major order
    unchanged).  Pure projection: no shuffle, no UDF."""
    lam = change_rate(
        F.col(visits_col), F.col(changed_col), F.col(interval_col)
    )
    out = history.withColumn("lambda_hat", lam).withColumn(
        "p_stale", staleness_probability(F.col("lambda_hat"), F.col(age_col))
    )
    return out.withColumn(
        "recrawl_priority",
        F.when(F.col("p_stale") > HOT_P, F.lit(0))
        .when(F.col("p_stale") > WARM_P, F.lit(1))
        .otherwise(F.lit(2))
        .cast("long"),
    )
