"""DUST — learning URL rewrite rules from crawl evidence.

"Different URLs with Similar Text" (Bar-Yossef, Keidar & Schonfeld,
WWW'07) is the crawl problem the reference never faces at its 14-site
scale but a 10^10-URL frontier drowns in: session ids, tracking
parameters, and mirror paths make the same page reachable under
unbounded distinct URLs, and every alias burns a politeness slot.  The
static canonicalizer (functions/urlnorm.py) strips the *known* noise
(fragment, default port, utm_*); this operator LEARNS the site-specific
noise from the crawl's own (url, content-digest) log and feeds the
learned rules back into canonicalization — the dynamic tier above the
static one.

Scope: parameter-significance rules, the highest-yield DUST family.
For each (host, param) we ask: across groups of fetches that agree on
EVERYTHING except this parameter's value (same host, path, and other
query params — the "residual"), did the content digest ever vary?

  - a group where the param took ≥2 values is EVIDENCE (the crawl
    actually probed the param);
  - an evidence group with ≥2 distinct digests is a CONFLICT (the
    param changed content);
  - a param with ≥ ``min_groups`` evidence groups and ZERO conflicts is
    judged content-irrelevant → strip it.

The judgment is conservative by construction: a param that never varied
within any fixed residual has no evidence and is KEPT.  This also makes
rule learning naturally iterative — while a session id is still in the
URL, every other param's residual groups have size 1 (the session id
scatters them), so only the session id is learnable in pass 1; after
stripping it, pass 2 can see `ref=`-style trackers (tested).  That is
exactly the DUST paper's iterative refinement, expressed as "run the
operator again on rewritten URLs".

Scale shape: explode per-URL params (fan-out = params per URL, a small
constant), ONE map-combinable aggregate keyed (host, param, residual),
ONE keyed (host, param) — both narrow rows; rule application is a
broadcast map join + scan-side array filter.  No UDF anywhere, no
corpus-sized window, no self-join.

Reference analog: none — /root/reference/base_scraper.py:69-114 builds
URLs from per-exchange templates and never revisits aliasing; the
closest behavior is the hand-written per-site URL builders this
operator replaces with learned rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _base(url: Column) -> Column:
    """Everything before the first ``?`` (scheme+host+path)."""
    return F.regexp_extract(url, r"^([^?]*)", 1)


def url_query_params(url: Column) -> Column:
    """``array<string>`` of raw ``k=v`` items, [] when no query."""
    q = F.regexp_extract(url, r"\?(.*)$", 1)
    return F.when(q == "", F.array().cast("array<string>")).otherwise(
        F.split(q, "&")
    )


def _param_key(item: Column) -> Column:
    """Key of one ``k=v`` item (``k`` when no ``=``)."""
    return F.get(F.split(item, "=", 2), 0)


def param_significance(
    fetched: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    digest_col: str = "digest",
    min_groups: int = 3,
) -> DataFrame:
    """Per-(host, param) significance verdict from a fetch log.

    ``fetched``: one row per fetch with the URL and its content digest
    (re-fetches of one URL may repeat; distinct-counts absorb them).

    Returns (host, param, n_groups, n_varied_groups, n_conflict_groups,
    irrelevant): ``irrelevant = n_varied_groups >= min_groups AND
    n_conflict_groups == 0`` — strip-safe with quantified evidence.
    """
    url, dig = F.col(url_col), F.col(digest_col)
    params = url_query_params(url)
    d = fetched.select(
        F.col(host_col).alias("host"),
        dig.alias("__digest"),
        _base(url).alias("__base"),
        params.alias("__params"),
    ).select(
        "host",
        "__digest",
        "__base",
        "__params",
        F.explode("__params").alias("__item"),
    )
    d = d.select(
        "host",
        "__digest",
        _param_key(F.col("__item")).alias("param"),
        F.coalesce(F.get(F.split(F.col("__item"), "=", 2), 1), F.lit("")).alias(
            "__value"
        ),
        # residual: base + the OTHER params, order-normalized — the
        # "all else equal" grouping key.
        F.concat(
            F.col("__base"),
            F.lit("|"),
            F.array_join(
                F.array_sort(
                    F.filter(
                        F.col("__params"),
                        lambda x: _param_key(x) != _param_key(F.col("__item")),
                    )
                ),
                "&",
            ),
        ).alias("__residual"),
    )
    groups = d.groupBy("host", "param", "__residual").agg(
        F.countDistinct("__value").alias("__n_values"),
        F.countDistinct("__digest").alias("__n_digests"),
    )
    return (
        groups.groupBy("host", "param")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum((F.col("__n_values") >= 2).cast("long")).alias(
                "n_varied_groups"
            ),
            F.sum(
                ((F.col("__n_values") >= 2) & (F.col("__n_digests") >= 2)).cast(
                    "long"
                )
            ).alias("n_conflict_groups"),
        )
        .withColumn(
            "irrelevant",
            (F.col("n_varied_groups") >= F.lit(min_groups))
            & (F.col("n_conflict_groups") == 0),
        )
    )


def strip_learned_params(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Rewrite URLs by dropping each host's learned-irrelevant params.

    ``rules``: output of :func:`param_significance` (only rows with
    ``irrelevant = true`` act).  Surviving params are emitted SORTED —
    the rewrite canonicalizes param order at the same time, so
    ``a=1&b=2`` and ``b=2&a=1`` collapse too (same contract as the
    static canonicalizer).  Hosts with no rules pass through under the
    same sort.  Broadcast map join (one array<string> per host) + pure
    scan-side array ops.
    """
    host_rules = (
        rules.filter(F.col("irrelevant"))
        .groupBy("host")
        .agg(F.collect_set("param").alias("__drop"))
    )
    url = F.col(url_col)
    joined = frontier.join(
        F.broadcast(host_rules.withColumnRenamed("host", "__rhost")),
        frontier[host_col] == F.col("__rhost"),
        "left",
    ).drop("__rhost")
    drop = F.coalesce(F.col("__drop"), F.array().cast("array<string>"))
    kept = F.array_sort(
        F.filter(
            url_query_params(url), lambda x: ~F.array_contains(drop, _param_key(x))
        )
    )
    return joined.withColumn(
        out_col,
        F.when(F.size(kept) == 0, _base(url)).otherwise(
            F.concat(_base(url), F.lit("?"), F.array_join(kept, "&"))
        ),
    ).drop("__drop")
