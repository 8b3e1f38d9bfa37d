"""Crawl-trap detection — URL-template explosion screens.

Crawler traps (calendar pages, faceted search, session-id paths,
infinite pagination) generate unbounded URL spaces under one host: a
frontier that follows them drowns real content at 10^10-URL scale.
The classic screen is TEMPLATE COLLAPSING (Koht-arsa & Sanguanpong;
also the "URL pattern" dedup in IRLbot, WWW'09): strip the variable
parts of a path, count URLs per (host, template), and flag hosts whose
frontier mass concentrates in a handful of templates with huge
fan-out.

Everything is scan-side Catalyst: template = digit-runs → 'N',
long-hex-runs → 'H' (session ids), then two map-combinable aggregates
(host×template, then host).  No window over the corpus, no UDF; the
output is a per-host verdict the scheduler can anti-join or
down-prioritize the same way robots rules flow in
(operators/politeness.py broadcast policy dim).

The reference crawls a fixed hand-picked URL list per exchange
(/root/reference/exchange/*.py) and cannot meet a trap; any open-web
frontier at the north rule's scale does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_template(url: Column) -> Column:
    """Collapse variable URL parts: digit runs → N, ≥8-char hex runs → H,
    query-string values → V (keys kept).  Pure codegen regex chain."""
    path = F.regexp_replace(url, r"^[a-z][a-z0-9+.-]*://[^/]*", "")
    t = F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "H")
    t = F.regexp_replace(t, r"[0-9]+", "N")
    return F.regexp_replace(t, r"=([^&#/]*)", "=V")


def template_stats(
    frontier: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """Per (host, template) fan-out — the raw material for trap verdicts."""
    return (
        frontier.select(
            F.col(host_col).alias("host"),
            url_template(F.col(url_col)).alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )


def trap_hosts(
    frontier: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    min_urls: int = 100,
    max_top_template_share: float = 0.5,
) -> DataFrame:
    """Hosts whose frontier mass concentrates in one collapsed template.

    A host is flagged when it has ≥ ``min_urls`` frontier URLs AND its
    single biggest template holds > ``max_top_template_share`` of them —
    the signature of a generated URL space.  Returns (host, n_urls,
    n_templates, top_template, top_share) for the scheduler to act on
    (down-prioritize or cap); thresholds are deterministic constants,
    not RNG (SURVEY §2.10).

    Shape: two map-side-combinable aggregates; the per-host max-by is
    over the already-collapsed (host, template) rows — corpus-sized
    shuffles never happen.
    """
    ts = template_stats(frontier, url_col, host_col)
    per_host = ts.groupBy("host").agg(
        F.sum("n_urls").alias("n_urls"),
        F.count("*").alias("n_templates"),
        F.max_by("template", F.struct(F.col("n_urls"), F.col("template"))).alias(
            "top_template"
        ),
        F.max("n_urls").alias("top_n"),
    )
    return (
        per_host.withColumn(
            "top_share", F.round(F.col("top_n") / F.col("n_urls"), 4)
        )
        .filter(
            (F.col("n_urls") >= min_urls)
            & (F.col("top_share") > max_top_template_share)
        )
        .select("host", "n_urls", "n_templates", "top_template", "top_share")
    )


def demote_trapped(
    frontier: DataFrame,
    traps: DataFrame,
    penalty: int = 100,
    host_col: str = "host",
) -> DataFrame:
    """Feed a trap verdict back into the scheduler: add ``penalty`` to
    the ``priority`` of every frontier URL on a flagged host (lower
    priority value = sooner, operators/politeness._ORDER_COLS — so
    trapped hosts sink behind every healthy level instead of being
    dropped; real pages on a flagged host still crawl, last).

    The verdict table is per-host (thousands of rows at most) and
    broadcast — the frontier is touched by one scan-side map join, no
    shuffle.  A frontier without a priority column gets level 0 first,
    matching schedule_round's pre-priority default.
    """
    if "priority" not in frontier.columns:
        frontier = frontier.withColumn("priority", F.lit(0).cast("long"))
    flagged = traps.select(F.col("host").alias("__trap_host")).distinct()
    return (
        frontier.join(
            F.broadcast(flagged),
            frontier[host_col] == flagged["__trap_host"],
            "left",
        )
        .withColumn(
            "priority",
            F.when(
                F.col("__trap_host").isNotNull(),
                F.col("priority") + F.lit(penalty),
            ).otherwise(F.col("priority")),
        )
        .drop("__trap_host")
    )


def blocklist_screen(
    frontier: DataFrame,
    blocklist: DataFrame,
    host_col: str = "host",
) -> DataFrame:
    """Safety/compliance domain blocklist — the screen a production
    crawl runs BEFORE politeness even looks at a URL (unsafe content,
    legal takedowns, known malware sites).  Matching is by REGISTRABLE
    domain (eTLD+1), so blocking ``badsite.com`` covers
    ``cdn.images.badsite.com`` — subdomain hopping doesn't evade the
    list.

    ``blocklist``: dim of ``(domain, reason)`` rows (eTLD+1 keys,
    thousands-to-millions of rows — broadcast class).  Adds
    ``(site, blocked, block_reason)`` to every frontier row via one
    scan-side broadcast map join; unlike trap/quality DEMOTION, a
    blocklist verdict is a hard gate — callers drop or quarantine
    ``blocked`` rows, they never schedule them.
    """
    from ..functions.urlnorm import registrable_domain

    b = blocklist.select(
        F.lower(F.col("domain")).alias("__bl_domain"),
        F.col("reason").alias("block_reason"),
    )
    keyed = frontier.withColumn("site", registrable_domain(F.col(host_col)))
    return (
        keyed.join(
            F.broadcast(b), keyed["site"] == b["__bl_domain"], "left"
        )
        .withColumn("blocked", F.col("__bl_domain").isNotNull())
        .drop("__bl_domain")
    )


def soft404_suspects(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    digest_col: str = "digest",
    min_urls: int = 20,
) -> DataFrame:
    """Within-host error-template detection — the soft-404 problem: a
    host that answers every dead URL with HTTP 200 and the same "not
    found" page poisons the corpus with thousands of identical
    non-documents AND defeats URL-seen dedup (every dead URL is a new
    URL).  The signature is one digest carried by MANY DISTINCT URLs on
    ONE host; cross-host sharing is the mirror detector's job
    (operators/mirrors.py), content substrings the span screen's — this
    is the third axis.

    Returns (host, digest, n_urls, suspect); join suspects back (an
    anti-join on (host, digest)) to drop the template rows and mark the
    URLs dead.  One map-combinable distinct + count on (host, digest) —
    dedup_exact's shape; a million-URL error template is ONE aggregate
    key.  Legitimately repeated content (a popular page under a few
    aliases) stays under ``min_urls`` once canonicalization has run —
    screen AFTER the alias collapse, not before.
    """
    return (
        pages.select(host_col, digest_col, url_col)
        .distinct()
        .groupBy(host_col, digest_col)
        .agg(F.count("*").alias("n_urls"))
        .withColumn("suspect", F.col("n_urls") >= F.lit(min_urls))
    )


def url_hygiene_screen(
    frontier: DataFrame,
    url_col: str = "url",
    max_len: int = 2048,
    max_depth: int = 20,
    max_params: int = 16,
) -> DataFrame:
    """Structural URL hygiene — the cheap pre-admission gate Heritrix
    ships as decide rules (TooManyPathSegments, scheme accepts): URLs
    that are structurally crawler-hostile get annotated BEFORE any
    politeness slot is spent.  Checks (each a scan-side expression):

    - ``scheme``   — only http/https crawl (mailto:, javascript:, ftp:
      and friends leak in from href scrapes);
    - ``userinfo`` — ``user@host`` URLs are phishing-shaped and most
      servers reject them;
    - ``length``   — > ``max_len`` chars (session-state snowballs);
    - ``depth``    — > ``max_depth`` path segments (recursive traps
      that template collapse alone may not fold);
    - ``params``   — > ``max_params`` query params (parameter
      explosion).

    Emits (blocked, reasons) with reasons '+'-joined in ALPHABETICAL
    order (the LAION-gates idiom — deterministic, hash-comparable).
    Annotate-don't-drop, as every gate in this engine.
    """
    from cex_crawler_spark.operators.dust import url_query_params

    url = F.col(url_col)
    scheme = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1)
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    depth = F.size(F.split(path, "/")) - 1
    checks = F.array(
        F.when(~scheme.isin("http", "https"), F.lit("scheme")),
        F.when(
            F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*@", 0) != "",
            F.lit("userinfo"),
        ),
        F.when(F.length(url) > F.lit(max_len), F.lit("length")),
        F.when(depth > F.lit(max_depth), F.lit("depth")),
        F.when(
            F.size(url_query_params(url)) > F.lit(max_params),
            F.lit("params"),
        ),
    )
    reasons = F.array_sort(
        F.filter(checks, lambda x: x.isNotNull())
    )
    return frontier.withColumn(
        "reasons", F.array_join(reasons, "+")
    ).withColumn("blocked", F.size(reasons) > 0)


def outlink_screen(
    links: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_outlinks: int = 200,
) -> DataFrame:
    """Link-farm screen on the discovery feed — the expansion-side twin
    of the URL-template trap: a page emitting thousands of outlinks is
    a directory spam page, a paginated index, or an SEO farm, and
    letting it seed the frontier hands one page control of thousands of
    politeness slots.  Heritrix caps this per-page
    (ExtractorHTML max-outlinks); here the verdict is per SOURCE page:
    (n_outlinks, n_distinct_targets, farm).  Distinct-target count
    matters separately — 500 links to 3 targets is navigation chrome
    (harmless after dedup), 500 links to 500 targets is the farm.

    One map-combinable aggregate on src; feed ``farm`` rows to an
    anti-join on the expansion feed (drop the links, keep the page).
    """
    return (
        links.groupBy(F.col(src_col).alias("src"))
        .agg(
            F.count("*").alias("n_outlinks"),
            F.countDistinct(dst_col).alias("n_distinct_targets"),
        )
        .withColumn(
            "farm", F.col("n_distinct_targets") > F.lit(max_outlinks)
        )
    )
