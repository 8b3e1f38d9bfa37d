"""Sitemap parsing — XML sitemaps / sitemap-index files into frontier rows.

Sitemaps (sitemaps.org protocol) are the crawl world's push channel: a
host declares its URL inventory plus optional freshness hints, and a
polite crawler seeds its frontier from them instead of brute-force link
discovery.  The reference needs no sitemaps (fixed URL list per
exchange); an open-web frontier at 10^10 URLs leans on them hard —
they are the cheapest source of (url, lastmod) pairs there is.

Implementation is scan-side Catalyst over the raw XML body (fetched
like any other payload): ``regexp_extract_all`` per tag, positionally
zipped.  <url> entries in the wild are flat and order-stable
(loc first, the protocol's canonical serialization), which the
extraction relies on; a namespace-twisting feed would go through a
real XML parser behind the same output schema.  No UDF, no shuffle —
the explode happens fused with the fetch scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?s): sitemap bodies are multi-line — the block regex must cross newlines
_URL_BLOCK = r"(?s)<url>(.*?)</url>"
_LOC = r"<loc>\s*([^<]*?)\s*</loc>"
_LASTMOD = r"<lastmod>\s*([^<]*?)\s*</lastmod>"


def sitemap_entries(xml: Column) -> Column:
    """array<struct<loc,lastmod>> from one sitemap body.

    Each <url> block is isolated first so a missing <lastmod> in one
    entry cannot shift the positional zip (the naive two-pass zip of
    all <loc>s against all <lastmod>s mis-pairs the moment one entry
    omits the tag).
    """
    blocks = F.regexp_extract_all(xml, F.lit(_URL_BLOCK), 1)
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC, 1).alias("loc"),
            # regexp_extract returns '' on no-match; surface NULL
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
        ),
    )


def parse_sitemaps(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """Explode sitemap bodies into (host, url, lastmod:timestamp) frontier
    seed rows.  Entries with an empty/absent <loc> are dropped; lastmod
    is parsed as a UTC timestamp when present (W3C datetime dates parse
    too), NULL otherwise — the freshness watermark treats NULL as
    always-stale, the safe default."""
    return (
        sitemaps.select(
            F.col(host_col).alias("host"),
            F.explode(sitemap_entries(F.col(xml_col))).alias("e"),
        )
        .filter(F.col("e.loc") != "")
        .select(
            "host",
            F.col("e.loc").alias("url"),
            F.to_timestamp("e.lastmod").alias("lastmod"),
        )
    )


# sitemap-index files (sitemaps.org: <sitemapindex> of <sitemap>
# blocks) — the protocol's own sharding: one index can fan out to
# 50k child sitemaps × 50k URLs each, which is how a 10^9-URL host
# actually publishes its inventory.
_INDEX_BLOCK = r"(?s)<sitemap>(.*?)</sitemap>"


def sitemap_index_entries(xml: Column) -> Column:
    """array<struct<loc,lastmod>> of CHILD SITEMAP references from a
    sitemap-index body — same per-block isolation as
    :func:`sitemap_entries` (a missing <lastmod> cannot shift the
    zip), different block tag."""
    blocks = F.regexp_extract_all(xml, F.lit(_INDEX_BLOCK), 1)
    return F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC, 1).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
        ),
    )


def expand_sitemap_index(
    indexes: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """Explode sitemap-index bodies into (host, sitemap_url,
    lastmod:timestamp) fetch tasks — the middle hop of the discovery
    chain robots ``Sitemap:`` → index → leaf sitemaps →
    :func:`parse_sitemaps` → frontier seeds.  A child whose lastmod
    predates the last successful fetch of that same child can be
    skipped by the freshness watermark exactly like a page URL — at
    sitemap-index scale (50k children per index) that pruning is the
    difference between re-reading a host's whole inventory every
    round and touching only changed shards."""
    return (
        indexes.select(
            F.col(host_col).alias("host"),
            F.explode(sitemap_index_entries(F.col(xml_col))).alias("e"),
        )
        .filter(F.col("e.loc") != "")
        .select(
            "host",
            F.col("e.loc").alias("sitemap_url"),
            F.to_timestamp("e.lastmod").alias("lastmod"),
        )
    )


def sitemap_coverage_gap(
    declared: DataFrame,
    discovered: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """Per-host reconciliation of the site's ADVERTISED inventory
    (sitemap URLs) against what link discovery actually found — the two
    gaps mean different operational things:

    - ``declared_only`` (in the sitemap, never discovered): content the
      crawl is missing — pages unreachable by links (deep archives,
      JS-only navigation).  These should seed directly from the sitemap
      (parse_sitemaps → frontier), and a large count says link-following
      alone under-covers this host.
    - ``discovered_only`` (found by links, not advertised): orphan or
      parameter pages the site doesn't consider canonical — prime DUST/
      trap suspects, and the first rows to drop under budget pressure.

    One full-outer join on (host, url) of two DISTINCT projections +
    one map-combinable rollup; at 10^10 URLs both sides shuffle once on
    the same key.  Reference analog: none — the reference's inventory
    IS its hand-written URL templates.
    """
    d1 = declared.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct().withColumn("__dec", F.lit(1))
    d2 = discovered.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("url")
    ).distinct().withColumn("__dis", F.lit(1))
    j = d1.join(d2, ["host", "url"], "full_outer")
    return j.groupBy("host").agg(
        F.sum(
            (F.col("__dec").isNotNull() & F.col("__dis").isNull()).cast("long")
        ).alias("declared_only"),
        F.sum(
            (F.col("__dec").isNull() & F.col("__dis").isNotNull()).cast("long")
        ).alias("discovered_only"),
        F.sum(
            (F.col("__dec").isNotNull() & F.col("__dis").isNotNull()).cast(
                "long"
            )
        ).alias("both"),
    )


#: sitemap <changefreq> values → declared inter-change interval, hours
CHANGEFREQ_HOURS = {
    "always": 0,
    "hourly": 1,
    "daily": 24,
    "weekly": 168,
    "monthly": 720,
    "yearly": 8760,
    "never": 1000000,
}


def sitemap_changefreq_trust(
    history: DataFrame,
    declared: DataFrame,
    host_col: str = "host",
    min_visits: int = 50,
    slack: int = 4,
) -> DataFrame:
    """Does the host's declared ``<changefreq>`` match observed reality?

    The freshness pipeline PRUNES on sitemap lastmod/changefreq
    (sitemap_discovery_chain) — which is only safe for hosts that tell
    the truth.  This reconciles the declaration against the crawl's own
    revisit history: observed mean inter-change interval =
    total-observed-days / changes (in permille-hours, all integer), and
    the verdict allows a ``slack``× band:

    - ``overstated``  — claims changes ``slack``× more often than
      observed (or claims changes, none ever seen): distrust lastmod,
      crawl on the observed schedule;
    - ``understated`` — changes ``slack``× more often than declared:
      the sitemap under-advertises, refetch sooner than it suggests;
    - ``consistent``  — inside the band: lastmod-based pruning is safe.

    Hosts under ``min_visits`` total observations return ``unjudged``
    (the min-docs discipline).  ``declared``: (host, changefreq string).
    One map-combinable host rollup + a broadcast dim join; integer
    arithmetic end to end.
    """
    freq = F.create_map(
        *[
            x
            for k, v in CHANGEFREQ_HOURS.items()
            for x in (F.lit(k), F.lit(v))
        ]
    )
    dec = declared.select(
        F.col(host_col).alias("__dhost"),
        (freq[F.lower(F.col("changefreq"))] * 1000)
        .cast("long")
        .alias("declared_hours_permille"),
    )
    roll = history.groupBy(host_col).agg(
        F.sum("n_visits").alias("n_visits"),
        F.sum("n_changed").alias("n_changes"),
        F.sum(F.col("interval_days") * F.col("n_visits")).alias("__obs_days"),
    )
    j = roll.join(
        F.broadcast(dec), roll[host_col] == F.col("__dhost")
    ).withColumn(
        "observed_hours_permille",
        F.when(
            F.col("n_changes") > 0,
            F.expr("(1000 * 24 * __obs_days) div n_changes"),
        ),
    )
    obs, decl = F.col("observed_hours_permille"), F.col(
        "declared_hours_permille"
    )
    verdict = (
        F.when(F.col("n_visits") < F.lit(min_visits), F.lit("unjudged"))
        .when(F.col("n_changes") == 0, F.lit("overstated"))
        .when(obs > F.lit(slack) * decl, F.lit("overstated"))
        .when(F.lit(slack) * obs < decl, F.lit("understated"))
        .otherwise(F.lit("consistent"))
    )
    return j.select(
        host_col,
        "n_visits",
        "n_changes",
        "observed_hours_permille",
        "declared_hours_permille",
        verdict.alias("verdict"),
    )


_PRIORITY = r"<priority>\s*([0-9.]+)\s*</priority>"


def parse_sitemaps_with_priority(
    sitemaps: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """:func:`parse_sitemaps` plus the protocol's ``<priority>`` field
    (sitemaps.org: 0.0–1.0, default 0.5) mapped onto the scheduler's
    integer ladder — the site's own crawl-order hint finally reaching
    the ``priority`` column everything downstream ranks by.

    ``priority_permille`` = round(value × 1000) (both engines parse the
    decimal string to the same IEEE double and round it the same way —
    the grid discipline); missing tag → the spec default 500.  The
    ladder mirrors the recrawl thresholds: ≥ 800 → level 0 (hot),
    ≥ 400 → level 1, else level 2 — so sitemap hints, staleness
    probabilities, and aging all speak the same ladder.  Same per-block
    isolation as loc/lastmod (a missing tag cannot shift the zip).
    """
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 1)
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            F.regexp_extract(b, _LOC, 1).alias("loc"),
            F.nullif(F.regexp_extract(b, _LASTMOD, 1), F.lit("")).alias(
                "lastmod"
            ),
            F.nullif(F.regexp_extract(b, _PRIORITY, 1), F.lit("")).alias(
                "prio"
            ),
        ),
    )
    d = (
        sitemaps.select(
            F.col(host_col).alias("host"), F.explode(entries).alias("e")
        )
        .filter(F.col("e.loc") != "")
        .select(
            "host",
            F.col("e.loc").alias("url"),
            F.to_timestamp("e.lastmod").alias("lastmod"),
            F.coalesce(
                F.round(F.col("e.prio").cast("double") * 1000).cast("long"),
                F.lit(500),
            ).alias("priority_permille"),
        )
    )
    return d.withColumn(
        "priority",
        F.when(F.col("priority_permille") >= 800, 0)
        .when(F.col("priority_permille") >= 400, 1)
        .otherwise(2)
        .cast("long"),
    )


def cross_host_sitemap_screen(
    declared: DataFrame,
    host_col: str = "host",
    sitemap_url_col: str = "sitemap_url",
) -> DataFrame:
    """declared + (sitemap_host, same_site, accepted) — the
    sitemaps.org CROSS-SUBMISSION rule, conservatively: a ``Sitemap:``
    line in host A's robots.txt may point at another host, but
    honoring arbitrary cross-host declarations lets any crawled site
    inject a victim's URL namespace into the frontier (sitemap
    poisoning).  The screen accepts a cross-host declaration only
    when both ends share the REGISTRABLE domain (eTLD+1 — www/cdn
    sharding is the legitimate case); everything else is annotated
    ``accepted = false`` for quarantine, never silently dropped.

    Scan-side: one regexp host extraction (port stripped,
    case-folded) + two registrable-domain expressions — no joins.
    """
    from ..functions.urlnorm import registrable_domain

    sm_host = F.lower(
        F.element_at(
            F.split(
                F.regexp_extract(
                    F.col(sitemap_url_col),
                    r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1,
                ),
                ":",
            ),
            1,
        )
    )
    out = declared.withColumn("sitemap_host", sm_host).withColumn(
        "same_site",
        registrable_domain(F.col(host_col))
        == registrable_domain(F.col("sitemap_host")),
    )
    return out.withColumn(
        "accepted", F.col("same_site") & (F.col("sitemap_host") != "")
    )


def render_sitemap_xml(entries: Column) -> Column:
    """Render an array<struct<loc, lastmod, priority_str>> to a
    canonical sitemap XML body — the export direction (the crawler's
    own published artifacts and replay fixtures derive their sitemaps
    FROM the catalog, so file and frontier can never disagree).  NULL
    lastmod/priority omit the tag (per-block isolation on the parse
    side makes that safe — that asymmetry is exactly what the parsers
    were built for).  Inverse of ``parse_sitemaps_with_priority``;
    the roundtrip is oracled."""
    item = lambda e: F.concat(
        F.lit("<url><loc>"), e["loc"], F.lit("</loc>"),
        F.coalesce(
            F.concat(F.lit("<lastmod>"), e["lastmod"], F.lit("</lastmod>")),
            F.lit(""),
        ),
        F.coalesce(
            F.concat(
                F.lit("<priority>"), e["priority_str"], F.lit("</priority>")
            ),
            F.lit(""),
        ),
        F.lit("</url>"),
    )
    return F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.array_join(F.transform(entries, item), ""),
        F.lit("</urlset>"),
    )
