"""robots.txt parsing — north-rule politeness input.

The reference ignores robots.txt entirely (it impersonates browsers —
/root/reference/exchange/base_scraper.py:60-141); the engine treats it
as first-class politeness input: a host's robots.txt text parses to an
array of Disallow path-prefixes (for `User-agent: *` sections), which
the scheduler applies as the F-robots terminal filter
(operators/politeness.py).

Parsing is a single Catalyst expression (multiline regex), so a
100M-host robots table parses as a scan-side projection.  Two tiers:

- the simplified `Disallow:`-prefix parser (`parse_robots_disallow`)
  feeding the scheduler's startswith filter — cheap enough for the
  10^10-row frontier hot path;
- the full RFC 9309 matcher (`parse_robots_rules` +
  `robots_pattern_regex` + `robots_allowed`): Allow/Disallow with `*`
  wildcards and `$` end-anchors, longest-pattern-wins, Allow beats
  Disallow on length ties — for the hosts whose robots actually use
  the full grammar (rule→regex translation happens ONCE on the host
  dim; only the per-path regexp match runs on frontier rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DISALLOW_RX = r"(?m)^[Dd]isallow:[ \t]*(\S+)"


def parse_robots_disallow(robots_txt: Column) -> Column:
    """array<string> of Disallow prefixes from a robots.txt body.

    Empty `Disallow:` lines (allow-all markers) don't match — correct,
    since an empty prefix would block everything under startswith.
    """
    return F.array_distinct(
        F.regexp_extract_all(robots_txt, F.lit(_DISALLOW_RX), 1)
    )


def robots_txt_for_policy(disallow_prefixes: Column) -> Column:
    """Render prefixes back to a robots.txt body (round-trip testing)."""
    return F.concat(
        F.lit("User-agent: *\n"),
        F.array_join(
            F.transform(
                disallow_prefixes, lambda p: F.concat(F.lit("Disallow: "), p)
            ),
            "\n",
        ),
    )


_CRAWL_DELAY_RX = r"(?m)^[Cc]rawl-[Dd]elay:[ \t]*([0-9]+(?:\.[0-9]+)?)"


def parse_robots_crawl_delay(robots_txt: Column) -> Column:
    """Crawl-delay seconds from a robots.txt body (double; null when no
    directive present).  When multiple lines match, the STRICTEST (max)
    wins — the safe interpretation for a politeness input.  Feeds the
    scheduler's ``min_delay_ms`` budget:
    ``greatest(min_delay_ms, crawl_delay * 1000)``.

    Same single-Catalyst-expression contract as
    :func:`parse_robots_disallow` — a 100M-host robots table parses as
    a scan-side projection.
    """
    return F.array_max(
        F.transform(
            F.regexp_extract_all(robots_txt, F.lit(_CRAWL_DELAY_RX), 1),
            lambda s: s.cast("double"),
        )
    )


def effective_host_policy(host_policy, robots, agent=None):
    """Fold raw robots.txt bodies into the host-policy dim table.

    ``robots``: ``(host, robots_txt)`` — one fetched robots body per
    host (hosts absent from it keep their configured policy untouched).
    The result is the SAME schema as ``host_policy``, with

    - ``robots_disallow`` ∪ parsed ``Disallow:`` prefixes, and
    - ``min_delay_ms`` = greatest(configured floor, Crawl-delay × 1000)

    so the scheduler (operators/politeness.py) needs no code change:
    robots enforcement stays a single broadcast join against a
    still-tiny dim (one row per host — even 100M hosts is a few GB,
    and the parse is a scan-side projection on that dim, not on the
    10^10-row frontier).

    ``agent``: pass the crawler's product token to ALSO attach a
    ``robots_rules`` column — the RFC 9309 rule set governing that
    agent (:func:`parse_robots_groups` → :func:`select_robots_rules`,
    still dim-side).  The scheduler detects the column and switches
    those hosts to full wildcard/anchor evaluation (strict-robots
    tier); hosts without a body stay NULL → prefix tier.
    """
    parsed = robots.select(
        "host",
        parse_robots_disallow(F.col("robots_txt")).alias("__dis"),
        parse_robots_crawl_delay(F.col("robots_txt")).alias("__delay_s"),
        *(
            [
                translate_robots_rules(
                    select_robots_rules(
                        parse_robots_groups(F.col("robots_txt")),
                        F.lit(agent),
                    )
                ).alias("robots_rules")
            ]
            if agent is not None
            else []
        ),
    )
    return (
        host_policy.join(parsed, "host", "left")
        .withColumn(
            "robots_disallow",
            F.when(
                F.col("__dis").isNotNull(),
                F.array_union(F.col("robots_disallow"), F.col("__dis")),
            ).otherwise(F.col("robots_disallow")),
        )
        .withColumn(
            # greatest() skips nulls → a body with no Crawl-delay (or a
            # host with no body) keeps the configured floor.
            "min_delay_ms",
            F.greatest(
                F.col("min_delay_ms"),
                F.ceil(F.col("__delay_s") * 1000).cast("long"),
            ),
        )
        .drop("__dis", "__delay_s")
    )


_RULE_RX = r"(?m)^[ \t]*([Aa]llow|[Dd]isallow):[ \t]*(\S+)"


def parse_robots_rules(robots_txt: Column) -> Column:
    """array<struct<allow:boolean, pattern:string>> — every Allow /
    Disallow rule in the body (RFC 9309 §2.2.2).  Empty-path
    `Disallow:` lines (allow-all markers) produce no rule, matching the
    prefix parser's behavior.  Scan-side: two regexp_extract_all passes
    zipped positionally (the extract_links shape)."""
    kinds = F.regexp_extract_all(robots_txt, F.lit(_RULE_RX), 1)
    pats = F.regexp_extract_all(robots_txt, F.lit(_RULE_RX), 2)
    return F.transform(
        F.arrays_zip(kinds.alias("k"), pats.alias("p")),
        lambda s: F.struct(
            (F.lower(s["k"]) == "allow").alias("allow"),
            s["p"].alias("pattern"),
        ),
    )


def robots_pattern_regex(pattern: Column) -> Column:
    """Translate one RFC 9309 path pattern to an anchored regex:
    a trailing ``$`` anchors end-of-path, ``*`` matches any char
    sequence, everything else is literal (metachars escaped).  Pure
    Catalyst — translation runs once per RULE on the host dim, so the
    frontier-side cost is only the match itself."""
    anchored = pattern.rlike(r"\$$")
    body = F.regexp_replace(pattern, r"\$$", "")
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


def translate_robots_rules(rules: Column) -> Column:
    """``array<struct<allow,pattern,rex>>`` — rules with the
    pattern→regex translation MATERIALIZED.  Run this on the host dim
    (one row per host): the translation is a chain of string rewrites
    per rule, fine once per host but real work at per-frontier-row ×
    per-rule scale.  :func:`robots_best_rule` and the scheduler's
    strict tier detect the ``rex`` field and skip re-translating."""
    return F.transform(
        rules,
        lambda r: F.struct(
            r["allow"].alias("allow"),
            r["pattern"].alias("pattern"),
            robots_pattern_regex(r["pattern"]).alias("rex"),
        ),
    )


def robots_best_rule(
    path: Column, rules: Column, pretranslated: bool = False
) -> Column:
    """The winning RFC 9309 rule for ``path`` against
    ``parse_robots_rules`` output, as ``struct<l:int, a:int,
    p:string>`` (pattern length, allow as 0/1, pattern) — or NULL when
    no rule matches.  Among matching rules the LONGEST pattern wins; at
    equal length Allow beats Disallow.  (If two distinct patterns tie
    on both length and verdict — a case the RFC leaves open — the
    lexicographically larger pattern is deemed the winner in both the
    engine and the oracle, keeping the choice deterministic.)

    One array expression per row: filter rules by regexp match, take
    array_max over (length, allow, pattern) structs — struct ordering
    is field-by-field, which is exactly the precedence list.
    ``pretranslated=True`` matches against the rules' materialized
    ``rex`` field (:func:`translate_robots_rules`) instead of
    re-deriving the regex per row — the form the frontier hot path
    must use.
    """
    if pretranslated:
        rex = lambda r: r["rex"]  # noqa: E731
    else:
        rex = lambda r: robots_pattern_regex(r["pattern"])  # noqa: E731
    return F.array_max(
        F.transform(
            F.filter(
                rules,
                lambda r: F.regexp_like(path, rex(r)),
            ),
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"),
                r["allow"].cast("int").alias("a"),
                r["pattern"].alias("p"),
            ),
        )
    )


def robots_allowed(
    path: Column, rules: Column, pretranslated: bool = False
) -> Column:
    """RFC 9309 §2.2.2 decision for ``path``: verdict of the
    :func:`robots_best_rule` winner; no matching rule → allowed."""
    best = robots_best_rule(path, rules, pretranslated=pretranslated)
    return F.when(best.isNull(), F.lit(True)).otherwise(best["a"] == 1)


_UA_RX = r"(?m)^[Uu]ser-[Aa]gent:[ \t]*(\S+)"
# A group boundary is a User-agent line whose PREVIOUS line is not one
# (consecutive User-agent lines share one rule block — RFC 9309 §2.2.1).
# Java regex (Spark-side) supports the lookahead; the DuckDB oracle
# reconstructs groups structurally (line numbers + lag window) instead.
_GROUP_BOUNDARY_RX = (
    r"(?m)^((?![Uu]ser-[Aa]gent:)[^\n]*)\n(?=[Uu]ser-[Aa]gent:)"
)
_GROUP_SEP = "\x01"


def parse_robots_groups(robots_txt: Column) -> Column:
    """``array<struct<agents:array<string>, rules:...>>`` — RFC 9309
    §2.2.1 groups: each is the consecutive ``User-agent:`` lines (one
    start-group set) plus the rules that follow until the next group.

    Split point = a User-agent line not preceded by another (a marker
    char is injected there, then one `split`); each segment yields its
    lowercased agent tokens and its :func:`parse_robots_rules` output.
    A headerless preamble (rules before any User-agent line) becomes a
    group with zero agents — never selected, per the RFC's
    undefined-record guidance.  Still a single scan-side expression on
    the host dim."""
    marked = F.regexp_replace(
        robots_txt, _GROUP_BOUNDARY_RX, "$1\n" + _GROUP_SEP
    )
    return F.transform(
        F.split(marked, _GROUP_SEP),
        lambda seg: F.struct(
            F.transform(
                F.regexp_extract_all(seg, F.lit(_UA_RX), 1),
                lambda a: F.lower(a),
            ).alias("agents"),
            parse_robots_rules(seg).alias("rules"),
        ),
    )


def select_robots_rules(groups: Column, agent: Column) -> Column:
    """The rule set governing ``agent`` per RFC 9309 §2.2.1: the union
    of every group naming the agent (case-insensitive exact product
    token — multiple groups for one agent MERGE); if none names it,
    the union of the ``*`` groups; if neither exists, no rules (then
    :func:`robots_allowed` allows everything).  Feed the result
    straight to :func:`robots_allowed` / :func:`robots_best_rule`."""
    mine = F.filter(
        groups, lambda g: F.array_contains(g["agents"], F.lower(agent))
    )
    star = F.filter(
        groups, lambda g: F.array_contains(g["agents"], F.lit("*"))
    )
    chosen = F.when(F.size(mine) > 0, mine).otherwise(star)
    return F.flatten(F.transform(chosen, lambda g: g["rules"]))


_SITEMAP_RX = r"(?m)^[Ss]itemap:[ \t]*(\S+)"


def parse_robots_sitemaps(robots_txt: Column) -> Column:
    """array<string> of Sitemap: URLs from a robots.txt body — the
    discovery channel that closes the loop robots → sitemap fetch →
    sources/sitemap.parse_sitemaps → frontier seed.  Per RFC 9309 §2.3
    the directive is user-agent-independent (can appear anywhere in the
    file), so no section tracking is needed.  Same scan-side
    single-expression contract as the other parsers here."""
    return F.array_distinct(
        F.regexp_extract_all(robots_txt, F.lit(_SITEMAP_RX), 1)
    )


def robots_refetch_due(
    robots_meta: DataFrame,
    now: str,
    ttl_hours: int = 24,
    error_ttl_hours: int = 1,
) -> DataFrame:
    """Robots-cache staleness (RFC 9309 §2.4: cache at most 24 hours
    unless the server says otherwise): which hosts' robots.txt must be
    re-fetched before their URLs are scheduled this round.

    ``robots_meta``: ``(host, fetched_at timestamp, fetch_ok boolean)``
    — the robots fetch log the catalog keeps beside the policy dim.
    Failed fetches re-try on the short ``error_ttl_hours`` (a flaky
    robots server must not freeze a host's rules for a day), successes
    age out at ``ttl_hours``.  ``now`` is an explicit watermark string
    — never wall-clock (SURVEY §2.10 determinism).

    Returns ``(host, fetched_at, fetch_ok, age_s, refetch_due)`` —
    dim-sized scan-side arithmetic; the refetch itself is a handful of
    URLs prepended to the round's fetch batch, and hosts with a fresh
    body keep their parsed rules untouched.
    """
    now_ts = F.to_timestamp(F.lit(now))
    age = now_ts.cast("long") - F.col("fetched_at").cast("long")
    ttl = F.when(
        F.col("fetch_ok"), F.lit(ttl_hours * 3600)
    ).otherwise(F.lit(error_ttl_hours * 3600))
    return robots_meta.select(
        "host",
        "fetched_at",
        "fetch_ok",
        age.alias("age_s"),
        (age >= ttl).alias("refetch_due"),
    )


def robots_policy_delta(
    frontier,
    old_policy,
    new_policy,
    host_col: str = "host",
    url_col: str = "url",
):
    """Verdict delta after a robots refetch — the action side of the
    cache-TTL screen (robots_refetch_due): when a host's rules change,
    the standing frontier's verdicts are stale in BOTH directions.
    ``newly_blocked`` URLs must stop being scheduled (their robots pass
    was granted under the old rules); ``newly_allowed`` URLs were
    prefix-blocked at enqueue time and deserve a requeue (the
    plans/driver.requeue un-see path is the committing twin of this
    projection).

    Both policies are (host, robots_disallow array) dims riding ONE
    broadcast join each; the verdicts are the scheduler's own scan-side
    prefix ``exists`` — per-row work is two bounded array scans, no
    shuffle beyond the broadcasts.  Returns the frontier annotated with
    (old_blocked, new_blocked, delta) where delta ∈ {'newly_blocked',
    'newly_allowed', NULL}.
    """
    from pyspark.sql import functions as F

    def _blocked(policy, flag):
        return policy.select(
            F.col(host_col).alias(f"__h_{flag}"),
            F.col("robots_disallow").alias(f"__dis_{flag}"),
        )

    path = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    d = (
        frontier.join(
            F.broadcast(_blocked(old_policy, "old")),
            frontier[host_col] == F.col("__h_old"),
            "left",
        )
        .join(
            F.broadcast(_blocked(new_policy, "new")),
            frontier[host_col] == F.col("__h_new"),
            "left",
        )
        .withColumn("__path", path)
    )
    def _hit(col):
        return F.coalesce(
            F.exists(F.col(col), lambda p: F.startswith(F.col("__path"), p)),
            F.lit(False),
        )
    return (
        d.withColumn("old_blocked", _hit("__dis_old"))
        .withColumn("new_blocked", _hit("__dis_new"))
        .withColumn(
            "delta",
            F.when(
                ~F.col("old_blocked") & F.col("new_blocked"),
                F.lit("newly_blocked"),
            ).when(
                F.col("old_blocked") & ~F.col("new_blocked"),
                F.lit("newly_allowed"),
            ),
        )
        .drop("__h_old", "__h_new", "__dis_old", "__dis_new", "__path")
    )


def render_robots_txt(
    disallow_prefixes: Column,
    crawl_delay_s: Column | None = None,
    sitemap_urls: Column | None = None,
) -> Column:
    """Render a host's full policy to a robots.txt body — the export
    direction (config-as-code: the crawler's own staging hosts and the
    replay fixtures get their robots files FROM the policy table, so
    the file and the scheduler can never disagree).  Canonical layout:
    one ``User-agent: *`` group, Disallow lines in the given array
    order, optional ``Crawl-delay``, then ``Sitemap`` lines (the
    group-independent channel last, matching the convention).  The
    inverse of the three parsers above; the roundtrip is oracled."""
    parts = F.concat(
        F.lit("User-agent: *\n"),
        F.array_join(
            F.transform(
                disallow_prefixes, lambda p: F.concat(F.lit("Disallow: "), p)
            ),
            "\n",
        ),
    )
    if crawl_delay_s is not None:
        parts = F.concat(
            parts,
            F.coalesce(
                F.concat(
                    F.lit("\nCrawl-delay: "), crawl_delay_s.cast("string")
                ),
                F.lit(""),
            ),
        )
    if sitemap_urls is not None:
        parts = F.concat(
            parts,
            F.coalesce(
                F.nullif(
                    F.concat(
                        F.lit("\n"),
                        F.array_join(
                            F.transform(
                                sitemap_urls,
                                lambda u: F.concat(F.lit("Sitemap: "), u),
                            ),
                            "\n",
                        ),
                    ),
                    F.lit("\n"),
                ),
                F.lit(""),
            ),
        )
    return parts
