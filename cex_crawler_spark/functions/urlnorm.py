"""URL canonicalization — the engine's identity function for frontier rows.

The reference keys the URL-seen set on ad-hoc per-exchange forms:
md5(full_url) (/root/reference/exchange/bybit.py:121), last path segment
(/root/reference/exchange/lbank.py:53), article codes
(/root/reference/exchange/binance.py:235), with scattered trailing-slash
and relative-URL fixups (/root/reference/exchange/bingx.py:57-58,173-174).
The engine replaces all of that with ONE canonical form:

    scheme://host[:port]/path?sorted-non-tracking-query

rules: lowercase scheme+host; drop default ports (:80 http, :443 https);
strip the fragment; strip trailing slashes from the path; drop tracking
params (utm_*, ref, fbclid, gclid); sort surviving query params.

Two implementations that MUST agree byte-for-byte (tested):

- :func:`canonicalize_url` — a pure Catalyst column expression
  (regexp + higher-order array functions; whole-stage-codegen friendly,
  no Python in the hot path);
- :func:`py_canonicalize_url` — plain Python for the single-node
  replayer oracle.

Identity key: ``url_hash = xxhash64(canonical_url)`` (64-bit, shuffle-
friendly; see functions/hashing.py for the replayer-side twin).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import xxh64_str

_URL_RX = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
_TRACKING_RX = r"^(utm_[^=]*|ref|fbclid|gclid)(=.*)?$"


def canonicalize_url(url: Column) -> Column:
    """Canonical URL as a single Catalyst expression (no Python UDF)."""
    scheme = F.lower(F.regexp_extract(url, _URL_RX, 1))
    host = F.lower(F.regexp_extract(url, _URL_RX, 2))
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(url, _URL_RX, 3), "/+$", "")
    query = F.regexp_replace(F.regexp_extract(url, _URL_RX, 4), r"^\?", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(_TRACKING_RX),
    )
    qstr = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.sort_array(params), "&")),
    ).otherwise(F.lit(""))
    # non-URL input (regex no-match → empty scheme) canonicalizes to "",
    # matching the Python twin
    return F.when(scheme == "", F.lit("")).otherwise(
        F.concat(scheme, F.lit("://"), host, path, qstr)
    )


def url_hash(canonical: Column) -> Column:
    """64-bit identity key of a canonical URL (Spark built-in xxhash64)."""
    return F.xxhash64(canonical)


def with_canonical_url(df, url_col: str = "url"):
    """Append ``canonical_url`` and ``url_hash`` columns."""
    c = canonicalize_url(F.col(url_col))
    return df.withColumn("canonical_url", c).withColumn(
        "url_hash", F.xxhash64(F.col("canonical_url"))
    )


# ---------------------------------------------------------------- python twin

_PY_URL_RX = re.compile(_URL_RX)
_PY_TRACKING_RX = re.compile(_TRACKING_RX)


def py_canonicalize_url(url: str) -> str:
    """Replayer-side canonicalization; must equal :func:`canonicalize_url`."""
    m = _PY_URL_RX.match(url)
    if not m:
        return ""
    scheme = (m.group(1) or "").lower()
    host = (m.group(2) or "").lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = re.sub(r"/+$", "", m.group(3) or "")
    query = (m.group(4) or "").lstrip("?")
    params = [p for p in query.split("&") if p and not _PY_TRACKING_RX.match(p)]
    qstr = "?" + "&".join(sorted(params)) if params else ""
    return f"{scheme}://{host}{path}{qstr}"


def py_url_hash(canonical: str) -> int:
    return xxh64_str(canonical)


# ------------------------------------------------------- registrable domain

# Common multi-label public suffixes (heuristic subset of the PSL — the
# full list is data, not code, and would load the same way as a broadcast
# dim; these cover the bulk of real crawl traffic).  A host ending in one
# of these keeps THREE labels, otherwise two.
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za", "com.ar", "com.tr",
]


def registrable_domain(host: Column) -> Column:
    """eTLD+1 — the per-SITE key politeness and trap screens group by
    (per-host grouping over-splits sites that shard across subdomains;
    per-TLD under-splits everything).  Pure Catalyst: label split +
    suffix membership against a literal array; production swaps the
    constant list for the full Public Suffix List as a broadcast dim
    without touching callers."""
    labels = F.split(F.lower(host), r"\.")
    n = F.size(labels)
    # try_element_at: when() does not short-circuit evaluation, so a bare
    # single-label host (localhost) would throw on element_at(-2).
    last2 = F.concat_ws(
        ".", F.try_element_at(labels, F.lit(-2)), F.try_element_at(labels, F.lit(-1))
    )
    take3 = F.array_contains(
        F.array(*[F.lit(s) for s in MULTI_SUFFIXES]), last2
    ) & (n >= 3)
    return F.when(
        take3,
        F.concat_ws(".", F.try_element_at(labels, F.lit(-3)), last2),
    ).otherwise(F.when(n >= 2, last2).otherwise(F.lower(host)))
