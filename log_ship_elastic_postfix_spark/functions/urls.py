"""URL normalization + URL-keyed dedup — web-corpus pipeline ops.

A Common-Crawl-scale training pipeline dedups by canonical URL before
any content-based pass (it is the cheapest dedup signal: one narrow
projection + one hash exchange on a short string). These are pure
Catalyst expressions — JVM-side, codegen'd, no Python in the path —
mirroring how the reference treats the queue-id as the primary
identity key (/root/reference/lib/logship.js:321-329, qid = doc _id):
here the canonical URL plays that role per BASELINE.json (url is the
queue-id analog).

Normalization rules (the common canonicalization subset every major
crawl pipeline applies; each is independently testable):
  1. lowercase scheme + host
  2. strip default ports (:80 http, :443 https)
  3. drop the fragment (#…)
  4. drop tracking query params (utm_*, gclid, fbclid), keep the rest
     in original order
  5. collapse duplicate slashes in the path, strip a trailing slash
     (except the bare root)
  6. strip a leading "www." host label
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# host[:port] is everything between scheme:// and the first / ? #
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored so the '?' must occur BEFORE any '#': a '?' inside the
# fragment ('http://h/p#f?x=1') is fragment content, not a query, and
# rule 3 drops it entirely (the lazy [^#]*? prefix cannot cross a '#')
_QUERY_RE = r"^[^#]*?\?([^#]*)"

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("gclid", "fbclid", "msclkid", "mc_eid")


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host, port and leading www. stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":\d+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def url_registered_domain(url: Column) -> Column:
    """Last two host labels — the cheap registered-domain heuristic
    (a production pipeline swaps in the public-suffix list; the
    operator shape — narrow projection feeding a host-keyed groupBy —
    is identical)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_path(url: Column) -> Column:
    """Path with duplicate slashes collapsed and the trailing slash
    stripped (bare root '' stays '')."""
    p = F.regexp_extract(url, _PATH_RE, 1)
    p = F.regexp_replace(p, r"/{2,}", "/")
    return F.regexp_replace(p, r"(.)/$", "$1")


def url_query_normalized(url: Column) -> Column:
    """Query string with tracking params removed, original order kept;
    NULL when nothing survives."""
    q = F.regexp_extract(url, _QUERY_RE, 1)
    parts = F.split(q, "&")

    def _is_tracking(kv: Column) -> Column:
        key = F.split(kv, "=")[0]
        cond = F.lit(False)
        for p in _TRACKING_PREFIXES:
            cond = cond | key.startswith(p)
        for e in _TRACKING_EXACT:
            cond = cond | (key == e)
        return cond

    kept = F.filter(parts, lambda kv: (kv != "") & ~_is_tracking(kv))
    joined = F.array_join(kept, "&")
    return F.when(joined != "", joined)


def canonical_url(url: Column) -> Column:
    """Full canonical form: scheme://host/path[?query], per the module
    rules. Rows that do not look like absolute URLs come back NULL
    (callers route them to a reject/side output, the qid-less-line
    analog)."""
    scheme = url_scheme(url)
    port = F.regexp_extract(F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1)),
                            r":(\d+)$", 1)
    keep_port = F.when(
        (port != "") & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443")),
        F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    q = url_query_normalized(url)
    out = F.concat(
        scheme, F.lit("://"), url_host(url), keep_port,
        F.when(url_path(url) == "", F.lit("/")).otherwise(url_path(url)),
        F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit("")))
    return F.when(scheme != "", out)


def dedup_by_canonical_url(df: DataFrame, *, url_col: str = "url",
                           order_col: str | None = None) -> DataFrame:
    """One keeper row per canonical URL (first by ``order_col``, else
    min raw url — deterministic). Scale shape: the only exchange is
    the groupBy on the canonical-url hash; payload columns ride the
    exchange once (at 100 TB prefer the two-step id-assignment in
    operators.dedup.dedup_assignments — same key, ids only)."""
    cu = canonical_url(F.col(url_col)).alias("canonical_url")
    keyed = df.select(cu, "*").filter(F.col("canonical_url").isNotNull())
    order = F.col(order_col) if order_col else F.col(url_col)
    keep = F.min(F.struct(order.alias("_o"),
                          *[F.col(c) for c in df.columns])).alias("_keep")
    agg = keyed.groupBy("canonical_url").agg(
        keep, F.count(F.lit(1)).alias("n_dups"))
    return agg.select(
        "canonical_url",
        *[F.col(f"_keep.{c}").alias(c) for c in df.columns],
        "n_dups")
