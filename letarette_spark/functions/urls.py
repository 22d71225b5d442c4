"""URL canonicalization + URL-keyed dedup — web-corpus pipeline hygiene.

Crawled corpora carry the same resource under many spellings; training
pipelines canonicalize before URL-level dedup (the Common Crawl / WARC
convention). ``canonical_url`` applies the standard normalizations, each
one RFC-3986-safe or an explicit documented policy:

  - trim surrounding whitespace
  - scheme and host lowercased (RFC 3986 §6.2.2.1)
  - trailing dot stripped from the host (DNS root label)
  - default port dropped (:80 for http, :443 for https — §6.2.3)
  - fragment removed (never sent to the server)
  - empty path -> "/" (§6.2.3)
  - consecutive slashes in the path collapsed (policy, not RFC — crawl
    canonicalizers do this; documented deviation for proxies that treat
    // as significant)
  - tracking parameters dropped: utm_*, gclid, fbclid, msclkid, ref
  - remaining query parameters sorted bytewise (policy: parameter order
    is almost never semantic)
  - empty query string dropped ("?" alone)

Everything is pure JVM column arithmetic (regexp + array ops inside
whole-stage codegen — zero Python, zero UDF), with an exact ANSI-SQL twin
(driver gates ``url_canonical`` / ``url_dup_groups``). userinfo
(user:pass@) and %-encoding re-normalization are out of scope and pass
through untouched, as do bracketed IPv6-literal hosts (documented
boundaries). NULL URLs canonicalize to NULL and are never grouped or
deduplicated — a row without a URL is not a duplicate of anything.

Reference relation: beyond-reference training-data operator; companions
functions/html.py (link harvest produces the URLs this canonicalizes) and
functions/dedup.py (content-level dedup after URL-level dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# parameters dropped before sorting: the well-known cross-site trackers
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (see module docstring).
    Non-URL strings (no scheme://host) come back trimmed but otherwise
    untouched — canonicalization never destroys data it doesn't
    understand."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    # userinfo passes through untouched (case-significant credentials);
    # host[:port] is everything after the last '@'
    userinfo = F.regexp_extract(authority, "^(.*@)", 1)
    hostport = F.regexp_extract(authority, "([^@]*)$", 1)
    # lowercase host, strip DNS-root trailing dot
    host = F.regexp_replace(
        F.lower(F.regexp_extract(hostport, "^([^:]*)", 1)), "[.]$", ""
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    port_part = F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port))
    raw_path = F.regexp_extract(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1)
    path = F.regexp_replace(
        F.when(raw_path == "", F.lit("/")).otherwise(raw_path), "/{2,}", "/"
    )
    query = F.regexp_extract(nofrag, "[?](.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query_part = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    canon = F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path, query_part
    )
    # bracketed (IPv6-literal) hosts would be mangled by the ':'-based
    # host/port split — pass them through untouched (same never-destroy
    # policy as non-URLs; documented boundary)
    return (
        F.when(scheme == "", u)
        .when(hostport.startswith("["), u)
        .otherwise(canon)
    )


def canonicalize(
    df: DataFrame, url_col: str = "url", out_col: str = "canon"
) -> DataFrame:
    """df + one canonical-URL column. One scan, zero shuffle."""
    return df.withColumn(out_col, canonical_url(url_col))


def url_dup_groups(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(canon, n_variants, n_docs, keep_id) — groups of rows whose URLs
    canonicalize identically: distinct surface spellings, total rows, and
    the deterministic survivor (min id). One partial-aggregable groupBy
    on the canonical string. NULL-URL rows are excluded — groupBy would
    otherwise collapse every URL-less doc into one bogus group."""
    return (
        canonicalize(df.filter(F.col(url_col).isNotNull()), url_col)
        .groupBy("canon")
        .agg(
            F.countDistinct(url_col).alias("n_variants"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep exactly one row per canonical URL (the min id) — the URL-level
    dedup pass that precedes content-level dedup in a crawl pipeline.
    Same keep-first shape as dedup.exact_duplicates. Rows with a NULL
    URL are all kept: no URL means nothing to be a duplicate of."""
    keep = url_dup_groups(df, url_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.filter(F.col(url_col).isNotNull()).join(
        keep, id_col, "left_semi"
    ).unionByName(df.filter(F.col(url_col).isNull()))
