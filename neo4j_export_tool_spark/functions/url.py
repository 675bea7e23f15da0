"""URL canonicalization for web-corpus pipelines.

Common-Crawl-style corpora key everything on ``url`` (the input_hint's
per-row identity), and the same page arrives under many spellings —
scheme/host case, default ports, ``www.``, fragment-only differences,
tracking parameters, shuffled query order.  Canonicalization is the
dedup/join key normalizer applied before exact dedup, URL-level joins,
and incremental re-crawl diffing.

Implementation notes: pure column expressions (regexp chain + array
ops), no UDF, no shuffle — a linear map like q50.  All regexes stay in
the Java-regex ∩ RE2 intersection (the `functions/scrub.py` discipline)
so a DuckDB twin evaluates the SAME patterns and the driver gate can be
hash-exact.  The rules (fragment drop, case-fold scheme/host, strip
userinfo / ``www.`` / default ports, trailing-slash collapse, tracking
param removal, stable query-param sort) follow the conservative subset
of RFC 3986 §6 normalization plus the de-facto tracking-param hygiene
every crawler applies; semantics-changing steps (percent-decoding, dot
segment resolution) are deliberately omitted.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# query params that never change page identity
_TRACKING_KEYS = ("gclid", "fbclid", "msclkid", "igshid", "mc_cid", "mc_eid")


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL (pure column
    exprs).  Non-URL strings (no ``scheme://``) canonicalize to NULL —
    failure is data, matching the codec operators' convention."""
    base = F.regexp_replace(url, "#.*", "")  # fragment never reaches keys
    scheme = F.lower(
        F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    authority = F.regexp_extract(
        base, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    authority = F.regexp_replace(authority, "^[^@]*@", "")  # drop userinfo
    host = F.lower(F.regexp_extract(authority, "^([^:]*)", 1))
    host = F.regexp_replace(host, "^www\\.", "")
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit("80")))
        & ~((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    path = F.regexp_extract(
        base, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)", 1
    )
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(base, "\\?(.*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~F.regexp_extract(p, "^([^=]*)", 1).isin(*_TRACKING_KEYS),
        )
    )
    qcanon = F.array_join(params, "&")
    return F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(
                F.lit("")
            ),
        )
    )


def canonical_url_oracle_sql(url_expr: str) -> str:
    """The DuckDB twin of :func:`canonical_url_col` — same regexes, same
    rule order — so gates over any URL column can be hash-exact."""
    base = f"regexp_replace({url_expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    auth = (
        f"regexp_replace(regexp_extract({base}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '^[^@]*@', '')"
    )
    host = f"regexp_replace(lower(regexp_extract({auth}, '^([^:]*)', 1)), '^www\\.', '')"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    keep_port = (
        f"({port} != '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443'))"
    )
    path = (
        f"regexp_replace(regexp_extract({base}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?]*)', 1), '/+$', '')"
    )
    path = f"(CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
    query = f"regexp_extract({base}, '\\?(.*)', 1)"
    tracking = ", ".join(f"'{k}'" for k in _TRACKING_KEYS)
    qcanon = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p != '' AND NOT starts_with(p, 'utm_') "
        f"AND NOT regexp_extract(p, '^([^=]*)', 1) IN ({tracking}))), '&')"
    )
    return (
        f"(CASE WHEN {scheme} = '' THEN NULL ELSE "
        f"{scheme} || '://' || {host} || "
        f"(CASE WHEN {keep_port} THEN ':' || {port} ELSE '' END) || {path} || "
        f"(CASE WHEN {qcanon} != '' THEN '?' || {qcanon} ELSE '' END) END)"
    )
