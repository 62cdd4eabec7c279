"""URL column functions for web-corpus curation.

The standard first-pass dedup key for a web crawl is the NORMALIZED
URL (C4 deduplicates by URL before any content pass), and the standard
source-mix cap is per registrable domain (CCNet-style). These are the
column expressions for both: everything is native Spark SQL
(``parse_url`` is a JVM expression) — no UDFs, one scan, codegen'd.

Scale shape: normalization is a narrow projection; URL dedup is the
digest-groupBy shape of ``operators.dedup.dedup_exact_hashed`` on the
normalized string; domain caps ride ``operators.sampling.
quota_by_group`` (one group-partitioned window). Nothing here
shuffles anything wider than (key, id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import _c

# Tracking parameters stripped by normalize_url: the industry-common
# click/campaign identifiers that fragment otherwise-identical URLs.
# Deliberately precision-biased: bare "ref" is NOT here — on many
# sites (github blob ?ref=branch, storefront ?ref=product) it selects
# CONTENT, and a dedup key that merges distinct pages silently drops
# data; pass a custom list to strip site-specific params.
TRACKING_PARAMS = [
    "utm_source", "utm_medium", "utm_campaign", "utm_term",
    "utm_content", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
    "ref_src",
]

# Common multi-label public suffixes for the registrable-domain
# heuristic. A full implementation carries the public-suffix list as a
# broadcast lookup table; these cover the high-traffic two-label TLDs.
_TWO_LABEL_SUFFIXES = [
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tw", "com.sg", "co.za", "com.ar",
]


def url_host(url_col: Column | str) -> Column:
    """Lowercased host of a URL (NULL for non-URLs)."""
    return F.lower(F.try_parse_url(_c(url_col), F.lit("HOST")))


def url_registrable_domain(url_col: Column | str) -> Column:
    """Registrable-domain heuristic: the last two host labels, or the
    last three when the trailing two are a known multi-label public
    suffix (``a.b.co.uk`` → ``b.co.uk``; ``www.example.com`` →
    ``example.com``). An IPv4-literal host is returned WHOLE — its
    octets are not registrable labels, and truncating would pool
    unrelated IP-hosted servers under one "domain". NULL for
    non-URLs. This is the CCNet-style grouping key for per-source
    caps; swap in a broadcast public-suffix table for exactness at
    the tail."""
    host = url_host(url_col)
    is_ipv4 = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_two_label_suffix = last2.isin(_TWO_LABEL_SUFFIXES)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(is_ipv4, host)
        .when(n <= 2, host)
        .when(is_two_label_suffix & (n >= 3), last3)
        .otherwise(last2)
    )


def normalize_url(
    url_col: Column | str,
    strip_params: list[str] | None = None,
) -> Column:
    """Canonical URL: lowercase scheme+host, default ports stripped,
    fragment dropped, tracking query params removed and the rest
    SORTED (param order never distinguishes two fetches of the same
    page), trailing path slash stripped. Non-URL strings (no
    parseable host) pass through trimmed; NULL stays NULL — dedup
    keys built on this must handle NULL/blank themselves (see
    ``dedup_by_url``'s per-row sentinel).

    Built entirely from ``parse_url`` + regex/array expressions; the
    param filter binds the split array to a projected alias implicitly
    via a single expression tree (no HOF-inline trap: the array child
    is the cheap ``split``, not a tokenize chain).
    """
    # the filter below compares LOWERCASED param names, so lowercase the
    # caller's list once here — 'UTM_Source' must strip the same as
    # 'utm_source' (TRACKING_PARAMS only worked by being all-lowercase)
    params = [
        p.lower()
        for p in (strip_params if strip_params is not None else TRACKING_PARAMS)
    ]
    raw = F.trim(_c(url_col))
    scheme = F.lower(F.regexp_extract(raw, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    host = F.lower(F.try_parse_url(raw, F.lit("HOST")))
    # AUTHORITY = host[:port]; keep a non-default port, drop :80/:443
    authority = F.lower(F.try_parse_url(raw, F.lit("AUTHORITY")))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    port_part = F.when(
        (port != "") & ~default_port, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.coalesce(F.try_parse_url(raw, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/+$", "")
    query = F.try_parse_url(raw, F.lit("QUERY"))
    pairs = F.array_sort(
        F.filter(
            F.split(F.coalesce(query, F.lit("")), "&"),
            lambda p: (p != "")
            & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(params),
        )
    )
    query_part = F.when(
        F.size(pairs) > 0, F.concat(F.lit("?"), F.concat_ws("&", pairs))
    ).otherwise(F.lit(""))
    rebuilt = F.concat(
        scheme, F.lit("://"), host, port_part, path, query_part
    )
    return F.when(host.isNotNull() & (scheme != ""), rebuilt).otherwise(raw)


def dedup_by_url(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """C4-style URL dedup: keep the min-id row per NORMALIZED URL —
    delegated to ``dedup_exact_hashed`` (ONE definition of the
    digest-groupBy dedup shape; the shuffle carries (md5(key), id),
    never page bodies).

    The key is TOTAL: a row whose URL is NULL or blank gets a
    per-row sentinel key (``#no-url#<id>``), so URL-less documents
    are all KEPT rather than silently vanishing on a NULL join key or
    collapsing into one blank-URL survivor."""
    # call-time import: operators.dedup itself imports functions.text,
    # so a module-level import here would cycle
    from ..operators.dedup import dedup_exact_hashed

    norm = normalize_url(url_col)
    key = F.when(
        norm.isNull() | (F.trim(norm) == ""),
        F.concat(F.lit("#no-url#"), F.col(id_col).cast("string")),
    ).otherwise(norm)
    return dedup_exact_hashed(
        df.withColumn("__u", key), "__u", id_col
    ).drop("__u")


def domain_quota(
    df: DataFrame,
    url_col: str,
    id_col: str,
    quota: int,
    priority_col: str | None = None,
    domain_col: str = "domain",
) -> DataFrame:
    """Cap rows per registrable domain (CCNet-style source-mix
    control): attaches ``domain_col`` and keeps at most ``quota`` rows
    per domain via ``quota_by_group`` (priority order when given, else
    the deterministic md5 draw). Non-URLs group under the empty-string
    domain and are capped together. ``domain_col`` is configurable so
    composing pipelines can use a private name instead of clobbering a
    pre-existing ``domain`` column on crawl metadata (raise if the
    chosen name already exists)."""
    from ..operators.sampling import quota_by_group

    if domain_col in df.columns:
        raise ValueError(
            f"column {domain_col!r} already exists on the input — pass a "
            "different domain_col instead of silently overwriting it"
        )
    with_domain = df.withColumn(
        domain_col, F.coalesce(url_registrable_domain(url_col), F.lit(""))
    )
    return quota_by_group(with_domain, domain_col, id_col, quota, priority_col)
