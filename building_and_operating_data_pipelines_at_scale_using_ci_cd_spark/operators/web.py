"""Web-corpus curation: URL canonicalization, registrable domains,
URL-level dedup, and deterministic per-domain caps.

Parity note: the reference (aws-samples
building-and-operating-data-pipelines-at-scale-using-ci-cd,
``spark.json`` cleansing/dedup steps) declares generic
junk-removal/dedup operators; this module extends the same curation
tier with the web-crawl hygiene a 100-TB training corpus needs
(C4 / CCNet / RefinedWeb-style URL normalization before dedup).

Scale design: every transform here is a pure Column expression —
map-only, whole-stage-codegen, zero Python, zero shuffle.  The only
shuffles are the ones the *caller* asks for (``url_dedup``'s groupBy on
the canonical URL, ``domain_cap``'s per-domain window), and both key on
high-cardinality values (canonical URL / registrable domain) so they
partition evenly; a pathological single mega-domain in ``domain_cap``
is exactly the skew case the window tolerates because the cap is a
row_number early-exit per partition, not a sort of the whole corpus.

Cross-engine determinism: components are extracted with regexes (not
``parse_url``) so a DuckDB oracle can mirror every step byte-for-byte;
the per-domain cap orders by the md5-derived ``portable_hash`` so the
kept set is identical in any engine with md5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import portable_hash

# Query parameters that never change page identity (analytics /
# click-tracking); stripped before the param sort.  The regex form is
# compiled once into the plan — extending the list is a literal edit.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)="

# Bounded public-suffix excerpt: second-level suffixes under which the
# registrable domain is three labels, not two ("bbc.co.uk", not
# "co.uk").  A full PSL is ~9k rules; this excerpt covers the
# multi-label ccTLDs that dominate web corpora and is deliberately a
# literal tuple — it ships inside the plan, no broadcast, no closure.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.kr", "or.kr", "go.kr",
    "com.br", "org.br", "net.br", "gov.br",
    "com.mx", "org.mx", "com.ar", "com.tr", "com.cn", "net.cn",
    "org.cn", "gov.cn", "com.sg", "com.hk", "com.tw",
    "co.in", "net.in", "org.in", "co.nz", "org.nz", "net.nz",
    "co.za", "org.za", "com.my", "com.ph", "com.vn", "com.eg",
    "com.sa", "com.pk", "com.ng", "co.id", "or.id",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of an absolute http(s)-style URL, as one
    whole-stage-codegen Column expression.

    Steps (each mirrors 1:1 into ANSI/DuckDB SQL):

    1. trim; drop the ``#fragment``;
    2. lowercase scheme and host (paths stay case-sensitive);
    3. drop a leading ``www.`` label (``strip_www=True``);
    4. drop default ports (``http:80``, ``https:443``);
    5. drop tracking query params (:data:`TRACKING_PARAM_RE`), sort the
       survivors byte-wise, rejoin with ``&`` (param order never
       changes page identity);
    6. collapse trailing ``/`` on non-root paths; empty path → ``/``.

    Rows that don't look like absolute URLs (no ``scheme://``, or any
    literal whitespace left after the outer trim — legal URLs
    %-encode spaces) come back NULL so callers can route them to an
    error lane. The whitespace rule is also what makes the transform
    IDEMPOTENT: hypothesis found ``http://a.b.com/ /`` whose
    trailing-slash collapse exposed a trailing space that the next
    pass's trim would then eat.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    port_part = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))

    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)

    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_q = F.array_join(params, "&")
    q_part = F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit(""))

    return F.when(
        (scheme != "") & ~u.rlike(r"\s"),
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part),
    )


def canonicalize_url_sql(expr: str, strip_www: bool = True) -> str:
    """The DuckDB/ANSI mirror of :func:`canonicalize_url` over the SQL
    expression ``expr`` — kept next to the Column version so the two
    evolve together (every oracle that canonicalizes URLs composes
    this)."""
    u = f"regexp_replace(trim({expr}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u}, '{_HOSTPORT_RE}', 1))"
    host = f"regexp_replace({hostport}, ':[0-9]+$', '')"
    if strip_www:
        host = f"regexp_replace({host}, '^www\\.', '')"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} <> '' AND NOT ({scheme} = 'http' AND {port} = '80') "
        f"AND NOT ({scheme} = 'https' AND {port} = '443') "
        f"THEN ':' || {port} ELSE '' END"
    )
    raw_path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path = (
        f"CASE WHEN regexp_replace({raw_path}, '/+$', '') = '' THEN '/' "
        f"ELSE regexp_replace({raw_path}, '/+$', '') END"
    )
    query = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    canon_q = (
        f"array_to_string(list_sort(list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}'))), '&')"
    )
    q_part = f"CASE WHEN {canon_q} <> '' THEN '?' || {canon_q} ELSE '' END"
    return (
        f"CASE WHEN {scheme} <> '' AND NOT regexp_matches({u}, '\\s') THEN "
        f"{scheme} || '://' || {host} || {port_part} || {path} || {q_part} END"
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 under the bounded :data:`MULTI_LABEL_SUFFIXES` excerpt:
    three labels when the last two form a listed public suffix
    (``bbc.co.uk``), else two (``example.com``); single-label hosts
    (``localhost``) pass through.  Pure Column arithmetic over a
    split + negative ``element_at`` — no UDF, no lookup join (the
    suffix set is a plan literal)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last1 = F.element_at(labels, -1)
    last2 = F.concat(F.element_at(labels, -2), F.lit("."), last1)
    last3 = F.concat(F.element_at(labels, -3), F.lit("."), last2)
    return (
        F.when((n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB mirror of :func:`registrable_domain` over ``expr``."""
    labels = f"string_split({expr}, '.')"
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    last2 = f"list_extract({labels}, -2) || '.' || list_extract({labels}, -1)"
    last3 = f"list_extract({labels}, -3) || '.' || {last2}"
    return (
        f"CASE WHEN len({labels}) >= 3 AND ({last2}) IN ({suffixes}) THEN {last3} "
        f"WHEN len({labels}) >= 2 THEN {last2} ELSE {expr} END"
    )


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Collapse rows whose URLs canonicalize identically: one output
    row per canonical URL carrying the smallest ``id_col`` (the
    deterministic survivor) and the variant count.  One groupBy on the
    canonical URL — high cardinality, even partitioning; rows whose URL
    doesn't parse land in the NULL group for the caller to route."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.select(canon.alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).cast("bigint").alias("keep_id"),
            F.count("*").cast("bigint").alias("n_variants"),
        )
    )


def domain_cap(
    df: DataFrame,
    host_col: str,
    cap: int,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``cap`` rows per registrable domain — the
    per-domain quota every crawl-derived corpus applies so one
    mega-site can't dominate the training mix.

    The kept set is DETERMINISTIC: rows rank by
    ``(portable_hash(id, seed), id)`` within their domain, so the
    selection is a uniform pseudo-random draw that any engine with md5
    reproduces exactly.  Plan: one hash-partitioned window (no global
    sort); adds ``domain`` and keeps input columns.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    dom = registrable_domain(F.col(host_col))
    w = (
        Window.partitionBy("domain")
        .orderBy(F.col("__dc_h").asc(), F.col(id_col).asc())
    )
    return (
        df.withColumn("domain", dom)
        .withColumn("__dc_h", portable_hash(F.col(id_col), seed=seed))
        .withColumn("__dc_rn", F.row_number().over(w))
        .filter(F.col("__dc_rn") <= cap)
        .drop("__dc_h", "__dc_rn")
    )
