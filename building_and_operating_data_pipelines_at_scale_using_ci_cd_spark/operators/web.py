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
the canonical URL, ``domain_cap``'s count pre-pass + per-domain
ranking), keyed on high-cardinality values (canonical URL / registrable
domain) so they partition evenly.  A pathological single mega-domain in
``domain_cap`` never reaches a window sort of its full row set: the
count pre-pass routes under-cap domains around ranking entirely and a
hash-threshold pre-filter shrinks an over-cap domain to ~4·cap rows
before the exact window (with a checked exact fallback, so the answer
never depends on hash uniformity) — see :func:`domain_cap`.

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
# Bare ``ref`` is deliberately NOT in the default list: unlike utm_*/
# gclid it frequently carries page identity (``?ref=<branch>`` on code
# hosts), so stripping it can merge genuinely distinct pages — pass
# ``strip_ref=True`` to canonicalize_url to opt in for corpora where
# ``ref`` is known to be referral tracking only.
TRACKING_PARAM_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref_src|igshid)="
TRACKING_PARAM_WITH_REF_RE = r"^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src|igshid)="

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
#: robots matching target per RFC 9309 §2.2.2: the PATH AND QUERY (the
#: fragment never reaches the server) — `Disallow: /p$` must NOT block
#: `/p?x`, and query-string rules (`/search?q=`) must be matchable
_PATHQUERY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_url(
    url: Column, strip_www: bool = True, strip_ref: bool = False
) -> Column:
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

    tracking_re = TRACKING_PARAM_WITH_REF_RE if strip_ref else TRACKING_PARAM_RE
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_re),
        )
    )
    canon_q = F.array_join(params, "&")
    q_part = F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(F.lit(""))

    return F.when(
        (scheme != "") & ~u.rlike(r"\s"),
        F.concat(scheme, F.lit("://"), host, port_part, path, q_part),
    )


def canonicalize_url_sql(
    expr: str, strip_www: bool = True, strip_ref: bool = False
) -> str:
    """The DuckDB/ANSI mirror of :func:`canonicalize_url` over the SQL
    expression ``expr`` — kept next to the Column version so the two
    evolve together (every oracle that canonicalizes URLs composes
    this)."""
    tracking_re = TRACKING_PARAM_WITH_REF_RE if strip_ref else TRACKING_PARAM_RE
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
        f"p -> p <> '' AND NOT regexp_matches(p, '{tracking_re}'))), '&')"
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
    deterministic survivor — MIN in the id column's NATIVE type, so
    string document ids work; an unconditional bigint cast would NULL
    every survivor on a string-keyed corpus) and the variant count.
    One groupBy on the canonical URL — high cardinality, even
    partitioning; rows whose URL doesn't parse land in the NULL group
    for the caller to route."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.select(canon.alias("canonical_url"), F.col(id_col))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
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

    The kept set is DETERMINISTIC and EXACT: rows rank by
    ``(portable_hash(id, seed), id)`` within their domain, so the
    selection is a uniform pseudo-random draw that any engine with md5
    reproduces exactly.

    Skew design (a single mega-domain is the whole point of this
    operator, so it must not be its failure mode — ``row_number`` has
    no early exit; a naive per-domain window would SORT the entire
    mega-domain's rows in one task):

    1. per-domain count pre-pass (cheap map-side-partial groupBy);
    2. rows of domains with ``count <= cap`` bypass ranking entirely —
       they are all kept, no window ever sees them;
    3. over-cap domains pre-filter to rows with
       ``hash <= HASH_SPAN·cap·4/count + 1024`` — because the kept set
       is exactly the ``cap`` smallest ``(hash, id)`` pairs, the
       survivor set is a PREFIX of that order, ~4·cap + slack expected
       rows per domain, and the exact window ranks only those;
    4. the oversample makes a shortfall (< cap survivors)
       astronomically unlikely but not impossible, so it is CHECKED —
       with ONE bounded validation job at construction time (scan +
       count-join + aggregate, collect capped at 1001 domain names):
       any short domain (adversarial ids could skew md5's low range)
       is re-ranked exactly over all its rows in a union branch, and
       >1000 short domains raises (the id distribution is degenerate).
       The answer never depends on the hash being uniform.

    The count attach is an equi-join on ``domain``; unlike a window,
    a skewed join is AQE-splittable. The returned plan in the normal
    (no-shortfall) case is two scans + one window over bounded groups.
    Adds ``domain``; keeps input columns.

    Rows whose host yields a NULL registrable domain form their OWN
    capped partition (SQL ``PARTITION BY`` semantics — the same thing
    the plain-window reference does), so every join here is null-safe:
    a plain inner equi-join would silently drop the NULL-domain rows.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    from .guards import construction_rows

    hash_span = 1 << 32
    dom = registrable_domain(F.col(host_col))
    base = df.withColumn("domain", dom).withColumn(
        "__dc_h", portable_hash(F.col(id_col), seed=seed)
    )
    counts = base.groupBy("domain").agg(F.count("*").alias("__dc_n"))
    joined = base.join(
        counts.withColumnRenamed("domain", "__dc_dom"),
        F.col("domain").eqNullSafe(F.col("__dc_dom")),
    ).drop("__dc_dom")
    out_cols = [*df.columns, "domain"]

    threshold = F.least(
        F.lit(hash_span - 1),
        F.expr(f"CAST({hash_span * 4 * cap} AS BIGINT) DIV __dc_n") + F.lit(1024),
    ).cast("bigint")
    # ONE window branch serves both lanes: under-cap domains keep every
    # row (their rn <= n <= cap trivially) and never pay the hash
    # filter; over-cap domains rank only their ~4·cap hash-prefix
    # survivors. The window's per-domain state is therefore bounded by
    # max(cap, survivors), never the mega-domain's row count. A second
    # window function over the SAME partitioning (no extra shuffle or
    # sort) counts each domain's survivors, so shortfall is a per-row
    # predicate — no anti-join, no extra branch execution.
    filtered = joined.filter(
        (F.col("__dc_n") <= cap) | (F.col("__dc_h") <= threshold)
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("__dc_h").asc(), F.col(id_col).asc()
    )
    wd = Window.partitionBy("domain")
    is_short = (F.col("__dc_n") > cap) & (F.col("__dc_s") < cap)
    kept_main = (
        filtered.withColumn("__dc_rn", F.row_number().over(w))
        .withColumn("__dc_s", F.count("*").over(wd))
        .filter((F.col("__dc_rn") <= cap) & ~is_short)
        .select(*out_cols)
    )

    # Shortfall fallback (a domain with < cap hash-prefix survivors —
    # only an id distribution that defeats md5 uniformity gets here):
    # resolved with ONE bounded EAGER check at construction, derived
    # from the OVER-CAP DOMAIN LIST (the count pre-pass) so a domain
    # with ZERO survivors is seen too — deriving shortfall from
    # survivor groups alone would silently drop it (caught by the
    # hostile-hash fallback test). The common case returns the 2-scan
    # plan above untouched; the astronomically-rare case unions an
    # exact full re-rank of just the short domains.
    surv_counts = (
        joined.filter((F.col("__dc_n") > cap) & (F.col("__dc_h") <= threshold))
        .groupBy("domain")
        .agg(F.count("*").alias("__dc_sc"))
    )
    short_rows = construction_rows(
        counts.filter(F.col("__dc_n") > cap)
        .join(
            surv_counts.withColumnRenamed("domain", "__dc_dom"),
            F.col("domain").eqNullSafe(F.col("__dc_dom")),
            "left",
        )
        .filter(F.coalesce(F.col("__dc_sc"), F.lit(0)) < cap)
        .select("domain"),
        op_name="domain_cap",
        purpose="hash-prefix shortfall check",
        max_rows=1000,
        over_msg=(
            "domain_cap: >1000 domains fell short of the 4x-oversampled "
            "hash threshold — the id column's md5 distribution is "
            "degenerate; pick a different id_col or seed"
        ),
    )
    if not short_rows:
        return kept_main
    short_domains = [r["domain"] for r in short_rows]
    non_null = [d for d in short_domains if d is not None]
    short_pred = (
        F.col("domain").isin(non_null) if non_null else F.lit(False)
    )
    if any(d is None for d in short_domains):
        # isin() can never match NULL — route the NULL-domain partition
        # to the fallback explicitly when the check flagged it
        short_pred = short_pred | F.col("domain").isNull()
    ranked_fallback = (
        base.filter(short_pred)
        .withColumn("__dc_rn", F.row_number().over(w))
        .filter(F.col("__dc_rn") <= cap)
        .select(*out_cols)
    )
    return kept_main.unionByName(ranked_fallback)


# ---------------------------------------------------------------------------
# Full public-suffix-list path (the bounded literal excerpt above stays the
# zero-shuffle default; this closes its documented long-tail gap)
# ---------------------------------------------------------------------------

#: parsed PSL rule: (join key, effective label count for prevailing-rule
#: selection, public-suffix label count when this rule wins, exception?)
PslRule = tuple


def parse_psl(text: str) -> list:
    """Parse public-suffix-list text (the publicsuffix.org format: one
    rule per line, ``//`` comments, ``*.`` wildcards matching exactly
    one label, ``!`` exceptions) into rules usable by
    :func:`registrable_domain_psl`.

    Each rule becomes ``(key, eff_labels, ps_len, is_exception)``:

    - plain rule ``co.uk`` → key ``co.uk``, eff_labels 2, ps_len 2;
    - wildcard ``*.ck``   → key ``ck``  (the literal tail — a host
      matches when its 1-label suffix equals it AND it has a label for
      the ``*``), eff_labels 2, ps_len 2;
    - exception ``!www.ck`` → key ``www.ck``, ps_len 1 (the rule minus
      its first label is the public suffix, per spec) and priority
      over any wildcard/plain rule it overlaps.

    Only leading ``*.`` wildcards are supported — the published list
    uses no other form. Rules are lowercased; duplicate keys keep the
    strongest (exception > most labels).
    """
    rules: dict = {}
    for raw in text.splitlines():
        line = raw.strip().lower()
        if not line or line.startswith("//"):
            continue
        # the published list annotates entries with trailing comments on
        # their own lines only, but be safe about inline whitespace
        line = line.split()[0]
        is_exc = line.startswith("!")
        if is_exc:
            line = line[1:]
        is_wild = line.startswith("*.")
        if is_wild:
            line = line[2:]
        if "*" in line or not line:
            raise ValueError(f"unsupported PSL rule: {raw!r}")
        labels = line.split(".")
        if is_exc:
            rule = (line, len(labels), len(labels) - 1, True)
        elif is_wild:
            rule = (line, len(labels) + 1, len(labels) + 1, False)
        else:
            rule = (line, len(labels), len(labels), False)
        prev = rules.get(line)
        if prev is None or (rule[3], rule[1]) > (prev[3], prev[1]):
            rules[line] = rule
    return sorted(rules.values())


def load_psl(path: str) -> list:
    """Read and parse a PSL file from disk (driver-side — the rule set
    is broadcast, never scanned as data)."""
    with open(path, encoding="utf-8") as fh:
        return parse_psl(fh.read())


def registrable_domain_psl(
    df: DataFrame,
    host_col: str,
    rules: list,
    out_col: str = "domain",
    max_suffix_labels: int | None = None,
) -> DataFrame:
    """eTLD+1 under a FULL public suffix list: the broadcast-join twin
    of :func:`registrable_domain` for when the ~50-suffix literal
    excerpt's long tail matters (``gov.br`` variants, wildcard TLDs,
    exception rules).

    Algorithm (publicsuffix.org): among rules whose key equals a
    label-suffix of the host (wildcards additionally require a label
    for the ``*``), exceptions win, then the most labels; the winning
    rule's public suffix plus one preceding label is the registrable
    domain; hosts that ARE a public suffix (or unparseable) get NULL;
    hosts matching no rule use the implicit ``*`` default (public
    suffix = last label).

    Plan shape for 100 TB: one distinct on the host (high-cardinality
    groupBy), a ≤``max_suffix_labels``-way posexplode of label
    suffixes on that DISTINCT set only, one BROADCAST join against the
    ~9k-row rule table, one groupBy(host) max-struct to pick the
    winning rule, and one equi-join back onto the input rows — the
    corpus itself is touched by exactly that last join; everything
    else runs on the deduplicated host set.
    """
    if not rules:
        raise ValueError("empty PSL rule set")
    spark = df.sparkSession
    max_j = max_suffix_labels or max(r[1] for r in rules)
    rules_df = spark.createDataFrame(
        [(k, el, pl, 1 if exc else 0) for k, el, pl, exc in rules],
        "key string, eff_labels int, ps_len int, is_exc int",
    )
    hosts = df.select(F.col(host_col).alias("__rd_host")).distinct()
    labels = F.split(F.col("__rd_host"), r"\.")
    n = F.size(labels)
    with_labels = hosts.select(
        "__rd_host", labels.alias("__rd_labels"), n.alias("__rd_n")
    ).filter(F.col("__rd_n") >= 1)
    cands = with_labels.select(
        "__rd_host",
        "__rd_labels",
        "__rd_n",
        F.explode(F.sequence(F.lit(1), F.least(F.col("__rd_n"), F.lit(max_j)))).alias(
            "__rd_j"
        ),
    ).select(
        "__rd_host",
        "__rd_labels",
        "__rd_n",
        F.array_join(
            F.slice(
                F.col("__rd_labels"),
                F.col("__rd_n") - F.col("__rd_j") + 1,
                F.col("__rd_j"),
            ),
            ".",
        ).alias("__rd_suffix"),
    )
    matched = cands.join(
        F.broadcast(rules_df),
        (F.col("__rd_suffix") == F.col("key"))
        & (F.col("__rd_n") >= F.col("eff_labels")),
        "left",
    )
    best = matched.groupBy("__rd_host").agg(
        F.max(F.struct("is_exc", "eff_labels", "ps_len")).alias("__rd_best"),
        F.first("__rd_labels").alias("__rd_labels"),
        F.first("__rd_n").alias("__rd_n"),
    )
    ps_len = F.coalesce(F.col("__rd_best.ps_len"), F.lit(1))
    n2 = F.col("__rd_n")
    domain = F.when(
        n2 >= ps_len + 1,
        F.array_join(
            F.slice(F.col("__rd_labels"), n2 - ps_len, ps_len + F.lit(1)), "."
        ),
    )
    mapping = best.select(
        F.col("__rd_host"), domain.alias(out_col)
    )
    return df.join(
        mapping, df[host_col] == mapping["__rd_host"], "left"
    ).drop("__rd_host")


def registrable_domain_psl_sql(
    host_source_sql: str, host_col: str, rules: list, out_col: str = "domain"
) -> str:
    """DuckDB mirror of :func:`registrable_domain_psl`: a SELECT over
    ``host_source_sql`` (a table/CTE expression) producing
    ``(host_col, out_col)`` per DISTINCT host, with the same rule set
    inlined as VALUES — kept beside the Column version so the two
    evolve together (the canonicalize_url_sql pattern)."""
    if not rules:
        raise ValueError("empty PSL rule set")
    max_j = max(r[1] for r in rules)
    values = ", ".join(
        f"('{k}', {el}, {pl}, {1 if exc else 0})" for k, el, pl, exc in rules
    )
    return f"""
WITH __psl_rules(key, eff_labels, ps_len, is_exc) AS (VALUES {values}),
__psl_hosts AS (
  SELECT DISTINCT {host_col} AS host FROM {host_source_sql}),
__psl_lab AS (
  SELECT host, string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n FROM __psl_hosts),
__psl_cand AS (
  SELECT host, labels, n,
         unnest(generate_series(1, LEAST(n, {max_j}))) AS j
  FROM __psl_lab),
__psl_match AS (
  SELECT c.host, c.labels, c.n, r.eff_labels, r.ps_len, r.is_exc
  FROM (SELECT host, labels, n,
               array_to_string(list_slice(labels, n - j + 1, n), '.') AS suffix
        FROM __psl_cand) c
  LEFT JOIN __psl_rules r
    ON c.suffix = r.key AND c.n >= r.eff_labels),
__psl_best AS (
  SELECT host, labels, n, ps_len,
         ROW_NUMBER() OVER (PARTITION BY host
           ORDER BY is_exc DESC NULLS LAST, eff_labels DESC NULLS LAST) AS rn
  FROM __psl_match)
SELECT host AS {host_col},
       CASE WHEN n >= COALESCE(ps_len, 1) + 1
            THEN array_to_string(
                   list_slice(labels, n - COALESCE(ps_len, 1), n), '.')
       END AS {out_col}
FROM __psl_best WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# robots.txt politeness filter (REP / RFC 9309) — the crawl-compliance
# gate a training corpus applies before any content ever enters the mix
# ---------------------------------------------------------------------------


def parse_robots(text: str, user_agent: str = "*") -> list:
    """Parse robots.txt text into ``(pattern, allow, pattern_len)``
    rules for ``user_agent``, per RFC 9309:

    - groups start with one or more ``User-agent:`` lines; the group
      that applies is the one naming the longest case-insensitive
      prefix of ``user_agent``, else the ``*`` group, else no rules
      (everything allowed);
    - ``Allow``/``Disallow`` values are path patterns where ``*``
      matches any character run and a trailing ``$`` anchors the end;
      an empty ``Disallow:`` allows everything (contributes no rule);
    - precedence at evaluation time (see :func:`robots_filter`) is the
      LONGEST matching pattern, Allow winning length ties;
    - ``#`` starts a comment; unknown directives (Crawl-delay,
      Sitemap, ...) are ignored.
    """
    ua = user_agent.lower()
    if text.startswith("﻿"):
        # real-world robots.txt files frequently carry a UTF-8 BOM; it
        # would otherwise glue onto the first directive's key and make
        # the whole first group invisible
        text = text[1:]
    groups: list = []  # (agents, rules)
    agents: list = []
    rules: list = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val == "":
                continue  # empty Disallow = allow all (no rule)
            rules.append((val, key == "allow", len(val)))
        else:
            in_group_body = True  # unknown directive still ends the UA run
    if agents or rules:
        groups.append((agents, rules))

    best: list | None = None
    best_len = -1
    star: list | None = None
    for grp_agents, grp_rules in groups:
        for a in grp_agents:
            if a == "*":
                star = grp_rules if star is None else star + grp_rules
            elif ua.startswith(a) and len(a) > best_len:
                best, best_len = grp_rules, len(a)
    chosen = best if best is not None else (star or [])
    return sorted(set(chosen))


def _robots_like(pattern: str, dialect_escape: str = "\\") -> tuple:
    """Translate a robots path pattern into a SQL LIKE pattern (shared
    by Spark and DuckDB — both use ``\\`` escapes via ESCAPE): ``*`` →
    ``%``, literal ``%``/``_``/``\\`` escaped; a trailing ``$`` anchors
    (no trailing ``%``), otherwise the translated pattern gets a
    trailing ``%`` (robots rules are prefix matches). Returns
    ``(like_pattern, anchored)``."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", dialect_escape):
            out.append(dialect_escape + ch)
        else:
            out.append(ch)
    like = "".join(out)
    if not anchored:
        like += "%"
    return like, anchored


def robots_rules_df(spark, rules_by_domain: dict):
    """Build the broadcastable rule table from ``{domain: [(pattern,
    allow, plen), ...]}`` (each value as returned by
    :func:`parse_robots`): columns ``(domain, like_pattern, allow,
    plen)`` with the LIKE translation precomputed driver-side."""
    rows = []
    for dom, rules in sorted(rules_by_domain.items()):
        for pattern, allow, plen in rules:
            like, _ = _robots_like(pattern)
            rows.append((dom, like, bool(allow), int(plen)))
    return spark.createDataFrame(
        rows, "domain string, like_pattern string, allow boolean, plen int"
    )


def robots_rules_from_df(
    rules_src: DataFrame,
    domain_col: str,
    body_col: str,
    user_agent: str = "*",
) -> DataFrame:
    """Crawl-scale rule ingestion: parse robots.txt BODIES stored as a
    DataFrame column into the same ``(domain, like_pattern, allow,
    plen)`` rule table :func:`robots_rules_df` builds from a driver
    dict.  A real crawl holds millions of robots.txt files — they are
    DATA, not config, so the parse (RFC 9309 group selection + the LIKE
    translation, pure string logic shared with the driver path via
    :func:`parse_robots` / :func:`_robots_like`) runs distributively in
    an Arrow-batched ``mapInPandas`` kernel: one pass over the bodies,
    one output row per applicable directive, no driver round-trip.

    NULL domains/bodies contribute no rules (their URLs then take the
    default-allow lane in :func:`robots_filter`); a body with no group
    matching ``user_agent`` likewise yields nothing.  Callers should
    deduplicate to one body per domain first — duplicate domains simply
    union their directives."""
    import pandas as pd

    ua = user_agent

    def gen(batches):
        for pdf in batches:
            doms: list = []
            likes: list = []
            allows: list = []
            plens: list = []
            for dom, body in zip(pdf[domain_col], pdf[body_col]):
                if dom is None or body is None:
                    continue
                for pattern, allow, plen in parse_robots(body, ua):
                    like, _ = _robots_like(pattern)
                    doms.append(dom)
                    likes.append(like)
                    allows.append(bool(allow))
                    plens.append(int(plen))
            yield pd.DataFrame(
                {
                    "domain": pd.Series(doms, dtype="object"),
                    "like_pattern": pd.Series(likes, dtype="object"),
                    "allow": pd.Series(allows, dtype="bool"),
                    "plen": pd.Series(plens, dtype="int32"),
                }
            )

    return rules_src.select(domain_col, body_col).mapInPandas(
        gen, "domain string, like_pattern string, allow boolean, plen int"
    )


def robots_filter(
    df: DataFrame,
    url_col: str,
    rules: DataFrame,
    out_col: str = "robots_allowed",
    rules_hint: str = "auto",
) -> DataFrame:
    """Per-URL robots verdict: adds ``out_col`` (boolean) — True when
    the longest matching rule for the URL's registrable domain is an
    Allow, or no rule matches, or the domain has no robots rules
    (RFC 9309 default-allow). Length ties go to Allow (the spec's
    tie-break: booleans order false < true inside the max-struct).
    Matching targets the URL's PATH AND QUERY per RFC 9309 §2.2.2 (the
    fragment never reaches the server): ``Disallow: /p$`` does not
    block ``/p?x``, and query-string rules are matchable.
    Rows whose URL is NULL (or yields no host) keep the default-allow
    verdict rather than vanishing — every join is null-safe, so row
    multiplicity is ALWAYS preserved.

    Plan shape for 100 TB: the verdict is a function of (domain, path)
    alone, so it is computed on the DISTINCT (domain, path) set — one
    high-cardinality groupBy — where the rule table left-joins on the
    domain, fanning each distinct pair out only by ITS domain's rule
    count; matching is a single LIKE per pair (translated once — no
    per-row regex compilation); a max-struct per pair picks the winner,
    and one equi-join attaches verdicts back to the corpus rows. The
    corpus itself is scanned once.

    ``rules_hint`` picks the rule-join strategy: ``"auto"`` (default)
    leaves it to Catalyst/AQE — a curated driver-dict table (KBs) gets
    broadcast by the planner's own size estimate, while a crawl-scale
    table from :func:`robots_rules_from_df` that outgrows
    ``spark.sql.autoBroadcastJoinThreshold`` falls back to a shuffled
    equi-join on the domain; ``"broadcast"`` forces the broadcast for
    rule tables the caller KNOWS are bounded.
    """
    if rules_hint not in ("auto", "broadcast"):
        raise ValueError(
            f"rules_hint must be 'auto' or 'broadcast', got {rules_hint!r}"
        )
    dom = registrable_domain(
        F.regexp_replace(
            F.lower(F.regexp_extract(F.col(url_col), _HOSTPORT_RE, 1)),
            r":[0-9]+$|^www\.",
            "",
        )
    )
    path_raw = F.regexp_extract(F.col(url_col), _PATHQUERY_RE, 1)
    path = (
        F.when(path_raw == "", F.lit("/"))
        # query with an empty path ("https://h?x"): the match target is
        # "/?x" — the path component is normatively "/"
        .when(path_raw.startswith("?"), F.concat(F.lit("/"), path_raw))
        .otherwise(path_raw)
    )
    base = df.withColumn("__rb_dom", dom).withColumn("__rb_path", path)
    pairs = base.select("__rb_dom", "__rb_path").distinct()
    rules_side = F.broadcast(rules) if rules_hint == "broadcast" else rules
    joined = pairs.join(
        rules_side,
        (F.col("__rb_dom") == F.col("domain"))
        & F.like(F.col("__rb_path"), F.col("like_pattern"), F.lit("\\")),
        "left",
    )
    verdicts = (
        joined.groupBy("__rb_dom", "__rb_path")
        .agg(F.max(F.struct(F.col("plen"), F.col("allow"))).alias("__rb_best"))
        .select(
            F.col("__rb_dom").alias("__rb_dom_v"),
            F.col("__rb_path").alias("__rb_path_v"),
            F.coalesce(F.col("__rb_best.allow"), F.lit(True)).alias(out_col),
        )
    )
    # null-safe attach: a NULL URL yields NULL (domain, path) keys, which
    # a plain equi-join would drop; eqNullSafe keeps the row with its
    # default-allow verdict (the pairs table carries the NULL pair too)
    return base.join(
        verdicts,
        F.col("__rb_dom").eqNullSafe(F.col("__rb_dom_v"))
        & F.col("__rb_path").eqNullSafe(F.col("__rb_path_v")),
    ).select(*df.columns, out_col)


def robots_filter_sql(
    source_sql: str,
    url_col: str,
    rules_by_domain: dict,
    out_col: str = "robots_allowed",
) -> str:
    """DuckDB mirror of :func:`robots_filter` over ``source_sql``
    (must expose ``doc_id`` and ``url_col``); same rule literals, same
    LIKE translation, same longest-match/Allow-ties semantics. Kept
    beside the Column version so the two evolve together."""
    if not rules_by_domain:
        raise ValueError("empty robots rule set")
    rows = []
    for dom_name, rules in sorted(rules_by_domain.items()):
        for pattern, allow, plen in rules:
            like, _ = _robots_like(pattern)
            like_sql = like.replace("\\", "\\\\").replace("'", "''")
            rows.append(
                f"('{dom_name}', '{like_sql}', {'TRUE' if allow else 'FALSE'}, {plen})"
            )
    values = ", ".join(rows)
    hostport = f"lower(regexp_extract(url, '{_HOSTPORT_RE}', 1))"
    host = f"regexp_replace({hostport}, ':[0-9]+$|^www\\.', '')"
    dom = registrable_domain_sql(host)
    raw_path = f"regexp_extract(url, '{_PATHQUERY_RE}', 1)"
    path = (
        f"CASE WHEN {raw_path} = '' THEN '/' "
        f"WHEN {raw_path} LIKE '?%' THEN '/' || {raw_path} "
        f"ELSE {raw_path} END"
    )
    return f"""
WITH __rb_rules(domain, like_pattern, allow, plen) AS (VALUES {values}),
__rb_base AS (
  SELECT doc_id, {url_col} AS url, {dom} AS rb_dom, {path} AS rb_path
  FROM {source_sql}),
__rb_join AS (
  SELECT b.doc_id, b.url, r.allow, r.plen,
         ROW_NUMBER() OVER (
           PARTITION BY b.doc_id
           ORDER BY r.plen DESC NULLS LAST, r.allow DESC NULLS LAST) AS rn
  FROM __rb_base b LEFT JOIN __rb_rules r
    ON b.rb_dom = r.domain AND b.rb_path LIKE r.like_pattern ESCAPE '\\')
SELECT doc_id, url, COALESCE(allow, TRUE) AS {out_col}
FROM __rb_join WHERE rn = 1
"""
