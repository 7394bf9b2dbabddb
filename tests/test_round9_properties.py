"""Property-based tests for the round-9 web-curation operators:
robots_filter against a pure-python RFC 9309 evaluator on random rule
sets + paths, registrable_domain_psl against a pure-python PSL matcher
on random hosts/rule sets, and domain_cap exactness against the plain
window reference under random caps/skews. Few examples (each runs real
Spark jobs); hypothesis explores the corners — wildcard-only patterns,
$ anchors on empty paths, rules shadowing each other at equal length,
single-label hosts, caps straddling group sizes."""

from fnmatch import fnmatchcase

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
    portable_hash,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
    domain_cap,
    registrable_domain,
    registrable_domain_psl,
    robots_filter,
    robots_rules_df,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# robots path patterns over a tiny alphabet so rules collide and shadow
_seg = st.sampled_from(["a", "b", "ab", "x"])
_pattern = st.builds(
    lambda parts, star, anchor: "/"
    + "/".join(parts)
    + ("*" if star else "")
    + ("$" if anchor else ""),
    st.lists(_seg, min_size=0, max_size=2),
    st.booleans(),
    st.booleans(),
)
_rules = st.lists(
    st.tuples(_pattern, st.booleans()), min_size=1, max_size=6
)
_paths = st.lists(
    st.builds(lambda parts: "/" + "/".join(parts), st.lists(_seg, max_size=3)),
    min_size=1,
    max_size=10,
)


def _py_robots_verdict(path: str, rules: list) -> bool:
    """Pure-python RFC 9309: longest matching pattern wins, Allow wins
    length ties, no match -> allowed. fnmatch gives * semantics; a
    pattern without $ is a prefix match (append *)."""
    best = None  # (plen, allow)
    for pattern, allow in rules:
        pat = pattern[:-1] if pattern.endswith("$") else pattern + "*"
        # fnmatch's [ and ? are not robots metacharacters — the tiny
        # alphabet above never generates them, so fnmatchcase is exact
        if fnmatchcase(path, pat):
            cand = (len(pattern), allow)
            if best is None or cand > best:
                best = cand
    return True if best is None else best[1]


@settings(**_SETTINGS)
@given(rules=_rules, paths=_paths)
def test_robots_filter_matches_python_reference(spark, rules, paths):
    parsed = sorted({(p, a, len(p)) for p, a in rules})
    rules_df = robots_rules_df(spark, {"example.com": parsed})
    df = spark.createDataFrame(
        [(i, f"https://example.com{p}") for i, p in enumerate(paths)],
        ["doc_id", "url"],
    )
    got = {
        r.doc_id: r.robots_allowed
        for r in robots_filter(df, "url", rules_df).collect()
    }
    for i, p in enumerate(paths):
        # the operator normalizes the empty path to '/'
        want = _py_robots_verdict(p or "/", [(p2, a) for p2, a, _ in parsed])
        assert got[i] == want, (p, parsed)


_label = st.sampled_from(["a", "bb", "ck", "uk", "co", "gov"])
_host = st.builds(".".join, st.lists(_label, min_size=1, max_size=4))
_rule_entry = st.one_of(
    st.builds(".".join, st.lists(_label, min_size=1, max_size=2)),
    st.builds(lambda t: "*." + t, _label),
    st.builds(lambda t: "!" + t, st.builds(".".join, st.lists(_label, min_size=2, max_size=2))),
)


def _py_psl_domain(host: str, rules: list) -> str | None:
    """Pure-python publicsuffix.org algorithm over parsed rules
    ``(key, eff_labels, ps_len, is_exc)``."""
    labels = host.split(".")
    n = len(labels)
    best = None  # (is_exc, eff_labels, ps_len)
    for key, eff, ps, exc in rules:
        klabels = key.split(".")
        if labels[n - len(klabels):] == klabels and n >= eff:
            cand = (1 if exc else 0, eff, ps)
            if best is None or cand > best:
                best = cand
    ps_len = best[2] if best else 1
    if n >= ps_len + 1:
        return ".".join(labels[n - ps_len - 1:])
    return None


@settings(**_SETTINGS)
@given(
    raw_rules=st.lists(_rule_entry, min_size=1, max_size=8),
    hosts=st.lists(_host, min_size=1, max_size=8),
)
def test_psl_matches_python_reference(spark, raw_rules, hosts):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
        parse_psl,
    )

    rules = parse_psl("\n".join(raw_rules))
    df = spark.createDataFrame([(h,) for h in set(hosts)], ["host"])
    got = {
        r.host: r.domain
        for r in registrable_domain_psl(df, "host", rules).collect()
    }
    for h in set(hosts):
        assert got[h] == _py_psl_domain(h, rules), (h, rules)


@settings(**_SETTINGS)
@given(
    n_rows=st.integers(min_value=1, max_value=400),
    cap=st.integers(min_value=1, max_value=50),
    n_hosts=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=3),
)
def test_domain_cap_equals_plain_window_any_shape(spark, n_rows, cap, n_hosts, seed):
    hosts = [f"h{i}.example.com" if i % 2 == 0 else f"s{i}.site.co.uk"
             for i in range(n_hosts)]
    arr = F.array(*[F.lit(h) for h in hosts])
    df = spark.range(0, n_rows).select(
        F.col("id").alias("doc_id"),
        F.element_at(arr, (F.col("id") % n_hosts + 1).cast("int")).alias("host"),
    )
    got = sorted(
        map(tuple, domain_cap(df, "host", cap, "doc_id", seed=seed).collect())
    )
    w = Window.partitionBy("domain").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    ref = sorted(
        map(
            tuple,
            df.withColumn("domain", registrable_domain(F.col("host")))
            .withColumn("h", portable_hash(F.col("doc_id"), seed=seed))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("doc_id", "host", "domain")
            .collect(),
        )
    )
    assert got == ref
