"""Round-9 fixes: overflow-safe exact significance (_cross_mult_ge),
skew-safe domain_cap, url_dedup/tracking-param contracts, unified
linkage null semantics, the full-PSL registrable-domain path, and
delta-lite per-file stats + data skipping."""

import json
import os
import random

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators import (
    web as web_mod,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
    AB_TEST_MAX_N,
    RANK_SUM_MAX_N,
    _cross_mult_ge,
    ab_test,
    linear_fit,
    rank_sum_test,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.linkage import (
    FieldComparator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
    MULTI_LABEL_SUFFIXES,
    canonicalize_url,
    domain_cap,
    load_psl,
    parse_psl,
    registrable_domain,
    registrable_domain_psl,
    registrable_domain_psl_sql,
    url_dedup,
)

PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "building_and_operating_data_pipelines_at_scale_using_ci_cd_spark",
    "resources",
    "public_suffix_excerpt.dat",
)


class TestCrossMultLemma:
    """a_sq·b >= m·r1 decided without forming either product — checked
    against exact Python integers at magnitudes where the naive product
    needs >38 digits, in BOTH engines."""

    def _cases(self):
        random.seed(99)
        cases = []
        for _ in range(60):
            m = random.randrange(1, 10**18)
            a_sq = random.randrange(0, m) ** 2 if random.random() < 0.5 else (
                random.randrange(0, 10**15) ** 2
            )
            b = random.randrange(1, 10**13)
            r1 = random.randrange(0, 10**28)
            cases.append((a_sq, m, b, r1))
        # adversarial boundaries: exact equality, off-by-one both sides
        for a in (7, 10**14):
            for delta in (-1, 0, 1):
                m, b = 3, 10**6
                r1_eq, rem = divmod(a * a * b, m)
                cases.append((a * a, m, b, r1_eq + delta))
                assert rem == 0 or True
        return cases

    def test_matches_python_in_spark(self, spark):
        cases = self._cases()
        sel = ", ".join(
            _cross_mult_ge(
                f"CAST({a} AS DECIMAL(38,0))",
                f"CAST({m} AS DECIMAL(38,0))",
                f"CAST({b} AS DECIMAL(38,0))",
                f"CAST({r1} AS DECIMAL(38,0))",
            )
            + f" AS c{i}"
            for i, (a, m, b, r1) in enumerate(cases)
        )
        row = spark.sql(f"SELECT {sel}").collect()[0]
        for i, (a, m, b, r1) in enumerate(cases):
            assert row[f"c{i}"] == (a * b >= m * r1), (a, m, b, r1)

    def test_matches_python_in_duckdb(self):
        # the oracle-side HUGEINT mirror of the same clamped form
        con = duckdb.connect()
        for a, m, b, r1 in self._cases():
            got = con.execute(
                f"SELECT GREATEST(LEAST(CAST({r1} AS HUGEINT) - "
                f"(CAST({a} AS HUGEINT) // {m}) * {b}, CAST({b} AS HUGEINT)), -1)"
                f" * {m} <= (CAST({a} AS HUGEINT) % {m}) * {b}"
            ).fetchone()[0]
            assert got == (a * b >= m * r1), (a, m, b, r1)


class TestABTestPlan:
    def test_single_scan_no_orderby_limit_twins(self, spark):
        df = spark.range(0, 2000).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
            (F.col("id") % 3 == 0).cast("int").alias("conv"),
        )
        plan = ab_test(df, "arm", "conv")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range") == 1  # ONE scan of the input
        assert "TakeOrderedAndProject" not in plan

    def test_guard_bound_is_documented_constant(self):
        assert AB_TEST_MAX_N == 4_000_000_000
        assert RANK_SUM_MAX_N == 100_000_000


class TestRankSumGuards:
    def test_high_cardinality_metric_raises(self, spark):
        df = spark.range(0, 50_000).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
            F.col("id").alias("v"),
        )
        with pytest.raises(ValueError, match="max_values"):
            rank_sum_test(df, "arm", "v", "a", "b", max_values=100)

    def test_bucketized_path_bounds_v_and_matches_manual(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
            logbucket_index,
        )

        df = spark.range(0, 20_000).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
            # a genuine shift on arm b, values spanning sign + zero
            F.when(
                F.col("id") % 2 == 0, (F.col("id") % 701) - 350
            ).otherwise(((F.col("id") % 701) - 350) * 2).cast("bigint").alias("v"),
        )
        r = rank_sum_test(
            df, "arm", "v", "a", "b", n_buckets_bits=4
        ).collect()[0]
        # manual sign-preserving bucketing, then the exact-value test
        av = F.abs(F.col("v"))
        manual = df.select(
            "arm",
            F.when(F.col("v") > 0, logbucket_index(av, 4) + 1)
            .when(F.col("v") < 0, -(logbucket_index(av, 4) + 1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("v"),
        )
        r2 = rank_sum_test(manual, "arm", "v", "a", "b", max_values=None).collect()[0]
        assert (r.u2, r.n_values, r.significant) == (r2.u2, r2.n_values, r2.significant)
        assert r.n_values <= 2 * 63 * 16 + 1

    def test_tie_cubes_exact_beyond_int64_wrap_shape(self, spark):
        # ~50k rows ALL tied on few values: t^3 sums stay exact (decimal);
        # compare against a pure-python tie-corrected reference
        n = 50_000
        df = spark.range(0, n).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("arm"),
            (F.col("id") % 3).cast("bigint").alias("v"),
        )
        r = rank_sum_test(df, "arm", "v", "a", "b", max_values=None).collect()[0]
        vals_a = [i % 3 for i in range(0, n, 2)]
        vals_b = [i % 3 for i in range(1, n, 2)]
        from collections import Counter

        ca, cb = Counter(vals_a), Counter(vals_b)
        u2 = 0
        cum_b = 0
        t3 = 0
        for v in sorted(set(ca) | set(cb)):
            u2 += ca.get(v, 0) * (2 * cum_b + cb.get(v, 0))
            cum_b += cb.get(v, 0)
            t = ca.get(v, 0) + cb.get(v, 0)
            t3 += t**3 - t
        na, nb = len(vals_a), len(vals_b)
        ntot = na + nb
        lhs = 3 * (u2 - na * nb) ** 2 * ntot * (ntot - 1) * 10000
        rhs = 38416 * na * nb * (ntot * (ntot * ntot - 1) - t3)
        assert r.u2 == u2
        assert r.significant == (lhs >= rhs)


class TestLinearFitDecimal:
    def test_exact_where_int64_moments_would_wrap(self, spark):
        # n=200_001, y = 1_000_000_000 + 3x: sum(x*y) ~ 2e19 > int64.
        # The decimal moments keep the closed form exact -> slope 3000.
        n = 200_001
        df = spark.range(0, n).select(
            F.lit("k").alias("k"),
            F.col("id").alias("x"),
            (F.lit(1_000_000_000) + F.col("id") * 3).alias("y"),
        )
        r = linear_fit(df, "k", "x", "y").collect()[0]
        assert (r.n_points, r.slope_x1000) == (n, 3000)


class TestLinkageNullContract:
    def _pair(self, spark, l_val, r_val, kind, param=0):
        ftype = "double" if kind == "abs_tol_x100" else "string"
        l = spark.createDataFrame([(1, l_val)], f"lid bigint, f {ftype}").alias("l")
        r = spark.createDataFrame([(2, r_val)], f"rid bigint, f {ftype}").alias("r")
        comp = FieldComparator("f", "f", kind, 10, -7, param)
        return (
            l.crossJoin(r).select(comp.weight().alias("w")).collect()[0].w
        )

    @pytest.mark.parametrize("kind,param", [
        ("exact", 0), ("prefix", 3), ("abs_tol_x100", 5),
    ])
    def test_both_null_agrees_every_kind(self, spark, kind, param):
        val = None
        assert self._pair(spark, val, val, kind, param) == 10

    @pytest.mark.parametrize("kind,param", [
        ("exact", 0), ("prefix", 3), ("abs_tol_x100", 5),
    ])
    def test_one_sided_null_disagrees_every_kind(self, spark, kind, param):
        filler = 1.0 if kind == "abs_tol_x100" else "abc"
        assert self._pair(spark, filler, None, kind, param) == -7
        assert self._pair(spark, None, filler, kind, param) == -7


class TestUrlContracts:
    def test_string_ids_survive(self, spark):
        df = spark.createDataFrame(
            [("doc-a", "http://x.com/"), ("doc-b", "http://X.com")],
            ["sid", "url"],
        )
        rows = url_dedup(df, "url", "sid").collect()
        assert rows[0].keep_id == "doc-a" and rows[0].n_variants == 2

    def test_ref_param_kept_by_default_opt_in_strip(self, spark):
        df = spark.createDataFrame(
            [("http://x.com/?ref=main",), ("http://x.com/?ref=dev",)], ["u"]
        )
        kept = df.select(canonicalize_url(F.col("u")).alias("c")).distinct().count()
        stripped = (
            df.select(canonicalize_url(F.col("u"), strip_ref=True).alias("c"))
            .distinct()
            .count()
        )
        assert (kept, stripped) == (2, 1)
        # ref_src stays a tracking param in both modes
        r = spark.createDataFrame([("http://x.com/?ref_src=tw",)], ["u"]).select(
            canonicalize_url(F.col("u")).alias("c")
        ).collect()[0].c
        assert r == "http://x.com/"


class TestDomainCapSkewSafe:
    def _window_reference(self, df, cap):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
            portable_hash,
        )

        w = Window.partitionBy("domain").orderBy(
            F.col("h").asc(), F.col("doc_id").asc()
        )
        return (
            df.withColumn("domain", registrable_domain(F.col("host")))
            .withColumn("h", portable_hash(F.col("doc_id"), seed=0))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= cap)
            .select("doc_id", "host", "domain")
        )

    def test_mega_domain_exact_vs_plain_window(self, spark):
        df = spark.range(0, 4000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 20 < 19, F.lit("www.mega.co.uk"))
            .otherwise(F.lit("tiny.example.org"))
            .alias("host"),
        )
        got = sorted(map(tuple, domain_cap(df, "host", 13, "doc_id").collect()))
        ref = sorted(map(tuple, self._window_reference(df, 13).collect()))
        assert got == ref and len(got) == 13 + 13

    def test_under_cap_domains_bypass_unchanged(self, spark):
        df = spark.range(0, 9).select(
            F.col("doc_id").alias("doc_id")
            if False
            else F.col("id").alias("doc_id"),
            F.concat(F.lit("h"), (F.col("id") % 3).cast("string"), F.lit(".com")).alias(
                "host"
            ),
        )
        out = domain_cap(df, "host", 5, "doc_id")
        assert out.count() == 9  # 3 domains x 3 rows, all under cap
        assert out.columns == ["doc_id", "host", "domain"]

    def test_shortfall_fallback_is_exact(self, spark, monkeypatch):
        # adversarial hash: every value at the top of the 32-bit range, so
        # the oversampled threshold finds ZERO survivors and the checked
        # fallback must take over — the answer may not depend on hash
        # uniformity
        span = 1 << 32

        def hostile_hash(col, seed=0):
            return (F.lit(span - 1) - F.col("doc_id")).cast("bigint")

        monkeypatch.setattr(web_mod, "portable_hash", hostile_hash)
        df = spark.range(0, 500).select(
            F.col("id").alias("doc_id"), F.lit("big.site.com").alias("host")
        )
        got = domain_cap(df, "host", 3, "doc_id").collect()
        # smallest hostile hashes = LARGEST doc_ids
        assert sorted(r.doc_id for r in got) == [497, 498, 499]


class TestPsl:
    def test_parse_rules(self):
        rules = parse_psl(
            "// comment\n\ncom\nco.uk\n*.ck\n!www.ck\nCO.JP\nco.uk\n"
        )
        by_key = {k: (el, pl, exc) for k, el, pl, exc in rules}
        assert by_key["com"] == (1, 1, False)
        assert by_key["co.uk"] == (2, 2, False)
        assert by_key["ck"] == (2, 2, False)  # wildcard tail
        # exception: key 'www.ck' (2 labels) wins with priority; the
        # public suffix is the rule minus its first label (ps_len 1)
        assert by_key["www.ck"] == (2, 1, True)
        assert by_key["co.jp"] == (2, 2, False)  # lowercased

    def test_unsupported_rule_raises(self):
        with pytest.raises(ValueError):
            parse_psl("a.*.b\n")

    def test_operator_long_tail_and_spec_cases(self, spark):
        rules = load_psl(PSL_PATH)
        hosts = [
            ("docs.foo.gov.br", "foo.gov.br"),
            ("portal.camara.leg.br", "camara.leg.br"),
            ("a.b.foo.ck", "b.foo.ck"),  # *.ck: foo.ck is a PS
            ("foo.ck", None),  # host IS a public suffix
            ("www.ck", "www.ck"),  # !www.ck exception
            ("sub.www.ck", "www.ck"),
            ("x.unknowntld", "x.unknowntld"),  # implicit * default
            ("news.bbc.co.uk", "bbc.co.uk"),
        ]
        df = spark.createDataFrame([(h,) for h, _ in hosts], ["host"])
        got = {
            r.host: r.domain
            for r in registrable_domain_psl(df, "host", rules).collect()
        }
        assert got == dict(hosts)

    def test_parity_with_literal_excerpt(self, spark):
        rules = load_psl(PSL_PATH)
        df = spark.createDataFrame(
            [(f"sub.site.{s}",) for s in MULTI_LABEL_SUFFIXES]
            + [("deep.x.example.com",), ("plain.org",)],
            ["host"],
        )
        lit = df.select("host", registrable_domain(F.col("host")).alias("d1"))
        psl = registrable_domain_psl(df, "host", rules).withColumnRenamed(
            "domain", "d2"
        )
        assert lit.join(psl, "host").filter("d1 <> d2").count() == 0

    def test_duckdb_mirror_matches(self, spark):
        rules = load_psl(PSL_PATH)
        hosts = ["news.bbc.co.uk", "foo.gov.br", "a.b.foo.ck", "www.ck", "z.er"]
        con = duckdb.connect()
        vals = ", ".join(f"('{h}')" for h in hosts)
        con.execute(f"CREATE TABLE h AS SELECT * FROM (VALUES {vals}) t(host)")
        duck = dict(
            con.execute(registrable_domain_psl_sql("h", "host", rules)).fetchall()
        )
        df = spark.createDataFrame([(h,) for h in hosts], ["host"])
        sp = {
            r.host: r.domain
            for r in registrable_domain_psl(df, "host", rules).collect()
        }
        assert duck == sp

    def test_registry_step(self, spark):
        df = spark.createDataFrame([("news.bbc.co.uk",)], ["host"])
        r = apply_operator(
            "registrableDomainPsl", df, {"host_col": "host", "psl_path": PSL_PATH}
        ).collect()[0]
        assert r.domain == "bbc.co.uk"


class TestDeltaStatsSkipping:
    @pytest.fixture()
    def table(self, spark, tmp_path):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        tbl = str(tmp_path / "tbl")
        for lo in (0, 100, 200):
            df = (
                spark.range(lo, lo + 100)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 2).alias("v"),
                    F.concat(F.lit("s"), F.col("id").cast("string")).alias("name"),
                )
                .coalesce(1)
            )
            dl.write_delta_lite(df, tbl, mode="append")
        return tbl

    def _last_commit_params(self, tbl, version):
        with open(os.path.join(tbl, "_delta_log", f"{version:020d}.json")) as fh:
            return json.loads(fh.readline())["commitInfo"]["operationParameters"]

    def test_add_actions_record_minmax_stats(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        snap = dl.load_snapshot(table)
        stats = [json.loads(a["stats"]) for a in snap.files.values()]
        ks = sorted((s["minValues"]["k"], s["maxValues"]["k"]) for s in stats)
        assert ks == [(0, 99), (100, 199), (200, 299)]
        assert all(s["nullCount"]["k"] == 0 for s in stats)
        assert all(s["minValues"]["name"].startswith("s") for s in stats)

    def test_keyed_merge_touches_one_file(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        src = spark.range(150, 160).select(
            F.col("id").alias("k"),
            F.lit(-1).cast("bigint").alias("v"),
            F.lit("upd").alias("name"),
        )
        v = dl.merge_delta_lite(
            spark, table, src, ["k"], when_matched_update={"v": "src_v"}
        )
        params = self._last_commit_params(table, v)
        assert params["candidateFiles"] == 1
        assert params["matchedFiles"] == 1
        out = dl.read_delta_lite(spark, table)
        assert out.filter("k = 155").collect()[0].v == -1
        assert out.filter("k = 55").collect()[0].v == 110
        assert out.count() == 300

    def test_keyed_delete_prunes_and_is_exact(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        v = dl.delete_delta_lite(spark, table, "k >= 250 AND k < 260")
        params = self._last_commit_params(table, v)
        assert params["candidateFiles"] == 1
        assert dl.read_delta_lite(spark, table).count() == 290

    def test_predicate_read_equals_filtered_full_read(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        pred = "k >= 95 AND k <= 105"
        a = sorted(
            map(tuple, dl.read_delta_lite(spark, table, predicate=pred).collect())
        )
        b = sorted(
            map(
                tuple,
                dl.read_delta_lite(spark, table).filter(pred).collect(),
            )
        )
        assert a == b and len(a) == 11

    def test_complex_predicate_is_conservative(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        snap = dl.load_snapshot(table)
        conj = dl._parse_conjuncts("k % 2 = 0 OR v > 3")
        assert conj == []
        assert len(dl._candidate_files(snap, conj)) == 3
        # unparsed conjunct inside an AND chain: the parsed one still prunes
        conj2 = dl._parse_conjuncts("name LIKE 's%' AND k <= 50")
        assert ("k", "<=", 50) in conj2
        assert len(dl._candidate_files(snap, conj2)) == 1

    def test_string_and_reversed_literal_conjuncts(self, spark, table):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        snap = dl.load_snapshot(table)
        assert len(dl._candidate_files(snap, dl._parse_conjuncts("150 <= k"))) == 2
        assert len(dl._candidate_files(snap, dl._parse_conjuncts("name = 's5'"))) >= 1

    def test_all_null_column_keeps_file(self, spark, tmp_path):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        tbl = str(tmp_path / "nulls")
        df = spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit(None).cast("bigint").alias("v")
        )
        dl.write_delta_lite(df, tbl)
        snap = dl.load_snapshot(tbl)
        # v has no min/max evidence -> any v-predicate keeps the file
        assert len(dl._candidate_files(snap, dl._parse_conjuncts("v = 5"))) == len(
            snap.files
        )

    def test_long_strings_not_recorded(self, spark, tmp_path):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        tbl = str(tmp_path / "longs")
        df = spark.range(0, 5).select(
            F.col("id").alias("k"),
            F.concat(F.lit("x" * 200), F.col("id").cast("string")).alias("blob"),
        )
        dl.write_delta_lite(df, tbl)
        snap = dl.load_snapshot(tbl)
        stats = json.loads(list(snap.files.values())[0]["stats"])
        assert "blob" not in stats.get("minValues", {})
        assert "k" in stats["minValues"]


class TestRobots:
    TXT = (
        "# policy\n"
        "User-agent: gptbot\nDisallow: /\n\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /tmp/*.log$\n"
        "Disallow: /search\n"
        "Allow: /search$\n"
        "Crawl-delay: 10\n\n"
        "User-agent: researchbot\nUser-agent: otherbot\n"
        "Allow: /\nDisallow: /nope/\n"
    )

    def test_parse_group_selection(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
            parse_robots,
        )

        assert parse_robots(self.TXT, "gptbot") == [("/", False, 1)]
        # longest-prefix UA match; unknown UA falls to the * group
        res = parse_robots(self.TXT, "researchbot/1.2")
        assert ("/nope/", False, 6) in res and ("/", True, 1) in res
        star = parse_robots(self.TXT, "somecrawler")
        assert ("/private/ok/", True, 12) in star
        # empty Disallow contributes no rule; no robots -> no rules
        assert parse_robots("User-agent: *\nDisallow:\n") == []

    def test_verdicts_both_engines(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
            parse_robots,
            robots_filter,
            robots_filter_sql,
            robots_rules_df,
        )

        rules_by_domain = {"example.com": parse_robots(self.TXT)}
        urls = [
            (1, "https://www.example.com/private/ok/page", True),
            (2, "https://example.com/private/secret", False),
            (3, "https://example.com/tmp/a.log", False),  # $ anchor holds
            (4, "https://example.com/tmp/a.logx", True),  # $ anchor fails
            (5, "https://example.com/search", True),  # longest match wins
            (6, "https://example.com/searchy", False),
            (7, "https://norules.net/x", True),  # default allow
            (8, "https://example.com", True),  # empty path -> '/'
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u, _ in urls], ["doc_id", "url"]
        )
        rules = robots_rules_df(spark, rules_by_domain)
        got = {
            r.doc_id: r.robots_allowed
            for r in robots_filter(df, "url", rules).collect()
        }
        assert got == {i: a for i, u, a in urls}
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{u}')" for i, u, _ in urls)
        con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {vals}) v(doc_id, url)")
        duck = dict(
            con.execute(
                "SELECT doc_id, robots_allowed FROM ("
                + robots_filter_sql("t", "url", rules_by_domain)
                + ")"
            ).fetchall()
        )
        assert duck == {i: a for i, u, a in urls}

    def test_row_multiplicity_preserved(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
            parse_robots,
            robots_filter,
            robots_rules_df,
        )

        df = spark.createDataFrame(
            [(1, "https://example.com/a")] * 3, ["doc_id", "url"]
        )
        rules = robots_rules_df(spark, {"example.com": parse_robots(self.TXT)})
        assert robots_filter(df, "url", rules).count() == 3

    def test_registry_step(self, spark):
        df = spark.createDataFrame(
            [(1, "https://example.com/private/x")], ["doc_id", "url"]
        )
        r = apply_operator(
            "robotsFilter",
            df,
            {
                "url_col": "url",
                "robots_map_json": json.dumps({"example.com": self.TXT}),
            },
        ).collect()[0]
        assert r.robots_allowed is False


class TestOptimizeZorder:
    def test_zorder_makes_stats_prune(self, spark, tmp_path):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.sources import (
            delta_lite as dl,
        )

        tbl = str(tmp_path / "zo")
        # three INTERLEAVED batches: every file spans the full key range,
        # so stats can prune nothing
        for off in (0, 1, 2):
            df = spark.range(0, 100).select(
                (F.col("id") * 3 + off).alias("k"),
                (F.col("id") % 7).alias("v"),
            ).coalesce(1)
            dl.write_delta_lite(df, tbl, mode="append")
        snap = dl.load_snapshot(tbl)
        conj = dl._parse_conjuncts("k >= 10 AND k <= 19")
        assert len(dl._candidate_files(snap, conj)) == 3  # no pruning possible

        v = dl.optimize_delta_lite(tbl, spark, target_files=3, zorder_by=["k"])
        with open(os.path.join(tbl, "_delta_log", f"{v:020d}.json")) as fh:
            ci = json.loads(fh.readline())["commitInfo"]
        assert ci["operationParameters"]["zOrderBy"] == ["k"]
        snap2 = dl.load_snapshot(tbl)
        # rows identical, clustering real: the same predicate now touches
        # a strict subset of the files
        assert dl.read_delta_lite(spark, tbl).count() == 300
        pruned = dl._candidate_files(snap2, conj)
        assert 1 <= len(pruned) < len(snap2.files) or len(snap2.files) == 1
        got = sorted(
            r.k for r in dl.read_delta_lite(spark, tbl, predicate="k >= 10 AND k <= 19").collect()
        )
        assert got == list(range(10, 20))


class TestKAnonymity:
    def test_report_exact(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            k_anonymity_report,
        )

        rows = (
            [("z1", "a", 100)] * 5           # group of 5, one salary value
            + [("z1", "b", i) for i in range(3)]  # group of 3, diverse
            + [("z2", "a", 7)]                # singleton
        )
        df = spark.createDataFrame(rows, ["zip", "seg", "salary"])
        r = k_anonymity_report(df, ["zip", "seg"], k=4, sensitive_col="salary").collect()[0]
        assert (r.n_rows, r.n_groups, r.min_group_size) == (9, 3, 1)
        assert (r.rows_below_k, r.at_risk_bp, r.k_anonymous) == (4, 4444, False)
        assert r.min_l_diversity == 1  # the 5-row group leaks its salary

    def test_anonymous_case_and_no_sensitive(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            k_anonymity_report,
        )

        df = spark.createDataFrame(
            [("z", i % 2) for i in range(10)], ["zip", "p"]
        )
        r = k_anonymity_report(df, ["zip"], k=10).collect()[0]
        assert (r.k_anonymous, r.rows_below_k) == (True, 0)
        assert "min_l_diversity" not in r.asDict()

    def test_registry_step(self, spark):
        df = spark.createDataFrame([("z", 1), ("z", 2)], ["zip", "s"])
        r = apply_operator(
            "kAnonymity", df, {"quasi_cols": "zip", "k": "2", "sensitive_col": "s"}
        ).collect()[0]
        assert r.k_anonymous is True and r.min_l_diversity == 2


class TestCardRedaction:
    def test_luhn_validation_both_engines(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
            luhn_valid,
            redact_cards,
            redact_cards_sql,
        )

        cases = [
            ("pay 4111111111111111 now", "pay [CARD] now"),
            ("pay 4111 1111 1111 1111 now", "pay [CARD] now"),
            ("id 4111111111111112 kept", "id 4111111111111112 kept"),
            ("amex 378282246310005 ok", "amex [CARD] ok"),
            ("num 1234567890123456 kept", "num 1234567890123456 kept"),
            ("mc 5555-5555-5555-4444 done", "mc [CARD] done"),
            ("short 411111111111 kept", "short 411111111111 kept"),
            ("long 41111111111111111111 kept", "long 41111111111111111111 kept"),
            ("two 4012888888881881 and 4111111111111111 x", "two [CARD] and [CARD] x"),
        ]
        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(cases)], ["i", "t"]
        )
        got = {
            r.i: r.r for r in df.select("i", redact_cards(F.col("t")).alias("r")).collect()
        }
        assert got == {i: want for i, (_, want) in enumerate(cases)}
        con = duckdb.connect()
        vals = ", ".join(f"({i}, '{t}')" for i, (t, _) in enumerate(cases))
        con.execute(f"CREATE TABLE ct AS SELECT * FROM (VALUES {vals}) v(i, t)")
        duck = dict(con.execute(f"SELECT i, {redact_cards_sql('t')} FROM ct").fetchall())
        assert duck == got

    def test_luhn_matches_python(self, spark):
        import random

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.text import (
            luhn_valid,
        )

        def py_luhn(s):
            ds = [int(c) for c in s if c.isdigit()]
            if not 13 <= len(ds) <= 19:
                return False
            total = 0
            for i, d in enumerate(reversed(ds), start=1):
                total += d if i % 2 == 1 else (d * 2 - 9 if d * 2 > 9 else d * 2)
            return total % 10 == 0

        random.seed(7)
        cands = ["".join(random.choice("0123456789") for _ in range(random.randint(12, 20)))
                 for _ in range(40)]
        df = spark.createDataFrame([(c,) for c in cands], ["c"])
        got = {r.c: r.v for r in df.select("c", luhn_valid(F.col("c")).alias("v")).collect()}
        for c in cands:
            assert got[c] == py_luhn(c), c

    def test_registry_step(self, spark):
        df = spark.createDataFrame([("use 4111111111111111 ok",)], ["text"])
        r = apply_operator("redactCards", df, {"text_col": "text"}).collect()[0]
        assert r.text == "use [CARD] ok"


class TestExif:
    @staticmethod
    def _base_jpeg():
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray,
        )

        raster = [[(x * 3 + y * 5) % 200 for x in range(16)] for y in range(16)]
        return encode_jpeg_gray(raster, 16, 16, quality=85)

    def test_roundtrip_random_coords_both_orders(self):
        import random

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            parse_exif,
        )

        random.seed(17)
        for _ in range(50):
            lat = random.randrange(-90_000_000, 90_000_001)
            lon = random.randrange(-180_000_000, 180_000_001)
            bo = random.choice(["II", "MM"])
            o = random.randrange(1, 9)
            r = parse_exif(
                build_exif_app1(
                    orientation=o, make="M", gps_lat_micro=lat,
                    gps_lon_micro=lon, byte_order=bo,
                )
            )
            assert (r["gps_lat_micro"], r["gps_lon_micro"], r["orientation"]) == (
                lat, lon, o,
            ), (lat, lon, bo)

    def test_strip_keeps_pixels_bit_exact(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            inject_app1,
            parse_exif,
            strip_exif,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            parse_image,
        )

        base = self._base_jpeg()
        tagged = inject_app1(
            base,
            build_exif_app1(gps_lat_micro=48_858_370, gps_lon_micro=2_294_481),
        )
        clean = strip_exif(tagged)
        assert parse_exif(tagged)["gps_lat_micro"] == 48_858_370
        assert parse_exif(clean)["has_exif"] is False
        assert parse_image(clean) == parse_image(base)
        # idempotent, and a plain JPEG passes through unchanged
        assert strip_exif(clean) == clean == base

    def test_malformed_exif_raises_with_reason(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            inject_app1,
            parse_exif,
        )

        base = self._base_jpeg()
        good = inject_app1(base, build_exif_app1(orientation=1))
        # truncate inside the APP1 TIFF: IFD entry runs off the segment
        bad = good[:8] + good[10:]
        for payload in (bad, b"Exif\x00\x00IIxx", b"Exif\x00\x00ZZ\x2a\x00"):
            with pytest.raises(ValueError, match="exif|JPEG|marker"):
                parse_exif(payload)

    def test_spark_kernels_and_null_routing(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            exif_features,
            inject_app1,
            strip_exif_payloads,
        )

        base = self._base_jpeg()
        tagged = inject_app1(
            base,
            build_exif_app1(
                orientation=6, make="Cam", gps_lat_micro=-1_500_000,
                gps_lon_micro=2_250_000, byte_order="MM",
            ),
        )
        rows = [
            (0, bytearray(tagged)),
            (1, bytearray(base)),
            # SOI then garbage: a CORRUPT jpeg errors; mere non-JPEG
            # bytes (no SOI, no TIFF) would just report has_exif=False
            (2, bytearray(b"\xff\xd8\x00\x01broken")),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r.doc_id: r for r in exif_features(df).collect()}
        assert (got[0].orientation, got[0].gps_lat_micro, got[0].make) == (
            6, -1_500_000, "Cam",
        )
        assert got[1].has_exif is False and got[1].exif_error is None
        assert got[2].exif_error is not None and got[2].has_exif is None
        stripped = {r.doc_id: r for r in strip_exif_payloads(df).collect()}
        assert stripped[0].bytes_removed > 0 and bytes(stripped[0].payload) == base
        assert stripped[1].bytes_removed == 0
        assert stripped[2].exif_error is not None

    def test_registry_steps(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            inject_app1,
        )

        tagged = inject_app1(
            self._base_jpeg(), build_exif_app1(orientation=2)
        )
        df = spark.createDataFrame(
            [(1, bytearray(tagged))], "doc_id long, payload binary"
        )
        assert apply_operator("exifReport", df, {}).collect()[0].orientation == 2
        out = apply_operator("stripExif", df, {}).collect()[0]
        assert out.bytes_removed > 0


class TestExifFuzz:
    def test_random_corruptions_never_crash(self):
        """Any single-byte corruption of a tagged JPEG either parses to
        SOME report or raises ValueError — never an unhandled exception
        or a hang (bounds checks + entry-count caps)."""
        import random

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            inject_app1,
            parse_exif,
            strip_exif,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray,
        )

        raster = [[(x * 3 + y * 5) % 200 for x in range(16)] for y in range(16)]
        tagged = inject_app1(
            encode_jpeg_gray(raster, 16, 16),
            build_exif_app1(
                orientation=6, make="Cam", datetime_str="2024:01:01 00:00:00",
                gps_lat_micro=1_000_000, gps_lon_micro=-2_000_000,
            ),
        )
        random.seed(23)
        for _ in range(300):
            b = bytearray(tagged)
            pos = random.randrange(len(b))
            b[pos] = random.randrange(256)
            for fn in (parse_exif, strip_exif):
                try:
                    fn(bytes(b))
                except ValueError:
                    pass  # the contract: raise with a reason, never crash

    def test_truncations_never_crash(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
            build_exif_app1,
            parse_exif,
        )

        app1 = build_exif_app1(
            orientation=1, make="M", gps_lat_micro=5, gps_lon_micro=7
        )
        for cut in range(len(app1)):
            try:
                parse_exif(app1[:cut])
            except ValueError:
                pass


class TestRobotsLikeEscapes:
    def test_literal_percent_and_underscore_in_paths(self, spark):
        """Robots patterns and URL paths with literal %/_ (both are SQL
        LIKE metacharacters) must be escaped, not wildcarded."""
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
            robots_filter,
            robots_rules_df,
        )

        rules = robots_rules_df(
            spark, {"example.com": [("/a%b", False, 4), ("/c_d", False, 4)]}
        )
        urls = [
            (1, "https://example.com/a%b/x", False),   # literal match
            (2, "https://example.com/aXb/x", True),    # % must NOT wildcard
            (3, "https://example.com/c_d", False),
            (4, "https://example.com/cXd", True),      # _ must NOT wildcard
        ]
        df = spark.createDataFrame([(i, u) for i, u, _ in urls], ["doc_id", "url"])
        got = {
            r.doc_id: r.robots_allowed
            for r in robots_filter(df, "url", rules).collect()
        }
        assert got == {i: a for i, u, a in urls}
