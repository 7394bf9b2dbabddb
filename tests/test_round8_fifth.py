"""Round-8 fifth-session late ops: rule-based expectations report and
the per-key integer OLS trend."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
    linear_fit,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
    Expectation,
    expectations_report,
)


@pytest.fixture(scope="module")
def dirty(spark):
    rows = [
        # id, price, status, code
        (1, 10.0, "A", "1-HIGH"),
        (1, 20.0, "B", "2-MED"),      # duplicate id
        (2, -5.0, "A", "9-JUNK"),     # price below range, bad code
        (3, None, "C", "3-LOW"),      # null price, status outside set
        (None, 50.0, "A", None),      # null id, null code
    ]
    return spark.createDataFrame(rows, ["id", "price", "status", "code"])


class TestExpectations:
    def test_all_kinds(self, dirty):
        rules = [
            Expectation("r_null", "not_null", "id"),
            Expectation("r_uniq", "unique", "id"),
            Expectation("r_range", "in_range", "price", lo=0, hi=100),
            Expectation("r_set", "in_set", "status", values=["A", "B"]),
            Expectation("r_re", "regex_match", "code", pattern="^[1-5]-"),
            Expectation("r_rows", "row_count_between", lo=1, hi=4),
        ]
        got = {
            r.rule_id: (r.n_rows, r.n_failed, r.passed)
            for r in expectations_report(dirty, rules).collect()
        }
        assert got["r_null"] == (5, 1, False)
        # duplicates = total - distinct keys (two rows share id 1)
        assert got["r_uniq"] == (5, 1, False)
        # -5 fails, NULL price fails (explicit NULL semantics)
        assert got["r_range"] == (5, 2, False)
        assert got["r_set"] == (5, 1, False)       # status C
        assert got["r_re"] == (5, 2, False)        # 9-JUNK + NULL code
        assert got["r_rows"] == (5, 1, False)      # 5 rows > hi=4

    def test_clean_data_passes(self, spark):
        df = spark.createDataFrame([(1, 5.0), (2, 6.0)], ["id", "v"])
        rules = [
            Expectation("a", "not_null", "id"),
            Expectation("b", "unique", "id"),
            Expectation("c", "in_range", "v", lo=0, hi=10),
        ]
        assert all(r.passed for r in expectations_report(df, rules).collect())

    def test_validation_errors(self, dirty):
        with pytest.raises(ValueError, match="unknown expectation kind"):
            Expectation("x", "nope", "id")
        with pytest.raises(ValueError, match="needs a column"):
            Expectation("x", "not_null")
        with pytest.raises(ValueError, match="lo and/or hi"):
            Expectation("x", "in_range", "id")
        with pytest.raises(ValueError, match="values"):
            Expectation("x", "in_set", "id")
        with pytest.raises(ValueError, match="pattern"):
            Expectation("x", "regex_match", "id")
        with pytest.raises(ValueError, match="at least one rule"):
            expectations_report(dirty, [])

    def test_registry_step_json_rules(self, dirty):
        out = apply_operator(
            "expectations",
            dirty,
            {"rules": '[{"rule_id": "n", "kind": "not_null", "column": "id"},'
                      ' {"rule_id": "c", "kind": "row_count_between", "lo": 1}]'},
        ).collect()
        got = {r.rule_id: r.passed for r in out}
        assert got == {"n": False, "c": True}


class TestLinearFit:
    def test_exact_positive_slope(self, spark):
        # y = 3x + 5 exactly -> slope_x1000 == 3000
        rows = [("k", x, 3 * x + 5) for x in range(10)]
        df = spark.createDataFrame(rows, ["k", "x", "y"])
        r = linear_fit(df, "k", "x", "y").collect()[0]
        assert (r.n_points, r.slope_x1000) == (10, 3000)

    def test_negative_and_fractional_truncation(self, spark):
        # y = -x: slope -1000; y = x DIV 3 pattern: slope ~ 333
        rows = [("neg", x, -x) for x in range(8)]
        rows += [("frac", x, x // 3) for x in range(9)]
        df = spark.createDataFrame(rows, ["k", "x", "y"])
        got = {r.k: r.slope_x1000 for r in linear_fit(df, "k", "x", "y").collect()}
        assert got["neg"] == -1000
        assert 300 <= got["frac"] <= 400

    def test_degenerate_x_is_null(self, spark):
        df = spark.createDataFrame([("k", 5, 1), ("k", 5, 9)], ["k", "x", "y"])
        r = linear_fit(df, "k", "x", "y").collect()[0]
        assert r.slope_x1000 is None

    def test_translation_invariance(self, spark):
        # shifting x by a huge constant must not change the slope (the
        # global-min rebase is what keeps the moments in int64)
        base = [("k", x, 7 * x + 2) for x in range(20)]
        big = [("k", x + 490_000, 7 * x + 2) for x in range(20)]
        s1 = linear_fit(spark.createDataFrame(base, ["k", "x", "y"]), "k", "x", "y").collect()[0]
        s2 = linear_fit(spark.createDataFrame(big, ["k", "x", "y"]), "k", "x", "y").collect()[0]
        assert s1.slope_x1000 == s2.slope_x1000 == 7000

    def test_registry_step(self, spark):
        df = spark.createDataFrame([("k", x, 2 * x) for x in range(5)], ["k", "x", "y"])
        r = apply_operator(
            "linearFit", df,
            {"key_col": "k", "x_col": "x", "y_col": "y", "scale": "100"},
        ).collect()[0]
        assert r.slope_x100 == 200


class TestABTest:
    @staticmethod
    def _arms(spark, xa, na, xb, nb):
        rows = [("A", 1 if i < xa else 0) for i in range(na)]
        rows += [("B", 1 if i < xb else 0) for i in range(nb)]
        return spark.createDataFrame(rows, ["arm", "conv"])

    def test_significant_and_not(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            ab_test,
        )

        # 60% vs 40% over 100 each: z^2 = 8.0 -> significant at 3.8416
        r = ab_test(self._arms(spark, 60, 100, 40, 100), "arm", "conv").collect()[0]
        assert (r.rate_a_bp, r.rate_b_bp, r.significant) == (6000, 4000, True)
        # 52% vs 48%: z^2 ~ 0.32 -> not significant
        r = ab_test(self._arms(spark, 52, 100, 48, 100), "arm", "conv").collect()[0]
        assert r.significant is False

    def test_exact_threshold_boundary(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            ab_test,
        )

        # make z^2 exactly computable: pass a custom threshold equal to
        # the exact z^2 of the data -> >= comparison flips to True
        df = self._arms(spark, 30, 50, 20, 50)
        # z^2 = (30*50-20*50)^2*100 / (50*50*50*50) = 25e6*100/625e4 = 4.0
        assert ab_test(df, "arm", "conv", z2_x10000=40000).collect()[0].significant
        assert not ab_test(df, "arm", "conv", z2_x10000=40001).collect()[0].significant

    def test_degenerate_pools(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            ab_test,
        )

        all_conv = self._arms(spark, 10, 10, 10, 10)
        none_conv = self._arms(spark, 0, 10, 0, 10)
        assert ab_test(all_conv, "arm", "conv").collect()[0].significant is False
        assert ab_test(none_conv, "arm", "conv").collect()[0].significant is False

    def test_explicit_arm_filter(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            ab_test,
        )

        df = self._arms(spark, 60, 100, 40, 100).unionByName(
            spark.createDataFrame([("C", 1)] * 30, ["arm", "conv"])
        )
        r = ab_test(df, "arm", "conv", arm_a="A", arm_b="B").collect()[0]
        assert (r.arm_a, r.arm_b, r.significant) == ("A", "B", True)

    def test_registry_step(self, spark):
        r = apply_operator(
            "abTest", self._arms(spark, 60, 100, 40, 100),
            {"arm_col": "arm", "converted_col": "conv", "z2_x10000": "38416"},
        ).collect()[0]
        assert r.significant is True


class TestPSIReport:
    def test_identical_slices_near_zero(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            psi_report,
        )

        df = spark.range(1, 2001).select((F.col("id") % 500 + 1).alias("v"))
        r = psi_report(df, df, "v").collect()[0]
        assert r.psi_x10000 == 0  # identical distributions
        assert r.n_ref == r.n_cur == 2000

    def test_shift_is_detected_and_reference_matches(self, spark):
        import math

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            psi_report,
        )

        ref_vals = [(v % 300) + 1 for v in range(1500)]
        cur_vals = [v * 4 for v in ref_vals]  # two-octave shift
        ref = spark.createDataFrame([(v,) for v in ref_vals], ["v"])
        cur = spark.createDataFrame([(v,) for v in cur_vals], ["v"])
        r = psi_report(ref, cur, "v").collect()[0]
        assert r.psi_x10000 > 10000  # PSI > 1: major drift

        # pure-python reference implementation over the same buckets
        def bucket(v):
            e = v.bit_length() - 1
            return e * 16 + ((v << 4) >> e) - 16

        from collections import Counter
        rc, cc = Counter(map(bucket, ref_vals)), Counter(map(bucket, cur_vals))
        buckets = set(rc) | set(cc)
        nr, nc, nb = sum(rc.values()), sum(cc.values()), len(buckets)
        psi = sum(
            ((rc[b] + 1) / (nr + nb) - (cc[b] + 1) / (nc + nb))
            * (math.log((rc[b] + 1) / (nr + nb)) - math.log((cc[b] + 1) / (nc + nb)))
            for b in buckets
        )
        assert r.psi_x10000 == math.floor(psi * 10000 + 0.5)
        assert r.n_buckets == nb

    def test_registry_step(self, spark):
        df = spark.range(1, 101).select((F.col("id") + 10).alias("v"))
        df.createOrReplaceTempView("psi_ref_v")
        r = apply_operator(
            "psiReport", df, {"ref_view": "psi_ref_v", "value_col": "v"}
        ).collect()[0]
        assert r.psi_x10000 == 0


class TestSchemaDiff:
    def test_all_statuses(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            schema_diff,
        )

        left = spark.createDataFrame([(1, 2.0, "x")], ["k", "p", "l_only"])
        right = spark.createDataFrame([(1, "2.0", True)], ["k", "p", "r_only"])
        got = {
            r.col_name: (r.status, r.type_left, r.type_right)
            for r in schema_diff(left, right).collect()
        }
        assert got == {
            "k": ("ok", "bigint", "bigint"),
            "p": ("type_mismatch", "double", "string"),
            "l_only": ("only_left", "string", None),
            "r_only": ("only_right", None, "boolean"),
        }

    def test_no_data_scan(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.validation import (
            schema_diff,
        )

        # a frame whose evaluation would EXPLODE if scanned: the diff
        # must come from metadata alone
        bomb = spark.range(1).select(
            (F.lit(1) / (F.col("id") - F.col("id"))).alias("boom")
        )
        out = schema_diff(bomb, bomb)
        assert all(r.status == "ok" for r in out.collect())

    def test_registry_step(self, spark):
        left = spark.createDataFrame([(1,)], ["k"])
        spark.createDataFrame([("a",)], ["k"]).createOrReplaceTempView("sd_right_v")
        r = apply_operator("schemaDiff", left, {"right_view": "sd_right_v"}).collect()[0]
        assert (r.col_name, r.status) == ("k", "type_mismatch")


class TestRankSumTest:
    @staticmethod
    def _df(spark, a_vals, b_vals):
        rows = [("A", v) for v in a_vals] + [("B", v) for v in b_vals]
        return spark.createDataFrame(rows, ["arm", "v"])

    def test_extreme_separation_boundary(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            rank_sum_test,
        )

        # n=3+3 full separation: z^2 = 27/7 = 3.857... -> significant
        # at 3.8416, NOT at 3.8572 (the exact-comparison boundary)
        df = self._df(spark, [1, 2, 3], [4, 5, 6])
        assert rank_sum_test(df, "arm", "v", "A", "B").collect()[0].significant
        r = rank_sum_test(df, "arm", "v", "A", "B", z2_x10000=38572).collect()[0]
        assert r.significant is False
        assert r.u2 == 0  # every A below every B

    def test_same_distribution_not_significant(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            rank_sum_test,
        )

        vals = [i % 10 for i in range(60)]
        r = rank_sum_test(self._df(spark, vals, vals), "arm", "v", "A", "B").collect()[0]
        assert r.significant is False
        # fully symmetric: U = n1*n2/2 exactly -> u2 == n1*n2
        assert r.u2 == 60 * 60

    def test_all_tied_degenerate(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            rank_sum_test,
        )

        r = rank_sum_test(
            self._df(spark, [5] * 4, [5] * 4), "arm", "v", "A", "B"
        ).collect()[0]
        assert r.significant is False and r.n_values == 1

    def test_matches_python_reference(self, spark):
        import random

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            rank_sum_test,
        )

        random.seed(11)
        a = [random.randrange(20) for _ in range(80)]
        b = [random.randrange(20) + 3 for _ in range(70)]
        r = rank_sum_test(self._df(spark, a, b), "arm", "v", "A", "B").collect()[0]
        # pure-python U (doubled units, ties count once each)
        u2 = sum(2 for x in a for y in b if x > y) + sum(
            1 for x in a for y in b if x == y
        )
        assert r.u2 == u2
        # z^2 with tie correction, float reference for the boolean
        n1, n2 = len(a), len(b)
        n = n1 + n2
        from collections import Counter
        t3 = sum(t ** 3 - t for t in Counter(a + b).values())
        z2 = (3 * (u2 - n1 * n2) ** 2 * n * (n - 1)) / (
            n1 * n2 * (n * (n * n - 1) - t3)
        )
        assert r.significant == (z2 * 10000 >= 38416)

    def test_registry_step(self, spark):
        r = apply_operator(
            "rankSumTest",
            self._df(spark, [1, 2, 3], [4, 5, 6]),
            {"arm_col": "arm", "value_col": "v", "arm_a": "A", "arm_b": "B"},
        ).collect()[0]
        assert r.significant is True
