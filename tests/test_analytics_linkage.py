"""Funnel / retention analytics and blocked Fellegi–Sunter linkage."""

import datetime

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
    funnel,
    retention,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.linkage import (
    FieldComparator,
    blocked_pairs,
    link_records,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)

T0 = datetime.datetime(2024, 5, 1, 9, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + datetime.timedelta(minutes=m), t) for u, m, t in rows],
        ["user_id", "ts", "event_type"],
    )


class TestFunnel:
    def test_hand_funnel(self, spark):
        rows = [
            # u1 completes all three stages in order
            (1, 0, "signup"), (1, 10, "view"), (1, 20, "purchase"),
            # u2: view BEFORE signup does not count; no purchase
            (2, 0, "view"), (2, 5, "signup"),
            # u3: signup only
            (3, 0, "signup"),
            # u4: never signs up -> not in funnel at all
            (4, 0, "view"), (4, 5, "purchase"),
        ]
        out = {
            r["stage"]: r
            for r in funnel(
                _ev(spark, rows), "user_id", "ts", "event_type",
                ["signup", "view", "purchase"],
            ).collect()
        }
        assert out["signup"]["n_users"] == 3
        assert out["view"]["n_users"] == 1  # only u1 viewed after signup
        assert out["purchase"]["n_users"] == 1
        assert out["signup"]["conv_pct_x10000"] == 10000
        assert out["view"]["conv_pct_x10000"] == 3333  # 1*10000 DIV 3

    def test_strictly_after_semantics(self, spark):
        # same-timestamp stage-2 event does NOT count (strictly after)
        rows = [(1, 0, "signup"), (1, 0, "view")]
        out = {
            r["stage"]: r["n_users"]
            for r in funnel(
                _ev(spark, rows), "user_id", "ts", "event_type", ["signup", "view"]
            ).collect()
        }
        assert out == {"signup": 1, "view": 0}

    def test_empty_stages_raises(self, spark):
        with pytest.raises(ValueError):
            funnel(_ev(spark, []), "user_id", "ts", "event_type", [])

    def test_registry_step(self, spark):
        rows = [(1, 0, "signup"), (1, 1, "view")]
        out = apply_operator(
            "funnel",
            _ev(spark, rows),
            {"user_col": "user_id", "ts_col": "ts", "type_col": "event_type",
             "stages": "signup,view"},
        )
        assert out.count() == 2


class TestRetention:
    def test_hand_cohorts(self, spark):
        day = datetime.timedelta(days=1)
        rows = [
            (1, T0, ), (1, T0 + day, ), (1, T0 + 3 * day, ),
            (2, T0, ), (2, T0 + day, ),
            (3, T0 + day, ),  # second cohort
        ]
        df = spark.createDataFrame(rows, ["user_id", "ts"])
        out = {
            (r["cohort_day"], r["day_offset"]): (r["n_active"], r["n_cohort"],
                                                 r["retained_pct_x10000"])
            for r in retention(df, "user_id", "ts", max_offset=3).collect()
        }
        d0 = datetime.date(2024, 5, 1)
        assert out[(d0, 0)] == (2, 2, 10000)
        assert out[(d0, 1)] == (2, 2, 10000)
        assert out[(d0, 3)] == (1, 2, 5000)
        assert (d0, 2) not in out  # nobody active at offset 2
        assert out[(datetime.date(2024, 5, 2), 0)] == (1, 1, 10000)

    def test_same_day_duplicates_count_once(self, spark):
        df = spark.createDataFrame(
            [(1, T0), (1, T0 + datetime.timedelta(hours=2))], ["user_id", "ts"]
        )
        rows = retention(df, "user_id", "ts", max_offset=1).collect()
        assert len(rows) == 1 and rows[0]["n_active"] == 1

    def test_registry_step(self, spark):
        df = spark.createDataFrame([(1, T0)], ["user_id", "ts"])
        out = apply_operator(
            "retention", df, {"user_col": "user_id", "ts_col": "ts",
                              "max_offset": "2"}
        )
        assert out.count() == 1


class TestLinkage:
    def _sides(self, spark):
        left = spark.createDataFrame(
            [(1, "Ann Smith", "NY", 100.00), (2, "Bob Jones", "NY", 55.00),
             (3, "Cal Poe", "LA", 9.99)],
            ["id", "name", "city", "bal"],
        )
        right = spark.createDataFrame(
            [(11, "Ann Smith", "NY", 100.10),   # true match of 1 (bal within tol)
             (12, "Bob Jnoes", "NY", 55.00),    # typo'd 2: name disagrees
             (13, "Cal Poe", "SF", 9.99)],      # moved city: different block
            ["id", "name", "city", "bal"],
        )
        return left, right

    COMPS = [
        FieldComparator("name", "name", "exact", 3000, -1000),
        FieldComparator("bal", "bal", "abs_tol_x100", 1000, -1000, param=20),
    ]

    def test_blocking_bounds_candidates(self, spark):
        left, right = self._sides(spark)
        pairs = blocked_pairs(left, right, [(F.col("l.city"), F.col("r.city"))])
        # only NY x NY pairs: 2 left x 2 right = 4 (never 3x3=9)
        assert pairs.count() == 4

    def test_scores_and_threshold(self, spark):
        left, right = self._sides(spark)
        out = {
            (r["left_id"], r["right_id"]): r["score"]
            for r in link_records(
                left, right, [(F.col("l.city"), F.col("r.city"))],
                self.COMPS, 1500, "id", "id",
            ).collect()
        }
        assert out == {(1, 11): 4000}  # typo'd Bob scores -1000+1000=0 < 1500
        # Cal's true match is a blocking false negative (city moved):
        # absent by construction, not by scoring

    def test_no_blocking_rejected(self, spark):
        left, right = self._sides(spark)
        with pytest.raises(ValueError):
            blocked_pairs(left, right, [])

    def test_registry_step(self, spark):
        left, right = self._sides(spark)
        right.createOrReplaceTempView("linkage_right_v")
        out = apply_operator(
            "linkRecords",
            left,
            {"right_view": "linkage_right_v", "block_keys": "city:city",
             "comparators": '[{"left_col": "name", "right_col": "name", '
                            '"kind": "exact", "w_agree": 3000, "w_disagree": -1000}]',
             "threshold": "1500", "left_id": "id", "right_id": "id"},
        )
        assert {(r["left_id"], r["right_id"]) for r in out.collect()} == {(1, 11)}


class TestTransitionMatrix:
    def test_hand_sequences(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            transition_matrix,
        )

        # u1: a -> b -> a -> b ; u2: a -> a  (transitions never cross users)
        ev = _ev(spark, [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "b"),
            (2, 0, "a"), (2, 1, "a"),
        ])
        got = {
            (r.from_event, r.to_event): (r.cnt, r.from_total, r.prob_x10000)
            for r in transition_matrix(ev, "user_id", "ts", "event_type").collect()
        }
        assert got == {
            ("a", "b"): (2, 3, 6666),   # 2*10000 DIV 3
            ("a", "a"): (1, 3, 3333),
            ("b", "a"): (1, 1, 10000),
        }

    def test_tie_break_is_deterministic(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            transition_matrix,
        )

        # two events on the SAME timestamp: tie_col (id) fixes the order
        rows = [(1, T0, "b", 2), (1, T0, "a", 1), (1, T0 + datetime.timedelta(minutes=1), "c", 3)]
        ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type", "eid"])
        got = {
            (r.from_event, r.to_event)
            for r in transition_matrix(
                ev, "user_id", "ts", "event_type", tie_col="eid"
            ).collect()
        }
        assert got == {("a", "b"), ("b", "c")}

    def test_min_count_keeps_full_row_totals(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.analytics import (
            transition_matrix,
        )

        # a->b twice, a->c once; min_count=2 drops a->c but a->b's
        # probability is still 2/3 of the FULL row
        ev = _ev(spark, [
            (1, 0, "a"), (1, 1, "b"),
            (2, 0, "a"), (2, 1, "b"),
            (3, 0, "a"), (3, 1, "c"),
        ])
        rows = transition_matrix(
            ev, "user_id", "ts", "event_type", min_count=2
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.from_event, r.to_event, r.cnt, r.from_total, r.prob_x10000) == (
            "a", "b", 2, 3, 6666
        )

    def test_registry_step(self, spark):
        ev = _ev(spark, [(1, 0, "a"), (1, 1, "b")])
        out = apply_operator(
            "transitionMatrix",
            ev,
            {"user_col": "user_id", "ts_col": "ts", "type_col": "event_type",
             "min_count": "1"},
        ).collect()
        assert [(r.from_event, r.to_event, r.prob_x10000) for r in out] == [
            ("a", "b", 10000)
        ]
