"""Round-8 fourth-session operators: web curation (URL canonicalize /
registrable domain / per-domain cap), the deterministic log-bucket
quantile sketch, and OHLCV bars."""

import datetime

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.sketches import (
    logbucket_estimate,
    logbucket_index,
    logbucket_merge,
    logbucket_quantiles,
    logbucket_sketch,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.registry import (
    apply_operator,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
    ohlc_bars,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.web import (
    canonicalize_url,
    canonicalize_url_sql,
    domain_cap,
    registrable_domain,
    registrable_domain_sql,
    url_dedup,
)

URL_CASES = [
    # (raw, canonical)
    ("HTTP://WWW.Example.COM:80/Article/17/?utm_source=feed&id=17#frag",
     "http://example.com/Article/17?id=17"),
    ("https://example.com:443/article//", "https://example.com/article"),
    ("https://news.BBC.co.uk/path?b=2&a=1&fbclid=xyz",
     "https://news.bbc.co.uk/path?a=1&b=2"),
    ("http://site.com.au:8080/", "http://site.com.au:8080/"),  # non-default port kept
    ("not a url", None),
    ("  https://example.com  ", "https://example.com/"),
    # round 9: bare ref carries page identity (?ref=<branch> on code
    # hosts) and is KEPT by default; ref_src stays a tracking param
    ("https://example.com/?ref=x", "https://example.com/?ref=x"),
    ("https://example.com/?ref_src=tw", "https://example.com/"),
    ("https://example.com/a?z=1&y=2&x=3", "https://example.com/a?x=3&y=2&z=1"),
]


class TestCanonicalizeUrl:
    def test_hand_cases(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["url"])
        got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
        assert got == [c for _, c in URL_CASES]

    def test_duckdb_mirror_bit_identical(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in URL_CASES], ["url"])
        got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t(url VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(u,) for u, _ in URL_CASES])
        exp = [
            r[0]
            for r in con.execute(
                f"SELECT {canonicalize_url_sql('url')} FROM t"
            ).fetchall()
        ]
        assert got == exp

    def test_plan_is_jvm_only(self, spark):
        df = spark.createDataFrame([("https://a.com/x",)], ["url"])
        plan = df.select(canonicalize_url(F.col("url")))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRegistrableDomain:
    CASES = [
        ("news.bbc.co.uk", "bbc.co.uk"),
        ("example.com", "example.com"),
        ("a.b.site.com.au", "site.com.au"),
        ("localhost", "localhost"),
        # www.gov.uk: gov.uk is a public suffix, so eTLD+1 is the full host
        ("www.gov.uk", "www.gov.uk"),
        ("deep.sub.shop.example.org", "example.org"),
    ]

    def test_hand_cases(self, spark):
        df = spark.createDataFrame([(h,) for h, _ in self.CASES], ["h"])
        got = [r[0] for r in df.select(registrable_domain(F.col("h"))).collect()]
        assert got == [d for _, d in self.CASES]

    def test_duckdb_mirror(self, spark):
        con = duckdb.connect()
        con.execute("CREATE TABLE h(h VARCHAR)")
        con.executemany("INSERT INTO h VALUES (?)", [(h,) for h, _ in self.CASES])
        exp = [
            r[0]
            for r in con.execute(f"SELECT {registrable_domain_sql('h')} FROM h").fetchall()
        ]
        assert exp == [d for _, d in self.CASES]


class TestUrlDedupDomainCap:
    def test_url_dedup_collapses_variants(self, spark):
        rows = [
            (1, "HTTP://WWW.shop.COM:80/p/9?utm_source=a"),
            (2, "http://shop.com/p/9"),
            (3, "http://shop.com/p/9/#frag"),
            (4, "https://other.com/x"),
            (5, "junk"),
        ]
        out = {
            r["canonical_url"]: (r["keep_id"], r["n_variants"])
            for r in url_dedup(
                spark.createDataFrame(rows, ["doc_id", "url"]), "url", "doc_id"
            ).collect()
        }
        assert out["http://shop.com/p/9"] == (1, 3)
        assert out["https://other.com/x"] == (4, 1)
        assert out[None] == (5, 1)  # unparseable lane

    def test_domain_cap_deterministic_and_bounded(self, spark):
        rows = [(i, "s%d.example.com" % (i % 3)) for i in range(60)]
        df = spark.createDataFrame(rows, ["doc_id", "host"])
        kept1 = sorted(r["doc_id"] for r in domain_cap(df, "host", 7, "doc_id").collect())
        kept2 = sorted(r["doc_id"] for r in domain_cap(df, "host", 7, "doc_id").collect())
        assert kept1 == kept2  # deterministic draw
        assert len(kept1) == 7  # all hosts share eTLD+1 example.com
        # a different seed draws a different (but still size-7) set
        kept3 = sorted(
            r["doc_id"] for r in domain_cap(df, "host", 7, "doc_id", seed=1).collect()
        )
        assert len(kept3) == 7 and kept3 != kept1

    def test_domain_cap_rejects_bad_cap(self, spark):
        df = spark.createDataFrame([(1, "a.com")], ["doc_id", "host"])
        with pytest.raises(ValueError):
            domain_cap(df, "host", 0, "doc_id")

    def test_registry_steps(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a.com/x"), (2, "HTTP://A.COM/x")], ["doc_id", "url"]
        )
        out = apply_operator("urlDedup", df, {"url_col": "url", "id_col": "doc_id"})
        assert out.count() == 1
        hosts = spark.createDataFrame(
            [(i, "h.example.com") for i in range(9)], ["doc_id", "host"]
        )
        capped = apply_operator(
            "domainCap", hosts, {"host_col": "host", "cap": "4", "id_col": "doc_id"}
        )
        assert capped.count() == 4


class TestLogbucketSketch:
    def test_hand_buckets(self, spark):
        df = spark.createDataFrame([(1,), (3,), (16,), (17,)], ["v"])
        got = [r[0] for r in df.select(logbucket_index(F.col("v"))).collect()]
        # v=1: e=0,m=0 -> 0; v=3: e=1,m=8 -> 24; v=16: e=4,m=0 -> 64; v=17: e=4,m=1 -> 65
        assert got == [0, 24, 64, 65]

    def test_estimate_relative_error_bound(self, spark):
        vals = [1, 3, 7, 100, 12345, 999_999, 10**12]
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        rows = df.select(
            F.col("v"), logbucket_estimate(logbucket_index(F.col("v"))).alias("est")
        ).collect()
        for r in rows:
            assert abs(r["est"] - r["v"]) <= r["v"] / 32 + 1

    def test_quantiles_vs_numpy(self, spark):
        rng = np.random.default_rng(11)
        vals = (rng.lognormal(4, 1.2, 5000) * 100).astype("int64") + 1
        df = spark.createDataFrame([(int(v),) for v in vals], ["v"])
        sk = logbucket_sketch(df, "v")
        assert sk.count() <= 63 * 16  # bounded state by construction
        for r in logbucket_quantiles(sk).collect():
            exact = int(np.sort(vals)[int((len(vals) - 1) * r["p_x100"] / 100)])
            assert abs(r["est"] - exact) / exact <= 0.032
            assert r["n"] == len(vals)

    def test_merge_identity(self, spark):
        rng = np.random.default_rng(5)
        vals = [(int(v), i % 4) for i, v in enumerate(rng.integers(1, 10**6, 2000))]
        df = spark.createDataFrame(vals, ["v", "g"])
        direct = sorted(map(tuple, logbucket_sketch(df, "v").collect()))
        parts = [
            logbucket_sketch(df.filter(F.col("g") == i), "v") for i in range(4)
        ]
        merged = sorted(map(tuple, logbucket_merge(*parts).collect()))
        assert merged == direct

    def test_registry_step(self, spark):
        df = spark.createDataFrame([(10,), (20,), (3000,)], ["v"])
        out = apply_operator("logbucketSketch", df, {"col": "v"})
        assert {"bucket", "cnt"} == set(out.columns)


class TestOhlcBars:
    TS = datetime.datetime(2024, 3, 1, 10, 0, 0)

    def _df(self, spark):
        t = self.TS
        rows = [
            # same hour, A: open at 10:00:01 (v 1.00), close at 10:59 (v 3.00)
            (1, t + datetime.timedelta(seconds=1), "A", 1.00),
            (2, t + datetime.timedelta(minutes=30), "A", 9.99),
            (3, t + datetime.timedelta(minutes=59), "A", 3.00),
            # tie on timestamp: event_id breaks it -> open is id 4
            (4, t, "B", 5.00),
            (5, t, "B", 7.00),
        ]
        return spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])

    def test_hand_bars(self, spark):
        out = {
            r["key"]: r
            for r in ohlc_bars(
                self._df(spark), "event_type", "ts", "value", "event_id"
            ).collect()
        }
        a, b = out["A"], out["B"]
        assert (a["open_x100"], a["high_x100"], a["low_x100"], a["close_x100"]) == (
            100, 999, 100, 300,
        )
        assert a["volume_x100"] == 100 + 999 + 300 and a["n_ticks"] == 3
        # tie at identical ts: min event_id opens, max event_id closes
        assert (b["open_x100"], b["close_x100"]) == (500, 700)
        assert b["bar_ts"] == self.TS

    def test_no_window_in_plan(self, spark):
        plan = (
            ohlc_bars(self._df(spark), "event_type", "ts", "value", "event_id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan  # one groupBy, no window/self-join

    def test_bad_step_raises(self, spark):
        with pytest.raises(ValueError):
            ohlc_bars(self._df(spark), "event_type", "ts", "value", "event_id",
                      step="3 fortnights")

    def test_registry_step(self, spark):
        out = apply_operator(
            "ohlcBars",
            self._df(spark),
            {"key_col": "event_type", "ts_col": "ts", "value_col": "value",
             "tie_col": "event_id"},
        )
        assert out.count() == 2


class TestStreamingOhlc:
    def test_stream_equals_batch(self, spark, sf_dir):
        import __spark_entry__ as entry_mod

        streamed = sorted(
            map(tuple, entry_mod.queries()["streaming_ohlc"](spark, sf_dir).collect())
        )
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        batch = sorted(
            map(
                tuple,
                ohlc_bars(ev, "event_type", "ts", "value", "event_id")
                .select("key", "bar_ts", "open_x100", "high_x100", "low_x100",
                        "close_x100", "volume_x100", "n_ticks")
                .collect(),
            )
        )
        assert streamed == batch


class TestBarReturnsSkewReport:
    def test_bar_returns_hand_case(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
            bar_returns,
        )

        t = datetime.datetime(2024, 6, 1, 9, 0)
        bars = spark.createDataFrame(
            [("A", t, 100, 120), ("A", t + datetime.timedelta(hours=1), 120, 90),
             ("A", t + datetime.timedelta(hours=2), 90, 110)],
            ["key", "bar_ts", "open_x100", "close_x100"],
        )
        rows = {r["bar_ts"].hour: r for r in bar_returns(bars).collect()}
        # +20/100 = +2000bp; -30/120 => sign*-(30*10000 DIV 120) = -2500bp
        assert rows[9]["ret_bp"] == 2000 and rows[9]["drawdown_bp"] == 0
        assert rows[10]["ret_bp"] == -2500
        # runmax 120, close 90 -> 30*10000 DIV 120 = 2500bp drawdown
        assert rows[10]["drawdown_bp"] == 2500
        assert rows[11]["run_max_x100"] == 120 and rows[11]["drawdown_bp"] == 833

    def test_negative_division_sign_contract(self, spark):
        # -1 close move on open 3: DIV truncates magnitude, sign reapplied
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.timeseries import (
            bar_returns,
        )

        t = datetime.datetime(2024, 6, 1)
        bars = spark.createDataFrame(
            [("K", t, 3, 2)], ["key", "bar_ts", "open_x100", "close_x100"]
        )
        r = bar_returns(bars).collect()[0]
        assert r["ret_bp"] == -3333  # -(1*10000 DIV 3), not floor(-3334)

    def test_skew_report_shares_and_quantiles(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.operators.scale import (
            skew_report,
        )

        # key 0: 60 rows; keys 1..20: 2 rows each -> total 100
        rows = [(0,)] * 60 + [(k,) for k in range(1, 21) for _ in range(2)]
        df = spark.createDataFrame(rows, ["k"])
        out = skew_report(df, "k", top_n=2).collect()
        assert len(out) == 2
        top = out[0] if out[0]["key"] == 0 else out[1]
        assert top["cnt"] == 60 and top["share_bp"] == 6000
        assert top["n_keys"] == 21 and top["max_cnt"] == 60
        # p50 of per-key counts is 2; a SINGLE outlier sits above the p99
        # rank (floor(20*0.99)+1 = 20 of 21) by construction — max_cnt is
        # the column that flags it, and max/p50 is the skew signal
        assert out[0]["p50_cnt_est"] <= 3 and out[0]["p99_cnt_est"] <= 3
        assert top["max_cnt"] // out[0]["p50_cnt_est"] >= 20

    def test_registry_steps(self, spark):
        t = datetime.datetime(2024, 6, 1)
        bars = spark.createDataFrame(
            [("K", t, 100, 110)], ["key", "bar_ts", "open_x100", "close_x100"]
        )
        out = apply_operator("barReturns", bars, {})
        assert out.collect()[0]["ret_bp"] == 1000
        df = spark.createDataFrame([(1,), (1,), (2,)], ["k"])
        rep = apply_operator("skewReport", df, {"key_col": "k", "top_n": "1"})
        assert rep.collect()[0]["cnt"] == 2
