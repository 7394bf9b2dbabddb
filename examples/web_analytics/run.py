"""Web + product analytics on the config dialect (round 8): four
CONCURRENT manifest jobs exercising the session's new operator steps
end-to-end —

  - curate  — `urlDedup` + `domainCap`: crawl-hygiene URL
    canonicalization/dedup and the per-registrable-domain quota over a
    deliberately messy synthetic crawl (mixed-case hosts, default
    ports, tracking params, fragments, multi-label co.uk suffixes);
  - product — `funnel` (signup→view→click→purchase), `retention`
    (daily cohorts, 8 offsets), `ohlcBars` (hourly OHLCV),
    `logbucketSketch` (deterministic value-distribution sketch),
    `transitionMatrix` (Markov event transitions, 5th session), and
    `kmvSketch`+`kmvIntersect` (the viewer/buyer audience-overlap
    estimate from two bounded sketches);
  - linkage — `linkRecords`: blocked Fellegi–Sunter matching of a
    customer table against a corrupted copy, block keys staged by
    plain sqlQuery steps (the dialect-idiomatic way to get expression
    block keys);
  - experiments — the fifth-session stats tier: `expectations` (the
    DQ gate), `abTest` + `rankSumTest` (exact cross-multiplied
    significance decisions), `psiReport` (week-over-week value
    drift), `linearFit` (per-type value trend), `schemaDiff`
    (a deliberately drifted feed shape).

    cd /root/repo && python examples/web_analytics/run.py

Every step is a hash-partitioned join/groupBy or a map expression —
the same configs run unchanged at crawl scale; only paths change.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
    from_manifest,
)

DEMO = "/tmp/web_analytics_demo"
SF = "/root/testdata/sf0.01"


def _stage_inputs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.createOrReplaceTempView("d0")
    spark.sql(
        """
        SELECT doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'Http' END
               || '://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
               || 'host' || CAST(doc_id % 9 AS STRING) || '.Example.co.uk'
               || CASE WHEN doc_id % 3 = 0 THEN ':80' ELSE '' END
               || '/p/' || CAST(doc_id % 60 AS STRING)
               || CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&k=1#f' ELSE '' END AS url,
               'host' || CAST(doc_id % 9 AS STRING) || '.example.co.uk' AS host
        FROM d0
        """
    ).write.mode("overwrite").parquet(f"{DEMO}/raw/crawl")

    spark.read.parquet(f"{SF}/events.parquet").write.mode("overwrite").parquet(
        f"{DEMO}/raw/events"
    )

    spark.read.parquet(f"{SF}/customer.parquet").write.mode("overwrite").parquet(
        f"{DEMO}/raw/clean"
    )
    spark.read.parquet(f"{SF}/customer.parquet").createOrReplaceTempView("c0")
    spark.sql(
        """
        SELECT c_custkey + 1000000 AS d_id,
               CASE WHEN c_custkey % 3 = 0
                    THEN replace(c_name, 'Customer#', 'Custmer#') ELSE c_name END AS d_name,
               c_nationkey AS d_nationkey,
               CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.97 ELSE c_acctbal END AS d_acctbal,
               CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS d_mktsegment
        FROM c0
        """
    ).write.mode("overwrite").parquet(f"{DEMO}/raw/dirty")


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="web-analytics-demo")
    _stage_inputs(spark)

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    import duckdb

    n_docs = duckdb.sql(f"SELECT COUNT(*) FROM '{DEMO}/raw/crawl/*.parquet'").fetchone()[0]
    uniq, dirty_urls = duckdb.sql(
        f"SELECT COUNT(*), COALESCE(SUM(CASE WHEN canonical_url LIKE '%utm%' "
        f"OR canonical_url LIKE '%WWW%' THEN 1 ELSE 0 END), 0) "
        f"FROM '{DEMO}/uniq_urls/*.parquet'"
    ).fetchone()
    print(f"crawl: {n_docs} raw urls -> {uniq} canonical ({dirty_urls} hygiene misses)")
    assert 0 < uniq < n_docs and dirty_urls == 0

    caps = duckdb.sql(f"SELECT domain, n_kept FROM '{DEMO}/domain_stats/*.parquet'").fetchall()
    print(f"domain caps: {caps}")
    # all 9 hosts share eTLD+1 example.co.uk -> ONE domain, capped at 40
    assert caps == [("example.co.uk", 40)]

    # robots verdicts (round 9): Disallow /p/1 blocks /p/1 and /p/10-19
    # EXCEPT the longer Allow /p/13$; everything else default-allows.
    # Trailing-path asserts tolerate the :80 and ?query variants.
    bad, good13, total = duckdb.sql(
        f"SELECT SUM(CASE WHEN NOT robots_allowed THEN 1 ELSE 0 END), "
        f"       SUM(CASE WHEN url LIKE '%/p/13' AND robots_allowed THEN 1 ELSE 0 END), "
        f"       COUNT(*) FROM '{DEMO}/robots_verdicts/*.parquet'"
    ).fetchone()
    expected_bad = duckdb.sql(
        f"SELECT COUNT(*) FROM '{DEMO}/raw/crawl/*.parquet' "
        f"WHERE doc_id % 60 IN (1, 10, 11, 12, 14, 15, 16, 17, 18, 19)"
    ).fetchone()[0]
    print(f"robots: {bad}/{total} disallowed ({good13} /p/13 exempted)")
    assert total == n_docs and bad == expected_bad and good13 > 0

    # full-PSL mapping (round 9): every hostN.example.co.uk resolves to
    # the same registrable domain under the co.uk rule
    psl = duckdb.sql(f"SELECT domain, n FROM '{DEMO}/psl_stats/*.parquet'").fetchall()
    print(f"psl domains: {psl}")
    assert psl == [("example.co.uk", n_docs)]

    # robots rules FROM BODIES (round 10): the rule table is parsed
    # distributively from robots.txt text staged as a view — Disallow
    # /p/2 blocks /p/2 and /p/20-29 except the anchored Allow /p/25$
    bad2, good25, total2 = duckdb.sql(
        f"SELECT SUM(CASE WHEN NOT robots_allowed THEN 1 ELSE 0 END), "
        f"       SUM(CASE WHEN url LIKE '%/p/25' AND robots_allowed THEN 1 ELSE 0 END), "
        f"       COUNT(*) FROM '{DEMO}/robots_verdicts2/*.parquet'"
    ).fetchone()
    expected_bad2 = duckdb.sql(
        f"SELECT COUNT(*) FROM '{DEMO}/raw/crawl/*.parquet' "
        f"WHERE doc_id % 60 IN (2, 20, 21, 22, 23, 24, 26, 27, 28, 29)"
    ).fetchone()[0]
    print(f"robots-from-bodies: {bad2}/{total2} disallowed ({good25} /p/25 exempted)")
    assert total2 == n_docs and bad2 == expected_bad2 and good25 > 0

    # k-anonymity ENFORCEMENT (round 10, linkage task): the released
    # customer table re-audits k-anonymous at k=20 — every generalized
    # quasi group clears k, one ladder level for the whole release
    min_g, n_lvls, n_rel = duckdb.sql(
        f"SELECT MIN(n), COUNT(DISTINCT gen_level), SUM(n) FROM ("
        f"  SELECT c_nationkey, c_mktsegment, bal_band, gen_level, COUNT(*) AS n"
        f"  FROM '{DEMO}/privacy_release/*.parquet'"
        f"  GROUP BY 1, 2, 3, 4)"
    ).fetchone()
    n_cust = duckdb.sql(f"SELECT COUNT(*) FROM '{DEMO}/raw/clean/*.parquet'").fetchone()[0]
    print(f"privacy release: {n_rel}/{n_cust} rows, min group {min_g}, levels {n_lvls}")
    assert min_g >= 20 and n_lvls == 1
    assert n_rel * 10000 >= n_cust * 9700  # suppression within the 3% budget

    fun = duckdb.sql(
        f"SELECT stage, n_users, conv_pct_x10000 FROM '{DEMO}/funnel_report/*.parquet' "
        f"ORDER BY stage_idx"
    ).fetchall()
    print(f"funnel: {fun}")
    ns = [r[1] for r in fun]
    assert len(fun) == 4 and ns == sorted(ns, reverse=True) and fun[0][2] == 10000

    ret = duckdb.sql(
        f"SELECT COUNT(*), MAX(retained_pct_x10000) FROM '{DEMO}/retention_report/*.parquet'"
    ).fetchone()
    print(f"retention rows: {ret[0]} (max bp {ret[1]})")
    assert ret[0] > 0 and ret[1] <= 10000

    n_events = duckdb.sql(f"SELECT COUNT(*) FROM '{DEMO}/raw/events/*.parquet'").fetchone()[0]
    bars = duckdb.sql(
        f"SELECT COUNT(*), SUM(n_ticks) FROM '{DEMO}/bars/*.parquet'"
    ).fetchone()
    sketch_total = duckdb.sql(
        f"SELECT SUM(cnt) FROM '{DEMO}/value_sketch/*.parquet'"
    ).fetchone()[0]
    print(f"bars: {bars[0]} (ticks {bars[1]}); sketch mass {sketch_total}")
    assert bars[1] == n_events and sketch_total == n_events

    ret = duckdb.sql(
        f"SELECT COUNT(*), MAX(drawdown_bp) FROM '{DEMO}/returns/*.parquet'"
    ).fetchone()
    print(f"bar returns: {ret[0]} rows (max drawdown {ret[1]}bp)")
    assert ret[0] == bars[0] and 0 <= ret[1] <= 10000

    sk = duckdb.sql(
        f"SELECT COUNT(*), MAX(share_bp) FROM '{DEMO}/user_skew/*.parquet'"
    ).fetchone()
    print(f"user skew report: top {sk[0]} keys, max share {sk[1]}bp")
    assert sk[0] == 3 and 0 < sk[1] <= 10000

    # transition mass conservation: every event except each user's last
    # contributes exactly one transition
    tr = duckdb.sql(
        f"SELECT SUM(cnt), MIN(prob_sum), MAX(prob_sum) FROM ("
        f"  SELECT from_event, SUM(cnt) AS cnt, SUM(prob_x10000) AS prob_sum"
        f"  FROM '{DEMO}/transitions/*.parquet' GROUP BY from_event)"
    ).fetchone()
    n_users = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{DEMO}/raw/events/*.parquet'"
    ).fetchone()[0]
    print(f"transitions: {tr[0]} pairs (rows prob-sum {tr[1]}..{tr[2]}bp)")
    assert tr[0] == n_events - n_users  # one transition per non-final event
    assert 9970 <= tr[1] <= 10000 and tr[2] <= 10000  # integer-DIV rows sum to ~1

    ov = duckdb.sql(
        f"SELECT k, n_both, jaccard_x10000 FROM '{DEMO}/audience_overlap/*.parquet'"
    ).fetchone()
    print(f"viewer/buyer overlap: {ov[1]}/{ov[0]} union sample in both "
          f"(jaccard {ov[2]}bp)")
    assert ov[0] == 64 and 8000 <= ov[2] <= 10000  # every user views AND buys

    # experiments job: the fifth-session stats tier end-to-end
    dq = dict(duckdb.sql(
        f"SELECT rule_id, passed FROM '{DEMO}/dq_report/*.parquet'"
    ).fetchall())
    print(f"dq gate: {dq}")
    assert dq == {"ev_pk": True, "ev_user": True, "ev_type": True, "ev_rows": True}

    ab = duckdb.sql(
        f"SELECT n_a, n_b, rate_a_bp, rate_b_bp, significant "
        f"FROM '{DEMO}/ab_result/*.parquet'"
    ).fetchone()
    print(f"A/B: control {ab[0]} users @ {ab[2]}bp vs treatment {ab[1]} @ {ab[3]}bp "
          f"-> significant={ab[4]}")
    assert ab[0] + ab[1] == 150 and ab[4] is False  # same population, no effect

    rs = duckdb.sql(
        f"SELECT n_a, n_b, significant FROM '{DEMO}/rank_result/*.parquet'"
    ).fetchone()
    print(f"rank-sum: {rs[0]} vs {rs[1]} values -> significant={rs[2]}")
    assert rs[0] + rs[1] == n_events and rs[2] is False  # identical value dists

    psi = duckdb.sql(
        f"SELECT n_ref, n_cur, psi_x10000 FROM '{DEMO}/drift_report/*.parquet'"
    ).fetchone()
    print(f"psi drift week1 vs rest: {psi[2]}bp over {psi[0]}+{psi[1]} rows")
    assert psi[0] + psi[1] == n_events and 0 <= psi[2] < 1000  # same distribution

    tr2 = duckdb.sql(
        f"SELECT COUNT(*), COUNT(slope_x1000) FROM '{DEMO}/trend_report/*.parquet'"
    ).fetchone()
    assert tr2[0] == 5 and tr2[1] == 5  # a slope per event type

    sd = dict(duckdb.sql(
        f"SELECT col_name, status FROM '{DEMO}/schema_report/*.parquet'"
    ).fetchall())
    print(f"schema drift: {sd}")
    assert sd == {"event_id": "ok", "user_id": "type_mismatch",
                  "value": "ok", "props": "only_right"}

    m = duckdb.sql(
        f"SELECT COUNT(*), SUM(CASE WHEN right_id - 1000000 = left_id THEN 1 ELSE 0 END) "
        f"FROM '{DEMO}/matches/*.parquet'"
    ).fetchone()
    print(f"linkage: {m[0]} matches, {m[1]} true")
    # every match above threshold is a true pair here (blocks are tight),
    # and the model's documented false negatives keep it below the total
    n_cust = duckdb.sql(f"SELECT COUNT(*) FROM '{DEMO}/raw/clean/*.parquet'").fetchone()[0]
    assert m[0] == m[1] and 0 < m[0] < n_cust

    print("web_analytics example OK")


if __name__ == "__main__":
    main()
