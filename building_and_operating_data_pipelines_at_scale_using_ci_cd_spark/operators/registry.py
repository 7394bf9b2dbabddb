"""Config-dialect operator registry (§2.9 extensibility).

The reference's only transformation surface is a SQL string
(``spark.json:54-65``). SQL covers the relational core, but the
training-data operators (MinHash near-dup, clustering, splits, packing,
ANN) are multi-step DataFrame programs a SQL string can't express. This
registry makes them config-callable as a peer of ``sqlQuery``::

    {"operatorName": "minhash_near_dups",
     "inputDFName": "documents",
     "operatorParams": {"id_col": "doc_id", "text_col": "text"},
     "outputDFName": "dups"}

Each entry is ``name -> fn(df, **params) -> DataFrame``; the engine
resolves ``inputDFName`` against the registered views, applies the
operator, and registers the output view exactly like a SQL step — so SQL
and operator steps chain freely in one job and Catalyst still owns the
whole plan (operators build lazy DataFrames; nothing executes until the
load phase).

CONSTRUCTION-JOB CONTRACT: a handful of steps run ONE small, bounded
Spark job while BUILDING their plan (not at load time), because the
right plan depends on a scalar fact about the data — ``domainCap``
(hash-prefix shortfall check), ``rankSumTest`` (cardinality guard, only
when ``max_values`` is set), ``nearDupPairs`` / ``ngramJaccardDups``
(duplication-ratio probe, only when ``collapse_exact="auto"``), and
``generalizeToK`` (per-level suppression stats).  All of them route
through :mod:`.guards`, which bounds each job by a design parameter;
see that module's docstring for the full contract.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from .dedup import exact_dedup_groups

    return exact_dedup_groups(df, text_col, id_col)


def _dedup_survivors(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup that returns the surviving ROWS (not the group report):
    the corpus after dropping duplicate content."""
    from .dedup import exact_dedup_groups

    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col)


def _minhash_near_dups(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .dedup import near_dup_pairs

    return near_dup_pairs(df, id_col, text_col, **kw)


def _near_dup_clusters(df: DataFrame, **kw) -> DataFrame:
    from .dedup import near_dup_clusters

    return near_dup_clusters(df, **kw)


def _simhash(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .dedup import simhash_fingerprints

    return simhash_fingerprints(df, id_col, text_col, **kw)


def _winnow_near_dups(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .dedup import winnow_near_dup_pairs

    return winnow_near_dup_pairs(df, id_col, text_col, **kw)


def _embedding_near_dups(df: DataFrame, id_col: str, vec_col: str, **kw) -> DataFrame:
    from .dedup import embedding_near_dup_pairs

    return embedding_near_dup_pairs(df, id_col, vec_col, **kw)


def _text_enrich(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard curation columns: predicted language, quality
    score, token count, fingerprint."""
    from ..functions.text import doc_fingerprint, lang_id, quality_score, token_count

    c = F.col(text_col)
    return (
        df.withColumn("predicted_lang", lang_id(c))
        .withColumn("quality", quality_score(c))
        .withColumn("n_tokens", token_count(c))
        .withColumn("fingerprint", doc_fingerprint(c))
    )


def _hash_split(df: DataFrame, id_col: str, weights: dict, **kw) -> DataFrame:
    from .sampling import hash_split

    return hash_split(df, id_col, {k: float(v) for k, v in weights.items()}, **kw)


def _stratified_sample(df: DataFrame, strata_col: str, fractions, id_col: str, **kw) -> DataFrame:
    from .sampling import stratified_sample

    if isinstance(fractions, dict):
        fractions = {k: float(v) for k, v in fractions.items()}
    else:
        fractions = float(fractions)
    return stratified_sample(df, strata_col, fractions, id_col, **kw)


def _pack_sequential(df: DataFrame, order_col: str, size_col: str, budget, **kw) -> DataFrame:
    from .sampling import pack_sequential

    return pack_sequential(df, order_col, size_col, int(budget), **kw)


def _shuffle_shards(df: DataFrame, id_col: str, n_shards, seed=0, **kw) -> DataFrame:
    """Config shape: global pseudorandom shuffle + shard assignment for
    training-output writes — chain into a file sink with
    ``partitionBy: [shard]`` to land one pseudorandomly-ordered shard
    per directory."""
    from .sampling import shuffle_shards

    return shuffle_shards(df, id_col, int(n_shards), seed=int(seed), **kw)


def _pii_redact(df: DataFrame, text_col: str = "text", output_col: str | None = None) -> DataFrame:
    """Scrub PII shapes in ``text_col``; in place unless ``output_col``."""
    from ..functions.text import redact_pii

    return df.withColumn(output_col or text_col, redact_pii(F.col(text_col)))


def _heavy_hitters(df: DataFrame, item_col: str, **kw) -> DataFrame:
    from ..functions.sketches import heavy_hitters

    kw = {k: int(v) for k, v in kw.items()}  # frac_num/frac_den/k
    return heavy_hitters(df, item_col, **kw)


def _bloom_filtered_join(df: DataFrame, key: str, build_view: str, **kw) -> DataFrame:
    """Config shape: the step's input view is the PROBE side; the build
    side is another registered view named by ``build_view`` (phase_1
    inputs and phase_2 outputs are all temp views — the same
    by-name resolution config SQL uses)."""
    from .scale import bloom_filtered_join

    kw = {k: int(v) if k in ("k", "m") else v for k, v in kw.items()}
    return bloom_filtered_join(df, df.sparkSession.table(build_view), key, **kw)


def _random_projection(df: DataFrame, id_col: str, vec_col: str, out_dim, **kw) -> DataFrame:
    from ..functions.similarity import random_projection

    kw = {k: int(v) if k in ("in_dim", "scale") else v for k, v in kw.items()}
    return random_projection(df, id_col, vec_col, int(out_dim), **kw)


def _term_cooccurrence(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .corpus import term_cooccurrence

    kw = {k: int(v) for k, v in kw.items()}
    return term_cooccurrence(df, id_col, text_col, **kw)


def _bm25_score(df: DataFrame, id_col: str, text_col: str, query_terms, **kw) -> DataFrame:
    """Config shape: ``queryTerms`` as a comma-joined string or list;
    optional k1/b floats, roundDp int."""
    from ..functions.indexing import bm25_scores

    terms = (
        [t for t in query_terms.split(",") if t]
        if isinstance(query_terms, str)
        else list(query_terms)
    )
    kw = {k: (int(v) if k == "round_dp" else float(v)) for k, v in kw.items()}
    return bm25_scores(df, id_col, text_col, terms, **kw)


def _rrf_fuse(df: DataFrame, id_col: str, other_views, rank_col: str = "rank", **kw) -> DataFrame:
    """Config shape: the step's input view is the FIRST ranked list;
    ``otherViews`` names the rest (comma-joined or list) — the same
    by-name view resolution ``bloomFilteredJoin`` uses."""
    from ..functions.indexing import rrf_fuse

    views = (
        [v for v in other_views.split(",") if v]
        if isinstance(other_views, str)
        else list(other_views)
    )
    dfs = [df] + [df.sparkSession.table(v) for v in views]
    kw = {k: int(v) for k, v in kw.items()}
    return rrf_fuse(dfs, id_col, rank_col=rank_col, **kw)


def _phash_fingerprints(df: DataFrame, **kw) -> DataFrame:
    """Config shape: input view carries (doc_id, payload) image rows."""
    from ..functions.phash import phash_fingerprints

    return phash_fingerprints(df, **kw)


def _phash_near_pairs(df: DataFrame, **kw) -> DataFrame:
    """Config shape: input view is a phashFingerprints output."""
    from ..functions.phash import phash_near_pairs

    return phash_near_pairs(df, **{k: int(v) for k, v in kw.items()})


def _url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Config shape: crawl-hygiene URL dedup — canonicalize (case /
    www. / default port / tracking params / param order / trailing
    slash) then one groupBy on the canonical URL."""
    from .web import url_dedup

    return url_dedup(df, url_col, id_col)


def _domain_cap(df: DataFrame, host_col: str, cap, id_col: str, **kw) -> DataFrame:
    """Config shape: keep at most ``cap`` rows per registrable domain
    (eTLD+1 over the bounded public-suffix excerpt), deterministic
    portable-hash draw."""
    from .web import domain_cap

    if "seed" in kw:
        kw["seed"] = int(kw["seed"])
    return domain_cap(df, host_col, int(cap), id_col, **kw)


def _logbucket_sketch(df: DataFrame, col: str, **kw) -> DataFrame:
    """Config shape: the mergeable deterministic log-bucket histogram
    (keep per-shard sketches; summing counts = the whole-corpus
    sketch)."""
    from ..functions.sketches import logbucket_sketch

    return logbucket_sketch(df, col, **{k: int(v) for k, v in kw.items()})


def _ohlc_bars(df: DataFrame, key_col: str, ts_col: str, value_col: str,
               tie_col: str, **kw) -> DataFrame:
    """Config shape: irregular ticks → OHLCV bars per (key, bucket)."""
    from .timeseries import ohlc_bars

    return ohlc_bars(df, key_col, ts_col, value_col, tie_col, **kw)


def _funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
            stages) -> DataFrame:
    """Config shape: ordered conversion funnel; ``stages`` is a
    comma-joined list or a list."""
    from .analytics import funnel

    steps = (
        [s for s in stages.split(",") if s] if isinstance(stages, str) else list(stages)
    )
    return funnel(df, user_col, ts_col, type_col, steps)


def _retention(df: DataFrame, user_col: str, ts_col: str, **kw) -> DataFrame:
    """Config shape: daily cohort retention basis points."""
    from .analytics import retention

    return retention(df, user_col, ts_col, **{k: int(v) for k, v in kw.items()})


def _transition_matrix(df: DataFrame, user_col: str, ts_col: str,
                       type_col: str, **kw) -> DataFrame:
    """Config shape: first-order Markov transition counts +
    basis-point row probabilities over per-user event sequences."""
    from .analytics import transition_matrix

    if "min_count" in kw:
        kw["min_count"] = int(kw["min_count"])
    return transition_matrix(df, user_col, ts_col, type_col, **kw)


def _dsir_select(df: DataFrame, target_view: str, id_col: str,
                 text_col: str, k, **kw) -> DataFrame:
    """Config shape: DSIR importance selection. The step's input view
    is the RAW corpus; ``target_view`` names the target corpus (the
    rrfFuse view-resolution pattern)."""
    from .sampling import dsir_select

    return dsir_select(
        df, df.sparkSession.table(target_view), id_col, text_col, int(k),
        **{key: int(v) for key, v in kw.items()},
    )


def _expectations(df: DataFrame, rules) -> DataFrame:
    """Config shape: rule-based data-quality expectations report;
    ``rules`` is a JSON list of Expectation kwargs (the linkRecords
    comparator-JSON pattern)."""
    import json as _json

    from .validation import Expectation, expectations_report

    spec = _json.loads(rules) if isinstance(rules, str) else rules
    return expectations_report(df, [Expectation(**r) for r in spec])


def _linear_fit(df: DataFrame, key_col: str, x_col: str, y_col: str,
                scale="1000") -> DataFrame:
    """Config shape: per-key OLS trend slope in integer 1/scale units."""
    from .analytics import linear_fit

    return linear_fit(df, key_col, x_col, y_col, scale=int(scale))


def _exif_report(df: DataFrame) -> DataFrame:
    """Config shape: per-image EXIF metadata report over (doc_id,
    payload) — orientation/capture time/make/GPS micro-degrees, broken
    EXIF null-routed."""
    from ..functions.exif import exif_features

    return exif_features(df)


def _strip_exif(df: DataFrame) -> DataFrame:
    """Config shape: privacy scrub — APP1..APP15 metadata removed from
    (doc_id, payload) JPEGs, pixels untouched."""
    from ..functions.exif import strip_exif_payloads

    return strip_exif_payloads(df)


def _k_anonymity(df: DataFrame, quasi_cols, k, **kw) -> DataFrame:
    """Config shape: k-anonymity (+ optional l-diversity) privacy audit.
    ``quasi_cols`` is a comma-separated list or JSON array."""
    import json as _json

    from .validation import k_anonymity_report

    if isinstance(quasi_cols, str):
        quasi_cols = (
            _json.loads(quasi_cols)
            if quasi_cols.lstrip().startswith("[")
            else [c.strip() for c in quasi_cols.split(",") if c.strip()]
        )
    return k_anonymity_report(df, list(quasi_cols), int(k), **kw)


def _redact_cards(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Config shape: Luhn-validated payment-card redaction of a text
    column (in place unless ``out_col`` names a new column)."""
    from ..functions.text import redact_cards

    target = out_col or text_col
    return df.withColumn(target, redact_cards(F.col(text_col)))


def _robots_filter(
    df: DataFrame, url_col: str, robots_map_json: str, **kw
) -> DataFrame:
    """Config shape: RFC 9309 robots politeness verdicts.
    ``robots_map_json`` is a JSON object mapping registrable domain →
    raw robots.txt text; optional ``user_agent`` selects the group
    (default ``*``)."""
    import json as _json

    from .web import parse_robots, robots_filter, robots_rules_df

    ua = kw.pop("user_agent", "*")
    robots_map = _json.loads(robots_map_json)
    rules = robots_rules_df(
        df.sparkSession,
        {dom: parse_robots(txt, ua) for dom, txt in robots_map.items()},
    )
    return robots_filter(df, url_col, rules, **kw)


def _robots_filter_from_bodies(
    df: DataFrame,
    url_col: str,
    rules_view: str,
    domain_col: str = "domain",
    body_col: str = "body",
    **kw,
) -> DataFrame:
    """Config shape: crawl-scale robots verdicts — the rule table is
    parsed DISTRIBUTIVELY from robots.txt bodies staged as a view
    (``rules_view`` with ``domain_col``/``body_col``), so the rule set
    is data, not driver config; the rule join auto-selects broadcast vs
    shuffle by size (``rules_hint='auto'``)."""
    from .web import robots_filter, robots_rules_from_df

    ua = kw.pop("user_agent", "*")
    bodies = df.sparkSession.table(rules_view)
    rules = robots_rules_from_df(bodies, domain_col, body_col, user_agent=ua)
    return robots_filter(df, url_col, rules, **kw)


def _delta_merge(df: DataFrame, table_path: str, on_keys, **kw) -> DataFrame:
    """Config shape: MERGE the input view (the source) into a delta-lite
    table by key — the config-dialect upsert for the lakehouse tier.
    ``on_keys`` is a comma-separated list or JSON array;
    ``when_matched_update_json`` maps column → SQL expr over the joined
    row (source columns visible as ``src_<name>``);
    ``when_matched_delete`` takes "true" or a SQL condition;
    ``when_not_matched_insert`` defaults true; ``mergeSchema`` "true"
    lets a source with NEW columns evolve the table additively
    (delta-spark's schema.autoMerge). Returns the POST-MERGE
    snapshot so downstream steps chain off the new table state. NB: the
    merge executes eagerly when this step runs (it is table DML, not a
    lazy transform)."""
    import json as _json

    from ..sources.delta_lite import merge_delta_lite, read_delta_lite

    keys = (
        [k.strip() for k in on_keys.split(",")]
        if isinstance(on_keys, str)
        else list(on_keys)
    )
    if "when_matched_update_json" in kw:
        kw["when_matched_update"] = _json.loads(
            kw.pop("when_matched_update_json")
        )
    if isinstance(kw.get("when_matched_delete"), str) and kw[
        "when_matched_delete"
    ].lower() in ("true", "false"):
        kw["when_matched_delete"] = kw["when_matched_delete"].lower() == "true"
    if isinstance(kw.get("when_not_matched_insert"), str):
        kw["when_not_matched_insert"] = (
            kw["when_not_matched_insert"].lower() == "true"
        )
    if "mergeSchema" in kw:  # config spelling → python kwarg
        kw["merge_schema"] = str(kw.pop("mergeSchema")).lower() == "true"
    if isinstance(kw.get("merge_schema"), str):
        kw["merge_schema"] = kw["merge_schema"].lower() == "true"
    merge_delta_lite(df.sparkSession, table_path, df, keys, **kw)
    return read_delta_lite(df.sparkSession, table_path)


def _delta_delete(df: DataFrame, table_path: str, condition: str) -> DataFrame:
    """Config shape: row-level DELETE WHERE on a delta-lite table (the
    input view is only the chaining anchor — deletion is table DML and
    executes eagerly, data-skipped by the per-file stats). Returns the
    post-delete snapshot."""
    from ..sources.delta_lite import delete_delta_lite, read_delta_lite

    delete_delta_lite(df.sparkSession, table_path, condition)
    return read_delta_lite(df.sparkSession, table_path)


def _delta_restore(
    df: DataFrame, table_path: str, version=None, timestamp=None
) -> DataFrame:
    """Config shape: ``RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF`` on
    a delta-lite table (the input view is only the chaining anchor —
    restore is table DML and executes eagerly; cost is log-size, no data
    moves, pre-restore versions stay time-travelable). ``version`` is a
    commit number; ``timestamp`` is epoch-ms int or ISO string. Returns
    the post-restore snapshot."""
    from ..sources.delta_lite import read_delta_lite, restore_delta_lite

    restore_delta_lite(
        table_path,
        version=int(version) if version is not None else None,
        timestamp=timestamp,
    )
    return read_delta_lite(df.sparkSession, table_path)


def _delta_convert(df: DataFrame, table_path: str) -> DataFrame:
    """Config shape: CONVERT TO DELTA — turn an existing parquet
    directory (flat or hive-partitioned) into a delta-lite table IN
    PLACE (no data moves; commit 0 references the files with footer
    stats, so data skipping works from the first read). Idempotent on
    an already-delta path. Returns the post-convert snapshot."""
    from ..sources.delta_lite import convert_to_delta, read_delta_lite

    convert_to_delta(df.sparkSession, table_path)
    return read_delta_lite(df.sparkSession, table_path)


def _delta_history(df: DataFrame, table_path: str) -> DataFrame:
    """Config shape: DESCRIBE HISTORY on a delta-lite table — one row
    per commit, newest first (version, timestamp epoch-ms, operation,
    operationParameters as a JSON string). Log-only: never touches
    data, so it is safe on any table size. The input view is only the
    chaining anchor; downstream steps can gate on the history (e.g.
    pick a ``timestampAsOf`` for a later read, audit operations)."""
    import json as _json

    from ..sources.delta_lite import history_delta_lite

    rows = [
        (
            int(h["version"]),
            int(h["timestamp"]),
            h["operation"],
            _json.dumps(h["operationParameters"], sort_keys=True, default=str),
        )
        for h in history_delta_lite(table_path)
    ]
    return df.sparkSession.createDataFrame(
        rows,
        "version bigint, timestamp bigint, operation string, "
        "operationParameters string",
    )


def _delta_constraint(
    df: DataFrame,
    table_path: str,
    name: str,
    expr: str | None = None,
    action: str = "add",
) -> DataFrame:
    """Config shape: ``ALTER TABLE ... ADD/DROP CONSTRAINT`` on a
    delta-lite table. ``action: add`` validates EXISTING rows first
    (one bounded job) and upgrades the writer protocol to 3; from then
    on every row-adding step (simpleInsert, deltaMerge, deltaDelete
    rewrites, scdType2Insert, replaceWhere) refuses rows violating
    ``expr``. ``action: drop`` removes the rule (log-only). The input
    view is only the chaining anchor; returns the table snapshot."""
    from ..sources.delta_lite import (
        add_check_constraint,
        drop_check_constraint,
        read_delta_lite,
    )

    if action == "add":
        if not expr:
            raise ValueError("deltaConstraint action=add requires expr")
        add_check_constraint(df.sparkSession, table_path, name, expr)
    elif action == "drop":
        drop_check_constraint(table_path, name)
    else:
        raise ValueError(f"deltaConstraint action must be add|drop, got {action!r}")
    return read_delta_lite(df.sparkSession, table_path)


def _delta_properties(
    df: DataFrame,
    table_path: str,
    properties_json: str | None = None,
    unset: str | None = None,
) -> DataFrame:
    """Config shape: ``ALTER TABLE ... SET/UNSET TBLPROPERTIES`` —
    ``properties_json`` is a JSON object of key → value;``unset`` a
    comma-separated key list. ``delta.appendOnly: true`` makes every
    later data-removing step refuse (the protocol's writer-v2 rule);
    constraints must go through deltaConstraint. Log-only commit."""
    import json as _json

    from ..sources.delta_lite import read_delta_lite, set_table_properties

    set_table_properties(
        table_path,
        properties=_json.loads(properties_json) if properties_json else None,
        unset=[k.strip() for k in unset.split(",")] if unset else None,
    )
    return read_delta_lite(df.sparkSession, table_path)


def _delta_clone(
    df: DataFrame,
    source_path: str,
    table_path: str,
    version=None,
    timestamp=None,
) -> DataFrame:
    """Config shape: ``CREATE TABLE ... SHALLOW CLONE`` — zero-copy
    fork of ``source_path`` (optionally at a version/timestamp) into
    ``table_path``: one log write referencing the source files in
    place, stats carried so data skipping works from the first read.
    Appends/DML on the clone land in the clone's own directory and
    never touch the source. Returns the clone's snapshot."""
    from ..sources.delta_lite import clone_delta_lite, read_delta_lite

    clone_delta_lite(
        source_path,
        table_path,
        version=int(version) if version is not None else None,
        timestamp=timestamp,
    )
    return read_delta_lite(df.sparkSession, table_path)


def _delta_optimize(
    df: DataFrame, table_path: str, target_files=1, zorder_by=None
) -> DataFrame:
    """Config shape: OPTIMIZE a delta-lite table (dataChange=false
    bin-packing compaction; ``zorder_by`` — comma-separated or JSON
    array — switches to Morton-key clustering so per-file stats prune
    on every clustered column). Maintenance DML, executes eagerly;
    returns the post-OPTIMIZE snapshot for chaining."""
    from ..sources.delta_lite import optimize_delta_lite, read_delta_lite

    cols = (
        [c.strip() for c in zorder_by.split(",")]
        if isinstance(zorder_by, str)
        else (list(zorder_by) if zorder_by else None)
    )
    optimize_delta_lite(
        table_path,
        df.sparkSession,
        target_files=int(target_files),
        zorder_by=cols,
    )
    return read_delta_lite(df.sparkSession, table_path)


def _delta_changes(
    df: DataFrame,
    table_path: str,
    from_version=None,
    to_version=None,
    from_timestamp=None,
    to_timestamp=None,
) -> DataFrame:
    """Config shape: CDC — row-level changes of a delta-lite table
    between two versions (or timestamps, resolved like timestampAsOf),
    tagged ``_change_type`` insert|delete. The input view is only the
    chaining anchor. Exactly one of from_version/from_timestamp is
    required; the 'to' bound defaults to the latest version."""
    from ..sources.delta_lite import _resolve_timestamp, delta_changes

    if (from_version is None) == (from_timestamp is None):
        raise ValueError("pass exactly one of from_version / from_timestamp")
    lo = (
        int(from_version)
        if from_version is not None
        else _resolve_timestamp(table_path, from_timestamp)
    )
    hi = (
        int(to_version)
        if to_version is not None
        else (
            _resolve_timestamp(table_path, to_timestamp)
            if to_timestamp is not None
            else None
        )
    )
    return delta_changes(df.sparkSession, table_path, lo, hi)


def _delta_vacuum(
    df: DataFrame, table_path: str, retain_versions=0, retention_hours=None
) -> DataFrame:
    """Config shape: VACUUM a delta-lite table — physically delete data
    files referenced only by snapshots older than the retained window
    (current + ``retain_versions`` prior + everything committed within
    ``retention_hours``, delta-spark's RETAIN n HOURS; the knobs
    compose). Maintenance DML, executes eagerly; returns the
    (unchanged) current snapshot for chaining."""
    from ..sources.delta_lite import read_delta_lite, vacuum_delta_lite

    vacuum_delta_lite(
        table_path,
        retain_versions=int(retain_versions),
        retention_hours=float(retention_hours) if retention_hours is not None else None,
    )
    return read_delta_lite(df.sparkSession, table_path)


def _generalize_to_k(df: DataFrame, k, ladder_json: str, **kw) -> DataFrame:
    """Config shape: k-anonymity enforcement — generalize quasi columns
    along ``ladder_json`` (a JSON list of ``{col: sql_expr}`` levels,
    least → most general) and suppress residual below-k groups.  NB:
    runs a bounded construction-time job (see the module docstring's
    contract note)."""
    import json as _json

    from .validation import generalize_to_k

    if "max_suppression_bp" in kw:
        kw["max_suppression_bp"] = int(kw["max_suppression_bp"])
    if "l_diversity" in kw:
        kw["l_diversity"] = int(kw["l_diversity"])
    return generalize_to_k(df, int(k), _json.loads(ladder_json), **kw)


def _registrable_domain_psl(
    df: DataFrame, host_col: str, psl_path: str, **kw
) -> DataFrame:
    """Config shape: eTLD+1 under a FULL public-suffix-list file
    (wildcards/exceptions included) — the broadcast-join twin of the
    literal-excerpt path ``domainCap`` uses. ``psl_path`` points at a
    publicsuffix.org-format file on the driver."""
    from .web import load_psl, registrable_domain_psl

    return registrable_domain_psl(df, host_col, load_psl(psl_path), **kw)


def _ab_test(df: DataFrame, arm_col: str, converted_col: str, **kw) -> DataFrame:
    """Config shape: exact two-proportion A/B significance decision."""
    from .analytics import ab_test

    if "z2_x10000" in kw:
        kw["z2_x10000"] = int(kw["z2_x10000"])
    return ab_test(df, arm_col, converted_col, **kw)


def _rank_sum_test(df: DataFrame, arm_col: str, value_col: str,
                   arm_a: str, arm_b: str, **kw) -> DataFrame:
    """Config shape: exact Mann–Whitney rank-sum significance."""
    from .analytics import rank_sum_test

    for k in ("z2_x10000", "max_values", "n_buckets_bits"):
        if kw.get(k) is not None:
            kw[k] = int(kw[k])
    return rank_sum_test(df, arm_col, value_col, arm_a, arm_b, **kw)


def _psi_report(df: DataFrame, ref_view: str, value_col: str, **kw) -> DataFrame:
    """Config shape: PSI drift of the input view's column against a
    reference view (the rrfFuse view-resolution pattern)."""
    from .validation import psi_report

    return psi_report(
        df.sparkSession.table(ref_view), df, value_col,
        **{k: int(v) for k, v in kw.items()},
    )


def _schema_diff(df: DataFrame, right_view: str) -> DataFrame:
    """Config shape: metadata-only schema drift report between the
    input view and ``right_view``."""
    from .validation import schema_diff

    return schema_diff(df, df.sparkSession.table(right_view))


def _kmv_intersect(df: DataFrame, other_view: str, k) -> DataFrame:
    """Config shape: set-overlap / join-size estimate from two full
    KMV sketches. The step's input view is sketch A; ``other_view``
    names sketch B (the rrfFuse view-resolution pattern)."""
    from ..functions.sketches import kmv_intersect

    return kmv_intersect(df, df.sparkSession.table(other_view), int(k))


def _link_records(df: DataFrame, right_view: str, block_keys: str,
                  comparators: str, threshold, left_id: str,
                  right_id: str) -> DataFrame:
    """Config shape: blocked Fellegi–Sunter linkage. The step's input
    view is the LEFT side; ``right_view`` names the right (the rrfFuse
    view-resolution pattern). ``block_keys`` is 'lcol:rcol,...';
    ``comparators`` is a JSON list of FieldComparator kwargs.  Callers
    needing expression block keys (e.g. name suffixes) stage them with
    a sqlQuery step first — idiomatic for the dialect."""
    import json as _json

    from pyspark.sql import functions as _F

    from .linkage import FieldComparator, link_records

    right = df.sparkSession.table(right_view)
    blocks = [
        (_F.col("l." + a), _F.col("r." + b))
        for a, b in (p.split(":") for p in block_keys.split(",") if p)
    ]
    comps = [FieldComparator(**c) for c in _json.loads(comparators)]
    return link_records(df, right, blocks, comps, int(threshold), left_id, right_id)


def _bar_returns(df: DataFrame, **kw) -> DataFrame:
    """Config shape: per-bar returns + drawdown over an ohlcBars view."""
    from .timeseries import bar_returns

    return bar_returns(df, **kw)


def _skew_report(df: DataFrame, key_col: str, **kw) -> DataFrame:
    """Config shape: quantified join-key skew diagnosis."""
    from .scale import skew_report

    return skew_report(df, key_col, **{k: int(v) for k, v in kw.items()})


def _triangle_count(df: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Config shape: exact triangle census of an edge-list view."""
    from ..functions.graph import triangle_count

    return triangle_count(df, src, dst)


def _bfs_levels(df: DataFrame, sources_view: str, src: str = "src",
                dst: str = "dst", node_col: str = "node",
                max_hops="4", directed="false") -> DataFrame:
    """Config shape: multi-source BFS hop distances. The step's input
    view is the edge list; ``sources_view`` names the source-node view
    (the rrfFuse view-resolution pattern)."""
    from ..functions.graph import bfs_levels

    return bfs_levels(
        df, df.sparkSession.table(sources_view), src, dst, node_col,
        max_hops=int(max_hops),
        directed=str(directed).lower() in ("true", "1", "yes"),
    )


def _geo_proximity_pairs(df: DataFrame, id_col: str, lat_col: str,
                         lon_col: str, radius_micro) -> DataFrame:
    """Config shape: all point pairs within a micro-degree radius."""
    from .geo import proximity_pairs

    return proximity_pairs(df, id_col, lat_col, lon_col, int(radius_micro))


def _ohlc_tumbling(df: DataFrame, ts_col: str, key_col: str, value_col: str,
                   tie_col: str, **kw) -> DataFrame:
    """Config shape: streaming tumbling-window OHLCV (the ohlcBars
    twin for a readStream input view)."""
    from ..streaming.ops import ohlc_tumbling

    return ohlc_tumbling(df, ts_col, key_col, value_col, tie_col, **kw)


def _kmv_sketch(df: DataFrame, col: str, **kw) -> DataFrame:
    """Config shape: the mergeable bottom-k rows (keep per-shard
    sketches; union+rerank = the whole-corpus sketch)."""
    from ..functions.sketches import kmv_sketch

    return kmv_sketch(df, col, **{k: int(v) for k, v in kw.items()})


def _decode_image(df: DataFrame, **kw) -> DataFrame:
    """Config shape for the image lane: input view carries (doc_id,
    payload) binary rows; PPM/PGM/BMP/JPEG/PNG/GIF decode natively."""
    from ..functions.multimodal import decode_image

    if "thumb" in kw:
        kw["thumb"] = int(kw["thumb"])
    return decode_image(df, **kw)


def _audio_features(df: DataFrame) -> DataFrame:
    from ..functions.audio import audio_features

    return audio_features(df)


def _sample_video_frames(df: DataFrame, **kw) -> DataFrame:
    from ..functions.avi import sample_video_frames

    if "every" in kw:
        kw["every"] = int(kw["every"])
    return sample_video_frames(df, **kw)


def _chunk_documents(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .corpus import chunk_documents

    kw = {k: int(v) if k in ("chunk_tokens", "overlap") else v for k, v in kw.items()}
    return chunk_documents(df, id_col, text_col, **kw)


def _frequent_ngrams(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .corpus import frequent_ngrams

    if "n" in kw:
        kw["n"] = int(kw["n"])
    if "min_doc_freq" in kw:
        kw["min_doc_freq"] = int(kw["min_doc_freq"])
    return frequent_ngrams(df, id_col, text_col, **kw)


def _decontaminate(
    df: DataFrame, id_col: str, text_col: str, eval_predicate: str, **kw
) -> DataFrame:
    """Config shape for decontamination: ONE input view split by a SQL
    predicate — rows matching ``eval_predicate`` are the held-out eval
    set, the rest the corpus to scrub."""
    from .corpus import contaminated_docs

    if "n" in kw:
        kw["n"] = int(kw["n"])
    if "min_overlap" in kw:
        kw["min_overlap"] = int(kw["min_overlap"])
    return contaminated_docs(
        df.filter(f"NOT ({eval_predicate})"),
        df.filter(eval_predicate),
        id_col,
        text_col,
        **kw,
    )


def _repetition_profile(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .corpus import repetition_profile

    if "n" in kw:
        kw["n"] = int(kw["n"])
    return repetition_profile(df, id_col, text_col, **kw)


def _remove_duplicate_spans(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .corpus import remove_duplicate_spans

    if "span_tokens" in kw:
        kw["span_tokens"] = int(kw["span_tokens"])
    return remove_duplicate_spans(df, id_col, text_col, **kw)


def _nfc_normalize(df: DataFrame, text_col: str = "text", output_col: str | None = None) -> DataFrame:
    from ..functions.register import py_nfc_normalize

    return df.withColumn(output_col or text_col, py_nfc_normalize(F.col(text_col)))


def _filter_with_reasons(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the C4/Gopher filter ledger: ``filter_reasons`` (comma-joined
    string so downstream sinks stay complex-type-free) + ``keep``."""
    from ..functions.text import filter_reasons

    reasons = filter_reasons(F.col(text_col))
    return df.withColumn("keep", F.size(reasons) == 0).withColumn(
        "filter_reasons", F.concat_ws(",", reasons)
    )


def _semantic_dedup(df: DataFrame, id_col: str, vec_col: str, **kw) -> DataFrame:
    from .dedup import semantic_dedup_keep

    if "n_clusters" in kw:
        kw["n_clusters"] = int(kw["n_clusters"])
    if "threshold" in kw:
        kw["threshold"] = float(kw["threshold"])
    return semantic_dedup_keep(df, id_col, vec_col, **kw)


def _fuzzy_self_join(df: DataFrame, id_col: str, text_col: str, **kw) -> DataFrame:
    from .fuzzy import fuzzy_self_join

    if "max_distance" in kw:
        kw["max_distance"] = int(kw["max_distance"])
    return fuzzy_self_join(df, id_col, text_col, **kw)


def _query_split(df: DataFrame, query_predicate: str | None):
    """Shared convention for the similarity ops: one input view, queries
    selected by a SQL predicate (None/absent = self-search, every row is
    a query). Mirrors the ``_decontaminate`` split-by-predicate shape."""
    return (df.filter(query_predicate), df) if query_predicate else (df, df)


def _topk_neighbors(df: DataFrame, id_col: str, vec_col: str,
                    query_predicate: str | None = None, **kw) -> DataFrame:
    from ..functions.similarity import topk_neighbors

    if "k" in kw:
        kw["k"] = int(kw["k"])
    q, c = _query_split(df, query_predicate)
    return topk_neighbors(q, c, id_col, vec_col, **kw)


def _ann_lsh_topk(df: DataFrame, id_col: str, vec_col: str, dim: int,
                  query_predicate: str | None = None, **kw) -> DataFrame:
    from ..functions.similarity import ann_topk_lsh

    for key in ("k", "num_planes", "num_tables", "num_probes"):
        if key in kw:
            kw[key] = int(kw[key])
    q, c = _query_split(df, query_predicate)
    return ann_topk_lsh(q, c, id_col, vec_col, dim=int(dim), **kw)


def _ivf_topk(df: DataFrame, id_col: str, vec_col: str,
              query_predicate: str | None = None, **kw) -> DataFrame:
    from ..functions.similarity import ivf_topk

    for key in ("k", "n_centroids", "n_probe", "kmeans_iters"):
        if key in kw and kw[key] is not None:
            kw[key] = int(kw[key])
    q, c = _query_split(df, query_predicate)
    return ivf_topk(q, c, id_col, vec_col, **kw)


def _bloom_incremental(df: DataFrame, key_col: str, new_predicate: str, **kw) -> DataFrame:
    """Config shape for incremental dedup: one input view split by a SQL
    predicate — rows matching ``new_predicate`` are the new crawl, the
    rest the historical corpus (the ``_decontaminate`` convention)."""
    from .dedup import bloom_incremental_new

    if "m" in kw:
        kw["m"] = int(kw["m"])
    if "k" in kw:
        kw["k"] = int(kw["k"])
    return bloom_incremental_new(
        df.filter(new_predicate), df.filter(f"NOT ({new_predicate})"), key_col, **kw
    )


def _domain_mix(df: DataFrame, strata_col: str, weights: dict, id_col: str, **kw) -> DataFrame:
    from .sampling import domain_mix_sample

    return domain_mix_sample(
        df, strata_col, {k: int(v) for k, v in weights.items()}, id_col, **kw
    )


def _lm_cross_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    from ..functions.text import unigram_cross_entropy

    return unigram_cross_entropy(df, id_col, text_col)


def _bigram_lm(df: DataFrame, id_col: str, text_col: str, lam=0.7) -> DataFrame:
    from ..functions.text import bigram_cross_entropy

    return bigram_cross_entropy(df, id_col, text_col, lam=float(lam))


def _bpe_tokenize(df: DataFrame, id_col: str, text_col: str, n_merges=24) -> DataFrame:
    """Composite train+apply: learn the merge table from the input view,
    tokenize the same view with it (tokens serialized space-joined so the
    output stays sink-friendly)."""
    from ..functions.bpe import bpe_apply, bpe_train

    merges = bpe_train(df, text_col, n_merges=int(n_merges))
    out = bpe_apply(df, id_col, text_col, merges)
    return out.select(id_col, "n_tokens", F.array_join("tokens", " ").alias("tokens"))


def _classifier_score(df: DataFrame, text_col: str, weights: list, output_col: str = "keep_prob") -> DataFrame:
    """Learned quality filter (apply path): sigmoid over surface features
    with fixed literal weights — pure projection."""
    from ..functions.classifier import logreg_score_terms, text_feature_terms
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    prob = logreg_score_terms(text_feature_terms(F.col(text_col)), [float(w) for w in weights])
    return df.withColumn(output_col, prob)


def _tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, top_n=3) -> DataFrame:
    from ..functions.indexing import tfidf_top_terms

    return tfidf_top_terms(df, id_col, text_col, top_n=int(top_n))


def _inverted_index(
    df: DataFrame, id_col: str, text_col: str, min_df=5, max_df=50, max_postings=10
) -> DataFrame:
    from ..functions.indexing import inverted_index

    return inverted_index(
        df, id_col, text_col,
        min_df=int(min_df), max_df=int(max_df), max_postings=int(max_postings),
    )


def _weighted_sample(df: DataFrame, id_col: str, weight_col: str, k, **kw) -> DataFrame:
    from .sampling import weighted_priority_sample

    return weighted_priority_sample(df, id_col, weight_col, int(k), **kw)


def _ngram_jaccard(
    df: DataFrame, id_col: str, text_col: str,
    n=3, threshold_num=3, threshold_den=5, **kw,
) -> DataFrame:
    from .dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        df, id_col, text_col,
        n=int(n), threshold_num=int(threshold_num), threshold_den=int(threshold_den),
        **kw,
    )


def _profile_columns(df: DataFrame, columns=None, **kw) -> DataFrame:
    from .validation import profile_columns

    if "approx_distinct" in kw:
        kw["approx_distinct"] = str(kw["approx_distinct"]).lower() == "true"
    if "rsd" in kw:
        kw["rsd"] = float(kw["rsd"])
    # distinct_mode ("exact"|"approx"|"both") passes through as a string
    return profile_columns(df, list(columns) if columns else None, **kw)


def _quantize_embeddings(df: DataFrame, id_col: str, vec_col: str, bits=8) -> DataFrame:
    """Config step: id + per-vector scale + comma-joined int codes (the
    sink-friendly flattening of quantize_vector's struct)."""
    from pyspark.sql import functions as F  # noqa: F811 (local alias)

    from ..functions.similarity import quantize_vector

    qt = quantize_vector(F.col(vec_col), bits=int(bits))
    return df.select(
        id_col,
        qt["scale"].alias("scale"),
        F.array_join(qt["q"].cast("array<string>"), ",").alias("codes"),
    )


def _quality_quantile(df: DataFrame, id_col: str, text_col: str, q=0.75, accuracy=None) -> DataFrame:
    from .corpus import quality_quantile_cut

    return quality_quantile_cut(
        df, id_col, text_col, q=float(q),
        accuracy=None if accuracy is None else int(accuracy),
    )


def _kmeans(df: DataFrame, id_col: str, vec_col: str, k=8, iters=3) -> DataFrame:
    from ..functions.clustering import kmeans_fit_predict

    adaptive = k is None or str(k).lower() in ("", "none", "auto")
    return kmeans_fit_predict(
        df, id_col, vec_col, k=None if adaptive else int(k), iters=int(iters)
    )


def _session_aggregate(df: DataFrame, ts_col: str, key: str, **kw) -> DataFrame:
    """Streaming-capable session windows (works on batch views too)."""
    from ..streaming.ops import session_aggregate

    return session_aggregate(df, ts_col, key, **kw)


def _tumbling_counts(df: DataFrame, ts_col: str, **kw) -> DataFrame:
    from ..streaming.ops import tumbling_counts

    return tumbling_counts(df, ts_col, **kw)


def _streaming_dedup_op(df: DataFrame, keys: list, ts_col: str, **kw) -> DataFrame:
    from ..streaming.ops import streaming_dedup

    return streaming_dedup(df, list(keys), ts_col, **kw)


def _session_close_events(df: DataFrame, key_col: str, ts_col: str, **kw) -> DataFrame:
    from ..streaming.ops import session_close_events

    kw = {k: int(v) if k == "gap_minutes" else v for k, v in kw.items()}
    return session_close_events(df, key_col, ts_col, **kw)


def _resample_ffill(df: DataFrame, key_col: str, ts_col: str, value_col: str, **kw) -> DataFrame:
    from .timeseries import resample_ffill

    return resample_ffill(df, key_col, ts_col, value_col, **kw)


def _resample_interpolate(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, **kw
) -> DataFrame:
    from .timeseries import resample_interpolate

    kw = {k: int(v) if k == "decimals" else v for k, v in kw.items()}
    return resample_interpolate(df, key_col, ts_col, value_col, **kw)


def _pq_topk(df: DataFrame, id_col: str, vec_col: str, **kw) -> DataFrame:
    from ..functions.similarity import pq_topk

    kw = {
        k: int(v) if k in ("k", "m", "k_codes", "iters", "shortlist") else v
        for k, v in kw.items()
    }
    # config steps have ONE input view: self-search (corpus queries itself)
    return pq_topk(df, df, id_col, vec_col, **kw)


def _knn_pagerank(df: DataFrame, id_col: str, vec_col: str, **kw) -> DataFrame:
    from ..functions.graph import knn_pagerank

    kw = {
        k: int(v)
        if k in ("k", "iters", "n_probe", "top_n")
        else (str(v).lower() == "true" if k == "weighted" else v)
        for k, v in kw.items()
    }
    return knn_pagerank(df, id_col, vec_col, **kw)


def _ivfpq_topk(df: DataFrame, id_col: str, vec_col: str, **kw) -> DataFrame:
    from ..functions.similarity import ivfpq_topk

    kw = {
        k: int(v)
        if k in ("k", "n_centroids", "n_probe", "m", "k_codes", "iters", "shortlist")
        else v
        for k, v in kw.items()
    }
    return ivfpq_topk(df, df, id_col, vec_col, **kw)


def _cms_frequency(df: DataFrame, item_col: str, **kw) -> DataFrame:
    from ..functions.sketches import cms_frequency

    kw = {k: int(v) if k in ("depth", "width") else v for k, v in kw.items()}
    return cms_frequency(df, item_col, **kw)


def _zorder_layout(df: DataFrame, cols: list, **kw) -> DataFrame:
    from .scale import zorder_layout

    kw = {k: int(v) if k in ("bits", "num_partitions") else v for k, v in kw.items()}
    return zorder_layout(df, list(cols), **kw)


OPERATORS: dict[str, Callable[..., DataFrame]] = {
    "exactDedupGroups": _exact_dedup,
    "exactDedupSurvivors": _dedup_survivors,
    "minhashNearDups": _minhash_near_dups,
    "nearDupClusters": _near_dup_clusters,
    "simhashFingerprints": _simhash,
    "winnowNearDups": _winnow_near_dups,
    "embeddingNearDups": _embedding_near_dups,
    "textEnrich": _text_enrich,
    "hashSplit": _hash_split,
    "stratifiedSample": _stratified_sample,
    "packSequential": _pack_sequential,
    "shuffleShards": _shuffle_shards,
    "piiRedact": _pii_redact,
    "frequentNgrams": _frequent_ngrams,
    "chunkDocuments": _chunk_documents,
    "decontaminate": _decontaminate,
    "repetitionProfile": _repetition_profile,
    "removeDuplicateSpans": _remove_duplicate_spans,
    "nfcNormalize": _nfc_normalize,
    "filterWithReasons": _filter_with_reasons,
    "semanticDedup": _semantic_dedup,
    "topkNeighbors": _topk_neighbors,
    "fuzzySelfJoin": _fuzzy_self_join,
    "annLshTopk": _ann_lsh_topk,
    "ivfTopk": _ivf_topk,
    "bloomIncrementalDedup": _bloom_incremental,
    "domainMixSample": _domain_mix,
    "lmCrossEntropy": _lm_cross_entropy,
    "bigramLm": _bigram_lm,
    "bpeTokenize": _bpe_tokenize,
    "classifierScore": _classifier_score,
    "tfidfTopTerms": _tfidf_top_terms,
    "invertedIndex": _inverted_index,
    "weightedSample": _weighted_sample,
    "ngramJaccardPairs": _ngram_jaccard,
    "kmeansClusters": _kmeans,
    "qualityQuantileCut": _quality_quantile,
    "profileColumns": _profile_columns,
    "quantizeEmbeddings": _quantize_embeddings,
    "pqTopk": _pq_topk,
    "ivfpqTopk": _ivfpq_topk,
    "resampleFfill": _resample_ffill,
    "resampleInterpolate": _resample_interpolate,
    "knnPagerank": _knn_pagerank,
    "cmsFrequency": _cms_frequency,
    "heavyHitters": _heavy_hitters,
    "bloomFilteredJoin": _bloom_filtered_join,
    "zorderLayout": _zorder_layout,
    "sessionAggregate": _session_aggregate,
    "tumblingCounts": _tumbling_counts,
    "streamingDedup": _streaming_dedup_op,
    "sessionCloseEvents": _session_close_events,
    "termCooccurrence": _term_cooccurrence,
    "randomProjection": _random_projection,
    "bm25Score": _bm25_score,
    "rrfFuse": _rrf_fuse,
    "kmvSketch": _kmv_sketch,
    "urlDedup": _url_dedup,
    "domainCap": _domain_cap,
    "registrableDomainPsl": _registrable_domain_psl,
    "robotsFilter": _robots_filter,
    "robotsFilterFromBodies": _robots_filter_from_bodies,
    "kAnonymity": _k_anonymity,
    "generalizeToK": _generalize_to_k,
    "deltaMerge": _delta_merge,
    "deltaDelete": _delta_delete,
    "deltaRestore": _delta_restore,
    "deltaHistory": _delta_history,
    "deltaConvert": _delta_convert,
    "deltaOptimize": _delta_optimize,
    "deltaConstraint": _delta_constraint,
    "deltaProperties": _delta_properties,
    "deltaClone": _delta_clone,
    "deltaVacuum": _delta_vacuum,
    "deltaChanges": _delta_changes,
    "redactCards": _redact_cards,
    "exifReport": _exif_report,
    "stripExif": _strip_exif,
    "funnel": _funnel,
    "retention": _retention,
    "transitionMatrix": _transition_matrix,
    "kmvIntersect": _kmv_intersect,
    "dsirSelect": _dsir_select,
    "bfsLevels": _bfs_levels,
    "expectations": _expectations,
    "linearFit": _linear_fit,
    "abTest": _ab_test,
    "psiReport": _psi_report,
    "schemaDiff": _schema_diff,
    "rankSumTest": _rank_sum_test,
    "linkRecords": _link_records,
    "ohlcTumbling": _ohlc_tumbling,
    "triangleCount": _triangle_count,
    "geoProximityPairs": _geo_proximity_pairs,
    "barReturns": _bar_returns,
    "skewReport": _skew_report,
    "logbucketSketch": _logbucket_sketch,
    "ohlcBars": _ohlc_bars,
    "phashFingerprints": _phash_fingerprints,
    "phashNearPairs": _phash_near_pairs,
    "decodeImage": _decode_image,
    "audioFeatures": _audio_features,
    "sampleVideoFrames": _sample_video_frames,
}


def apply_operator(name: str, df: DataFrame, params: dict) -> DataFrame:
    if name not in OPERATORS:
        raise KeyError(
            f"unknown operatorName '{name}'; available: {sorted(OPERATORS)}"
        )
    return OPERATORS[name](df, **params)
