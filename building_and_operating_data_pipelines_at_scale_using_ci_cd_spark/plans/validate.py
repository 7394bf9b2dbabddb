"""CI-time job-config validation: lint + Catalyst-analysis dry run.

The reference repo exists to push pipeline configs through CI/CD
(reference README.md; buildspec/deploy.yaml) — the gate a pull request
needs is "will this config run?", answered WITHOUT running it. This
module is that gate:

  - **structural lint** (no Spark): the config parses, every input has
    a path/connection, formats and loadTypes are known values, operator
    steps name registered operators and pass parameters their function
    signatures accept, SCD2 targets carry keys, view references resolve
    in chain order, ``${...}`` parameters substitute.
  - **semantic dry run** (Spark ANALYSIS, no job execution): inputs are
    opened lazily (schema comes from file footers / a sampled
    inference pass — the same read ``run()`` would plan), every
    ``sqlQuery`` step is built through ``spark.sql`` so Catalyst's
    analyzer resolves views, columns, and types against the REAL
    upstream schemas, and target/validation column lists are checked
    against the DataFrames they will see. Nothing is written and no
    external state is touched. Operator steps are handled by *schema
    synthesis*: a pure df→df operator is invoked on an EMPTY DataFrame
    carrying the upstream schema — that builds only a plan (or cheap
    empty-input driver work), never reads table data — so downstream
    SQL still gets full Catalyst analysis against the operator's real
    output columns. Operators that mutate or read EXTERNAL state
    (the delta DML family) or resolve OTHER session views (``*_view``
    params — invoking them would scan real inputs at CI time) are
    never invoked: their outputs become *placeholders*, and downstream
    SQL that reads a placeholder degrades to a syntax-only parse
    check, reported as such. Synthesis failures degrade the same way
    (warned, never fatal).

At 100 TB this is the cheap half of the contract: analysis cost is
metadata-sized (footers + the catalog), so the same validation that
protects a laptop run protects the production table — CI validates
against production paths without touching production compute.

Use ``Orchestrator(spark).validate(cfg)`` or the CLI::

    python -m building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.validate job.json

which prints findings and exits non-zero on errors (the CI shape).
"""

from __future__ import annotations

import inspect
import json
import os
from dataclasses import dataclass, field, replace
from typing import Any

from pyspark.sql import SparkSession

from ..config import InputSpec, JobConfig, TargetSpec, TransformSpec

#: formats read_input / write_output dispatch on
_INPUT_FORMATS = {"csv", "parquet", "orc", "json", "text", "xml", "excel", "deltalake"}
_OUTPUT_FORMATS = {"csv", "parquet", "orc", "json", "text", "xml", "excel", "deltalake"}
_LOAD_TYPES = {"simpleInsert", "truncateInsert", "scdType2Insert"}
_DATA_SOURCES = {"local", "aws-s3", "database", "sftp", "catalog"}


@dataclass
class Finding:
    severity: str  # "error" | "warning"
    where: str  # e.g. "phase_1.input_data[orders]", "transformations[2]"
    message: str

    def __str__(self) -> str:
        return f"{self.severity.upper():7s} {self.where}: {self.message}"


@dataclass
class ValidationReport:
    findings: list = field(default_factory=list)
    #: view name -> list of column names, for views the dry run resolved
    schemas: dict = field(default_factory=dict)
    #: outputs of operator steps (not executed — schema unknown)
    placeholders: set = field(default_factory=set)

    @property
    def errors(self) -> list:
        return [f for f in self.findings if f.severity == "error"]

    @property
    def warnings(self) -> list:
        return [f for f in self.findings if f.severity == "warning"]

    @property
    def ok(self) -> bool:
        return not self.errors

    def error(self, where: str, message: str) -> None:
        self.findings.append(Finding("error", where, message))

    def warn(self, where: str, message: str) -> None:
        self.findings.append(Finding("warning", where, message))

    def raise_on_error(self) -> "ValidationReport":
        if not self.ok:
            raise ValueError(
                "config validation failed:\n"
                + "\n".join(str(f) for f in self.errors)
            )
        return self

    def to_dict(self) -> dict:
        return {
            "ok": self.ok,
            "errors": [str(f) for f in self.errors],
            "warnings": [str(f) for f in self.warnings],
        }


#: statement heads that LOOK like pure queries — the textual fallback
#: used only when the JVM parser is unreachable (e.g. Spark Connect).
#: The real decision is made from the PARSED PLAN in :func:`_classify`,
#: because a head check alone is unsound: Spark accepts
#: ``WITH cte AS (...) INSERT INTO t ...`` and the multi-insert
#: ``FROM src INSERT INTO t1 ... INSERT INTO t2 ...``, both of which
#: start like queries but execute DML eagerly inside ``spark.sql()``.
_QUERY_HEADS = ("select", "with", "values", "table", "from", "(")


def _looks_like_query(sql: str) -> bool:
    """Textual fallback for :func:`_classify`: head must be query-like,
    and heads that can prefix DML (``with``/``from``/``(``) only count
    when no INSERT token appears anywhere (conservative — a false
    "command" merely degrades analysis to a syntax check)."""
    import re

    head = re.sub(
        r"^(\s+|--[^\n]*(\n|$)|/\*.*?\*/)+", "", sql, flags=re.S
    ).lstrip().lower()
    if not head.startswith(_QUERY_HEADS):
        return False
    if head.startswith(("select", "values", "table")):
        return True
    return re.search(r"\binsert\b", head) is None


def _classify(spark: SparkSession, sql: str):
    """Decide query-vs-command from the PARSED PLAN, not the first
    keyword. Walks every node of the parsed tree and flags ``Command``
    subclasses (CreateTable, DropTable, SetCommand, CacheTable,
    MergeIntoTable, ExplainCommand, ...) and parsed-statement DML that
    is *not* a Command subclass (InsertIntoStatement, InsertIntoDir) —
    so a CTE-wrapped INSERT (root ``UnresolvedWith``) and a
    multi-insert (root ``Union``) are still caught. Returns one of
    ``("query", None)``, ``("command", None)``, or
    ``("syntax", first-error-line)``."""
    try:
        parser = spark._jsparkSession.sessionState().sqlParser()
        command_cls = spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.catalyst.plans.logical.Command"
        )
    except Exception:
        return ("query", None) if _looks_like_query(sql) else ("command", None)
    try:
        plan = parser.parsePlan(sql)
    except Exception as exc:  # Py4JJavaError wrapping ParseException
        java_exc = getattr(exc, "java_exception", None)
        name = java_exc.getClass().getName() if java_exc is not None else type(exc).__name__
        if "ParseException" in name:
            msg = str(java_exc.getMessage() if java_exc is not None else exc)
            first = next((l for l in msg.splitlines() if l.strip()), "")
            return ("syntax", first or "syntax error")
        return ("query", None) if _looks_like_query(sql) else ("command", None)
    stack = [plan]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if (
            command_cls.isInstance(node)
            or name.endswith("Statement")
            or name.startswith("InsertInto")
        ):
            return ("command", None)
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return ("query", None)


def _parse_only(spark: SparkSession, sql: str):
    """Syntax-check ``sql`` without analysis (for statements that read a
    placeholder view whose schema the dry run cannot know). Returns an
    error message for a syntax error, None when the parse succeeds OR
    the parser interface is unavailable (never a false positive)."""
    try:
        parser = spark._jsparkSession.sessionState().sqlParser()
    except Exception:
        return None
    try:
        parser.parsePlan(sql)
        return None
    except Exception as exc:  # Py4JJavaError wrapping ParseException
        java_exc = getattr(exc, "java_exception", None)
        name = java_exc.getClass().getName() if java_exc is not None else type(exc).__name__
        if "ParseException" in name:
            msg = str(java_exc.getMessage() if java_exc is not None else exc)
            # the message often STARTS with newlines/banner lines — take
            # the first non-empty line, never return a falsy "error"
            first = next((l for l in msg.splitlines() if l.strip()), "")
            return first or "syntax error"
        return None


def _check_input_structural(spec: InputSpec, where: str, rep: ValidationReport) -> None:
    if spec.data_source not in _DATA_SOURCES:
        rep.error(where, f"unknown dataSource {spec.data_source!r} (expected one of {sorted(_DATA_SOURCES)})")
    if spec.data_source == "database":
        if not spec.jdbc_url:
            rep.error(where, "database input needs jdbcUrl")
        if not (spec.table_name or spec.table_query):
            rep.error(where, "database input needs tableName or tableQuery")
        return
    if spec.data_source == "sftp":
        if not spec.sftp_host:
            rep.error(where, "sftp input needs sftpServerName")
        if not spec.remote_path:
            rep.error(where, "sftp input needs remoteDirPath")
        return
    if not spec.path:
        rep.error(where, "input has no path")
    if spec.file_format not in _INPUT_FORMATS:
        rep.error(where, f"unknown fileFormat {spec.file_format!r} (expected one of {sorted(_INPUT_FORMATS)})")
    if spec.data_mapping and not spec.metadata_path:
        rep.error(where, "dataMapping=true needs metadataPath")
    if spec.metadata_path and not os.path.exists(spec.metadata_path):
        rep.error(where, f"metadataPath does not exist: {spec.metadata_path}")


def _check_target_structural(t: TargetSpec, where: str, rep: ValidationReport) -> None:
    if t.load_type not in _LOAD_TYPES:
        match = next((k for k in _LOAD_TYPES if k.lower() == t.load_type.lower()), None)
        hint = f"; did you mean {match!r}?" if match else ""
        rep.error(where, f"unknown loadType {t.load_type!r}{hint}")
    if t.data_target == "database":
        if not t.jdbc_url or not t.table_name:
            rep.error(where, "database target needs jdbcUrl + tableName")
        return
    if t.data_target == "sftp":
        if not t.sftp_host:
            rep.error(where, "sftp target needs sftpServerName")
        if not t.remote_path:
            rep.error(where, "sftp target needs remoteDirPath")
        return
    if t.data_target == "catalog":
        if not t.table_name:
            rep.error(where, "catalog target needs tableName")
        return
    if not t.path:
        rep.error(where, "file target has no path")
    if t.file_format not in _OUTPUT_FORMATS:
        rep.error(where, f"unknown fileFormat {t.file_format!r}")
    if t.load_type == "scdType2Insert":
        if not t.scd2_keys:
            rep.error(where, "scdType2Insert needs scd2Keys")
        if not t.scd2_effective_col:
            rep.error(where, "scdType2Insert needs scd2EffectiveCol")
        if t.file_format not in ("parquet", "deltalake"):
            rep.error(where, f"scdType2Insert writes parquet/deltalake, not {t.file_format!r}")


def _dry_run_synthesizable(name: str) -> bool:
    """True when an operator's output schema can be synthesized by
    invoking it on an EMPTY input: pure df→df transformations only.
    Excluded — and kept placeholders — are operators that touch
    external state (the ``delta*`` DML/maintenance family writes or
    reads table paths; a validator must never vacuum a production
    table) and operators that resolve OTHER session views by name
    (``*_view`` params): those views are REAL registered inputs at
    validation time, and an eager operator would scan production data
    at CI cost."""
    import inspect as _inspect

    from ..operators.registry import OPERATORS

    if name.startswith("delta") or name not in OPERATORS:
        return False
    return not any(
        p.endswith("_view") for p in _inspect.signature(OPERATORS[name]).parameters
    )


def _check_operator_step(t: TransformSpec, where: str, rep: ValidationReport) -> None:
    from ..operators.registry import OPERATORS

    if t.operator_name not in OPERATORS:
        close = sorted(
            k for k in OPERATORS if k.lower() == t.operator_name.lower()
        )
        hint = f"; did you mean {close[0]!r}?" if close else ""
        rep.error(where, f"unknown operatorName {t.operator_name!r}{hint}")
        return
    fn = OPERATORS[t.operator_name]
    sig = inspect.signature(fn)
    params = list(sig.parameters.values())
    accepts_kwargs = any(p.kind == p.VAR_KEYWORD for p in params)
    # first parameter is the input DataFrame (apply_operator's contract)
    named = {p.name for p in params[1:] if p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)}
    if not accepts_kwargs:
        unknown = sorted(set(t.operator_params) - named)
        if unknown:
            rep.error(
                where,
                f"operator {t.operator_name!r} does not accept parameter(s) "
                f"{unknown} (accepted: {sorted(named)})",
            )
    required = [
        p.name
        for p in params[1:]
        if p.default is p.empty
        and p.kind in (p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
    ]
    missing = sorted(set(required) - set(t.operator_params))
    if missing:
        rep.error(
            where,
            f"operator {t.operator_name!r} is missing required parameter(s) {missing}",
        )


def validate_config(
    spark: SparkSession,
    config: JobConfig | dict | str,
    params: dict[str, Any] | None = None,
    connect: bool = False,
) -> ValidationReport:
    """Validate a job config without executing it (module docstring has
    the full contract). ``connect=False`` (default) skips opening
    database/sftp inputs — CI usually cannot reach them — and records a
    warning instead; ``connect=True`` opens them exactly like ``run()``
    would (schema-only, still no action)."""
    rep = ValidationReport()
    try:
        if isinstance(config, str):
            cfg = JobConfig.from_json(config, params=params)
        elif isinstance(config, dict):
            cfg = JobConfig.from_dict(config, params=params)
        else:
            cfg = config
    except Exception as exc:
        rep.error("config", f"does not parse: {exc}")
        return rep

    specs = ([cfg.primary_input] if cfg.primary_input else []) + cfg.additional_inputs
    if not specs and cfg.data_transformation_required and any(
        not t.operator_name for t in cfg.transformations
    ):
        rep.warn("phase_1", "no inputs declared; SQL steps can only read pre-registered session views")

    # -- structural -------------------------------------------------------
    seen_views: list = []
    for i, spec in enumerate(specs):
        where = f"phase_1.input_data[{spec.dataframe_name}]"
        _check_input_structural(spec, where, rep)
        if spec.dataframe_name in seen_views:
            rep.error(where, f"duplicate view name {spec.dataframe_name!r}")
        seen_views.append(spec.dataframe_name)
    for i, t in enumerate(cfg.transformations):
        where = f"transformations[{i}:{t.output_df_name}]"
        if bool(t.operator_name) == bool(t.sql_query):
            rep.error(where, "a step needs exactly one of sqlQuery / operatorName")
            continue
        if t.operator_name:
            _check_operator_step(t, where, rep)
        elif t.sql_query.strip().lower().endswith(".sql") and not os.path.exists(t.sql_query.strip()):
            rep.error(where, f"sqlQuery file does not exist: {t.sql_query.strip()}")
        if t.output_df_name in seen_views:
            rep.warn(where, f"view {t.output_df_name!r} is redefined (shadows an earlier step)")
        seen_views.append(t.output_df_name)
    for i, t in enumerate(cfg.targets):
        _check_target_structural(t, f"target_record_insert[{i}:{t.dataframe_name}]", rep)
    v = cfg.validations
    if cfg.data_validation_required:
        if v.null_value_validation and not v.null_primary_keys:
            rep.error("data_validations.nullValueCheck", "needs primaryKeys")
        if v.duplicate_record_validation and not v.dup_primary_keys:
            rep.error("data_validations.duplicateRecordCheck", "needs primaryKeys")
    if cfg.threshold_limit is not None and cfg.error_sink is None:
        rep.warn("phase_3", "thresholdLimit is set but there is no ErrorRecordInsert quarantine sink")

    # -- semantic dry run (analysis only) ----------------------------------
    from ..sources.readers import read_input

    created: list = []  # temp views the dry run created — drop on exit
    replaced: dict = {}  # pre-existing temp views we replaced — restore raw defs

    def _jcatalog():
        try:
            return spark._jsparkSession.sessionState().catalog()
        except Exception:  # Spark Connect — no JVM session state
            return None

    def _register(df, name):
        # run() would createOrReplaceTempView too, but a validator must
        # leave the session EXACTLY as it found it: snapshot a
        # pre-existing temp view's raw definition (TemporaryViewRelation)
        # so the finally block can restore it, and remember to drop any
        # view the dry run creates — including one that SHADOWS a
        # catalog table (tableExists is true there, but the temp view is
        # still new and must not outlive validate()).
        cat = _jcatalog()
        if cat is None:  # degraded bookkeeping without JVM catalog access
            if not spark.catalog.tableExists(name):
                created.append(name)
            df.createOrReplaceTempView(name)
            return
        if name not in created and name not in replaced:
            try:
                opt = cat.getRawTempView(name)
                prior = opt.get() if opt.isDefined() else None
            except Exception:
                prior = None
            if prior is not None:
                replaced[name] = prior
            else:
                created.append(name)
        df.createOrReplaceTempView(name)

    try:
        for spec in specs:
            where = f"phase_1.input_data[{spec.dataframe_name}]"
            if spec.data_source in ("database", "sftp") and not connect:
                rep.warn(where, f"{spec.data_source} input not opened (pass connect=True to validate it)")
                rep.placeholders.add(spec.dataframe_name)
                continue
            try:
                df = read_input(spark, replace(spec, streaming=False))
                _register(df, spec.dataframe_name)
                rep.schemas[spec.dataframe_name] = list(df.columns)
            except Exception as exc:
                rep.error(where, f"cannot open: {str(exc).splitlines()[0]}")
                rep.placeholders.add(spec.dataframe_name)

        if cfg.data_validation_required and cfg.primary_input:
            cols = rep.schemas.get(cfg.primary_input.dataframe_name)
            if cols is not None:
                for label, keys in (
                    ("nullValueCheck", v.null_primary_keys if v.null_value_validation else []),
                    ("duplicateRecordCheck", v.dup_primary_keys if v.duplicate_record_validation else []),
                    ("duplicateRecordCheck.orderByCols", v.dup_order_by_cols if v.duplicate_record_validation else []),
                ):
                    bad = sorted(set(keys) - set(cols))
                    if bad:
                        rep.error(f"data_validations.{label}", f"column(s) {bad} not in {cfg.primary_input.dataframe_name!r} ({sorted(cols)})")

        prev_out = cfg.primary_input.dataframe_name if cfg.primary_input else None
        for i, t in enumerate(cfg.transformations):
            where = f"transformations[{i}:{t.output_df_name}]"
            if bool(t.operator_name) == bool(t.sql_query):
                continue  # already reported
            if t.operator_name:
                in_name = t.input_df_name or prev_out
                if in_name is None or (
                    in_name not in rep.schemas and in_name not in rep.placeholders
                ):
                    rep.error(where, f"operator input view {in_name!r} is not defined by any earlier step")
                    rep.placeholders.add(t.output_df_name)
                    prev_out = t.output_df_name
                    continue
                # schema synthesis: pure df→df operators run on an EMPTY
                # clone of the upstream schema — plan-building (or cheap
                # empty-input driver work) only, zero data scanned — so
                # downstream SQL keeps full Catalyst analysis. External-
                # state / other-view operators stay placeholders.
                synthesized = False
                if in_name in rep.schemas and _dry_run_synthesizable(t.operator_name):
                    from ..operators.registry import apply_operator

                    try:
                        empty = spark.createDataFrame([], spark.table(in_name).schema)
                        out = apply_operator(
                            t.operator_name, empty, dict(t.operator_params)
                        )
                        if not out.isStreaming:
                            _register(out, t.output_df_name)
                            rep.schemas[t.output_df_name] = list(out.columns)
                            synthesized = True
                    except Exception as exc:
                        rep.warn(
                            where,
                            f"operator {t.operator_name!r} output schema could "
                            f"not be synthesized on an empty input "
                            f"({str(exc).splitlines()[0]}) — downstream "
                            "analysis degraded",
                        )
                if not synthesized:
                    rep.placeholders.add(t.output_df_name)
            else:
                sql = t.resolve_sql()
                kind, syntax = _classify(spark, sql)
                if kind == "syntax":
                    rep.error(where, f"syntax error: {syntax}")
                    rep.placeholders.add(t.output_df_name)
                    prev_out = t.output_df_name
                    continue
                if kind == "command":
                    # INSERT (even CTE-wrapped / multi-insert) / CREATE /
                    # DROP / SET / CACHE ... — Spark executes these
                    # EAGERLY inside spark.sql(), and a validator must
                    # not run them. Syntax was already checked by the
                    # parse in _classify.
                    rep.warn(
                        where,
                        "statement is not a query (it executes at run "
                        "time) — analysis degraded to a syntax check",
                    )
                    rep.placeholders.add(t.output_df_name)
                    prev_out = t.output_df_name
                    continue
                try:
                    df = spark.sql(sql)
                    _register(df, t.output_df_name)
                    rep.schemas[t.output_df_name] = list(df.columns)
                except Exception as exc:
                    msg = str(exc)
                    hit = next(
                        (p for p in rep.placeholders if f"`{p}`" in msg or f"'{p}'" in msg),
                        None,
                    )
                    if hit is not None:
                        syntax = _parse_only(spark, sql)
                        if syntax:
                            rep.error(where, f"syntax error: {syntax}")
                        else:
                            rep.warn(
                                where,
                                f"reads {hit!r} (an operator output / unopened input) — "
                                f"analysis degraded to a syntax check",
                            )
                        rep.placeholders.add(t.output_df_name)
                    else:
                        rep.error(where, msg.splitlines()[0])
                        rep.placeholders.add(t.output_df_name)
            prev_out = t.output_df_name

        known = set(rep.schemas) | rep.placeholders
        for i, t in enumerate(cfg.targets):
            where = f"target_record_insert[{i}:{t.dataframe_name}]"
            if t.dataframe_name not in known:
                rep.error(where, f"writes view {t.dataframe_name!r}, which no step defines")
                continue
            cols = rep.schemas.get(t.dataframe_name)
            if cols is None:
                continue  # placeholder — columns unknown, structural only
            for label, wanted in (
                ("partitionBy", t.partition_by),
                ("sortBy", t.sort_by),
                ("bucketBy", t.bucket_by),
                ("scd2Keys", t.scd2_keys),
                ("scd2CompareCols", t.scd2_compare_cols),
            ):
                bad = sorted(set(wanted) - set(cols))
                if bad:
                    rep.error(where, f"{label} column(s) {bad} not in view {t.dataframe_name!r} ({sorted(cols)})")
    finally:
        for name in created:
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
        if replaced:
            cat = _jcatalog()
            for name, prior in replaced.items():
                try:
                    cat.createTempView(name, prior, True)
                except Exception:
                    pass
    return rep


def validate_manifest(
    spark: SparkSession,
    manifest: dict | str,
    params: dict[str, Any] | None = None,
    connect: bool = False,
) -> ValidationReport:
    """Validate a deploy.yaml-shaped pipeline manifest: DAG shape
    (unknown dependsOn, cycles, duplicate task names) plus
    :func:`validate_config` over every task that carries a job config,
    with the manifest's ``jobParams`` applied the way the Pipeline
    would. Findings are prefixed with the task name."""
    rep = ValidationReport()
    if isinstance(manifest, str):
        try:
            with open(manifest) as fh:
                manifest = json.load(fh)
        except Exception as exc:
            rep.error("manifest", f"does not parse: {exc}")
            return rep
    tasks = manifest.get("tasks", [])
    if not tasks:
        rep.error("manifest", "has no tasks")
        return rep
    names = [t.get("name") for t in tasks]
    for n in names:
        if not n:
            rep.error("manifest", "a task has no name")
    dupes = sorted({n for n in names if names.count(n) > 1})
    if dupes:
        rep.error("manifest", f"duplicate task name(s): {dupes}")
    by_name = {t.get("name"): t for t in tasks}
    for t in tasks:
        for dep in t.get("dependsOn") or []:
            if dep not in by_name:
                rep.error(f"task[{t.get('name')}]", f"dependsOn unknown task {dep!r}")
    # cycle check: Kahn's algorithm over the declared edges
    indeg = {n: 0 for n in by_name}
    for t in tasks:
        for dep in t.get("dependsOn") or []:
            if dep in indeg and t.get("name") in indeg:
                indeg[t["name"]] += 1
    queue = [n for n, d in indeg.items() if d == 0]
    seen = 0
    while queue:
        n = queue.pop()
        seen += 1
        for t in tasks:
            if n in (t.get("dependsOn") or []):
                indeg[t["name"]] -= 1
                if indeg[t["name"]] == 0:
                    queue.append(t["name"])
    if seen != len(by_name):
        rep.error("manifest", "dependency graph has a cycle")
    merged = {**(manifest.get("jobParams") or {}), **(params or {})}
    for t in tasks:
        cfg = t.get("config")
        if cfg is None:
            continue
        sub = validate_config(spark, cfg, params=merged or None, connect=connect)
        for f in sub.findings:
            rep.findings.append(
                Finding(f.severity, f"task[{t.get('name')}].{f.where}", f.message)
            )
    return rep


def main(argv: list | None = None) -> int:
    """CLI: validate config(s), print findings, exit 1 on any error."""
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    connect = "--connect" in args
    if connect:
        args.remove("--connect")
    as_manifest = "--manifest" in args
    if as_manifest:
        args.remove("--manifest")
    if not args:
        print("usage: python -m ...plans.validate [--connect] [--manifest] CONFIG.json [...]")
        return 2
    from ..session import get_session

    spark = get_session(app_name="config-validate")
    bad = False
    for path in args:
        rep = (
            validate_manifest(spark, path, connect=connect)
            if as_manifest
            else validate_config(spark, path, connect=connect)
        )
        status = "OK" if rep.ok else "FAIL"
        print(f"{status} {path}")
        for f in rep.findings:
            print(f"  {f}")
        bad = bad or not rep.ok
    return 1 if bad else 0


if __name__ == "__main__":  # pragma: no cover - CLI shim
    raise SystemExit(main())
