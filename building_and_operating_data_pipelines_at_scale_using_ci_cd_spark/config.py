"""Dataclass model of the JSON job-config dialect.

This is the engine's declarative API, re-modelled from the reference
template (``spark.json:1-108``): a 3-phase job —

  phase_1  ingest       primary input + N additional side inputs, each
                        registered as a named temp view (spark.json:13-38)
  phase_2  validate +   null-PK / duplicate validation splits, then an
           transform    ordered chain of Spark SQL statements each emitting
                        a new named view (spark.json:40-66)
  phase_3  load         fan-out writes with load modes incl. SCD2, error
                        quarantine, reconciliation (spark.json:68-107)

Dialect quirks honored deliberately:
  - string-typed booleans ("true"/"false") everywhere (spark.json:18 et al.)
  - phase_1 nests under "configs" while phase_2/phase_3 sit at top level
    (spark.json:2,40,68); we accept either placement for all three
  - thresholdLimit is a percent string like "30%" (spark.json:7)
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from typing import Any


def as_bool(v: Any, default: bool = False) -> bool:
    """Tolerant string-bool: the dialect writes booleans as strings."""
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "1", "yes", "y")


def as_percent(v: Any, default: float | None = 0.0) -> float | None:
    """Parse '30%' / '30' / 0.3 into a fraction in [0, 1]."""
    if v is None:
        return default
    if isinstance(v, (int, float)):
        return float(v) if v <= 1 else float(v) / 100.0
    s = str(v).strip().rstrip("%")
    if not s:
        return default
    return float(s) / 100.0


@dataclass
class InputSpec:
    """phase_1.input_data / additional_input_read entry (spark.json:14-38)."""

    data_source: str = "local"  # aws-s3|database|sftp|local
    dataframe_name: str = "input"
    path: str | None = None
    file_format: str = "parquet"  # csv|parquet|orc|json|xml|excel|text|deltalake
    header: bool = True
    options: dict[str, str] = field(default_factory=dict)
    # schema mapping (spark.json:21-22)
    data_mapping: bool = False
    metadata_path: str | None = None
    # projection at ingest (spark.json:23)
    select_columns: list[str] = field(default_factory=list)
    # database inputs (spark.json:32-38)
    table_name: str | None = None
    table_query: str | None = None
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    # sftp inputs (staged fetch)
    sftp_host: str | None = None
    remote_path: str | None = None
    #: streaming execution mode: read this input with readStream; the job
    #: becomes an incremental, checkpointed Structured Streaming run
    streaming: bool = False

    @classmethod
    def from_dict(cls, d: dict[str, Any], default_name: str = "input") -> "InputSpec":
        props = d.get("fileProperties", {}) or {}
        return cls(
            streaming=as_bool(d.get("streaming", props.get("streaming"))),
            data_source=str(d.get("dataSource", "local")).lower(),
            dataframe_name=d.get("dataFrameName", default_name),
            path=d.get("path") or d.get("inputPath") or d.get("s3Location"),
            file_format=str(props.get("fileFormat", d.get("fileFormat", "parquet"))).lower(),
            header=as_bool(props.get("header", d.get("header")), True),
            options={k: str(v) for k, v in (d.get("options") or {}).items()},
            data_mapping=as_bool(d.get("dataMapping")),
            metadata_path=d.get("metadataPath"),
            select_columns=list(d.get("selectColumns") or []),
            table_name=d.get("tableName"),
            table_query=d.get("tableQuery"),
            jdbc_url=d.get("jdbcUrl") or d.get("url"),
            jdbc_properties={k: str(v) for k, v in (d.get("jdbcProperties") or {}).items()},
            sftp_host=d.get("sftpServerName"),
            remote_path=d.get("remoteDirPath"),
        )


@dataclass
class ValidationSpec:
    """phase_2.data_validations (spark.json:41-52)."""

    null_value_validation: bool = False
    null_primary_keys: list[str] = field(default_factory=list)
    duplicate_record_validation: bool = False
    dup_primary_keys: list[str] = field(default_factory=list)
    dup_order_by_cols: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ValidationSpec":
        nv = d.get("nullValueCheck", {}) or {}
        dv = d.get("duplicateRecordCheck", {}) or {}
        return cls(
            null_value_validation=as_bool(d.get("nullValueValidation")),
            null_primary_keys=list(nv.get("primaryKeys") or []),
            duplicate_record_validation=as_bool(d.get("duplicateRecordValidation")),
            dup_primary_keys=list(dv.get("primaryKeys") or []),
            dup_order_by_cols=list(dv.get("orderByCols") or []),
        )


@dataclass
class TransformSpec:
    """One data_transformations entry (spark.json:54-65): a Spark SQL
    statement (inline or a .sql file path) producing a new named view —
    or, our extension, a registered operator (``operatorName`` +
    ``operatorParams`` applied to ``inputDFName``) for the multi-step
    DataFrame programs SQL can't express (near-dup, splits, packing)."""

    function_name: str = ""
    sql_query: str = ""
    output_df_name: str = "output"
    operator_name: str = ""
    operator_params: dict[str, Any] = field(default_factory=dict)
    input_df_name: str = ""

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TransformSpec":
        return cls(
            function_name=d.get("functionName", ""),
            sql_query=d.get("sqlQuery", ""),
            output_df_name=d.get("outputDFName", "output"),
            operator_name=d.get("operatorName", ""),
            operator_params=dict(d.get("operatorParams") or {}),
            input_df_name=d.get("inputDFName", ""),
        )

    def resolve_sql(self) -> str:
        """S12: sqlQuery may be an absolute .sql file path (spark.json:36,57)."""
        q = self.sql_query.strip()
        if q.lower().endswith(".sql") and os.path.exists(q):
            with open(q) as f:
                return f.read()
        return q


@dataclass
class TargetSpec:
    """One phase_3.target_record_insert entry (spark.json:69-96)."""

    data_target: str = "local"  # aws-s3|database|sftp|local
    dataframe_name: str = "output"
    load_type: str = "simpleInsert"  # simpleInsert|scdType2Insert|truncateInsert
    path: str | None = None
    table_name: str | None = None
    file_format: str = "parquet"
    save_mode: str = ""  # overwrite|append|scd2 (spark.json:91)
    single_file: bool = False
    output_file_name_prefix: str | None = None
    header: bool = True
    compression: str | None = None
    partition_by: list[str] = field(default_factory=list)
    #: sort rows within output files so columnar min/max stats are
    #: selective (data skipping on later scans)
    sort_by: list[str] = field(default_factory=list)
    #: bucket spec for dataTarget=catalog: repeated big⋈big joins on the
    #: bucket key become shuffle-free (see operators/scale.py)
    bucket_by: list[str] = field(default_factory=list)
    num_buckets: int = 32
    reconciliation: bool = False
    reconciliation_mode: str = "count"  # count|hash (value-level checksum)
    # SCD2 knobs (our engine's; reference exposes only loadType=scdType2Insert)
    scd2_keys: list[str] = field(default_factory=list)
    scd2_compare_cols: list[str] = field(default_factory=list)
    scd2_effective_col: str | None = None
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    sftp_host: str | None = None
    remote_path: str | None = None
    #: transport options (port/username/password/keyPath/hostKeyPath for
    #: sftp targets), mirroring InputSpec.options
    options: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "TargetSpec":
        props = d.get("outputDataProperties") or d.get("outputFileProperties") or {}
        return cls(
            data_target=str(d.get("dataTarget") or d.get("fileTarget") or "local").lower(),
            dataframe_name=d.get("dataFrameName", "output"),
            load_type=d.get("loadType", "simpleInsert"),
            path=d.get("path") or d.get("targetS3Location") or d.get("targetLocation"),
            table_name=d.get("tableName"),
            file_format=str(props.get("fileFormat", d.get("fileFormat", "parquet"))).lower(),
            save_mode=str(props.get("savemode", "") or "").lower(),
            single_file=as_bool(props.get("singleFile")),
            output_file_name_prefix=props.get("outputFileNamePrefix") or d.get("outputFileNamePrefix"),
            header=as_bool(props.get("header"), True),
            compression=props.get("compression"),
            partition_by=list(props.get("partitionBy") or d.get("partitionBy") or []),
            sort_by=list(props.get("sortBy") or d.get("sortBy") or []),
            bucket_by=list(props.get("bucketBy") or d.get("bucketBy") or []),
            num_buckets=int(props.get("numBuckets", d.get("numBuckets", 32))),
            reconciliation=as_bool(d.get("reconciliation")),
            reconciliation_mode=str(d.get("reconciliationMode", "count")).lower(),
            scd2_keys=list(d.get("scd2Keys") or []),
            scd2_compare_cols=list(d.get("scd2CompareCols") or []),
            scd2_effective_col=d.get("scd2EffectiveCol"),
            jdbc_url=d.get("jdbcUrl") or d.get("url"),
            jdbc_properties={k: str(v) for k, v in (d.get("jdbcProperties") or {}).items()},
            sftp_host=d.get("sftpServerName"),
            remote_path=d.get("remoteDirPath"),
            options={k: str(v) for k, v in (d.get("options") or {}).items()},
        )


@dataclass
class ErrorSinkSpec:
    """phase_3.ErrorRecordInsert (spark.json:97-101): the quarantine lane."""

    file_target: str = "local"
    path: str | None = None
    table_name: str | None = None
    file_format: str = "parquet"
    jdbc_url: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "ErrorSinkSpec":
        return cls(
            file_target=str(d.get("fileTarget", "local")).lower(),
            path=d.get("targetS3Location") or d.get("path"),
            table_name=d.get("tableName"),
            file_format=str(d.get("fileFormat", "parquet")).lower(),
            jdbc_url=d.get("jdbcUrl") or d.get("url"),
            jdbc_properties={k: str(v) for k, v in (d.get("jdbcProperties") or {}).items()},
        )


@dataclass
class JobConfig:
    """The full 3-phase job (spark.json:1-108)."""

    name: str = "job"
    spark_config: dict[str, str] = field(default_factory=dict)
    #: fraction of rows allowed bad (spark.json:7). None = key absent =
    #: gate off; an explicit "0%" means zero tolerance (any bad row fails)
    #: — same semantics the V3 count validation gives 0.
    threshold_limit: float | None = None
    duplicate_run_check: bool = False  # idempotency guard (spark.json:8)
    temp_path: str | None = None  # checkpoints/scratch (spark.json:9)
    metrics_path: str | None = None  # per-run JSON metrics sidecar dir
    archive_input_file: bool = False  # (spark.json:10-12)
    archive_path: str | None = None
    delete_source_after_archival: bool = False
    junk_character_removal: bool = False  # (spark.json:27)
    pre_scripts: list[str] = field(default_factory=list)  # (spark.json:28-30)
    post_scripts: list[str] = field(default_factory=list)  # (spark.json:103-105)

    primary_input: InputSpec | None = None
    additional_inputs: list[InputSpec] = field(default_factory=list)

    data_validation_required: bool = False
    validations: ValidationSpec = field(default_factory=ValidationSpec)
    data_transformation_required: bool = True
    transformations: list[TransformSpec] = field(default_factory=list)
    transformed_count_validation: bool = False

    targets: list[TargetSpec] = field(default_factory=list)
    error_sink: ErrorSinkSpec | None = None

    @classmethod
    def from_dict(cls, raw: dict[str, Any], params: dict[str, Any] | None = None) -> "JobConfig":
        # phase_1 nests under "configs"; phase_2/3 are top-level in the
        # reference template (spark.json:2,40,68). Accept either placement.
        raw = substitute_params(raw, params)
        configs = raw.get("configs", {}) or {}

        def section(key: str) -> dict[str, Any]:
            return raw.get(key) or configs.get(key) or {}

        p1, p2, p3 = section("phase_1"), section("phase_2"), section("phase_3")
        if not p1 and not p2 and not p3:
            # a typo'd config (wrong key names / flat layout) must not
            # parse to an empty job that "succeeds" silently
            raise ValueError(
                "job config has no phase_1/phase_2/phase_3 sections — "
                "nothing to run. Expected the spark.json dialect: phase_1 "
                "under 'configs' (or top-level), phase_2/phase_3 top-level; "
                f"got keys {sorted(raw.keys())}"
            )
        pre = configs.get("pre_execution_steps") or raw.get("pre_execution_steps") or {}
        post = p3.get("PostExecutionSteps") or {}

        primary = None
        if p1.get("input_data"):
            primary = InputSpec.from_dict(p1["input_data"])
        addl_raw = configs.get("additional_input_read") or raw.get("additional_input_read") or p1.get("additional_input_read") or []
        additional = [
            InputSpec.from_dict(d, default_name=f"side_input_{i}") for i, d in enumerate(addl_raw)
        ]

        targets_raw = p3.get("target_record_insert") or []
        error_raw = p3.get("ErrorRecordInsert")

        return cls(
            name=raw.get("name", configs.get("name", "job")),
            spark_config={k: str(v) for k, v in (configs.get("sparkConfig") or raw.get("sparkConfig") or {}).items()},
            threshold_limit=as_percent(
                configs.get("thresholdLimit", raw.get("thresholdLimit")), default=None
            ),
            duplicate_run_check=as_bool(configs.get("duplicateRunCheck", raw.get("duplicateRunCheck"))),
            temp_path=configs.get("s3TempPath") or raw.get("s3TempPath") or configs.get("tempPath"),
            metrics_path=configs.get("metricsPath") or raw.get("metricsPath"),
            archive_input_file=as_bool(configs.get("archiveInputFile")),
            archive_path=configs.get("archiveS3Path") or configs.get("archivePath"),
            delete_source_after_archival=as_bool(configs.get("deleteSourceAfterArchival")),
            junk_character_removal=as_bool(pre.get("junkCharacterRemoval")),
            pre_scripts=[s for s in (pre.get("scriptExecutions") or []) if s and not s.startswith("<")],
            post_scripts=[s for s in (post.get("scriptExecutions") or []) if s and not s.startswith("<")],
            primary_input=primary,
            additional_inputs=additional,
            data_validation_required=as_bool(p2.get("data_validation_required")),
            validations=ValidationSpec.from_dict(p2.get("data_validations") or {}),
            data_transformation_required=as_bool(p2.get("data_transformation_required"), True),
            transformations=[TransformSpec.from_dict(t) for t in (p2.get("data_transformations") or [])],
            transformed_count_validation=as_bool(p2.get("transformed_data_count_validation")),
            targets=[TargetSpec.from_dict(t) for t in targets_raw],
            error_sink=ErrorSinkSpec.from_dict(error_raw) if error_raw else None,
        )

    @classmethod
    def from_json(
        cls, path_or_str: str, params: dict[str, Any] | None = None
    ) -> "JobConfig":
        if os.path.exists(path_or_str):
            with open(path_or_str) as f:
                raw = json.load(f)
        else:
            raw = json.loads(path_or_str)
        return cls.from_dict(raw, params=params)


#: group 1 = optional escape "$" (``$${name}`` → literal ``${name}``),
#: group 2 = the parameter name
_PARAM_RE = re.compile(r"(\$?)\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def substitute_params(
    raw: dict[str, Any], params: dict[str, Any] | None = None
) -> dict[str, Any]:
    """Resolve ``${name}`` placeholders in every string of a raw job
    config — the templated-config mechanism an Airflow-driven pipeline
    uses to pass run dates (``"path": ".../ds=${ds}"``, ``"sqlQuery":
    "... WHERE ds = '${ds}'"``). The reference DAG does exactly this
    with ``#{...}``-style tokens spliced into each job submission
    (reference ``example-shareprice.py:79-82`` replaces
    ``#{s3_config_path}`` into the config argument); here the
    substitution is first-class in the config parser instead of ad-hoc
    string surgery in the DAG.

    Defaults come from the config's own ``configs.jobParams`` block;
    caller ``params`` override them. A placeholder with no value is a
    hard error NAMING the missing key (a typo'd template must not run
    with the literal ``${...}`` in a path); strings without
    placeholders pass through untouched, so un-templated configs are
    unaffected. A config that needs a LITERAL ``${...}`` in its text
    (a regex operatorParam, a shell-style string in a sqlQuery) writes
    ``$${name}`` — the escape resolves to ``${name}`` and is never
    treated as a parameter. ``jobParams`` itself is removed from the
    resolved dict (it is template input, not job config)."""
    configs = raw.get("configs") or {}
    defaults = dict(configs.get("jobParams") or raw.get("jobParams") or {})
    merged = {**defaults, **(params or {})}

    def sub(obj):
        if isinstance(obj, str):
            def repl(m):
                if m.group(1):  # $${name}: escaped — emit the literal
                    return "${" + m.group(2) + "}"
                k = m.group(2)
                if k not in merged:
                    raise ValueError(
                        f"job config references ${{{k}}} but no value was "
                        f"given (params/jobParams keys: {sorted(merged)}); "
                        f"write $${{{k}}} for a literal ${{{k}}}"
                    )
                return str(merged[k])

            return _PARAM_RE.sub(repl, obj)
        if isinstance(obj, dict):
            return {k: sub(v) for k, v in obj.items()}
        if isinstance(obj, list):
            return [sub(v) for v in obj]
        return obj

    # drop ONLY the template-input blocks (root and configs level) —
    # a nested payload key that happens to be named "jobParams" (e.g.
    # inside operatorParams) is user data and must survive
    out = sub(raw)
    out.pop("jobParams", None)
    if isinstance(out.get("configs"), dict):
        out["configs"].pop("jobParams", None)
    return out
