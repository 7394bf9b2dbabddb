"""PySpark-native analytics/ETL engine with the capabilities of
aws-samples/building-and-operating-data-pipelines-at-scale-using-ci-cd.

The reference engine is a closed Scala JAR driven by a JSON config dialect
(reference ``spark.json:1-108``); this package is a brand-new, idiomatic
PySpark implementation of that dialect plus the full Spark SQL operator
surface the dialect's ``sqlQuery`` transformations expose, plus large-scale
training-data operators (dedup, similarity search, text analysis, multimodal
column plumbing).

Architecture (Spark-first, see SURVEY.md §7):
  - ``config``     — dataclass model of the JSON job-config dialect
  - ``session``    — SparkSession factory with conf passthrough + AQE defaults
  - ``sources``    — phase_1 readers (csv/parquet/orc/json/xml/excel/text/delta/jdbc)
  - ``operators``  — validation splits, SCD2 merge, dedup family, as-of join,
                     reconciliation, run ledger, cleansing
  - ``functions``  — text analysis, similarity search, multimodal UDFs
  - ``sinks``      — phase_3 writers, load modes, error lane, archival
  - ``plans``      — the Orchestrator engine + multi-job pipeline runner
  - ``streaming``  — Structured Streaming surface (watermarks, windows, dedup)
"""

__version__ = "0.1.0"

from .session import get_session  # noqa: F401
from .config import JobConfig  # noqa: F401
from .plans.engine import Orchestrator  # noqa: F401
from .plans.validate import validate_config, validate_manifest  # noqa: F401
