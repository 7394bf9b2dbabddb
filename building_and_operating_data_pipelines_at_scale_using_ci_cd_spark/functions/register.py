"""SQL-callable function registration (SURVEY.md §2.9).

The reference's only extensibility is "write more SQL" (spark.json offers
SQL strings + bash hooks; no UDF surface). We close that gap: the
north-star text/similarity operators register as SQL-callable functions so
config-dialect ``sqlQuery`` transformations can use them directly.

Two tiers:
  - expression-backed names are just documented SQL idioms (they compile
    to built-in expressions — zero Python cost); see ``functions.text``.
  - pandas UDFs (Arrow-batched) for logic that genuinely needs Python —
    registered here. Row-at-a-time ``F.udf`` is deliberately absent: at
    100 TB it is never the right tool.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType, StringType


@pandas_udf(IntegerType())
def py_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count (Arrow-batched)."""
    return text.str.split(" ").map(len).astype("int32")


@pandas_udf(DoubleType())
def py_type_token_ratio(text: pd.Series) -> pd.Series:
    """Lexical diversity: unique tokens / tokens."""

    def ttr(s: str) -> float:
        toks = s.split(" ")
        return len(set(toks)) / len(toks) if toks else 0.0

    return text.map(ttr)


@pandas_udf(StringType())
def py_nfc_normalize(text: pd.Series) -> pd.Series:
    """Unicode NFC normalization (Arrow-batched) — canonical-composes
    decomposed sequences (e + U+0301 -> é) so byte-level dedup hashes
    agree across differently-encoded sources. Spark has no built-in
    unicode-normalize expression, so this is the honest Pandas-UDF tier;
    DuckDB oracles mirror it with ``nfc_normalize``."""
    return text.map(
        lambda s: unicodedata.normalize("NFC", s) if s is not None else None
    )


def _sentence_udtf():
    """Python UDTF (Spark 4): one input document → one row per sentence
    with its ordinal — the TABLE-function tier of §2.9 (scalar pandas
    UDFs can't change the row count; LATERAL joins against a UDTF can).
    Splitting is a deterministic regex-free scan ('. ' boundaries, final
    fragment kept), so a DuckDB oracle mirrors it with STRING_SPLIT."""
    from pyspark.sql.functions import udtf

    # useArrow: evaluation crosses to Python in Arrow batches
    # (ArrowEvalPythonUDTF) — without it a UDTF is the row-at-a-time
    # BatchEvalPython path the plan audit bans everywhere else
    @udtf(returnType="pos int, sentence string", useArrow=True)
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for i, frag in enumerate(text.split(". ")):
                # strip SPACES ONLY: the strict oracle uses SQL TRIM,
                # which removes ' ' but not tab/newline — one shared
                # whitespace contract or the hashes diverge on documents
                # with tabs/newlines next to a '. ' boundary
                frag = frag.strip(" ")
                if frag:
                    yield i, frag

    return SplitSentences


def register_sql_functions(spark: SparkSession) -> None:
    """Make the Python-tier functions callable from config SQL."""
    spark.udf.register("py_token_count", py_token_count)
    spark.udf.register("py_type_token_ratio", py_type_token_ratio)
    spark.udf.register("py_nfc_normalize", py_nfc_normalize)
    spark.udtf.register("py_split_sentences", _sentence_udtf())
