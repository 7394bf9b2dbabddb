"""P2: junk-character removal (``spark.json:27`` junkCharacterRemoval).

Strips non-printable / non-ASCII garbage from every string column. Pure
JVM-side ``regexp_replace`` — stays inside whole-stage codegen, no Python
crossing, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

#: keep printable ASCII + common whitespace; drop control chars & mojibake
_JUNK_PATTERN = r"[^\x20-\x7E\t\n\r]"


def remove_junk_characters(df: DataFrame, pattern: str = _JUNK_PATTERN) -> DataFrame:
    """Apply junk-char scrubbing to all string columns."""
    string_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, StringType)}
    if not string_cols:
        return df
    return df.select(
        *[
            F.regexp_replace(F.col(c), pattern, "").alias(c) if c in string_cols else F.col(c)
            for c in df.columns
        ]
    )
