"""Fuzzy (edit-distance) string join via symmetric-delete blocking.

The classic pipeline need: join records whose keys differ by typos
(entity resolution, log/label reconciliation). The naive shape is an
all-pairs Levenshtein — O(n²) and off the table at scale. The blocking
used here is the symmetric-delete (SymSpell, public algorithm) scheme:

  every string generates its deletion neighborhood — all variants with
  up to ``max_distance`` characters deleted. If ed(a, b) ≤ d, then a
  and b share at least one common variant (delete the substituted /
  inserted / deleted characters from whichever side carries them), so
  an EQUI-JOIN on the variant string is a COMPLETE candidate generator:
  exact Levenshtein verification on candidates only, never all pairs,
  and the completeness means the operator's output is exactly
  "all pairs with edit distance ≤ d" — directly oracle-checkable with
  a plain ``levenshtein()`` predicate in any engine.

Scale shape: variants per row is O(len^d) (len+1 for d=1) — a bounded
fan-out map stage; the join is a hash equi-join on the variant string.
Skewed variants only arise from genuinely near-identical key groups,
the same bound every dedup path in this package carries. Verification
is Spark's built-in ``levenshtein`` (JVM, codegen'd).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column, max_deletions: int = 1) -> Column:
    """All distinct variants of ``col`` with 0..max_deletions characters
    deleted (the string itself included). Pure Column expressions."""
    if max_deletions < 0:
        raise ValueError("max_deletions must be >= 0")
    variants = F.array(col)
    for _ in range(max_deletions):
        one_less = F.flatten(
            F.transform(
                variants,
                lambda v: F.when(
                    F.length(v) > 0,
                    F.transform(
                        # sequence(1, 0) would yield [1, 0] (descending),
                        # hence the length guard above
                        F.sequence(F.lit(1), F.length(v)),
                        lambda i: F.concat(
                            v.substr(F.lit(1), i - 1),
                            v.substr(i + 1, F.length(v)),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
        variants = F.array_distinct(F.concat(variants, one_less))
    return variants


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """All (left, right) pairs with levenshtein(left_col, right_col) ≤
    ``max_distance``. Columns out: id_a, id_b, name_a, name_b,
    edit_distance."""

    def keyed(df: DataFrame, id_col: str, col: str, ida: str, namea: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(ida),
            F.col(col).alias(namea),
            F.explode(deletion_variants(F.col(col), max_distance)).alias("__v"),
        )

    cand = (
        keyed(left, left_id, left_col, "id_a", "name_a")
        .join(keyed(right, right_id, right_col, "id_b", "name_b"), "__v")
        .select("id_a", "name_a", "id_b", "name_b")
        .distinct()
    )
    return (
        cand.withColumn("edit_distance", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("edit_distance") <= max_distance)
        .select("id_a", "id_b", "name_a", "name_b", "edit_distance")
    )


def fuzzy_self_join(
    df: DataFrame, id_col: str, text_col: str, max_distance: int = 1
) -> DataFrame:
    """Self-join form: unordered pairs (id_a < id_b) within
    ``max_distance`` edits — near-duplicate KEYS, the entity-resolution
    primitive next to the text/embedding near-dup family."""
    out = fuzzy_join(df, df, id_col, text_col, id_col, text_col, max_distance)
    return out.filter(F.col("id_a") < F.col("id_b"))
