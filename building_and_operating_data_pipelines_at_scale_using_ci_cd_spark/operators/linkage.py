"""Record linkage: blocked candidate generation + Fellegi–Sunter-style
integer field scoring.

The Fellegi–Sunter model (JASA 1969) scores a candidate pair by summing
per-field log-odds weights — an agreement on a discriminating field adds
a large positive weight, a disagreement subtracts — and classifies by
threshold.  Here the weights are INTEGER milli-units supplied by the
caller (they're log(m/u) ratios estimated offline; shipping them as
literals keeps the scorer whole-stage-codegen and the answer
bit-identical cross-engine — the knn_pagerank integer-mass lesson).

Scale shape (the part that matters at 100 TB):
  - candidates come from a BLOCKED equi-join — both sides hash-shuffle
    on the block key, pairs exist only within a block, never all-pairs
    (the same bound every dedup family in this repo uses: the block key
    is to linkage what the LSH band is to MinHash);
  - comparators are Column expressions over the joined row — map-only,
    no UDF;
  - scoring + threshold is a filter, so the match set never
    materializes the full candidate cross-product downstream.

A skewed block (one giant city/nation) is the known failure mode:
pick block keys whose cardinality grows with the data (or compose
several, e.g. nation × name-suffix) exactly as ``blocked_pairs``
encourages by accepting a LIST of keys.

Comparator kinds:
  - ``exact``  — left == right;
  - ``prefix`` — first ``param`` chars equal;
  - ``abs_tol_x100`` — |left-right| <= param/100, compared on
    HALF-UP-quantized integer hundredths (exact cross-engine).

All three share ONE null contract (see ``FieldComparator``): both-null
agrees, one-sided null disagrees — so the same missing field can never
flip sign between comparator kinds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldComparator:
    """One field rule: adds ``w_agree`` milli-units when the rule
    holds, else ``w_disagree`` (typically negative).

    NULL contract — IDENTICAL for every kind (a missing-both-sides
    field must not score oppositely depending on which comparator
    happens to test it): both sides NULL ⇒ agreement (the eqNullSafe
    convention ``exact`` always had); exactly one side NULL ⇒
    disagreement (the comparison can't confirm, so it doesn't pay
    ``w_agree``)."""

    left_col: str
    right_col: str
    kind: str  # exact | prefix | abs_tol_x100
    w_agree: int
    w_disagree: int
    param: int = 0

    def agrees(self) -> Column:
        l, r = F.col("l." + self.left_col), F.col("r." + self.right_col)
        if self.kind == "exact":
            return l.eqNullSafe(r)
        if self.kind == "prefix":
            cmp = F.substring(l.cast("string"), 1, self.param) == F.substring(
                r.cast("string"), 1, self.param
            )
        elif self.kind == "abs_tol_x100":
            lq = F.floor(l * 100 + F.lit(0.5)).cast("bigint")
            rq = F.floor(r * 100 + F.lit(0.5)).cast("bigint")
            cmp = F.abs(lq - rq) <= F.lit(self.param)
        else:
            raise ValueError(f"unknown comparator kind {self.kind!r}")
        # same null-safe contract as eqNullSafe: both-null agrees, a
        # one-sided null (cmp = NULL) falls to disagreement
        return (l.isNull() & r.isNull()) | F.coalesce(cmp, F.lit(False))

    def weight(self) -> Column:
        return (
            F.when(self.agrees(), F.lit(self.w_agree))
            .otherwise(F.lit(self.w_disagree))
            .cast("bigint")
        )


def blocked_pairs(
    left: DataFrame, right: DataFrame, block_cols: list[tuple[Column, Column]]
) -> DataFrame:
    """Candidate pairs via an equi-join on the block key expressions
    (list of (left_expr, right_expr)); aliases the sides ``l`` / ``r``
    for the comparators."""
    if not block_cols:
        raise ValueError("blocking needs at least one key (else all-pairs)")
    l = left.alias("l")
    r = right.alias("r")
    cond = None
    for le, re_ in block_cols:
        c = le == re_
        cond = c if cond is None else (cond & c)
    return l.join(r, cond, "inner")


def link_records(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[tuple[Column, Column]],
    comparators: list[FieldComparator],
    threshold: int,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Blocked Fellegi–Sunter linkage: returns
    ``(left_id, right_id, score)`` for candidate pairs whose summed
    integer weight reaches ``threshold``."""
    if not comparators:
        raise ValueError("need at least one comparator")
    pairs = blocked_pairs(left, right, block_cols)
    score = comparators[0].weight()
    for c in comparators[1:]:
        score = score + c.weight()
    return (
        pairs.select(
            F.col("l." + left_id).alias("left_id"),
            F.col("r." + right_id).alias("right_id"),
            score.alias("score"),
        )
        .filter(F.col("score") >= F.lit(threshold))
    )
