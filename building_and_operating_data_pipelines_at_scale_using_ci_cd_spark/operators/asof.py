"""As-of and range joins (SURVEY.md §2.3 Q2).

Querying SCD2 output is an effective-dated range lookup
(``BETWEEN eff_start_ts AND eff_end_ts`` — intrinsic to the reference's
``scd2_daily_ranges`` task, ``example-shareprice.py:150``). Spark has no
native as-of join, so:

  - ``range_join``: plain non-equi condition joined WITH equi key(s) first
    so Catalyst still plans a hash/sort-merge join on the keys and applies
    the range as a post-filter — never a cartesian when keys are given.
  - ``asof_join``: the scalable union-and-window formulation: tag both
    sides, union on (key, ts), carry the last right-side row forward with a
    window ``last(..., ignorenulls=True)``. One shuffle on (key), no
    point-by-point lookup, no Python. This is how you as-of join 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Effective-dated lookup: left rows matched to the right-side interval
    containing ``ts_col``. Keys make it an equi-join + range filter."""
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    rng = (left[ts_col] >= right[start_col]) & (left[ts_col] < right[end_col])
    cond = rng if cond is None else (cond & rng)
    dup = [k for k in keys if k in right.columns]
    return left.join(right, cond, how).drop(*[right[k] for k in dup])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before its
    timestamp (pandas ``merge_asof`` semantics), distributed via
    union + window instead of a per-row lookup.

    ``tolerance``: optional SQL interval string (e.g. ``'7 days'``) — right
    rows older than ``left_ts - tolerance`` don't match.
    """
    value_cols = right_value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    lt = left.withColumn("__ts", F.col(left_ts).cast("timestamp")).withColumn(
        "__side", F.lit(1)
    )
    rt = (
        right.select(
            *keys,
            F.col(right_ts).cast("timestamp").alias("__ts"),
            *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in [f"__v_{v}" for v in value_cols]:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    lt = lt.withColumn("__rts", F.lit(None).cast("timestamp"))
    rt = rt.withColumn("__rts", F.col("__ts"))

    all_cols = [c for c in lt.columns]
    unioned = lt.select(*all_cols).unionByName(
        rt.select(
            *[
                F.lit(None).cast(lt.schema[c].dataType).alias(c)
                if c not in rt.columns
                else F.col(c)
                for c in all_cols
            ]
        )
    )
    # right rows sort before left rows at equal ts → "at or before" semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *all_cols,
        *[
            F.last(F.col(f"__v_{v}"), ignorenulls=True).over(w).alias(f"__f_{v}")
            for v in value_cols
        ],
        F.last(F.col("__rts"), ignorenulls=True).over(w).alias("__f_rts"),
    )
    out = filled.filter(F.col("__side") == 1)
    if tolerance:
        within = F.col("__f_rts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(f"__f_{v}")).alias(v)
                for v in value_cols
            ],
        )
    else:
        out = out.select(
            *[c for c in left.columns],
            *[F.col(f"__f_{v}").alias(v) for v in value_cols],
        )
    return out
