"""Construction-time guard jobs — the shared contract for operators
that run a SMALL, BOUNDED Spark job while BUILDING their plan.

Most operators in this package are lazy: they return a DataFrame and no
cluster work happens until the caller acts on it.  A few need one
scalar fact about the data before the RIGHT plan can be chosen — e.g.
:func:`~.web.domain_cap` must know whether any domain fell short of its
hash-prefix oversample (astronomically rare, but the answer must never
depend on hash uniformity), and
:func:`~.analytics.rank_sum_test` must know the metric's cardinality
before it commits to a cumulative rank window.  Those operators run ONE
bounded job at CONSTRUCTION time through this helper.

Contract (also noted in ``operators/registry.py``): a config step or
API call that *builds* one of these operators triggers a small Spark
job immediately, even if the result is never acted on.  Every such job
is bounded by a design parameter (a row ``limit`` plus a hard raise),
never by data size.  Operators using the pattern: ``domain_cap``
(config step ``domainCap``), ``rank_sum_test`` (``rankSumTest``, only
when ``max_values`` is set), ``near_dup_pairs`` / ``ngram_jaccard_dups``
(``nearDupPairs`` / ``ngramJaccardDups``, only when
``collapse_exact="auto"``), and ``generalize_to_k`` (``generalizeToK``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def construction_rows(
    df: DataFrame,
    *,
    op_name: str,
    purpose: str,
    max_rows: int,
    over_msg: str | None = None,
) -> list:
    """Collect at most ``max_rows`` rows of ``df`` eagerly, as an
    operator-construction guard.  Raises ``ValueError`` when the bound
    is exceeded (``over_msg`` if given — callers put the actionable
    remedy there).  ``purpose`` documents what fact the job probes; it
    is embedded in the default error so a surprised caller can see WHY
    a "plan-building" call ran a job."""
    if max_rows < 1:
        raise ValueError(f"{op_name}: max_rows must be >= 1, got {max_rows}")
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            over_msg
            or (
                f"{op_name}: construction-time guard ({purpose}) exceeded "
                f"its {max_rows}-row bound — the data shape violates the "
                "operator's contract"
            )
        )
    return rows


def construction_scalar(df: DataFrame, *, op_name: str, purpose: str):
    """One-row-aggregate form of :func:`construction_rows`: collect the
    single row of a global aggregate built as a construction guard and
    return it.  ``df`` must be a 1-row plan (a global ``agg``)."""
    [row] = construction_rows(
        df, op_name=op_name, purpose=purpose, max_rows=1
    )
    return row
