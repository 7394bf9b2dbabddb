"""Learned quality/domain classifier: logistic regression trained and
applied entirely in DataFrame operations — the fastText-tier upgrade over
heuristic quality scores (CCNet/Llama-style corpora train exactly this
kind of cheap linear filter over surface features), with no MLlib
dependency so it composes with the rest of the engine's oracle-checkable
column-expression style.

Scale shape (same discipline as ``similarity.kmeans_refine``):

  - features are pure Column expressions (JVM-side, codegen'd);
  - each training iteration is ONE map-side-combined aggregate over the
    corpus — the gradient — returning ``dim`` doubles to the driver
    (bounded by feature count, never by rows);
  - the learned weights fold back into the projection as literals, so
    scoring is a narrow map stage (``logreg_score``) any engine can
    reproduce exactly.

Caveat recorded honestly: gradient sums are float accumulations, so
trained weights are deterministic only up to shuffle/partition order
(last-ulp wiggle). Scoring with FIXED weights is bit-deterministic and
is what the oracle checks; the training path gets the weaker rows-only
driver check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import avg_token_len, punct_ratio, stopword_ratio, token_count


def text_feature_terms(text: Column) -> list[Column]:
    """Surface-feature expressions for text-quality classification:
    [bias, stopword_ratio, punct_ratio, capped token count, mean token
    length] — every term mirror-able in ANSI SQL for the oracle."""
    return [
        F.lit(1.0),
        stopword_ratio(text),
        punct_ratio(text),
        F.least(token_count(text).cast("double") / F.lit(100.0), F.lit(1.0)),
        avg_token_len(text) / F.lit(10.0),
    ]


def text_feature_vector(text: Column) -> Column:
    """:func:`text_feature_terms` packed as one array column (the stored
    shape for training, where the gradient indexes a materialized x)."""
    return F.array(*text_feature_terms(text))


def logreg_score(features: Column, weights: list[float]) -> Column:
    """sigmoid(w·x) over a MATERIALIZED feature-array column."""
    z = None
    for i, w in enumerate(weights):
        term = F.element_at(features, i + 1).cast("double") * F.lit(float(w))
        z = term if z is None else z + term
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_score_terms(terms: list[Column], weights: list[float]) -> Column:
    """sigmoid(w·x) directly over feature EXPRESSIONS — identical math
    and accumulation order to :func:`logreg_score`, skipping the
    array-pack + element_at indirection. Use this in scoring hot paths:
    element_at over an array of computed expressions tickles a janino
    whole-stage-codegen bug in Spark 4.1 ("isNull_NN is not an rvalue")
    that silently drops the stage to interpreted eval (surfaced by the
    round-6 bench failed-task/stderr hygiene pass)."""
    z = None
    for w, term in zip(weights, terms):
        t = term.cast("double") * F.lit(float(w))
        z = t if z is None else z + t
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    features_col: str,
    label_col: str,
    dim: int,
    iters: int = 15,
    lr: float = 1.0,
) -> list[float]:
    """Batch gradient descent for logistic regression. Per iteration: one
    aggregate computing avg((sigmoid(w·x) − y) · x_d) per dimension —
    map-side partial aggregation, ``dim`` doubles of driver traffic.
    Deterministic given a deterministic input partitioning up to float
    accumulation order (see module docstring)."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    feats = F.col(features_col)
    y = F.col(label_col).cast("double")
    w = [0.0] * dim
    for _ in range(iters):
        p = logreg_score(feats, w)
        grads = df.agg(
            *[
                F.avg((p - y) * F.element_at(feats, d + 1).cast("double")).alias(f"g{d}")
                for d in range(dim)
            ]
        ).first()
        w = [w[d] - lr * float(grads[f"g{d}"]) for d in range(dim)]
    return w
