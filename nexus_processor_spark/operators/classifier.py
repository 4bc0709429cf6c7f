"""Distributed linear-classifier training for corpus quality filtering.

The modern curation stack trains a small linear model (fastText-style /
logistic regression over hashed n-gram features — public literature:
Joulin et al. 2016, Weinberger et al. 2009) on a labeled seed set, then
scores the whole corpus with it. This module is that loop, Spark-first:

* **fit** is full-batch gradient descent where each iteration is ONE
  map-side-combinable aggregate over the feature table (``dim`` sums +
  a bias sum — the same skinny-shuffle shape as MLlib's
  ``treeAggregate``) with the current weights broadcast into the plan
  as literals. Driver traffic is O(dim) per iteration; the data never
  moves. At 100 TB this is the textbook parameter-broadcast pattern —
  no parameter server needed below ~10^6 dims.
* **score** is a map-only projection (a ``dim``-term codegen dot
  product), so corpus-wide inference is scan-bound.

Determinism discipline (what makes the DuckDB oracle possible): the
per-row probability rounds to 6 decimals and each weight update rounds
to 9 BEFORE the next iteration reads them, so the whole GD trajectory
is reproducible across engines, partitionings, and aggregation orders —
the same trick as ``similarity.kmeans_fit`` / ``graph.pagerank``. The
dot product folds terms in index order on both sides.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["classification_report", "logreg_fit", "logreg_score"]


def _dot_lit(weights: list[float], vec_col: str) -> Column:
    """Index-ordered left fold of ``sum_j w_j * x[j]`` as a codegen
    expression (weights inlined as literals)."""
    return reduce(
        operator.add,
        (F.lit(w) * F.col(vec_col)[j] for j, w in enumerate(weights)),
    )


def _prob(weights: list[float], bias: float, vec_col: str) -> Column:
    """round-6 sigmoid of the affine score. Saturated scores degrade to
    exactly 0.0 / 1.0 identically in any IEEE engine (1/(1+inf))."""
    z = _dot_lit(weights, vec_col) + F.lit(bias)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logreg_fit(
    df: DataFrame,
    dim: int,
    *,
    feature_col: str = "embedding",
    label_col: str = "label",
    iterations: int = 5,
    lr: float = 0.1,
) -> tuple[list[float], float]:
    """Full-batch GD logistic regression -> (weights, bias).

    ``df`` needs a dense ``array<double>`` feature column of length
    ``dim`` (see ``textstats.hashed_dense``) and a 0/1 numeric label.
    Each iteration runs one aggregate job: partial gradient sums
    combine map-side, the driver sees one ``dim+1``-column row, and the
    rounded update is computed INSIDE the aggregate (engine round-half-
    away semantics, not Python's round-half-even) so the collected
    weights are exactly what an oracle re-deriving the trajectory gets.
    """
    # GD reads the features iterations+1 times: materialize them ONCE
    # (and truncate the upstream tokenize/hash lineage) instead of
    # re-deriving the whole feature pipeline per iteration — the same
    # iterative-algorithm discipline as dup_clusters/pagerank. At
    # corpus scale this is the "cache the training matrix" step.
    df = df.select(feature_col, label_col).localCheckpoint(eager=True)
    n = df.count()
    if n == 0:
        raise ValueError("logreg_fit on an empty DataFrame")
    w = [0.0] * dim
    b = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(iterations):
        err = (_prob(w, b, feature_col) - y).alias("_e")
        base = df.select(err, feature_col)
        # w_j - (lr * g_j) / n, rounded: same association as the oracle
        upd = [
            F.round(
                F.lit(w[j])
                - (F.lit(lr) * F.sum(F.col("_e") * F.col(feature_col)[j]))
                / F.lit(float(n)),
                9,
            ).alias(f"w{j}")
            for j in range(dim)
        ]
        upd.append(
            F.round(
                F.lit(b) - (F.lit(lr) * F.sum("_e")) / F.lit(float(n)), 9
            ).alias("b")
        )
        row = base.agg(*upd).first()
        w = [float(row[f"w{j}"]) for j in range(dim)]
        b = float(row["b"])
    return w, b


def logreg_score(
    df: DataFrame,
    weights: list[float],
    bias: float,
    *,
    feature_col: str = "embedding",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Map-only corpus scoring with a trained model: ``(id, prob,
    predicted)``. ``prob`` is the round-6 sigmoid the fit used, so
    scores are engine-reproducible."""
    p = _prob(weights, bias, feature_col)
    return df.select(
        F.col(id_col),
        p.alias("prob"),
        (p >= F.lit(threshold)).cast("long").alias("predicted"),
    )


def classification_report(
    scored: DataFrame,
    *,
    label_col: str = "label",
    prob_col: str = "prob",
    pred_col: str = "predicted",
) -> DataFrame:
    """One-row evaluation of a scored corpus in a SINGLE aggregate pass:
    confusion counts, accuracy / precision / recall / F1, and log-loss
    (probabilities clamped to [1e-15, 1-1e-15] so saturated round-6
    scores of exactly 0/1 stay finite). Ratio denominators guard zero
    (no positives predicted -> null precision, not a division error).
    """
    y = F.col(label_col).cast("double")
    p = F.least(
        F.greatest(F.col(prob_col), F.lit(1e-15)), F.lit(1.0 - 1e-15)
    )
    yhat = F.col(pred_col).cast("double")
    tp = F.sum(F.when((y == 1) & (yhat == 1), 1).otherwise(0)).cast("long")
    fp = F.sum(F.when((y == 0) & (yhat == 1), 1).otherwise(0)).cast("long")
    tn = F.sum(F.when((y == 0) & (yhat == 0), 1).otherwise(0)).cast("long")
    fn = F.sum(F.when((y == 1) & (yhat == 0), 1).otherwise(0)).cast("long")
    n = F.count(F.lit(1))
    agg = scored.agg(
        tp.alias("tp"), fp.alias("fp"), tn.alias("tn"), fn.alias("fn"),
        n.alias("n"),
        (-F.avg(y * F.log(p) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p)))
        .alias("log_loss"),
    )
    prec_den = (F.col("tp") + F.col("fp")).cast("double")
    rec_den = (F.col("tp") + F.col("fn")).cast("double")
    prec = F.when(prec_den > 0, F.col("tp") / prec_den)
    rec = F.when(rec_den > 0, F.col("tp") / rec_den)
    return agg.select(
        "tp", "fp", "tn", "fn", "n",
        ((F.col("tp") + F.col("tn")) / F.col("n").cast("double"))
        .alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            prec.isNotNull() & rec.isNotNull() & ((prec + rec) > 0),
            2 * prec * rec / (prec + rec),
        ).alias("f1"),
        "log_loss",
    )
