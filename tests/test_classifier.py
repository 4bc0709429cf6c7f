from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import classifier


def _toy(spark):
    # linearly separable in dim 2: label = 1 iff x0 > x1
    rows = [
        (1, [3.0, 0.0], 1),
        (2, [2.0, 1.0], 1),
        (3, [4.0, 1.0], 1),
        (4, [0.0, 3.0], 0),
        (5, [1.0, 2.0], 0),
        (6, [0.0, 4.0], 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, label long"
    )


def test_logreg_learns_separable_toy(spark):
    df = _toy(spark)
    w, b = classifier.logreg_fit(df, 2, iterations=30, lr=0.5)
    # gradient descent on separable data: w0 up, w1 down
    assert w[0] > 0 > w[1]
    scored = {
        r.doc_id: (r.prob, r.predicted)
        for r in classifier.logreg_score(df, w, b).collect()
    }
    for i in (1, 2, 3):
        assert scored[i][0] > 0.5 and scored[i][1] == 1
    for i in (4, 5, 6):
        assert scored[i][0] < 0.5 and scored[i][1] == 0


def test_logreg_rounded_trajectory_is_deterministic(spark):
    df = _toy(spark)
    a = classifier.logreg_fit(df, 2, iterations=5, lr=0.1)
    b = classifier.logreg_fit(df.repartition(7), 2, iterations=5, lr=0.1)
    # round-9 updates absorb partitioning/aggregation-order differences
    assert a == b


def test_logreg_fit_empty_raises(spark):
    df = _toy(spark).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        classifier.logreg_fit(df, 2)


def test_classification_report_counts_and_metrics(spark):
    rows = [
        # (label, prob, predicted): 2 TP, 1 FP, 2 TN, 1 FN
        (1, 0.9, 1), (1, 0.8, 1), (0, 0.7, 1),
        (0, 0.2, 0), (0, 0.1, 0), (1, 0.4, 0),
    ]
    df = spark.createDataFrame(rows, "label long, prob double, predicted long")
    r = classifier.classification_report(df).first()
    assert (r.tp, r.fp, r.tn, r.fn, r.n) == (2, 1, 2, 1, 6)
    assert abs(r.accuracy - 4 / 6) < 1e-12
    assert abs(r.precision - 2 / 3) < 1e-12
    assert abs(r.recall - 2 / 3) < 1e-12
    assert abs(r.f1 - 2 / 3) < 1e-12
    assert r.log_loss > 0


def test_classification_report_degenerate_no_positives(spark):
    # all predicted negative: precision undefined (null), recall 0;
    # saturated prob 0.0/1.0 must not produce inf log-loss
    rows = [(0, 0.0, 0), (1, 1.0, 0)]
    df = spark.createDataFrame(rows, "label long, prob double, predicted long")
    r = classifier.classification_report(df).first()
    assert r.precision is None
    assert r.recall == 0.0
    assert r.f1 is None
    import math
    assert math.isfinite(r.log_loss)
