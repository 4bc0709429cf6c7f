"""Expectation-suite semantics: metrics, pass/fail, and the one-job plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_processor_spark.operators import quality


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 10.0, "A"),
            (2, "beta", 20.0, "B"),
            (3, None, -5.0, "A"),
            (4, "delta", 999.0, "Z"),
            (4, "echo", 30.0, "B"),
        ],
        "id long, name string, score double, grade string",
    )


def test_metrics_and_verdicts(spark):
    res = quality.run_checks(
        _df(spark),
        [
            quality.not_null("name"),
            quality.not_null("name", min_fraction=0.7),
            quality.unique("id"),
            quality.in_range("score", 0.0, 100.0),
            quality.in_set("grade", ["A", "B"]),
            quality.matches("name", "^[a-z]+$"),
            quality.non_negative_count(F.col("score") < 0, "neg_score"),
        ],
    )
    rows = {r["check"]: r for r in res.collect()}
    assert rows["not_null:name"]["metric"] == 0.8
    assert not rows["not_null:name"]["passed"]
    # same metric, looser threshold -> distinct name, passes
    assert rows["not_null:name>=0.7"]["passed"]
    assert rows["unique:id"]["metric"] == -1.0  # one duplicate id
    assert not rows["unique:id"]["passed"]
    assert rows["in_range:score"]["metric"] == 0.6  # -5, 999 out of range
    assert rows["in_set:grade"]["metric"] == 0.8
    assert rows["matches:name"]["metric"] == 0.8  # null counts as violation
    assert rows["zero:neg_score"]["metric"] == 1.0
    assert not rows["zero:neg_score"]["passed"]


def test_loose_threshold_passes(spark):
    res = quality.run_checks(
        _df(spark), [quality.not_null("name", min_fraction=0.7)]
    )
    (row,) = res.collect()
    assert row["passed"]


def test_referential_check(spark):
    fact = _df(spark)
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    res = quality.run_checks(
        fact,
        [quality.not_null("id")],
        refs=[quality.Referential("id", dim, "k", min_fraction=0.9)],
    )
    rows = {r["check"]: r for r in res.collect()}
    ref = rows["references:id->k>=0.9"]
    assert ref["metric"] == 0.6  # the two id=4 rows miss
    assert not ref["passed"]


def test_all_green_suite(spark):
    res = quality.run_checks(
        _df(spark),
        [quality.in_range("score", -10.0, 1000.0), quality.unique("score")],
    )
    assert all(r["passed"] for r in res.collect())


def test_single_aggregate_pass(spark):
    """The whole suite compiles to ONE aggregate over one scan — no
    per-check jobs (N checks must not mean N table scans at 100 TB)."""
    from nexus_processor_spark.plans import explain

    df = _df(spark)
    res = quality.run_checks(
        df,
        [
            quality.not_null("name"),
            quality.in_range("score", 0.0, 100.0),
            quality.in_set("grade", ["A", "B"]),
        ],
    )
    plan = explain.executed_plan(res)
    assert plan.count("Scan ExistingRDD") == 1


def test_empty_suite_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        quality.run_checks(_df(spark), [])


def test_quantile_histogram_equal_depths_on_uniform(spark):
    from nexus_processor_spark.operators import profile

    df = spark.range(800).select((F.col("id")).cast("double").alias("v"))
    res = profile.quantile_histogram(df, "v", 4).orderBy("bucket").collect()
    assert [r["bucket"] for r in res] == [1, 2, 3, 4]
    # uniform data -> equal depths (within interpolation-tie slack)
    assert all(abs(r["n"] - 200) <= 1 for r in res)
    assert res[0]["bucket_lo"] is None and res[-1]["bucket_hi"] is None
    # boundaries are monotone
    cuts = [r["bucket_hi"] for r in res[:-1]]
    assert cuts == sorted(cuts)


def test_quantile_histogram_rejects_single_bucket(spark):
    import pytest
    from nexus_processor_spark.operators import profile

    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        profile.quantile_histogram(df, "v", 1)
