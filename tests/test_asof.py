from __future__ import annotations

import pytest

from nexus_processor_spark.operators.asof import asof_join, asof_join_pandas, sessionize


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [("a", 1.0, 100), ("a", 5.0, 101), ("a", 5.5, 102),
         ("b", 2.0, 200), ("b", 0.5, 201)],
        "g string, t double, eid long",
    )
    right = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 5.0, 50.0), ("b", 1.0, 99.0)],
        "g string, t double, quote double",
    )
    return left, right


def test_asof_join_backward_semantics(sides):
    left, right = sides
    out = {r.eid: r.quote for r in
           asof_join(left, right, on="t", by="g").collect()}
    assert out == {
        100: 10.0,   # equality visible (non-strict)
        101: 50.0,
        102: 50.0,   # carries forward
        200: 99.0,
        201: None,   # before any right row
    }


def test_asof_join_strict_excludes_equal(sides):
    left, right = sides
    out = {r.eid: r.quote for r in
           asof_join(left, right, on="t", by="g", strict=True).collect()}
    assert out[100] is None and out[101] == 10.0


def test_asof_pandas_matches_native(sides):
    left, right = sides
    native = {(r.g, r.t): r.quote for r in
              asof_join(left, right, on="t", by="g").collect()}
    pandas = {(r.g, r.t): r.quote for r in
              asof_join_pandas(left, right, on="t", by="g").collect()}
    # merge_asof NaN -> None normalization
    import math
    pandas = {k: (None if v is None or (isinstance(v, float) and math.isnan(v))
                  else v) for k, v in pandas.items()}
    assert native == pandas


def test_sessionize_gap(spark):
    events = spark.createDataFrame(
        [(1, 0.0), (1, 10.0), (1, 100.0), (1, 105.0), (2, 0.0)],
        "user_id long, t double",
    )
    out = {(r.user_id, r.t): r.session_id for r in
           sessionize(events, 50.0, time_col="t").collect()}
    assert out == {
        (1, 0.0): 0, (1, 10.0): 0,       # within gap
        (1, 100.0): 1, (1, 105.0): 1,    # new session after 90s gap
        (2, 0.0): 0,
    }


def test_asof_null_semantics_match_pandas(spark):
    """Null right keys are never matches, and the LATEST matching row
    wins even when its value is null (no stale-row resurrection) —
    native and pandas forms agree on both."""
    from nexus_processor_spark.operators import asof

    left = spark.createDataFrame(
        [("k", 3.0, 1), ("k", 0.5, 2)], "by string, t double, lid long")
    right = spark.createDataFrame(
        [("k", None, 9.0), ("k", 1.0, 5.0), ("k", 2.0, None)],
        "by string, t double, v double",
    )
    native = {r.lid: r.v for r in asof.asof_join(
        left, right, on="t", by="by").collect()}
    pandas = {r.lid: r.v for r in asof.asof_join_pandas(
        left, right, on="t", by="by").collect()}
    # lid=1 (t=3): latest match is t=2 whose v is genuinely NULL;
    # lid=2 (t=0.5): no right row at or before it (null-t row ignored)
    assert native == pandas == {1: None, 2: None}

    right2 = spark.createDataFrame(
        [("k", 1.0, 5.0, "a"), ("k", 2.0, None, "b")],
        "by string, t double, v double, s string",
    )
    got = {r.lid: (r.v, r.s) for r in asof.asof_join(
        left, right2, on="t", by="by",
        value_cols=["v", "s"]).collect()}
    # both outputs come from the SAME (latest) right row — never a mix
    assert got[1] == (None, "b")
