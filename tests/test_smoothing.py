"""EWMA recurrence: exact kernel semantics + scan-path parity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nexus_processor_spark.operators import smoothing

SCHEMA = "g string, t long, x double"


def _loop(xs, alpha):
    out, s = [], None
    for x in xs:
        if x is not None and not (isinstance(x, float) and math.isnan(x)):
            s = x if s is None else alpha * x + (1 - alpha) * s
        out.append(s)
    return out


def test_ewma_matches_sequential_loop_with_null_holds(spark):
    rows = [("a", 0, 4.0), ("a", 1, None), ("a", 2, 8.0), ("a", 3, 2.0),
            ("b", 0, None), ("b", 1, 10.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r.g, r.t): r.ewma
        for r in smoothing.ewma(df, ["g"], "t", "x", 0.25).collect()
    }
    for g in ("a", "b"):
        xs = [x for gg, _, x in rows if gg == g]
        for t, want in enumerate(_loop(xs, 0.25)):
            if want is None:
                assert got[(g, t)] is None
            else:
                assert got[(g, t)] == want  # bit-exact, not approx


def test_ewma_scan_matches_exact_kernel(spark):
    """The two-phase affine scan equals the sequential recurrence to
    1e-9 across many buckets (FP differs only at bucket boundaries),
    and is bit-exact inside the first (seeded) bucket."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 500
    rows = [("s", int(i), float(v))
            for i, v in enumerate(rng.normal(10, 3, n))]
    df = spark.createDataFrame(rows, SCHEMA)
    exact = {r.t: r.ewma
             for r in smoothing.ewma(df, ["g"], "t", "x", 0.25).collect()}
    scan = {r.t: r.ewma
            for r in smoothing.ewma_scan(
                df, "t", "x", 0.25, grid=64.0).collect()}
    assert set(scan) == set(exact)
    assert all(abs(scan[t] - exact[t]) < 1e-9 for t in exact)
    assert all(scan[t] == exact[t] for t in range(64))  # seed bucket


def test_ewma_scan_single_bucket_bit_exact(spark):
    df = spark.createDataFrame(
        [("s", i, float(v)) for i, v in enumerate([5.0, 1.0, 9.0, 3.0])],
        SCHEMA,
    )
    exact = [r.ewma for r in smoothing.ewma(df, ["g"], "t", "x", 0.5)
             .orderBy("t").collect()]
    scan = [r.ewma for r in smoothing.ewma_scan(df, "t", "x", 0.5,
                                                grid=1000.0)
            .orderBy("t").collect()]
    assert scan == exact


def test_holt_level_trend_seed_and_forecast(spark):
    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 1, 12.0), ("a", 2, 20.0), ("a", 3, None)],
        SCHEMA,
    )
    rows = {r.t: r for r in smoothing.holt(
        df, ["g"], "t", "x", 0.5, 0.5).collect()}
    assert rows[0].holt_level == 10.0 and rows[0].holt_trend is None
    assert rows[0].holt_forecast is None
    # seed step 2: level = x1, trend = x1 - x0
    assert rows[1].holt_level == 12.0 and rows[1].holt_trend == 2.0
    assert rows[1].holt_forecast == 14.0
    # step 3: level = .5*20 + .5*(12+2) = 17; trend = .5*(17-12)+.5*2 = 3.5
    assert rows[2].holt_level == 17.0 and rows[2].holt_trend == 3.5
    assert rows[2].holt_forecast == 20.5
    # null holds both states and the forecast
    assert (rows[3].holt_level, rows[3].holt_trend,
            rows[3].holt_forecast) == (17.0, 3.5, 20.5)
