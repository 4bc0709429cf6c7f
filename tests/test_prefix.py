"""Distributed prefix sum and sweep-line concurrency."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from nexus_processor_spark.operators.prefix import (
    distributed_running_sum,
    interval_concurrency,
)


def test_running_sum_equals_global_window(spark):
    rng = random.Random(11)
    rows = [(i, rng.uniform(-100.0, 100.0), rng.randint(-5, 5))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, t double, v int")
    got = {
        r.id: r.running_total
        for r in distributed_running_sum(
            df, order_col="t", value_col="v", grid=13.0,
            tiebreak_cols=("id",),
        ).collect()
    }
    w = (Window.orderBy("t", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {
        r.id: r.rt
        for r in df.select("id", F.sum("v").over(w).alias("rt")).collect()
    }
    assert got == want  # integer sums: exact, order-independent


def test_running_sum_no_global_sort_partition(spark):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 1.5).alias("t"), F.lit(1).alias("v")
    )
    plan = distributed_running_sum(
        df, order_col="t", value_col="v", grid=100.0, tiebreak_cols=("id",)
    )._jdf.queryExecution().executedPlan().toString()
    # the data-scale window must be partitioned by the bucket; the only
    # single-partition window runs over the bucket table
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "_b" not in ln and "windowspecdefinition" in ln
    ]
    assert not data_windows, data_windows


def _brute_concurrency(iv):
    deltas = []
    for uid, sid, s0, s1 in iv:
        deltas.append((s0, 1, uid, sid))
        deltas.append((s1, -1, uid, sid))
    deltas.sort(key=lambda r: (r[0], -r[1], r[2], r[3]))
    out, c = {}, 0
    for t, d, uid, sid in deltas:
        c += d
        out[(t, d, uid, sid)] = c
    return out


def test_concurrency_matches_sweep(spark):
    rng = random.Random(5)
    iv = []
    for uid in range(20):
        t = 0.0
        for sid in range(5):
            t += rng.uniform(1, 50)
            s0 = t
            t += rng.uniform(0, 30)  # zero-length sessions possible
            iv.append((uid, sid, s0, t))
    df = spark.createDataFrame(
        iv, "user_id long, session_id long, s0 double, s1 double"
    )
    got = {
        (r.t, r.delta, r.user_id, r.session_id): r.concurrent
        for r in interval_concurrency(
            df, start_col="s0", end_col="s1", grid=37.0,
            id_cols=("user_id", "session_id"),
        ).collect()
    }
    assert got == _brute_concurrency(iv)
    # closed-interval semantics: totals return to zero at the end
    assert min(got.values()) >= 0


def test_concurrency_start_meets_end_counts_both(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0, 10.0), (2, 0, 10.0, 20.0)],
        "user_id long, session_id long, s0 double, s1 double",
    )
    got = {
        (r.t, r.delta): r.concurrent
        for r in interval_concurrency(
            df, start_col="s0", end_col="s1", grid=7.0,
            id_cols=("user_id", "session_id"),
        ).collect()
    }
    assert got[(10.0, 1)] == 2  # the start at t=10 sees the ending one
    assert got[(10.0, -1)] == 1


def test_row_number_ranks_null_keys_first(spark):
    """NULL order keys are ranked (NULLS FIRST), not silently dropped by
    the bucket equi-join — same rows as the single-task global window."""
    from nexus_processor_spark.operators.prefix import distributed_row_number

    rows = [(1, 5.0), (2, None), (3, 1.0), (4, None), (5, 9.0)]
    df = spark.createDataFrame(rows, "id long, t double")
    got = {
        r.id: r.row_index
        for r in distributed_row_number(
            df, order_col="t", tiebreak_cols=("id",), grid=2.0
        ).collect()
    }
    w = Window.orderBy(F.asc_nulls_first("t"), "id")
    want = {
        r.id: r.ri
        for r in df.select(
            "id", (F.row_number().over(w) - 1).alias("ri")).collect()
    }
    assert len(got) == 5  # every row ranked, nulls included
    assert got == want == {2: 0, 4: 1, 3: 2, 1: 3, 5: 4}


def test_running_sum_keeps_null_key_rows(spark):
    from nexus_processor_spark.operators.prefix import distributed_running_sum

    rows = [(1, 5.0, 10), (2, None, 1), (3, 1.0, 100), (4, None, 2)]
    df = spark.createDataFrame(rows, "id long, t double, v int")
    got = {
        r.id: r.running_total
        for r in distributed_running_sum(
            df, order_col="t", value_col="v", grid=2.0, tiebreak_cols=("id",)
        ).collect()
    }
    # nulls first: 2 (1), 4 (3), then 3 (103), 1 (113)
    assert got == {2: 1, 4: 3, 3: 103, 1: 113}
