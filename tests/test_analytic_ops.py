"""Skyline, interval-overlap join, and as-of tolerance/robustness tests."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nexus_processor_spark.operators.asof import asof_join_pandas
from nexus_processor_spark.operators.intervals import (
    overlap_join,
    point_in_interval_join,
)
from nexus_processor_spark.operators.skyline import pareto_frontier_2d


# ---------------------------------------------------------------- skyline

def _brute_skyline(points):
    """O(n^2) dominance reference: minimize price, maximize size."""
    out = []
    for i, (_, pi, si) in enumerate(points):
        dominated = any(
            pj <= pi and sj >= si and (pj < pi or sj > si)
            for j, (_, pj, sj) in enumerate(points) if j != i
        )
        if not dominated:
            out.append(points[i][0])
    return sorted(out)


def test_skyline_matches_brute_force_with_ties(spark):
    rng = random.Random(7)
    # small value domains force price ties, size ties, and full duplicates
    pts = [(i, float(rng.randint(0, 8)), rng.randint(0, 8)) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, price double, size int")
    got = sorted(
        r.id for r in pareto_frontier_2d(
            df, minimize="price", maximize="size"
        ).collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_keeps_exact_duplicates_and_drops_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 5), (4, None, 9), (5, 0.5, None)],
        "id long, price double, size int",
    )
    got = sorted(
        r.id for r in pareto_frontier_2d(
            df, minimize="price", maximize="size"
        ).collect()
    )
    # duplicates don't dominate each other; 3 is dominated by 1/2;
    # null measures are excluded entirely
    assert got == [1, 2]


# ----------------------------------------------------- interval overlap

def _brute_overlaps(ls, rs):
    return sorted(
        (lid, rid)
        for lid, a, b in ls
        for rid, c, d in rs
        if a < d and c < b
    )


def test_overlap_join_exactly_once_random(spark):
    rng = random.Random(13)
    # lengths straddle the grid (50): some intervals span 4+ cells, so a
    # pair can share many cells — output must still be exactly-once
    ls = []
    rs = []
    for i in range(40):
        a = rng.uniform(0, 500)
        ls.append((i, a, a + rng.uniform(1, 220)))
    for j in range(30):
        c = rng.uniform(0, 500)
        rs.append((j, c, c + rng.uniform(1, 220)))
    left = spark.createDataFrame(ls, "lid long, ls double, le double")
    right = spark.createDataFrame(rs, "rid long, rs double, re double")
    out = overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        grid=50.0,
    ).select("lid", "rid").collect()
    got = sorted((r.lid, r.rid) for r in out)
    assert got == _brute_overlaps(ls, rs)
    assert len(got) == len(set(got)), "duplicate pairs emitted"


def test_overlap_join_half_open_boundary(spark):
    left = spark.createDataFrame([(1, 0.0, 10.0)], "lid long, ls double, le double")
    right = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 9.999, 12.0), (3, -5.0, 0.0)],
        "rid long, rs double, re double",
    )
    got = sorted(
        r.rid for r in overlap_join(
            left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
            grid=10.0,
        ).collect()
    )
    # [0,10) meets [10,20) and [-5,0) only at closed endpoints — no overlap
    assert got == [2]


def test_point_in_interval_half_open(spark):
    pts = spark.createDataFrame(
        [(1, 10.0), (2, 9.999), (3, 0.0), (4, -0.5)], "pid long, t double"
    )
    iv = spark.createDataFrame([(7, 0.0, 10.0)], "wid long, ws double, we double")
    got = sorted(
        r.pid for r in point_in_interval_join(
            pts, iv, time_col="t", start_col="ws", end_col="we", grid=4.0
        ).collect()
    )
    assert got == [2, 3]  # start inclusive, end exclusive


def test_overlap_join_plan_is_hash_equi_join(spark):
    left = spark.range(100).select(
        F.col("id").alias("lid"),
        (F.col("id") * 10.0).alias("ls"),
        (F.col("id") * 10.0 + 15.0).alias("le"),
    )
    right = spark.range(100).select(
        F.col("id").alias("rid"),
        (F.col("id") * 7.0).alias("rs"),
        (F.col("id") * 7.0 + 9.0).alias("re"),
    )
    plan = overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        grid=10.0,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ------------------------------------------------------ as-of robustness

def test_asof_pandas_tolerance_boundary_inclusive(spark):
    left = spark.createDataFrame(
        [("a", 10.0, 1), ("a", 20.0, 2)], "g string, t double, eid long"
    )
    right = spark.createDataFrame(
        [("a", 5.0, 50.0)], "g string, t double, quote double"
    )
    out = {r.eid: r.quote for r in asof_join_pandas(
        left, right, on="t", by="g", value_cols=["quote"], tolerance=5.0
    ).collect()}
    assert out == {1: 50.0, 2: None}  # exactly-at-tolerance matches


def test_asof_pandas_one_sided_groups_and_null_times(spark):
    left = spark.createDataFrame(
        [("only_left", 1.0, 1), ("both", 3.0, 2), ("both", None, 3)],
        "g string, t double, eid long",
    )
    right = spark.createDataFrame(
        [("both", 2.0, 9.0), ("both", None, -1.0), ("only_right", 0.0, 7.0)],
        "g string, t double, quote double",
    )
    rows = asof_join_pandas(
        left, right, on="t", by="g", value_cols=["quote"]
    ).collect()
    out = {r.eid: r.quote for r in rows}
    # left-only group joins nothing; null left time joins nothing; null
    # right time is never a match; right-only group emits no rows
    assert out == {1: None, 2: 9.0, 3: None}
    assert len(rows) == 3


def test_asof_pandas_self_derived_sides_keep_on_column(spark):
    # left and right sliced from ONE parent frame — the exprId-collision
    # case where the right child's `t` used to vanish from the pandas rdf
    base = spark.createDataFrame(
        [("a", 1.0, "q", 100), ("a", 2.0, "e", 101), ("a", 3.0, "e", 102)],
        "g string, t double, kind string, eid long",
    )
    left = base.filter(F.col("kind") == "e").select("eid", "g", "t")
    right = base.filter(F.col("kind") == "q").select(
        "g", "t", F.col("t").alias("vt")
    )
    out = {r.eid: r.vt for r in asof_join_pandas(
        left, right, on="t", by="g", value_cols=["vt"]
    ).collect()}
    assert out == {101: 1.0, 102: 1.0}


def test_skyline_plan_has_no_cartesian_and_broadcasts_groups(spark):
    df = spark.range(10000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 97).cast("double").alias("price"),
        (F.col("id") % 31).cast("int").alias("size"),
    )
    plan = pareto_frontier_2d(
        df, minimize="price", maximize="size"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan  # group table joins broadcast


def test_overlap_join_epoch_magnitude_boundaries(spark):
    """Boundary exclusion must work where `end - 1e-9 == end` in float64
    (epoch seconds), and sub-eps overlaps just past a boundary must
    still be found — the exact end-cell arithmetic, not an epsilon."""
    base = 1.7e9
    left = spark.createDataFrame(
        [(1, base, base + 3600.0),            # ends exactly on a boundary
         (2, base, base + 3600.0 + 5e-7)],    # overlaps the next cell by 0.5us
        "lid long, ls double, le double",
    )
    right = spark.createDataFrame(
        [(10, base + 3600.0, base + 7200.0)],
        "rid long, rs double, re double",
    )
    got = sorted(
        r.lid for r in overlap_join(
            left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
            grid=3600.0,
        ).collect()
    )
    assert got == [2]  # 1 only touches at the closed endpoint; 2 overlaps
