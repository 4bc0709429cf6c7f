"""Graph operator semantics: degrees, triangles, PageRank."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_processor_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_degrees_symmetrize_and_dedup(spark):
    # duplicate edge (1,2)/(2,1) and a self-loop must not inflate degrees
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (3, 3)])
    got = {r["id"]: r["degree"] for r in graph.degrees(e).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_triangle_count_per_vertex(spark):
    # triangle 1-2-3 plus a pendant 3-4: corners get 1, pendant absent
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {r["id"]: r["n_triangles"]
           for r in graph.triangle_count(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_k4(spark):
    # K4 has 4 triangles; every vertex sits in 3 of them
    e = _edges(spark, [(a, b) for a in range(4) for b in range(a + 1, 4)])
    got = {r["id"]: r["n_triangles"]
           for r in graph.triangle_count(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pagerank_star_center_dominates(spark):
    # star: hub 0 with 4 spokes — hub rank far above spokes, mass ~1
    e = _edges(spark, [(0, i) for i in range(1, 5)])
    got = {r["id"]: r["rank"] for r in graph.pagerank(e).collect()}
    assert got[0] > 0.35
    spokes = [got[i] for i in range(1, 5)]
    assert all(abs(s - spokes[0]) < 1e-9 for s in spokes)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_matches_numpy_power_iteration(spark):
    import numpy as np

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e = _edges(spark, pairs)
    got = {r["id"]: r["rank"] for r in graph.pagerank(e, iterations=10).collect()}

    # same symmetrized power iteration with the same per-round rounding
    n = 4
    adj = np.zeros((n, n))
    for a, b in pairs:
        adj[a, b] = adj[b, a] = 1
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        r = np.round(0.15 / n + 0.85 * (adj.T @ (r / deg)), 9)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])


def test_pagerank_empty_graph(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert graph.pagerank(e).count() == 0
