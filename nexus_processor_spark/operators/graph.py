"""Graph analytics over edge relations (undirected (src, dst) pairs).

The dup-pair graphs that dedup produces (and any entity-relation edge
table) support a standard analytics tier beyond connected components
(``dedup.dup_clusters``): degree distributions, triangle counting, and
PageRank-style centrality. All are DataFrame compositions:

* Degrees: one symmetrized aggregate.
* Triangles: the classic edge-ordered join — orient every edge from the
  smaller to the larger id, join wedges ``(a<b) x (b<c)``, then probe
  the closing edge ``(a, c)``. Ordering makes each triangle count
  exactly once AND bounds the wedge fan-out by the max ORIENTED
  out-degree (a hub's wedges distribute across its neighbors instead of
  squaring on the hub — the standard skew mitigation).
* PageRank: driver-looped iterations like ``dedup.dup_clusters`` (one
  join + aggregate per round, lineage cut per iteration). Ranks are
  rounded each iteration so runs are reproducible cross-partitioning.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both directions of each undirected edge, self-loops dropped,
    deduplicated.

    One explode pass, NOT a union of two selects of ``edges``: a union
    duplicates the upstream subtree, and the edge relations fed in here
    are often whole pipelines (the verified minhash pair set), which a
    union would execute twice per action."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    return (
        e.select(F.explode(F.array(
            F.struct(F.col("s"), F.col("d")),
            F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
        )).alias("_e"))
        .select("_e.s", "_e.d")
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )


def degrees(
    edges: DataFrame, *, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-vertex degree of the undirected simple graph: ``(id, degree)``."""
    return (
        _sym(edges, src, dst)
        .groupBy(F.col("s").alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def triangle_count(
    edges: DataFrame, *, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-vertex triangle participation: ``(id, n_triangles)``.

    Wedges join oriented edges (min->max id), so each triangle
    ``a<b<c`` materializes exactly one wedge ``a->b->c`` and one closing
    probe ``(a, c)`` — no double counting, and hub vertices don't square
    their degree on one side of the join. Vertices in no triangle are
    absent (left-join against ``degrees`` to zero-fill if needed).
    """
    # Materialize the oriented edge list once: it is consumed THREE
    # times below (both wedge legs + the closing-probe semi-join), and
    # without the cache each consumption re-executes the entire
    # upstream edge pipeline (for the dup-pair graph queries that is a
    # full banded-minhash + verify pass, ×3). PERSIST, not a local
    # checkpoint: the oriented edge list is proportional to the input
    # graph (huge on real graphs), and a localCheckpoint of it pins
    # executor disk while dropping fault tolerance — an executor loss
    # kills the job instead of recomputing the lost blocks.
    # MEMORY_AND_DISK keeps the single-materialization plan
    # (InMemoryTableScan x3) and spills under pressure.
    oriented = (
        _sym(edges, src, dst)
        .filter(F.col("s") < F.col("d"))
        .select(F.col("s").alias("a"), F.col("d").alias("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    wedge = (
        oriented.select(F.col("a"), F.col("b"))
        .join(
            oriented.select(F.col("a").alias("b"), F.col("b").alias("c")),
            "b",
        )
    )
    tri = (
        wedge.join(
            oriented.select(F.col("a"), F.col("b").alias("c")),
            ["a", "c"],
            "left_semi",
        )
    )
    per_corner = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_corner


def pagerank(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 10,
    damping: float = 0.85,
    round_digits: int = 9,
) -> DataFrame:
    """PageRank over the undirected simple graph: ``(id, rank)``.

    Power iteration with uniform teleport: each round is one join of the
    rank vector onto the symmetrized edges plus one aggregate
    (``O(iterations)`` shuffles, like the reference shape of
    ``dup_clusters``). ``localCheckpoint`` truncates lineage each round.
    Ranks round to ``round_digits`` per iteration so results don't drift
    with partitioning/accumulation order. Isolated vertices don't exist
    in an edge relation by construction; ranks sum to ~1 over vertices
    that appear.
    """
    # sym is input-proportional and consumed every iteration: persist
    # (fault-tolerant, disk-spilling) rather than localCheckpoint —
    # same reasoning as ``triangle_count``'s oriented edge list.
    sym = _sym(edges, src, dst).persist(StorageLevel.MEMORY_AND_DISK)
    # deg is consumed TWICE per iteration (rank/deg contribution and the
    # zero-fill join) — without the cut every iteration re-aggregates
    # the whole edge set twice (2 x iterations redundant passes). deg
    # stays a localCheckpoint: it doubles as the lineage cut the
    # driver-looped iteration needs (bounded: one row per vertex that
    # the rank vector itself already materializes per round).
    deg = sym.groupBy(F.col("s").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=True)
    n = deg.count()
    if n == 0:
        return deg.select("id", F.lit(0.0).alias("rank"))
    ranks = deg.select("id", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        rd = ranks.join(deg, "id")
        contrib = (
            sym.join(rd, sym.s == rd.id)
            .select(
                F.col("d").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            deg.select("id")
            .join(contrib, "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0)),
                    round_digits,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
