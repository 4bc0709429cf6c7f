"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* **Brute-force top-k** — broadcast the (small) query set against the
  corpus; cosine via native ``zip_with``/``aggregate``; per-query top-k by
  window. Exact; the baseline every ANN variant is measured against. The
  corpus is never collected — the only shuffle is the final per-query
  k-selection, whose input is already cut to k rows per partition by a
  partial window... at 100 TB the corpus scan dominates, which is the
  floor for exact search.
* **IVF (coarse-quantized) top-k** — restrict the search to the query's
  cell (here: the precomputed ``label`` column; in production: nearest
  k-means centroid assigned at ingest). Turns the full scan into a
  partition-pruned scan when the corpus is written partitioned by cell.

Cosines are rounded (1e-6) before ranking with an id tiebreak so results
are stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nexus_processor_spark.functions.vector import cosine


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self-matches
    excluded). Output: query_id, vec_id, cos, rank."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Approximate top-k searching only the query's coarse cell.

    With the corpus partitioned by cell on disk, the equi-join on
    ``cell_col`` prunes to the probed partitions — the IVF scale path.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(cell_col).alias("cell"),
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(cell_col).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos"),
        )
    )
    return _ranked_topk(scored, k)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = "label",
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold.

    Pairs are generated within coarse cells (blocked self-join) — the
    embedding analog of LSH banding; without ``cell_col`` it degrades to
    the full n² cross join (only for small corpora / tests).
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        *( [F.col(cell_col).alias("cell")] if cell_col else [] ),
    )
    joined = a.join(b, "cell") if cell_col else a.crossJoin(b)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
    )
