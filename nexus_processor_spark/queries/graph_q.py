"""Graph analytics queries over the near-dup pair graph, DuckDB-paired.

The edge relation is the verified MinHash pair set (same construction as
``dedup_minhash_pairs`` at threshold 0.5), so these queries also serve
as a second, structural check on the dedup pipeline: degree mass and
triangle closure are properties of the WHOLE pair relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.operators import dedup, graph
from nexus_processor_spark.queries.dedup_q import (
    _SHINGLES,
    _SIGS_R2,
    NUM_BANDS,
    SHINGLE_WORDS,
)
from nexus_processor_spark.sources.tables import load_table

PAIR_THRESHOLD = 0.5


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_dedup_pairs(
        docs,
        num_bands=NUM_BANDS,
        shingle_words=SHINGLE_WORDS,
        threshold=PAIR_THRESHOLD,
    )


def q_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex degree of the near-dup graph (symmetrized simple
    graph) — the size distribution view of dup clusters."""
    return graph.degrees(_pairs(spark, sf_dir))


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation via the edge-ordered wedge
    join — counts how clique-like each dup neighborhood is."""
    return graph.triangle_count(_pairs(spark, sf_dir))


QUERIES = {
    "graph_degrees": q_graph_degrees,
    "graph_triangles": q_graph_triangles,
}

# Verified pair relation (id_a < id_b), the shared edge CTE.
_PAIRS = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS ({_SIGS_R2}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sh x ON c.id_a = x.doc_id
        JOIN sh y ON c.id_b = y.doc_id
        WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / CAST(len(x.sh) + len(y.sh)
                     - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              >= {PAIR_THRESHOLD}
    )
"""

ORACLE = {
    "graph_degrees": f"""
        {_PAIRS}
        SELECT id, CAST(count(*) AS BIGINT) AS degree FROM (
            SELECT id_a AS id FROM pairs
            UNION ALL
            SELECT id_b FROM pairs
        ) GROUP BY 1
    """,
    "graph_triangles": f"""
        {_PAIRS},
        o AS (SELECT DISTINCT id_a AS a, id_b AS b FROM pairs),
        tri AS (
            SELECT w.a, w.b, w.c
            FROM (SELECT o1.a, o1.b, o2.b AS c
                  FROM o o1 JOIN o o2 ON o1.b = o2.a) w
            WHERE EXISTS (SELECT 1 FROM o
                          WHERE o.a = w.a AND o.b = w.c)
        )
        SELECT id, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT unnest([a, b, c]) AS id FROM tri
        ) GROUP BY 1
    """,
}
