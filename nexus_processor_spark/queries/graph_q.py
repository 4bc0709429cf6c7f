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


PR_ITERATIONS = 10
PR_DAMPING = 0.85


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph — centrality of each document
    inside its duplication neighborhood (the canonical-survivor pick a
    crawl dedup can use instead of min-id). Power iteration, one
    join+agg shuffle per round; per-iteration round-9 keeps the ranks
    engine- and order-deterministic."""
    return graph.pagerank(
        _pairs(spark, sf_dir),
        iterations=PR_ITERATIONS,
        damping=PR_DAMPING,
    )


QUERIES = {
    "graph_degrees": q_graph_degrees,
    "graph_triangles": q_graph_triangles,
    "graph_pagerank": q_graph_pagerank,
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

def _pagerank_sql(iterations: int, damping: float) -> str:
    """Unrolled power iteration mirroring operators.graph.pagerank
    exactly: same symmetrized edge set, same uniform init, same
    per-iteration round-9 (which also absorbs cross-engine double-sum
    ordering, the kmeans_fit oracle trick)."""
    ctes = [
        _PAIRS + ",",
        """e AS (SELECT id_a AS s, id_b AS d FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),""",
        "deg AS (SELECT s AS id, count(*) AS deg FROM e GROUP BY 1),",
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM nv) AS rank FROM deg),",
    ]
    for i in range(1, iterations + 1):
        ctes.append(f"""r{i} AS (
            SELECT deg.id,
                   round((1.0 - {damping}) / (SELECT n FROM nv)
                         + {damping} * COALESCE(c.in_sum, 0.0), 9) AS rank
            FROM deg LEFT JOIN (
                SELECT e.d AS id, sum(p.rank / sd.deg) AS in_sum
                FROM e
                JOIN r{i - 1} p ON e.s = p.id
                JOIN deg sd ON sd.id = e.s
                GROUP BY 1
            ) c ON deg.id = c.id
        ),""")
    body = "\n".join(ctes).rstrip().rstrip(",")
    return f"{body}\nSELECT id, rank FROM r{iterations}"


ORACLE = {
    "graph_pagerank": _pagerank_sql(PR_ITERATIONS, PR_DAMPING),
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
