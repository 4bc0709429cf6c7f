"""Persisted IVF-int8 vector index: the AT-REST form of the composed
search tier (`similarity.ivf_int8_rerank_topk`).

The in-memory composition already multiplies the two cost dials — cell
pruning and byte shrink — but its probe-union ``isin`` only becomes an
I/O win when the packed tier actually LIVES partitioned by coarse cell.
This module makes that real: ``build_ivf_int8_index`` writes the packed
codes as parquet ``partitionBy("cell")`` (plus the trained centroids
and an index manifest), and ``search`` runs the identical composed
pipeline against the on-disk tier — the probe-union filter hits
Spark's partition pruning, so a search READS ~nprobe/k_cells of the
index bytes (plan-pinned: ``PartitionFilters`` carries the ``isin``;
tests assert it). At 100 TB the index is the only thing a search
touches: 64 B/vector packed codes in the probed cells, plus
``candidates`` full vectors per query for the re-rank.

Layout under ``path``:

* ``codes/cell=<c>/*.parquet``   — (id, code binary), partition col cell
* ``centroids/*.parquet``        — (id, embedding)
* ``index.json``                 — dim, k_cells, id/vec column names

Reference scope: the reference has no vector index; this is the brief's
similarity-search scale path (IVF lists + quantized codes, the public
FAISS recipe) expressed as Spark-native storage + plans.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_ivf_int8_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> dict:
    """Ingest-time index build: assign every corpus vector to its
    nearest centroid (``similarity.kmeans_assign`` — the oracle-exact
    rounded-L2 + id tiebreak), pack its int8 code (64 B/vector at
    dim 64), and write the codes parquet PARTITIONED BY CELL so the
    search-time probe union prunes partitions. One corpus pass; the
    shuffle is the ``partitionBy`` write clustering (unavoidable — it
    IS the index). Returns the manifest dict."""
    from nexus_processor_spark.operators import similarity, vector_arrow

    dim = similarity._probe_dim(corpus, vec_col, "build_ivf_int8_index")
    if dim is None:
        raise ValueError("cannot index an empty/all-null corpus")
    cells = similarity.kmeans_assign(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits,
    ).select(id_col, F.col("centroid_id").alias("cell"))
    codes = vector_arrow.pack_int8_codes(
        corpus, id_col=id_col, vec_col=vec_col
    ).join(cells, id_col)
    codes.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(path, "codes"))
    centroids.select(id_col, vec_col).write.mode("overwrite").parquet(
        os.path.join(path, "centroids"))
    k_cells = centroids.count()
    manifest = {
        "dim": int(dim), "k_cells": int(k_cells),
        "id_col": id_col, "vec_col": vec_col,
        "round_digits": round_digits,
    }
    tmp = os.path.join(path, "index.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(path, "index.json"))
    return manifest


def open_index(
    spark: SparkSession, path: str
) -> tuple[dict, DataFrame, DataFrame]:
    """(manifest, centroids, codes) — codes carry the ``cell``
    partition column, so filters on it prune at the source."""
    with open(os.path.join(path, "index.json")) as fh:
        manifest = json.load(fh)
    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    codes = spark.read.parquet(os.path.join(path, "codes"))
    return manifest, centroids, codes


def search(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    path: str,
    k: int = 5,
    *,
    nprobe: int = 2,
    candidates: int = 50,
) -> DataFrame:
    """Composed search against the persisted tier: identical semantics
    (and oracle) to ``similarity.ivf_int8_rerank_topk`` with the index's
    cells/codes — the probe-union ``isin`` lands in the parquet scan's
    ``PartitionFilters``, so only the probed cells' files are read.
    ``corpus`` supplies the full-precision vectors for the re-rank
    (I/O proportional to queries x candidates, not corpus)."""
    from nexus_processor_spark.operators import similarity

    manifest, centroids, codes = open_index(spark, path)
    id_col = manifest["id_col"]
    # cells live in the codes frame itself; pass them through so the
    # operator never recomputes the assignment
    cells = codes.select(id_col, "cell")
    return similarity.ivf_int8_rerank_topk(
        queries, corpus, centroids, k,
        nprobe=nprobe, candidates=candidates,
        id_col=id_col, vec_col=manifest["vec_col"],
        round_digits=manifest["round_digits"],
        cells=cells, codes=codes,
    )


def append_to_index(
    new_vectors: DataFrame,
    path: str,
) -> int:
    """Incremental index maintenance: assign NEW vectors to the
    existing centroids (the quantizer is frozen at build time — the
    standard IVF maintenance contract; re-training is a rebuild) and
    append their packed codes into the cell-partitioned tier. Only the
    touched cells' directories receive files; existing files are never
    rewritten. Returns the number of vectors appended. Searches pick
    the new vectors up immediately — same layout, same oracle
    semantics as a from-scratch build over the union (test-pinned)."""
    from nexus_processor_spark.operators import similarity, vector_arrow

    spark = new_vectors.sparkSession
    manifest, centroids, _ = open_index(spark, path)
    id_col, vec_col = manifest["id_col"], manifest["vec_col"]
    cells = similarity.kmeans_assign(
        new_vectors, centroids, id_col=id_col, vec_col=vec_col,
        round_digits=manifest["round_digits"],
    ).select(id_col, F.col("centroid_id").alias("cell"))
    codes = vector_arrow.pack_int8_codes(
        new_vectors, id_col=id_col, vec_col=vec_col
    ).join(cells, id_col)
    n = codes.count()
    codes.write.mode("append").partitionBy("cell").parquet(
        os.path.join(path, "codes"))
    return n
