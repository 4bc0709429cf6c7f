"""Round-6 operator invariants: DSIR selection, soft-dedup weights,
LSH precision/recall eval, power-iteration PCA. (Value-exactness vs
DuckDB is pinned by the oracle harness; these pin SEMANTICS.)"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import dedup, pipeline, similarity


def test_dsir_weights_zero_when_target_is_corpus(spark):
    """p_tgt == p_raw bucket-for-bucket => every log-ratio is exactly 0
    and every doc scores exactly 0 — the importance weights measure
    DIVERGENCE from the corpus, nothing else."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i} gamma") for i in range(20)],
        "doc_id long, text string",
    )
    w = pipeline.dsir_logweights(docs, docs)
    assert [r.logw_e6 for r in w.collect()] == [0] * 20


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs written in the target domain's vocabulary must outrank docs
    written in a disjoint vocabulary."""
    target_like = [(i, "neutron beam pulse detector flux") for i in range(5)]
    other = [(i + 100, "recipe butter flour sugar oven") for i in range(5)]
    corpus = spark.createDataFrame(
        target_like + other, "doc_id long, text string")
    target = spark.createDataFrame(
        [(1000, "neutron beam pulse detector flux calibration")],
        "doc_id long, text string")
    top5 = pipeline.dsir_select(corpus, target, 5)
    assert {r.doc_id for r in top5.collect()} == {0, 1, 2, 3, 4}


def test_soft_dedup_weights_sum_to_one_per_group(spark):
    docs = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "unique"), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.weight_e6
           for r in dedup.soft_dedup_weights(docs).collect()}
    assert got == {1: 500000, 2: 500000, 3: 1000000, 4: 1000000}


def test_neardup_eval_perfect_on_exact_dups(spark):
    """Exact duplicates collide on every band and share every shingle:
    the detector must score precision = recall = 1.0 when the only
    J >= 0.5 pairs are exact copies."""
    base = "the quick brown fox jumps over the lazy sleeping dog today"
    docs = spark.createDataFrame(
        [(1, base), (2, base),
         (3, "completely different words about spark catalyst engines"),
         (4, "yet another unrelated document mentioning parquet files")],
        "doc_id long, text string",
    )
    row = dedup.neardup_eval(docs, threshold=0.5).first()
    assert (row.n_pred, row.n_true, row.n_hit) == (1, 1, 1)
    assert row.precision_e6 == 1000000 and row.recall_e6 == 1000000


def test_neardup_eval_truth_catches_lsh_misses(spark):
    """A pair just above threshold can miss every band (LSH is
    probabilistic); the exact truth side must still count it, recall
    dropping below 1. Construct with 1-band signatures at a threshold
    the single band will often miss — the invariant tested is
    n_true >= n_hit and n_pred >= n_hit, plus truth >= pred hit set."""
    rows = [(i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(6)]
    # two docs sharing ~60% of shingles
    rows += [(100, "a b c d e f g h i j"), (101, "a b c d e f g h i zz")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    row = dedup.neardup_eval(docs, threshold=0.5, num_bands=2).first()
    assert row.n_true >= 1
    assert row.n_hit <= min(row.n_pred, row.n_true)


def test_pca_power_scores_match_numpy_direction(spark):
    """The integer-exact power iteration must agree with numpy's SVD on
    a corpus with one dominant direction: score order == projection
    order onto the top right-singular vector (up to global sign)."""
    rng = np.random.default_rng(7)
    u = rng.normal(size=16)
    u /= np.linalg.norm(u)
    coeff = rng.normal(scale=5.0, size=40)
    noise = rng.normal(scale=0.05, size=(40, 16))
    x = np.clip(coeff[:, None] * u[None, :] + noise, -0.9, 0.9)
    rows = [(i, [float(v) for v in x[i]]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.score
           for r in similarity.pca_power_scores(emb, iterations=8).collect()}
    scores = np.array([got[i] for i in range(40)], dtype=float)
    proj = x @ np.linalg.svd(x, full_matrices=False)[2][0]
    corr = np.corrcoef(scores, proj)[0, 1]
    assert abs(corr) > 0.999, corr


def test_pca_power_scores_empty_and_null_vectors(spark):
    emb = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>")
    assert similarity.pca_power_scores(emb).count() == 0
