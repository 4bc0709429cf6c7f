"""curate_corpus: the composed pipeline tags each doc with the FIRST
stage that dropped it, stages apply sequentially, kept = untouched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import pipeline

LONG = "alpha beta gamma delta epsilon zeta eta theta " * 6


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # (id, text, n_chars) — n_chars is the quality metric
        (0, "tiny", 4),                         # low_quality (shortest)
        (1, LONG + "one", 400),                 # kept
        (2, LONG + "one", 400),                 # exact dup of 1
        (3, LONG + "one extra tail words", 420),  # near dup of 1
        (4, "completely different content words entirely novel "
            "predicate stream machine learning tokens repeated "
            "structure sample body text goes here today", 200),  # kept
        (5, "benchmark question: what is the capital of atlantis "
            "and why does it matter for scoring", 90),  # contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, n_chars long")


@pytest.fixture(scope="module")
def eval_df(spark):
    return spark.createDataFrame(
        [(100, "what is the capital of atlantis")],
        "doc_id long, text string",
    )


def test_curate_reasons_and_keep(corpus, eval_df):
    out = pipeline.curate_corpus(
        corpus, eval_df, quality_q=0.2, near_dup_threshold=0.4
    )
    got = {r.doc_id: (r.keep, r.drop_reason) for r in out.collect()}
    assert len(got) == 6  # audit table keeps every input row
    assert got[0] == (False, "low_quality")
    assert got[1] == (True, None)
    assert got[2] == (False, "exact_dup")
    assert got[3] == (False, "near_dup")
    assert got[4] == (True, None)
    assert got[5] == (False, "contaminated")


def test_curate_without_eval_has_no_contamination_stage(corpus):
    out = pipeline.curate_corpus(corpus, None, quality_q=0.2,
                                 near_dup_threshold=0.4)
    reasons = {r.drop_reason for r in out.collect()}
    assert "contaminated" not in reasons
    kept = {r.doc_id for r in out.filter(F.col("keep")).collect()}
    assert kept == {1, 4, 5}


@pytest.mark.slow
def test_curate_cli(spark, corpus, eval_df, tmp_path):
    from nexus_processor_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    ev = str(tmp_path / "eval.parquet")
    out = str(tmp_path / "curated.parquet")
    corpus.write.parquet(src)
    eval_df.write.parquet(ev)
    assert main(["corpus", "curate", "--input", src, "--eval-set", ev,
                 "--output", out]) == 0
    res = spark.read.parquet(out)
    assert res.count() == 6 and "drop_reason" in res.columns


def test_curate_repetition_gate(spark):
    looping = "spam ham " * 40 + "end"
    unique = lambda k: " ".join(f"word{k}x{i}" for i in range(50))  # noqa: E731
    rows = [
        (1, unique(1), 400),
        (2, looping, 400),   # duplicate-bigram mass ~1 -> repetitive
        (3, "tiny", 4),      # low_quality fires FIRST (stage order)
        (4, unique(4), 200),
        (5, unique(5), 401),
        (6, unique(6), 430),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    out = pipeline.curate_corpus(
        corpus, None, quality_q=0.2, max_dup_char_fraction=0.5
    )
    got = {r.doc_id: (r.keep, r.drop_reason) for r in out.collect()}
    assert got[3] == (False, "low_quality")
    assert got[2] == (False, "repetitive")
    assert got[1] == (True, None)
