"""Streaming corpus curation: gates, state-aware dedup, exactly-once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import dedup
from nexus_processor_spark.streaming import curate, sketches

LONG_A = ("the quick brown fox jumps over the lazy dog while the band "
          "plays a slow tune in the park")
NEAR_A = ("the quick brown fox jumps over the lazy dog while the band "
          "plays a slow tune in the rain")
OTHER = ("completely different content about spark catalyst tungsten "
         "adaptive execution and shuffle services")


def test_band_signatures_r1_equals_minhash_signatures(spark):
    docs = spark.createDataFrame(
        [(1, LONG_A), (2, OTHER), (3, "xy")], "doc_id long, text string"
    )
    a = sorted(map(tuple, dedup.minhash_signatures(docs, num_bands=8).collect()))
    b = sorted(map(tuple, dedup.band_signatures(
        docs, num_bands=8, rows_per_band=1).collect()))
    assert a == b


def test_curate_batch_cold_start_reasons(spark):
    batch = spark.createDataFrame(
        [
            (1, LONG_A),
            (2, LONG_A),     # exact dup of 1 within batch
            (3, NEAR_A),     # near dup of 1 within batch (verified)
            (4, OTHER),
            (5, "short"),    # fails the length gate
            (6, None),       # null text fails the gate
        ],
        "doc_id long, text string",
    )
    audit = {r.doc_id: (r.keep, r.drop_reason)
             for r in curate.curate_batch(batch, None).collect()}
    assert audit[1] == (True, None)
    assert audit[2] == (False, "exact_dup")
    assert audit[3] == (False, "near_dup")
    assert audit[4] == (True, None)
    assert audit[5] == (False, "low_quality")
    assert audit[6] == (False, "low_quality")


def test_curate_batch_repetition_gate(spark):
    loopy = "spam ham " * 30 + "end"     # duplicate-bigram heavy
    batch = spark.createDataFrame(
        [(1, LONG_A), (2, loopy), (3, "tiny")],
        "doc_id long, text string",
    )
    audit = {r.doc_id: (r.keep, r.drop_reason)
             for r in curate.curate_batch(
                 batch, None, max_dup_char_fraction=0.5).collect()}
    assert audit[1] == (True, None)
    assert audit[2] == (False, "repetitive")
    assert audit[3] == (False, "low_quality")
    # gate off: the loopy doc passes (unique content, no dups)
    audit2 = {r.doc_id: r.keep
              for r in curate.curate_batch(batch, None).collect()}
    assert audit2[2] is True


def test_curate_batch_against_state(spark):
    kept = spark.createDataFrame([(1, LONG_A)], "doc_id long, text string")
    state = curate._survivor_state(kept, text_col="text", id_col="doc_id")
    batch = spark.createDataFrame(
        [
            (10, LONG_A),   # exact dup of the kept corpus
            (11, NEAR_A),   # near dup of the kept corpus (band collision)
            (12, OTHER),    # genuinely new
        ],
        "doc_id long, text string",
    )
    audit = {r.doc_id: (r.keep, r.drop_reason)
             for r in curate.curate_batch(batch, state).collect()}
    assert audit[10] == (False, "exact_dup")
    assert audit[11] == (False, "near_dup")
    assert audit[12] == (True, None)


def test_curate_batch_decontamination_gate(spark):
    eval_df = spark.createDataFrame(
        [(1, "held out benchmark question about lazy dogs")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, LONG_A),
            # shares the 3-gram "held out benchmark" with the eval set
            (2, "this doc quotes the held out benchmark question verbatim"),
            (3, OTHER),
        ],
        "doc_id long, text string",
    )
    audit = {r.doc_id: (r.keep, r.drop_reason)
             for r in curate.curate_batch(
                 batch, None, eval_df=eval_df).collect()}
    assert audit[1] == (True, None)
    assert audit[2] == (False, "contaminated")
    assert audit[3] == (True, None)


def test_curate_stream_exactly_once_across_drains(spark, tmp_path):
    """File-source drains: each batch curated against the state built by
    every earlier batch; re-draining with no new files changes nothing."""
    src = tmp_path / "incoming"
    src.mkdir()
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    def add_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    def drain():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        q = curate.curate_stream(
            stream, state_path=state, sink_path=sink, checkpoint_dir=ck)
        q.awaitTermination(120)

    def audit_rows():
        return {(r.doc_id, r.keep, r.drop_reason)
                for r in spark.read.option("basePath", sink)
                .parquet(f"{sink}/batch=*").collect()}

    add_file("b1", [(1, LONG_A), (2, OTHER)])
    drain()
    assert audit_rows() == {(1, True, None), (2, True, None)}

    # second drain: an exact dup, a near dup of batch-1 survivors, one new
    add_file("b2", [(10, LONG_A), (11, NEAR_A),
                    (12, "fresh text that resembles nothing else and is "
                         "long enough to pass the gate")])
    drain()
    got = audit_rows()
    assert (10, False, "exact_dup") in got
    assert (11, False, "near_dup") in got
    assert (12, True, None) in got
    assert len(got) == 5

    # no new files: a re-drain adds no batches, no rows, no state versions
    versions_before = sketches._versions(spark, state)
    drain()
    assert audit_rows() == got
    assert sketches._versions(spark, state) == versions_before

    # the state holds survivor keys only (3 md5s + their band sigs)
    st = sketches.read_state(spark, state)
    assert st.filter("kind = 'md5'").count() == 3
    assert st.filter("kind = 'band'").count() > 0


def test_curate_stream_replayed_batch_is_skipped(spark, tmp_path):
    """A batch whose state version is already published (crash after
    publish, before the checkpoint advanced) must not rewrite the sink or
    re-merge state: the foreachBatch body short-circuits."""
    src = tmp_path / "incoming"
    src.mkdir()
    sink = str(tmp_path / "sink")
    state = str(tmp_path / "state")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, LONG_A)], schema).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "b1"))

    # simulate the post-publish crash: version v0 already complete
    sketches.apply_state_batch(
        spark, state, 0,
        spark.createDataFrame([("md5", "sentinel")], curate.STATE_SCHEMA),
        lambda cur, d: d,
    )
    stream = spark.readStream.schema(schema).parquet(str(src / "*"))
    q = curate.curate_stream(
        stream, state_path=state, sink_path=sink,
        checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)
    # batch 0 was treated as replayed: no sink write, state untouched
    import os

    assert not os.path.exists(f"{sink}/batch=0")
    st = sketches.read_state(spark, state)
    assert [tuple(r) for r in st.collect()] == [("md5", "sentinel")]
