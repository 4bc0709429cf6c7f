"""Streaming sketch maintenance: drained state == batch-built sketch."""

from __future__ import annotations

import json

from nexus_processor_spark.operators import sketch as sk
from nexus_processor_spark.sources import catalog, nexus
from nexus_processor_spark.streaming import replay
from nexus_processor_spark.streaming.sketches import (
    maintain_cms_stream,
    maintain_hll_stream,
)
from tests.test_nexus_ingest import fixture_tree


def _lake(spark, tmp_path) -> str:
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    return root


def test_hll_stream_state_equals_batch_registers(spark, tmp_path):
    root = _lake(spark, tmp_path)
    stream = replay.read_events_stream(spark, root, max_files_per_trigger=1)
    state = str(tmp_path / "hll_state")
    q = maintain_hll_stream(
        stream, "event_id", state,
        checkpoint_dir=str(tmp_path / "ckpt"), by="bank",
    )
    q.awaitTermination(60)
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    batch = catalog.read_table(spark, root, "events")
    want = sorted(map(tuple, sk.hll_registers(batch, "event_id", by="bank").collect()))
    assert got == want

    # restart on the same checkpoint: no new data, state unchanged
    q2 = maintain_hll_stream(
        replay.read_events_stream(spark, root, max_files_per_trigger=1),
        "event_id", state, checkpoint_dir=str(tmp_path / "ckpt"), by="bank",
    )
    q2.awaitTermination(60)
    assert sorted(map(tuple, spark.read.parquet(state).collect())) == want


def test_cms_stream_state_equals_batch_build(spark, tmp_path):
    root = _lake(spark, tmp_path)
    stream = replay.read_events_stream(spark, root, max_files_per_trigger=1)
    state = str(tmp_path / "cms_state")
    q = maintain_cms_stream(
        stream, "bank", state,
        checkpoint_dir=str(tmp_path / "ckpt2"), width=64, depth=2,
    )
    q.awaitTermination(60)
    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    batch = catalog.read_table(spark, root, "events")
    want = sorted(map(tuple, sk.cms_build(batch, "bank", width=64, depth=2).collect()))
    assert got == want
