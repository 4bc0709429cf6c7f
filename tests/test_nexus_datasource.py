"""The Spark 4 Python Data Source twin of the mapInPandas ingest."""

from __future__ import annotations

import json

import pytest

from nexus_processor_spark.sources import nexus
from nexus_processor_spark.sources.nexus_datasource import register
from tests.test_nexus_ingest import fixture_tree


@pytest.fixture()
def run_files(tmp_path):
    for i in (1, 2):
        tree = fixture_tree()
        tree["entry"]["run_number"] = 12344 + i
        (tmp_path / f"run_{i}.json").write_text(json.dumps(tree))
    return str(tmp_path / "*.json")


def _read(spark, pattern, table, **opts):
    register(spark)
    r = spark.read.format("nexus").option("table", table)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(pattern)


def test_datasource_matches_ingest_table(spark, run_files, tmp_path):
    import glob

    paths = sorted(glob.glob(run_files))
    for table in ("events", "metadata", "daslogs", "users"):
        via_ds = _read(spark, run_files, table,
                       ingestion_time="2026-01-01T00:00:00")
        via_map = nexus.ingest_table(
            spark, paths, table, ingestion_time="2026-01-01T00:00:00"
        )
        # names/types match; the source schema is the nullable,
        # metadata-free twin (streaming Arrow handoff requirement)
        assert [(f.name, f.dataType) for f in via_ds.schema.fields] == \
            [(f.name, f.dataType) for f in via_map.schema.fields], table
        a = sorted(map(tuple, via_ds.collect()))
        b = sorted(map(tuple, via_map.collect()))
        assert a == b, table


def test_datasource_one_partition_per_file(spark, run_files):
    df = _read(spark, run_files, "events")
    assert df.rdd.getNumPartitions() == 2


def test_datasource_unknown_table_raises(spark, run_files):
    with pytest.raises(Exception, match="unknown nexus table"):
        _read(spark, run_files, "nope").collect()


def test_datasource_skip_bad_files(spark, tmp_path):
    (tmp_path / "good.json").write_text(json.dumps(fixture_tree()))
    (tmp_path / "bad.json").write_text("{not json")
    pattern = str(tmp_path / "*.json")
    ok = _read(spark, pattern, "events", skip_bad_files="true")
    assert ok.count() == 4  # the good file's 4 events
    with pytest.raises(Exception):
        _read(spark, pattern, "events").collect()


def test_datasource_composes_with_sql_pushdown(spark, run_files):
    df = _read(spark, run_files, "events")
    df.createOrReplaceTempView("nexus_events")
    out = spark.sql(
        "SELECT bank, count(*) AS n FROM nexus_events "
        "WHERE event_id >= 102 GROUP BY bank ORDER BY bank"
    ).collect()
    assert [(r.bank, r.n) for r in out] == [("bank1_events", 4)]


def test_pushdown_prunes_banks_and_files(spark, tmp_path):
    import json as _json

    from pyspark.sql.datasource import EqualTo, GreaterThan, In, IsNull
    from pyspark.sql.datasource import InputPartition
    from nexus_processor_spark.sources.nexus_datasource import NexusReader
    from nexus_processor_spark.schemas import TABLES

    tree = fixture_tree()
    tree["entry"]["monitor1"] = {
        "event_id": [7, 8], "event_time_offset": [0.5, 0.6],
        "event_index": [0],
    }
    p = tmp_path / "run.json"
    p.write_text(_json.dumps(tree))

    reader = NexusReader(
        {"table": "events", "path": str(tmp_path / "*.json")},
        TABLES["events"][0],
    )
    flt = [EqualTo(("bank",), "monitor1"), IsNull(("pulse_time",))]
    leftover = list(reader.pushFilters(flt))
    # everything is yielded back for Spark to re-evaluate...
    assert leftover == flt
    # ...but only the supported one is retained for pruning
    assert reader.bank_filters == [flt[0]]
    rows = list(reader.read(InputPartition(str(p))))
    banks = {r[3] for r in rows}
    assert banks == {"monitor1"} and len(rows) == 2

    # run_number predicate prunes the whole file before extraction
    reader2 = NexusReader(
        {"table": "events", "path": str(tmp_path / "*.json")},
        TABLES["events"][0],
    )
    list(reader2.pushFilters([GreaterThan(("run_number",), 99999)]))
    assert list(reader2.read(InputPartition(str(p)))) == []

    reader3 = NexusReader(
        {"table": "events", "path": str(tmp_path / "*.json")},
        TABLES["events"][0],
    )
    list(reader3.pushFilters([In(("run_number",), (12345, 1))]))
    assert len(list(reader3.read(InputPartition(str(p))))) == 6


def test_pushdown_end_to_end_results_unchanged(spark, run_files):
    from pyspark.sql import functions as F

    df = _read(spark, run_files, "events")
    got = df.filter(
        (F.col("bank") == "bank1_events") & (F.col("run_number") == 12345)
    ).count()
    assert got == 4  # only run_1 matches the run filter


def test_skip_bad_files_is_all_or_nothing_per_file(spark, tmp_path):
    """A file that fails AFTER its first bank parsed must contribute zero
    rows under skip_bad_files — not a silent partial yield."""
    import json as _json

    from pyspark.sql.datasource import InputPartition
    from nexus_processor_spark.schemas import TABLES
    from nexus_processor_spark.sources.nexus_datasource import NexusReader

    tree = fixture_tree()
    # zbank sorts after bank1: bank1 parses fine, then this one explodes
    # (event_id is a non-numeric string -> numpy conversion error)
    tree["entry"]["zbank_events"] = {
        "event_id": ["boom"], "event_time_offset": [0.1], "event_index": [0],
    }
    p = tmp_path / "partial.json"
    p.write_text(_json.dumps(tree))

    reader = NexusReader(
        {"table": "events", "path": str(tmp_path / "*.json"),
         "skip_bad_files": "true"},
        TABLES["events"][0],
    )
    assert list(reader.read(InputPartition(str(p)))) == []


def test_stream_offsets_stay_bounded(tmp_path):
    """Offset compaction: after N in-order run files the offset is a
    high-water mark with an empty straggler list — the checkpoint log
    entry does NOT grow with stream age. Replay between compacted
    offsets still yields exactly the span's rows."""
    from nexus_processor_spark.sources.nexus_datasource import (
        NexusStreamReader,
        TABLES,
    )

    data = tmp_path / "runs"
    data.mkdir()
    pattern = str(data / "*.json")
    reader = NexusStreamReader(
        {"table": "events", "path": pattern, "offset_compaction": "true"},
        TABLES["events"][0],
    )
    off = reader.initialOffset()
    offsets = [off]
    for i in range(1, 8):
        tree = fixture_tree()
        tree["entry"]["run_number"] = 12344 + i
        (data / f"run_{i:04d}.json").write_text(json.dumps(tree))
        rows, off = reader.read(off)
        assert len(list(rows)) == 4          # each batch = the new file
        assert off["recent"] == []            # in-order arrival compacts
        assert off["hw"].endswith(f"run_{i:04d}.json")
        offsets.append(off)
    # offset size is O(1), not O(files)
    assert len(json.dumps(off)) < 120
    # deterministic replay of a middle span from compacted offsets
    replay = list(reader.readBetweenOffsets(offsets[2], offsets[5]))
    assert len(replay) == 12                  # files 3,4,5 x 4 rows
    # default (no option) keeps the safe full-list offsets
    legacy = NexusStreamReader(
        {"table": "events", "path": pattern}, TABLES["events"][0]
    )
    rows, off0 = legacy.read(legacy.initialOffset())
    assert len(list(rows)) == 28 and len(off0["files"]) == 7
    # and a legacy offset is readable by a compacting reader (checkpoint
    # survives flipping the option)
    rows, off1 = reader.read(off0)
    assert list(rows) == [] and off1["recent"] == []


def test_stream_ingests_each_file_exactly_once_across_restarts(spark, tmp_path):
    """readStream.format('nexus'): new run files appear between drains;
    the offset (ingested-file set) survives the checkpoint, so each file
    contributes exactly once."""
    import json as _json

    register(spark)
    data = tmp_path / "runs"
    data.mkdir()
    pattern = str(data / "*.json")

    def add_run(i):
        tree = fixture_tree()
        tree["entry"]["run_number"] = 12344 + i
        (data / f"run_{i}.json").write_text(_json.dumps(tree))

    counts: list[tuple[int, int]] = []  # (run_number-ish proxy, rows)
    rows: list = []

    def drain():
        stream = (spark.readStream.format("nexus")
                  .option("table", "events").load(pattern))
        assert stream.isStreaming
        q = (stream.writeStream
             .foreachBatch(lambda df, _id: rows.extend(
                 (r.run_number, r.event_id) for r in df.collect()))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination(120)

    add_run(1)
    drain()
    assert sorted({r for r, _ in rows}) == [12345]
    assert len(rows) == 4

    add_run(2)
    drain()  # restart on the same checkpoint: only run_2 is new
    assert sorted({r for r, _ in rows}) == [12345, 12346]
    assert len(rows) == 8  # 4 + 4, no re-ingest of run_1


def test_jsonl_stream_sink_exactly_once(spark, tmp_path):
    """writeStream.format('nexus'): staged-then-manifest JSONL sink —
    every event lands exactly once across two drains, manifests list
    exactly the published files, no staged leftovers."""
    import json as _json
    import os

    register(spark)
    data = tmp_path / "runs"
    data.mkdir()
    out = tmp_path / "sink"
    out.mkdir()

    def add_run(i):
        tree = fixture_tree()
        tree["entry"]["run_number"] = 12344 + i
        (data / f"run_{i}.json").write_text(_json.dumps(tree))

    def drain():
        stream = (spark.readStream.format("nexus")
                  .option("table", "events").load(str(data / "*.json")))
        q = (stream.writeStream.format("nexus")
             .option("path", str(out))
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).outputMode("append").start())
        q.awaitTermination(120)

    def published():
        rows = []
        for name in os.listdir(out):
            if name.startswith("_manifest_"):
                m = _json.loads((out / name).read_text())
                for f in m["files"]:
                    rows += [
                        _json.loads(ln)
                        for ln in (out / f).read_text().splitlines()
                    ]
        return rows

    add_run(1)
    drain()
    rows = published()
    assert len(rows) == 4
    assert {r["run_number"] for r in rows} == {12345}

    add_run(2)
    drain()
    rows = published()
    assert len(rows) == 8
    assert {r["run_number"] for r in rows} == {12345, 12346}
    # nothing left staged; no unmanifested jsonl files
    assert not os.listdir(out / ".staging")
    jsonls = {n for n in os.listdir(out) if n.endswith(".jsonl")}
    manifested = set()
    for name in os.listdir(out):
        if name.startswith("_manifest_"):
            manifested |= set(_json.loads((out / name).read_text())["files"])
    assert jsonls == manifested
