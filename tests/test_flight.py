from __future__ import annotations

import json

import pytest

pytest.importorskip("pyarrow.flight")

from nexus_processor_spark.sources import catalog, nexus
from nexus_processor_spark.sources.flight import EventFlightServer, read_flight
from nexus_processor_spark.streaming import replay

from tests.test_nexus_ingest import fixture_tree


def test_flight_replay_roundtrip(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")

    def events():
        return replay.ordered_replay(catalog.read_table(spark, root, "events"))

    server = EventFlightServer({"events": events})
    try:
        got = read_flight(server.endpoint, "events")
        assert got.num_rows == 4
        assert "pulse_time" in got.schema.names
        offs = got.column("time_offset").to_pylist()
        assert offs == sorted(offs)
        with pytest.raises(Exception, match="unknown flight table"):
            read_flight(server.endpoint, "nope")
    finally:
        server.shutdown()


def test_flight_cache_and_single_chunk(spark):
    calls = {"n": 0}

    def events():
        calls["n"] += 1
        return spark.range(10_000).selectExpr("id AS event_id", "id * 2 AS value")

    server = EventFlightServer({"events": events})
    try:
        a = read_flight(server.endpoint, "events")
        b = read_flight(server.endpoint, "events")
        assert a.num_rows == b.num_rows == 10_000
        assert calls["n"] == 1                      # memoized materialization
        assert a.column("event_id").num_chunks == 1  # re-chunked for streaming
    finally:
        server.shutdown()

    live = EventFlightServer({"events": events}, cache=False)
    try:
        read_flight(live.endpoint, "events")
        read_flight(live.endpoint, "events")
        assert calls["n"] == 3                      # live tables re-run the plan
    finally:
        live.shutdown()
