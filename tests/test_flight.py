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
