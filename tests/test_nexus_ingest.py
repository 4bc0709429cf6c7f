"""Ingest tests on the JSON fixture tree — the same shape the reference
pins with inline-h5py fixtures (tests/test_parquet.py:475-518)."""

from __future__ import annotations

import json

import pytest

from nexus_processor_spark.schemas import TABLES
from nexus_processor_spark.sources import nexus
from nexus_processor_spark.sources.nexus import ATTRS


def fixture_tree() -> dict:
    return {
        ATTRS: {"file_name": "test_data.nxs.h5"},
        "entry": {
            ATTRS: {"NX_class": "NXentry"},
            "title": "Test Run",
            "run_number": 12345,
            "start_time": "2025-01-15T10:00:00",
            "proton_charge": 1.25,
            "sample": {"name": "Test Sample", "mass": 2.5, "oddball": "x"},
            "instrument": {"name": "REF_L", "beamline": "BL-4B"},
            "user1": {"name": "Test User", "facility_user_id": "jdoe"},
            "user2": {"name": "Another"},
            "DASlogs": {
                "temperature": {
                    "time": [0.0, 1.0],
                    "value": [300.0, 301.0],
                    "average_value": 300.5,
                    "minimum_value": 300.0,
                    "maximum_value": 301.0,
                },
                "proton_charge": {"time": [10.5, 10.0], "value": [1.0, 1.0]},
                "Veto_pulse": {"time": [0.1, 0.2]},
                "stats_only": {"average_value": 7.0},
                "mismatched": {"time": [0.0, 1.0, 2.0], "value": [5.0]},
            },
            # CSR: event_index [0, 2] over 4 events, pulses at 10.0 / 10.5.
            "bank1_events": {
                "event_id": [100, 101, 102, 103],
                "event_time_offset": [0.1, 0.2, 0.3, 0.4],
                "event_index": [0, 2],
                "total_counts": 4,
            },
            "bank_err_events": {"event_id": [], "event_time_offset": []},
            "Software": {"test_sw": {"version": "1.0", "name": "sw"}},
        },
    }


def test_run_key_and_fallbacks():
    assert nexus.run_key(fixture_tree()) == ("REF_L", 12345, "REF_L:12345")
    assert nexus.run_key({"entry": {}}) == ("UNKNOWN", 0, "UNKNOWN:0")


def test_metadata_row():
    (row,) = nexus.extract_metadata(fixture_tree(), "/x/test.nxs.h5", "2026-01-01T00:00:00")
    assert row["title"] == "Test Run" and row["run_number"] == 12345
    assert row["proton_charge"] == 1.25
    assert row["source_file"] == "test.nxs.h5"
    assert row["file_attributes"] == {"file_name": "test_data.nxs.h5"}
    assert row["entry_attributes"] == {"NX_class": "NXentry"}


def test_sample_additional_fields():
    (row,) = nexus.extract_sample(fixture_tree())
    assert row["name"] == "Test Sample" and row["mass"] == 2.5
    assert row["additional_fields"] == {"oddball": "x"}
    assert nexus.extract_sample({"entry": {}}) == []  # missing group -> empty


def test_users_sorted():
    rows = nexus.extract_users(fixture_tree())
    assert [r["user_id"] for r in rows] == ["user1", "user2"]
    assert rows[0]["facility_user_id"] == "jdoe"


def test_daslogs_semantics():
    rows = nexus.extract_daslogs(fixture_tree())
    by_log = {}
    for r in rows:
        by_log.setdefault(r["log_name"], []).append(r)
    # stats repeated per row, dual encoding
    t = by_log["temperature"]
    assert [r["time"] for r in t] == [0.0, 1.0]
    assert t[0]["value"] == "300.0" and t[0]["value_numeric"] == 300.0
    assert t[0]["average_value"] == 300.5 and t[1]["max_value"] == 301.0
    # times-only (Veto_pulse pattern) -> value 1.0
    assert [r["value_numeric"] for r in by_log["Veto_pulse"]] == [1.0, 1.0]
    # stats-only -> single null-time row
    assert len(by_log["stats_only"]) == 1 and by_log["stats_only"][0]["time"] is None
    # length mismatch truncates to the shorter side
    assert len(by_log["mismatched"]) == 1


def test_events_csr_and_pulse_times():
    rows = nexus.extract_events(fixture_tree())
    b1 = [r for r in rows if r["bank"] == "bank1_events"]
    # event_index [0, 2]: events 0,1 -> pulse 0 (t=10.0); 2,3 -> pulse 1
    # (t=10.5, last pulse owns the tail). Pulse clock is sorted times.
    assert [r["pulse_index"] for r in b1] == [0, 0, 1, 1]
    assert [r["pulse_time"] for r in b1] == [10.0, 10.0, 10.5, 10.5]
    assert [r["event_idx"] for r in b1] == [0, 1, 2, 3]
    assert all(r["event_weight"] == 1.0 for r in b1)
    assert not any(r["bank"] == "bank_err_events" for r in rows)  # empty bank


def test_events_max_events_truncation():
    rows = nexus.extract_events(fixture_tree(), max_events=2)
    assert len([r for r in rows if r["bank"] == "bank1_events"]) == 2


def test_event_summary():
    rows = {r["bank"]: r for r in nexus.extract_event_summary(fixture_tree())}
    b1 = rows["bank1_events"]
    assert b1["total_counts"] == 4 and b1["n_pulses"] == 2
    assert b1["events_extracted"] == 4
    # empty bank still gets a (zero) summary row
    assert rows["bank_err_events"]["events_extracted"] == 0


def test_experiment_runs_nested():
    (row,) = nexus.extract_experiment_runs(fixture_tree(), "/x/f.h5", "t0")
    assert row["sample"]["name"] == "Test Sample"
    assert row["instrument"] == {"name": "REF_L", "beamline": "BL-4B"}
    assert row["software"][0]["component"] == "test_sw"
    assert {u["facility_user_id"] for u in row["users"]} == {"jdoe", None}


@pytest.mark.parametrize("table", list(TABLES))
def test_ingest_table_distributed(spark, tmp_path, table):
    """The full Spark path: file list -> mapInPandas -> declared schema;
    the run-key invariant holds on every table (reference invariant suite,
    tests/test_parquet.py:663-824)."""
    p = tmp_path / "run1.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], table)
    assert df.schema == TABLES[table][0]
    rows = df.collect()
    if table == "users":
        assert len(rows) == 2
    if rows:
        assert all(r.instrument_id == "REF_L" and r.run_number == 12345
                   and r.run_id == "REF_L:12345" for r in rows)


def test_ingest_skip_bad_files(spark, tmp_path):
    good = tmp_path / "good.json"
    good.write_text(json.dumps(fixture_tree()))
    bad = tmp_path / "bad.json"
    bad.write_text("{not json at all")
    paths = [str(good), str(bad)]
    # fail-fast by default
    with pytest.raises(Exception):
        nexus.ingest_table(spark, paths, "events").count()
    # availability mode: the good file's rows survive
    df = nexus.ingest_table(spark, paths, "events", skip_bad_files=True)
    assert df.count() == 4


def test_ingest_multiple_files_parallel(spark, tmp_path):
    trees = []
    for i in range(3):
        t = fixture_tree()
        t["entry"]["run_number"] = 100 + i
        p = tmp_path / f"run{i}.json"
        p.write_text(json.dumps(t))
        trees.append(str(p))
    df = nexus.ingest_table(spark, trees, "events")
    assert df.rdd.getNumPartitions() == 3  # one task per file
    assert df.count() == 12
    assert df.select("run_id").distinct().count() == 3


def test_ingest_table_max_events_cap(spark, tmp_path):
    """CLI --max-events parity: the per-bank cap flows through the
    distributed ingest."""
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    capped = nexus.ingest_table(spark, [str(p)], "events", max_events=2)
    assert capped.count() == 2  # bank1 has 4 events, capped at 2
    full = nexus.ingest_table(spark, [str(p)], "events")
    assert full.count() == 4
