"""Scale-shape checks: the properties that let small-corpus code survive
billion-row banks (vectorized expansion, chunked files, multi-run plans)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from nexus_processor_spark.operators import timeslice
from nexus_processor_spark.sources import catalog, nexus
from nexus_processor_spark.sources.nexus import ATTRS


def big_tree(n_events: int, n_pulses: int = 1000) -> dict:
    # CSR offsets: evenly spaced pulse boundaries over n_events
    step = n_events // n_pulses
    return {
        ATTRS: {},
        "entry": {
            "run_number": 777,
            "instrument": {"name": "BIG"},
            "DASlogs": {
                "proton_charge": {
                    "time": [float(i) for i in range(n_pulses)],
                    "value": [1.0] * n_pulses,
                },
            },
            "bank1_events": {
                "event_id": list(range(n_events)),
                "event_time_offset": [float(i % 997) for i in range(n_events)],
                "event_index": [i * step for i in range(n_pulses)],
            },
        },
    }


def test_half_million_event_ingest_vectorized(spark, tmp_path):
    n = 500_000
    p = tmp_path / "big.json"
    p.write_text(json.dumps(big_tree(n)))
    t0 = time.perf_counter()
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events", max_records_per_file=200_000)
    elapsed = time.perf_counter() - t0
    ev = catalog.read_table(spark, root, "events")
    assert ev.count() == n
    assert len(ev.inputFiles()) >= 3  # 200k cap -> >= 3 files
    # CSR correctness at scale: last event belongs to the last pulse
    last = ev.orderBy(F.desc("event_idx")).first()
    assert last.pulse_index == 999 and last.pulse_time == 999.0
    # vectorized path: this must be seconds, not minutes (dict-per-event
    # would be ~10x slower); generous bound to stay load-tolerant
    assert elapsed < 60, f"ingest too slow: {elapsed:.1f}s"


def test_multi_run_timeslice(spark, tmp_path):
    """'A single query can span thousands of runs': slice per run by using
    run_id as the grouping bank."""
    paths = []
    for i in range(4):
        t = big_tree(1000, n_pulses=10)
        t["entry"]["run_number"] = 100 + i
        p = tmp_path / f"r{i}.json"
        p.write_text(json.dumps(t))
        paths.append(str(p))
    df = nexus.ingest_table(spark, paths, "events")
    enriched = timeslice.with_absolute_time(df)
    per_run = timeslice.count_by_bank_and_interval(
        enriched, 100.0, bank_col="run_id"
    )
    rows = per_run.collect()
    assert {r.run_id for r in rows} == {f"BIG:{100 + i}" for i in range(4)}
    assert sum(r.event_count for r in rows) == 4000
