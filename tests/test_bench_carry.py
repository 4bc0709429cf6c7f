"""Artifact-preservation pin for bench.py's section carry-forward.

Round 11 lost a completed 90-minute full-sweep BENCH_SECTIONS.json to a
headline-only debug rerun that rewrote the same default path with only
the headline keys. ``carry_sections`` is the guard: sections absent or
budget-skipped in the current run are carried from the prior artifact
with a provenance marker, and sections that DID run are never
overwritten by stale data.
"""
import bench


def test_missing_sections_carried_with_marker():
    full = {"metric": "headline_queries_total_runtime", "value": 1.0}
    prior = {"curatebench": {"batches": [1, 2], "state_rows": 10},
             "bigbench": {"rows": 5}}
    out = bench.carry_sections(full, prior)
    assert out is full
    assert full["curatebench"] == {
        "batches": [1, 2], "state_rows": 10,
        "carried_from_prior_run": True}
    assert full["bigbench"] == {"rows": 5, "carried_from_prior_run": True}


def test_budget_skip_marker_is_replaced_by_prior_measurement():
    full = {"docsbench": {"skipped": "budget (5400s)"}}
    prior = {"docsbench": {"qps": 12.0}}
    bench.carry_sections(full, prior)
    assert full["docsbench"] == {"qps": 12.0,
                                 "carried_from_prior_run": True}


def test_fresh_measurement_never_overwritten():
    full = {"annbench1m": {"configs": {"new": 1}}}
    prior = {"annbench1m": {"configs": {"old": 0},
                            "carried_from_prior_run": True}}
    bench.carry_sections(full, prior)
    assert full["annbench1m"] == {"configs": {"new": 1}}


def test_prior_skip_marker_is_not_carried():
    full = {}
    prior = {"tablebench": {"skipped": "budget (5400s)"}}
    bench.carry_sections(full, prior)
    assert "tablebench" not in full


def test_carry_survives_chained_reruns():
    # a carried section carries again (marker stays a single bool)
    full = {}
    prior = {"vecbench": {"qps": 3.0, "carried_from_prior_run": True}}
    bench.carry_sections(full, prior)
    assert full["vecbench"] == {"qps": 3.0,
                                "carried_from_prior_run": True}


def test_empty_prior_is_noop():
    full = {"value": 2.0}
    bench.carry_sections(full, {})
    assert full == {"value": 2.0}
