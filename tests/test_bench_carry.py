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


def test_fold_efficiency_pin_passes_on_proportional_folds():
    # folds cheaper per committed MB than steady probe+join batches
    v = {"folds": {"max_batch_over_median": 3.54, "batches": [
        {"sec": 30.0, "commit_mb": 38.0, "fold_mb": 0.0},
        {"sec": 132.0, "commit_mb": 38.0, "fold_mb": 0.0},  # noise batch
        {"sec": 197.0, "commit_mb": 579.0, "fold_mb": 540.0},
    ]}}
    pin = bench.fold_efficiency_pin(v)
    assert pin["ok"] is True
    row = pin["variants"]["folds"]
    assert row["worst_fold_mb"] == 540.0
    assert row["ratio"] < 1.0  # sequential rewrite beats probe work
    assert row["max_batch_over_median"] == 3.54  # informational only


def test_fold_efficiency_pin_trips_on_superlinear_fold():
    # a fold scanning O(state): huge seconds for its committed bytes
    v = {"main": {"batches": [
        {"sec": 30.0, "commit_mb": 38.0, "fold_mb": 0.0},
        {"sec": 31.0, "commit_mb": 38.0, "fold_mb": 0.0},
        {"sec": 500.0, "commit_mb": 80.0, "fold_mb": 40.0},
    ]}}
    pin = bench.fold_efficiency_pin(v)
    assert pin["ok"] is False
    assert pin["variants"]["main"]["ratio"] > bench.FOLD_EFF_K


def test_fold_efficiency_pin_skips_variants_without_folds():
    v = {"gates": {"max_batch_over_median": 1.2, "batches": [
        {"sec": 10.0, "commit_mb": 20.0, "fold_mb": 0.0}]}}
    pin = bench.fold_efficiency_pin(v)
    assert pin["ok"] is True
    assert "ratio" not in pin["variants"]["gates"]


def test_errored_section_carries_prior_and_keeps_error_visible():
    full = {"opsbench": {"error": "Py4JJavaError: boom"}}
    prior = {"opsbench": {"qps": 9.0}}
    bench.carry_sections(full, prior)
    assert full["opsbench"] == {
        "qps": 9.0, "carried_from_prior_run": True,
        "error_this_run": "Py4JJavaError: boom"}


def test_prior_error_section_is_not_carried():
    full = {}
    prior = {"opsbench": {"error": "boom"}}
    bench.carry_sections(full, prior)
    assert "opsbench" not in full


def test_carry_refused_across_core_counts():
    # r12: an artifact measured at a different $SPARK_GRAFT_CPUS is a
    # different machine shape — never carried (the r11 8-core rerun
    # clobber-class, now also guarded at the carry layer).
    full = {}
    prior = {"cpus": 8, "bigbench": {"rows": 5}}
    bench.carry_sections(full, prior)
    assert "bigbench" not in full


def test_carry_treats_missing_cpus_as_32():
    # artifacts that predate the per-cpus split were all 32-core
    full = {}
    prior = {"bigbench": {"rows": 5}}
    bench.carry_sections(full, prior)
    assert (("bigbench" in full) == (bench.CPUS == 32))


def test_scaling_section_is_carryable():
    full = {}
    prior = {"cpus": bench.CPUS,
             "scaling": {"cpus": bench.CPUS, "flagship_sec": 5.0}}
    bench.carry_sections(full, prior)
    assert full["scaling"]["carried_from_prior_run"] is True
