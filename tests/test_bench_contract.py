"""The driver runs bench.py per round; pin its contract cheaply so a
registry rename can never break the bench at driver time."""

from __future__ import annotations

import json


def test_headline_names_resolve_in_registry():
    import bench
    from nexus_processor_spark import queries as registry

    qs = registry.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_final_stdout_line_is_compact_json():
    """The driver parses ONLY the last stdout line; bench.py's contract
    is a compact headline object (sections go to BENCH_SECTIONS.json).
    Pin the shape by reconstructing the exact dict bench prints."""
    line = json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": 1.0,
        "unit": "sec",
        "queries": {"q": 1.0},
        "sf": 0.1,
    })
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_runtime"
    # a 17-query headline line stays well under typical tail-capture
    # limits (~4 KB); the r03 failure was the inlined section payload
    import bench

    est = len(json.dumps({
        "metric": "headline_queries_total_runtime", "value": 123.456,
        "unit": "sec", "sf": 0.1,
        "queries": {n: 123.456 for n in bench.HEADLINE},
    }))
    assert est < 1024


def test_readme_query_count_matches_registry():
    """Doc-hygiene pin: any 'N queries' / 'N oracle-paired' literal in
    README.md must equal the live registry size (r4 shipped a stale
    count; this keeps the docs honest as the registry grows)."""
    import re
    from pathlib import Path

    from nexus_processor_spark import queries as registry

    n = len(registry.queries())
    text = (Path(__file__).resolve().parents[1] / "README.md").read_text()
    counts = re.findall(r"(\d+) queries, all (\d+) oracle-paired", text)
    assert counts, "README lost its registry-count sentence"
    for a, b in counts:
        assert int(a) == n and int(b) == n, (
            f"README says {a}/{b} queries; registry has {n}"
        )


def test_annbench_coverage_claims_match_bench_config():
    """VERDICT r6 next #4: claims and artifacts must agree EXACTLY —
    the r6 COVERAGE line said "1M x 64" and "m in {4,8}" while the
    bench ran 250k x 64 / m=8 only. Pin the doc's scale/config tokens
    to the literals in bench.run_ann so neither can drift alone."""
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    bench_src = (root / "bench.py").read_text()
    cov = (root / "COVERAGE.md").read_text()
    # the bench's annbench corpus size...
    assert "ann_rows = 250_000" in bench_src
    # ...and the doc's claim for it
    assert "250k x 64" in cov
    assert "1M x 64 for brute" not in cov
    # PQ sweep: one m (8), candidate-generation framing
    assert 'm, dim = 8, VEC_DIM' in bench_src
    assert "m=8" in cov
