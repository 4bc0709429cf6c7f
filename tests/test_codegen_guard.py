"""The codegen-fallback guard (VERDICT r10 next #2): the r10 PassJoin
probe-grid bug passed every correctness gate while running INTERPRETED
(janino 64 KB bailout) — only the driver logs carried the signal. These
tests pin (a) the scan/allowlist semantics on a synthetic log and (b)
end-to-end capture: a subprocess session with the guard confs runs a
deliberately over-wide expression and the guard goes red."""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

from nexus_processor_spark import codegen_guard


def test_scan_flags_fallback_lines(tmp_path):
    log = tmp_path / "guard.log"
    log.write_text(
        "WARN SomeClass: all quiet\n"
        "ERROR CodeGenerator: Failed to compile the generated Java "
        "code.\n"
        "Caused by: InternalCompilerException: Code grows beyond 64 "
        "KB\n"
        "WARN WholeStageCodegenExec: Whole-stage codegen disabled for "
        "plan (id=1):\n"
        "WARN Other: unrelated warning\n")
    res = codegen_guard.scan(str(log))
    assert len(res["hits"]) == 3
    assert res["allowed"] == []


def test_scan_allowlist_downgrades_with_justification(
        tmp_path, monkeypatch):
    log = tmp_path / "guard.log"
    log.write_text(
        "WARN WholeStageCodegenExec: Whole-stage codegen disabled for "
        "plan (id=7): known_megaquery\n")
    monkeypatch.setattr(
        codegen_guard, "ALLOWLIST",
        (("known_megaquery", "documented interpreted-by-design plan"),))
    res = codegen_guard.scan(str(log))
    assert res["hits"] == []
    assert len(res["allowed"]) == 1


def test_scan_missing_log_raises(tmp_path):
    # a guard that silently scans nothing is the bug this guards against
    with pytest.raises(FileNotFoundError):
        codegen_guard.scan(str(tmp_path / "never_written.log"))


@pytest.mark.slow
def test_guard_catches_live_janino_bailout(tmp_path):
    """End-to-end red run: a fresh JVM (subprocess — log4j2 config is
    launch-time) with capture_confs runs a 3000-expression concat that
    blows the 64 KB generated-method limit; the query still SUCCEEDS
    (interpreted fallback) and scan() reports the hits."""
    log = str(tmp_path / "guard_live.log")
    script = textwrap.dedent(f"""
        from nexus_processor_spark import codegen_guard
        from nexus_processor_spark.session import get_spark
        from pyspark.sql import functions as F
        confs, log_path = codegen_guard.capture_confs({log!r})
        spark = get_spark("guard-live-test", master="local[2]",
                          extra_confs=confs)
        cols = [(F.col("id") * i + i).cast("string") for i in range(3000)]
        df = spark.range(10).select(F.concat_ws(",", *cols).alias("x"))
        rows = df.selectExpr("sum(length(x))").collect()
        assert rows[0][0] > 0  # fallback is silent: values still correct
        spark.stop()
        res = codegen_guard.scan(log_path)
        assert res["hits"], "guard missed a live janino bailout"
        assert any("Failed to compile" in h or "64 KB" in h
                   for h in res["hits"])
        print("GUARD_RED_OK")
    """)
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300, cwd="/root/repo")
    assert "GUARD_RED_OK" in proc.stdout, (proc.stdout[-2000:],
                                           proc.stderr[-2000:])
