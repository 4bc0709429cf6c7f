"""Codegen-fallback guard: catch silent whole-stage-codegen failures.

Round 10 found a query (the PassJoin edit-distance probe grid) that
passed every correctness gate while running INTERPRETED: its generated
method blew janino's 64 KB limit, Spark logged a warning, fell back,
and nothing downstream noticed — the 4x slowdown was only found by
hand-grepping a long log (COVERAGE.md r10). This module automates that
grep (VERDICT r10 next #2):

* :func:`capture_confs` returns the session confs that route the
  driver JVM's log4j2 WARN+ stream to a file (console logging
  unchanged) — pass them to ``session.get_spark(extra_confs=...)``
  BEFORE the JVM launches (log4j2 config is launch-time).
* :func:`scan` greps that file for the fallback signatures and returns
  the offending lines, minus allowlisted ones.

``bench.py`` flags hits in its artifact (``codegen_fallbacks``);
``tools/check_oracle.py`` FAILS on them — a janino fallback reappearing
turns the oracle run red instead of silently shipping an interpreted
plan. The allowlist mirrors the plan sweep's
(tests/test_plan_sweep.py): every entry needs a justification.
"""

from __future__ import annotations

import os
import re
import tempfile

# Signatures of a codegen bailout in Spark's logs. "Failed to compile"
# is CodeGenerator's janino CompileException report (the 64 KB method
# limit logs "...grows beyond 64 KB" inside it); "Whole-stage codegen
# disabled" is WholeStageCodegenExec's fallback notice (also emitted
# for the generated-method-too-large bailout at runtime).
FALLBACK_PATTERNS = (
    r"Failed to compile",
    r"grows beyond 64 KB",
    r"Whole-stage codegen disabled",
)

# (substring, justification) pairs; a log line containing the substring
# is reported under "allowed" instead of failing the run. Empty today —
# both full r10 logs were zero-hit after the PassJoin fix.
ALLOWLIST: tuple[tuple[str, str], ...] = ()

_LOG4J2_TEMPLATE = """\
rootLogger.level = warn
rootLogger.appenderRef.stdout.ref = console
rootLogger.appenderRef.guard.ref = guard

appender.console.type = Console
appender.console.name = console
appender.console.target = SYSTEM_ERR
appender.console.layout.type = PatternLayout
appender.console.layout.pattern = %d{{yy/MM/dd HH:mm:ss}} %p %c{{1}}: %m%n

appender.guard.type = File
appender.guard.name = guard
appender.guard.fileName = {log_path}
appender.guard.layout.type = PatternLayout
appender.guard.layout.pattern = %p %c{{1}}: %m%n

# py4j chatters at INFO through the root logger in some layouts
logger.py4j.name = py4j
logger.py4j.level = error
"""


def default_log_path() -> str:
    """Per-process default guard log under the system temp dir."""
    return os.path.join(
        tempfile.gettempdir(), f"spark_codegen_guard_{os.getpid()}.log")


def capture_confs(log_path: str | None = None) -> tuple[dict, str]:
    """(extra_confs, log_path) routing driver-JVM WARN+ logs to
    ``log_path``. Must reach the session BUILDER of the process's
    FIRST SparkSession — log4j2 configuration is fixed when the JVM
    launches, so a later ``conf.set`` cannot enable capture."""
    log_path = log_path or default_log_path()
    props = os.path.join(
        tempfile.gettempdir(),
        f"spark_codegen_guard_log4j2_{os.getpid()}.properties")
    with open(props, "w") as fh:
        fh.write(_LOG4J2_TEMPLATE.format(log_path=log_path))
    # truncate any stale log from a previous run of this pid
    open(log_path, "w").close()
    return {
        "spark.driver.extraJavaOptions":
            f"-Dlog4j2.configurationFile=file:{props}",
    }, log_path


def scan(log_path: str) -> dict:
    """Grep the guard log for codegen-fallback signatures. Returns
    ``{"hits": [line, ...], "allowed": [line, ...]}`` — ``hits`` are
    un-allowlisted fallbacks (the run should go red), ``allowed``
    carry a justification in :data:`ALLOWLIST`. A missing log file
    (capture never enabled) raises — a guard that silently scans
    nothing is the bug this module exists to prevent."""
    pat = re.compile("|".join(FALLBACK_PATTERNS))
    hits: list[str] = []
    allowed: list[str] = []
    with open(log_path, errors="replace") as fh:
        for line in fh:
            if not pat.search(line):
                continue
            line = line.rstrip("\n")
            if any(sub in line for sub, _ in ALLOWLIST):
                allowed.append(line)
            else:
                hits.append(line)
    return {"hits": hits, "allowed": allowed}
