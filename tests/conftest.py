from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from nexus_processor_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("nexus-tests", master="local[8]",
                  extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
