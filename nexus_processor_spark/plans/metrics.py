"""Pipeline metrics via ``observe()`` — zero-extra-job instrumentation.

The reference's Spark jobs call eager ``count()`` repeatedly for progress
reporting (spark_events_by_time.py:80,105,120,157 — each a full job).
``observe`` attaches aggregate metrics to the plan that are collected as a
side effect of the ONE real action, so instrumentation costs nothing at
any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_row_metrics(
    df: DataFrame, name: str = "pipeline", *extra_metrics: F.Column
) -> tuple[DataFrame, Observation]:
    """Attach row-count (and optional extra aggregate) metrics.

    Returns the instrumented frame and the Observation; read
    ``observation.get`` after the first action on the frame.
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows"), *extra_metrics]
    return df.observe(obs, *metrics), obs
