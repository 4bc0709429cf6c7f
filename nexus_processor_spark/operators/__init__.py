"""Operator library: flagship analytics + training-data pipeline ops."""

from nexus_processor_spark.operators import (  # noqa: F401
    asof,
    dedup,
    pipeline,
    similarity,
    textstats,
    timeslice,
)
