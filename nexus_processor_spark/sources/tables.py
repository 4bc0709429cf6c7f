"""Parquet table loaders for the engine's test corpus.

Replaces the reference's per-script read logic (glob + exclusion +
concat, scripts/extract_events_by_time.py:64-108; multi-path
``spark.read.parquet``, scripts/spark_events_by_time_parquet.py:112,191)
with one declarative reader. Predicate pushdown and column pruning are
Catalyst's job — callers just ``.filter``/``.select`` and the parquet scan
receives ``PushedFilters``/``ReadSchema``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# events.parquet carries TIMESTAMP(NANOS), which Spark only reads with the
# nanosAsLong legacy flag (runtime-settable). The loader flips it on and the
# engine does exact integer time math on the long (functions.core.event_*).
_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; ``events.ts`` arrives as long nanoseconds."""
    if name == "events":
        spark.conf.set(_NANOS_FLAG, "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
