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
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Some corpus generations write events.ts as parquet TIMESTAMP(NANOS)
# physical int64, which Spark only reads with the nanosAsLong legacy flag
# (runtime-settable). Harmless for µs-timestamp files.
_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"


def _normalize_event_time(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Enforce the engine contract: ``events.ts`` is long UTC nanoseconds.

    The test corpus has shipped ``ts`` in two encodings across rounds:

    * parquet TIMESTAMP(NANOS) physical int64 — read as ``long`` nanos
      via ``nanosAsLong`` (already the contract; passes through), and
    * plain ``timestamp[us]`` — read as ``TIMESTAMP_NTZ`` (Spark 4 NTZ
      inference) or ``TIMESTAMP`` when inference is off.

    Timestamp encodings are converted to long nanoseconds here, once, so
    every downstream operator keeps doing exact integer time math
    (functions.core.event_*) no matter how the file was written. Naive
    timestamps are interpreted as UTC — the same convention as DuckDB's
    tz-free ``epoch()`` the oracles use — so the session timezone is
    pinned to UTC before the NTZ→LTZ cast.
    """
    t = df.schema["ts"].dataType
    if isinstance(t, LongType):
        return df
    if isinstance(t, TimestampNTZType):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        c = F.col("ts").cast("timestamp")
    elif isinstance(t, TimestampType):
        c = F.col("ts")
    else:  # unknown future encoding: leave untouched rather than corrupt
        return df
    return df.withColumn("ts", (F.unix_micros(c) * F.lit(1000)).cast("long"))


def load_table(spark: SparkSession, sf_dir: str, name: str,
               *, normalize_time: bool = True) -> DataFrame:
    """Load one testdata table; ``events.ts`` arrives as long nanoseconds.

    ``normalize_time=False`` keeps ``ts`` in its stored encoding — for
    callers that want to push a range predicate onto the physical column
    (parquet min/max row-group pruning) before normalizing, e.g.
    ``operators.timeslice.push_time_range`` + ``normalize_event_time``.
    """
    if name == "events":
        spark.conf.set(_NANOS_FLAG, "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and normalize_time and "ts" in df.columns:
        df = _normalize_event_time(spark, df)
    return df


def load_events_time_range(
    spark: SparkSession, sf_dir: str, start_time: float, end_time: float,
) -> DataFrame:
    """Events in half-open ``[start, end)`` seconds, with the range pushed
    onto the STORED ``ts`` column (encoding-aware literals → parquet
    ``PushedFilters`` → row-group skip on sorted layouts), then ``ts``
    normalized to the long-ns contract."""
    from nexus_processor_spark.operators.timeslice import push_time_range

    raw = load_table(spark, sf_dir, "events", normalize_time=False)
    return _normalize_event_time(spark, push_time_range(raw, start_time, end_time))


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    use = names or TESTDATA_TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
