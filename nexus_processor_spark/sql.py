"""SQL surface: temp-view registration + parameterized SQL execution.

The reference drives Spark with f-string SQL (spark_events_by_time.py:70-78
interpolates user input straight into the query — an injection surface).
This module keeps the SQL ergonomics but passes every user value through
Spark's parameterized ``spark.sql(query, args)`` so values are bound, not
spliced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.sources.tables import TESTDATA_TABLES, load_table


def register_testdata_views(spark: SparkSession, sf_dir: str,
                            tables: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Expose the test corpus as temp views for ``spark.sql`` queries."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_lake_views(spark: SparkSession, root: str,
                        tables: tuple[str, ...]) -> None:
    """Expose partitioned-parquet lake tables as temp views."""
    from nexus_processor_spark.sources.catalog import read_table

    for name in tables:
        read_table(spark, root, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str, **params) -> DataFrame:
    """Run SQL with named bound parameters (``:name`` placeholders)."""
    return spark.sql(query, args=params or None)


# SQL-UDF twins of the engine's scalar vocabulary (functions/core.py,
# functions/text.py semantics). Spark 4 SQL UDFs (CREATE FUNCTION ...
# RETURN <expr>) compile to the same catalyst expressions as the Column
# builders — pure SQL users get identical semantics and codegen, no
# Python anywhere.
_ENGINE_FUNCTIONS: dict[str, str] = {
    # exact long-ns -> µs via the bit-30 split (see core.event_micros)
    "event_micros":
        "(ts BIGINT) RETURNS BIGINT RETURN "
        "shiftright(ts, 30) * 1073741 + CAST(floor((shiftright(ts, 30) * 824 "
        "+ (ts & 1073741823)) / 1000) AS BIGINT)",
    "event_seconds":
        "(ts BIGINT) RETURNS DOUBLE RETURN "
        "(shiftright(ts, 30) * 1073741 + CAST(floor((shiftright(ts, 30) * 824 "
        "+ (ts & 1073741823)) / 1000) AS BIGINT)) / 1000000.0",
    "interval_floor":
        "(t DOUBLE, n DOUBLE) RETURNS BIGINT RETURN CAST(floor(t / n) AS BIGINT)",
    "interval_start":
        "(b BIGINT, n DOUBLE) RETURNS DOUBLE RETURN b * n",
    "interval_end":
        "(b BIGINT, n DOUBLE) RETURNS DOUBLE RETURN (b + 1) * n",
    "make_run_id":
        "(instrument STRING, run BIGINT) RETURNS STRING RETURN "
        "concat_ws(':', instrument, CAST(run AS STRING))",
    "run_id_to_filename":
        "(run_id STRING) RETURNS STRING RETURN translate(run_id, ':', '_')",
    # deterministic md5-threshold sampling (pipeline.hash_sample)
    "hash_sample_keep":
        "(key STRING, threshold STRING) RETURNS BOOLEAN RETURN "
        "substring(md5(key), 1, 8) < threshold",
    # feature-hashing bucket/sign (textstats.hashed_features)
    "hash_bucket":
        "(tok STRING, dim INT) RETURNS INT RETURN "
        "CAST(conv(substring(md5(tok), 1, 8), 16, 10) % dim AS INT)",
    "hash_sign":
        "(tok STRING) RETURNS INT RETURN "
        "CASE WHEN CAST(conv(substring(md5(tok), 9, 1), 16, 10) AS INT) % 2 = 0 "
        "THEN 1 ELSE -1 END",
    # set similarity over token arrays (dedup.jaccard_verify semantics)
    "jaccard":
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE RETURN "
        "CASE WHEN size(a) + size(b) - size(array_intersect(a, b)) > 0 "
        "THEN CAST(size(array_intersect(a, b)) AS DOUBLE) / "
        "(size(a) + size(b) - size(array_intersect(a, b))) ELSE 0.0 END",
    # index-order cosine, rounded like similarity._cos
    "cosine":
        "(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN "
        "round(aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"
        " / (sqrt(aggregate(a, 0.0D, (s, x) -> s + x * x))"
        " * sqrt(aggregate(b, 0.0D, (s, x) -> s + x * x))), 6)",
}


def register_engine_functions(spark: SparkSession) -> None:
    """Register the engine's scalar vocabulary as SQL UDFs so pure-SQL
    consumers (notebooks, BI, the reference's f-string-SQL users) get the
    exact engine semantics — including the subtle ones (bit-split ns
    math, md5 sampling domains) — without importing the Python API."""
    for name, body in _ENGINE_FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
