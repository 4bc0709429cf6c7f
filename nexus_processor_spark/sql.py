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
