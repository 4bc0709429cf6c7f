"""Table profiling / reconciliation queries over the testdata, with
DuckDB oracles. The snapshot-diff derives both "versions" from the same
orders table with deterministic key-modulo membership and a synthetic
status mutation, so the diff is reproducible cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.operators import profile
from nexus_processor_spark.sources.tables import load_table

PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate"]
HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 120_000.0, 24


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (nulls / exact distincts / min-max) of orders in
    one aggregate pass + literal-stack unpivot."""
    return profile.profile_table(
        load_table(spark, sf_dir, "orders"), PROFILE_COLS
    )


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    m10 = F.pmod(F.col("o_orderkey"), F.lit(10))
    old = orders.filter(m10 != 0)
    new = orders.filter(m10 != 1).withColumn(
        "o_orderstatus",
        F.when(F.pmod(F.col("o_orderkey"), F.lit(7)) == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus")),
    )
    return old, new


def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot reconciliation: keys added / removed / changed
    / same between two deterministic versions of orders."""
    old, new = _snapshots(spark, sf_dir)
    return profile.table_diff(old, new, "o_orderkey")


def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of l_extendedprice (width_bucket + one
    groupBy — identical bucketing function in DuckDB)."""
    return profile.histogram(
        load_table(spark, sf_dir, "lineitem"), "l_extendedprice",
        HIST_LO, HIST_HI, HIST_BUCKETS,
    )


QUERIES = {
    "profile_orders": q_profile_orders,
    "orders_snapshot_diff": q_orders_snapshot_diff,
    "price_histogram": q_price_histogram,
}


def _profile_one(col: str) -> str:
    return f"""
        SELECT '{col}' AS col_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({col}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
               CAST(min({col}) AS VARCHAR) AS min_value,
               CAST(max({col}) AS VARCHAR) AS max_value
        FROM orders
    """


_BUCKET_W = (HIST_HI - HIST_LO) / HIST_BUCKETS

ORACLE = {
    "profile_orders": " UNION ALL ".join(_profile_one(c) for c in PROFILE_COLS),
    "orders_snapshot_diff": """
        WITH o AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                   FROM orders WHERE o_orderkey % 10 <> 0),
        n AS (SELECT o_orderkey,
                     CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                          ELSE o_orderstatus END AS o_orderstatus,
                     o_totalprice
              FROM orders WHERE o_orderkey % 10 <> 1)
        SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus
                     AND o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                    THEN 'same' ELSE 'changed' END AS diff_status
        FROM o FULL OUTER JOIN n USING (o_orderkey)
    """,
    "price_histogram": f"""
        SELECT bucket,
               round({HIST_LO} + (bucket - 1) * {_BUCKET_W}, 6) AS bucket_lo,
               round({HIST_LO} + bucket * {_BUCKET_W}, 6) AS bucket_hi,
               CAST(count(*) AS BIGINT) AS n
        FROM (
            -- DuckDB 1.0 has no width_bucket; this is its exact formula
            -- (floor of the double division by the bucket width, +1,
            -- clamped to 0 / n+1 outside the range)
            SELECT CASE
                WHEN x < {HIST_LO} THEN 0
                WHEN x >= {HIST_HI} THEN {HIST_BUCKETS + 1}
                ELSE CAST(floor((x - {HIST_LO}) / {_BUCKET_W}) AS BIGINT) + 1
            END AS bucket
            FROM (SELECT CAST(l_extendedprice AS DOUBLE) AS x
                  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        ) GROUP BY bucket
        ORDER BY bucket
    """,
}
