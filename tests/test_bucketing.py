from __future__ import annotations

import pytest

from nexus_processor_spark.plans import explain
from nexus_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join: both sides bucketed on the join key -> sort-merge
    join with NO exchange. This is the layout strategy for repeated
    fact-fact joins at 100 TB (bucket once at write, join free forever)."""
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    (orders.write.mode("overwrite").format("parquet")
     .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders"))
    (cust.write.mode("overwrite").format("parquet")
     .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_cust"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_orders").join(
            spark.table("b_cust"),
            spark.table("b_orders").o_custkey == spark.table("b_cust").c_custkey,
        )
        plan = explain.executed_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # and the result is right
        assert j.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_cust")
