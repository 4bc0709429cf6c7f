from __future__ import annotations

import io
import json

from pyspark.sql import functions as F

from nexus_processor_spark.plans.layout import salted_join, spread
from nexus_processor_spark.sources import catalog, nexus
from nexus_processor_spark.streaming import replay

from tests.test_nexus_ingest import fixture_tree


def test_spread_raises_partition_count(spark):
    df = spark.range(1000).coalesce(1)
    assert spread(df).rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # already-wide inputs pass through untouched
    wide = spark.range(1000).repartition(16)
    assert spread(wide, parallelism=8) is wide


def test_salted_join_same_rows_as_plain(spark):
    # 90% of big rows share one hot key — the salting target.
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, "hot").otherwise("cold").alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, dim int")
    plain = big.join(small, ["k"]).groupBy("k", "dim").count()
    salted = salted_join(big, small, ["k"]).groupBy("k", "dim").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    small = spark.createDataFrame([("a", 10)], "k string, dim int")
    rows = {r.k: r.dim for r in salted_join(big, small, ["k"], how="left").collect()}
    assert rows == {"a": 10, "b": None}


def test_replay_to_jsonl(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    buf = io.StringIO()
    n = replay.replay_to_jsonl(catalog.read_table(spark, root, "events"), buf)
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert n == 4 and len(lines) == 4
    assert lines[0]["run_id"] == "REF_L:12345"
    offs = [x["time_offset"] for x in lines]
    assert offs == sorted(offs)  # deterministic replay order
