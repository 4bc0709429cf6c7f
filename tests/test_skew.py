"""layout.salted_join must be row-equivalent to the plain join while
actually spreading a hot key across salt shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.plans import layout


@pytest.fixture(scope="module")
def skewed(spark):
    # 5000 rows on one hot key + a long tail, dim with gaps (key 2 absent)
    fact = spark.range(6000).select(
        F.when(F.col("id") < 5000, F.lit(1)).otherwise(F.col("id") % 50)
        .cast("long").alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 50, 2)], "k long, attr string"
    )
    return fact, dim


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k")
    salted = layout.salted_join(fact, dim, ["k"], n_salt=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select("k", "fact_id", "attr")) == \
           _sorted_rows(plain.select("k", "fact_id", "attr"))


def test_salted_left_keeps_unmatched(skewed):
    fact, dim = skewed
    plain = fact.join(dim, "k", "left")
    salted = layout.salted_join(fact, dim, ["k"], n_salt=8, how="left")
    assert _sorted_rows(salted.select("k", "fact_id", "attr")) == \
           _sorted_rows(plain.select("k", "fact_id", "attr"))


def test_salt_actually_spreads_hot_key(spark, skewed):
    fact, _ = skewed
    salt = F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(8))
    n = fact.filter(F.col("k") == 1).select(salt.alias("s")).distinct().count()
    assert n == 8  # the hot key occupies every shard


def test_salted_join_is_deterministic(skewed):
    fact, dim = skewed
    a = _sorted_rows(layout.salted_join(fact, dim, ["k"], n_salt=4))
    b = _sorted_rows(layout.salted_join(fact, dim, ["k"], n_salt=4))
    assert a == b


def test_rejects_outer(skewed):
    fact, dim = skewed
    with pytest.raises(ValueError):
        layout.salted_join(fact, dim, ["k"], how="full")
