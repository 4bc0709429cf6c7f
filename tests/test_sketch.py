"""Count-Min and Bloom sketch properties."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nexus_processor_spark.operators.sketch import (
    bloom_build,
    bloom_filter_candidates,
    cms_build,
    cms_lookup,
    cms_merge,
)

W, D = 256, 4  # deliberately tiny so collisions actually happen


def _items(spark, seed, n=400, vocab=120):
    rng = random.Random(seed)
    rows = [(f"k{rng.randint(0, vocab)}",) for _ in range(n)]
    return spark.createDataFrame(rows, "key string")


def test_cms_never_underestimates_and_is_bounded(spark):
    items = _items(spark, 1)
    sketch = cms_build(items, "key", width=W, depth=D)
    assert sketch.count() <= W * D
    exact = {r.key: r.c for r in
             items.groupBy("key").agg(F.count("*").alias("c")).collect()}
    probes = items.select("key").distinct()
    est = {r.key: r.est for r in
           cms_lookup(sketch, probes, "key", width=W, depth=D).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)


def test_cms_merge_equals_build_on_union(spark):
    a, b = _items(spark, 2), _items(spark, 3)
    merged = cms_merge(
        cms_build(a, "key", width=W, depth=D),
        cms_build(b, "key", width=W, depth=D),
    )
    direct = cms_build(a.unionByName(b), "key", width=W, depth=D)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_cms_weighted_counts(spark):
    items = spark.createDataFrame(
        [("a", 3), ("a", 2), ("b", 10)], "key string, w int"
    )
    sketch = cms_build(items, "key", width=W, depth=D, weight_col="w")
    est = {r.key: r.est for r in cms_lookup(
        sketch, items.select("key").distinct(), "key", width=W, depth=D
    ).collect()}
    assert est["a"] >= 5 and est["b"] >= 10


def test_cms_lookup_unseen_key_is_zero_or_collision(spark):
    items = spark.createDataFrame([("x",)], "key string")
    sketch = cms_build(items, "key", width=W, depth=D)
    probes = spark.createDataFrame([("never-seen-key",)], "key string")
    [row] = cms_lookup(sketch, probes, "key", width=W, depth=D).collect()
    assert row.est >= 0  # zero unless all D buckets collide with 'x'


def test_bloom_has_no_false_negatives(spark):
    keys = _items(spark, 4).distinct()
    bloom = bloom_build(keys, "key", bits=1 << 14, k=4)
    passed = bloom_filter_candidates(keys, "key", bloom, bits=1 << 14, k=4)
    assert passed.count() == keys.count()


def test_bloom_prefilter_plus_exact_verify_is_exact(spark):
    members = _items(spark, 5).distinct()
    mixed = _items(spark, 6)  # overlaps members partially
    bloom = bloom_build(members, "key", bits=1 << 12, k=4)
    cand = bloom_filter_candidates(mixed, "key", bloom, bits=1 << 12, k=4)
    verified = cand.join(members, "key", "left_semi")
    truth = mixed.join(members, "key", "left_semi")
    assert sorted(r.key for r in verified.collect()) == \
        sorted(r.key for r in truth.collect())
    # and the prefilter is a superset of the truth
    assert cand.count() >= truth.count()


def test_bloom_filter_is_shuffle_free_on_probe_side(spark):
    keys = spark.createDataFrame([("a",), ("b",)], "key string")
    bloom = bloom_build(keys, "key", bits=1 << 12, k=4)
    probe = spark.range(1000).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    plan = bloom_filter_candidates(
        probe, "key", bloom, bits=1 << 12, k=4
    )._jdf.queryExecution().executedPlan().toString()
    # broadcast semi-joins only: the probe side must not hash-shuffle
    assert "BroadcastHashJoin" in plan
    probe_shuffles = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "key" in ln
    ]
    assert not probe_shuffles, probe_shuffles


def test_kmv_exact_below_k(spark):
    from nexus_processor_spark.operators.sketch import kmv_estimate, kmv_sketch

    items = spark.createDataFrame(
        [(f"k{i % 17}",) for i in range(200)], "key string"
    )
    sk = kmv_sketch(items, "key", k=64)
    [row] = kmv_estimate(sk, k=64).collect()
    assert row.n_draws == 17 and row.est_distinct == 17.0


def test_kmv_estimate_accuracy_and_merge(spark):
    from nexus_processor_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    a = spark.range(4000).select(F.concat(F.lit("a"), F.col("id")).alias("key"))
    b = spark.range(4000).select(F.concat(F.lit("b"), F.col("id")).alias("key"))
    k = 256
    ska, skb = kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k)
    [ea] = kmv_estimate(ska, k=k).collect()
    assert abs(ea.est_distinct - 4000) / 4000 < 0.2  # ~1/sqrt(k) error
    [eu] = kmv_estimate(kmv_merge(ska, skb, k=k), k=k).collect()
    assert abs(eu.est_distinct - 8000) / 8000 < 0.2
    # merged sketch == sketch built directly over the union
    direct = kmv_sketch(a.unionByName(b), "key", k=k)
    assert sorted(r.h for r in kmv_merge(ska, skb, k=k).collect()) == \
        sorted(r.h for r in direct.collect())


def test_kmv_set_ops_exact_below_k(spark):
    """When the union fits inside k, every estimate is exact: the
    sketches ARE the key sets."""
    from nexus_processor_spark.operators.sketch import kmv_set_ops, kmv_sketch

    a = spark.createDataFrame([(f"k{i}",) for i in range(30)], "key string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(20, 50)], "key string")
    k = 256
    [r] = kmv_set_ops(
        kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k
    ).collect()
    assert r.n_union_draws == 50 and r.n_common_draws == 10
    assert r.union_est == 50.0 and r.inter_est == 10.0
    assert r.a_est == 30.0 and r.b_est == 30.0
    assert abs(r.inter_jaccard - 0.2) < 1e-9


def test_kmv_set_ops_estimates_in_sketch_regime(spark):
    """Above k: union/intersection/Jaccard estimates land within the
    ~1/sqrt(k) KMV error band on a half-overlapping pair of 4k-key sets
    (truth: union 6000, intersection 2000, jaccard 1/3)."""
    from nexus_processor_spark.operators.sketch import kmv_set_ops, kmv_sketch

    a = spark.range(4000).select(F.concat(F.lit("x"), F.col("id")).alias("key"))
    b = spark.range(2000, 6000).select(
        F.concat(F.lit("x"), F.col("id")).alias("key"))
    k = 256
    [r] = kmv_set_ops(
        kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k
    ).collect()
    assert r.n_union_draws == k
    assert abs(r.union_est - 6000) / 6000 < 0.2
    assert abs(r.inter_jaccard - 1 / 3) < 0.15
    assert abs(r.inter_est - 2000) / 2000 < 0.35


def test_kmv_grouped_sketch_is_bounded(spark):
    from nexus_processor_spark.operators.sketch import kmv_sketch

    items = spark.createDataFrame(
        [(f"g{i % 3}", f"k{i}") for i in range(500)], "g string, key string"
    )
    sk = kmv_sketch(items, "key", k=32, by="g")
    per = {r.g: r.n for r in
           sk.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 32, "g1": 32, "g2": 32}


def test_hll_accuracy_and_merge(spark):
    from nexus_processor_spark.operators.sketch import (
        HLL_M,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    n = 20000
    a = spark.range(n).select(F.concat(F.lit("a"), F.col("id")).alias("key"))
    b = spark.range(n).select(F.concat(F.lit("b"), F.col("id")).alias("key"))
    ra, rb = hll_registers(a, "key"), hll_registers(b, "key")
    assert ra.count() <= HLL_M
    [ea] = hll_estimate(ra).collect()
    assert abs(ea.est_distinct - n) / n < 0.05  # ~1.04/sqrt(4096) = 1.6%
    merged = hll_merge(ra, rb)
    [eu] = hll_estimate(merged).collect()
    assert abs(eu.est_distinct - 2 * n) / (2 * n) < 0.05
    # merge == registers of the union, register for register
    direct = hll_registers(a.unionByName(b), "key")
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_hll_small_range_linear_counting(spark):
    from nexus_processor_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    small = spark.range(50).select(F.col("id").cast("string").alias("key"))
    [e] = hll_estimate(hll_registers(small, "key")).collect()
    # linear counting is near-exact when n << m
    assert abs(e.est_distinct - 50) <= 2


def test_hll_duplicates_do_not_move_estimate(spark):
    from nexus_processor_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    once = spark.range(1000).select(F.col("id").cast("string").alias("key"))
    thrice = once.unionByName(once).unionByName(once)
    [e1] = hll_estimate(hll_registers(once, "key")).collect()
    [e3] = hll_estimate(hll_registers(thrice, "key")).collect()
    assert e1.est_distinct == e3.est_distinct


def test_hll_wide_rho_extends_range(spark):
    """w=40 registers: same bucket layout, rho from a wider window —
    estimates stay accurate at test scale while the countable ceiling
    moves from ~6e9 to ~9e15; invalid widths are rejected."""
    from nexus_processor_spark.operators import sketch as sk

    keys = spark.range(120_000).selectExpr("CAST(id AS STRING) AS k")
    est20 = sk.hll_estimate(sk.hll_registers(keys, "k")).first()[0]
    est40 = sk.hll_estimate(sk.hll_registers(keys, "k", w=40)).first()[0]
    for est in (est20, est40):
        assert abs(est - 120_000) / 120_000 < 0.05
    # wide registers merge like narrow ones (same w on both sides)
    a = sk.hll_registers(keys.limit(60_000), "k", w=40)
    b = sk.hll_registers(keys, "k", w=40)
    merged = sk.hll_estimate(sk.hll_merge(a, b)).first()[0]
    assert abs(merged - est40) / est40 < 1e-9
    import pytest

    with pytest.raises(ValueError, match="w must be"):
        sk.hll_registers(keys, "k", w=0)


def test_hll_union_label_matches_merge_branch(spark):
    """The grouping-sets union rows must equal hll_merge of the per-group
    registers, register for register (the single-pass optimization must
    not change a single value), and a NULL group value must keep its own
    register table instead of being folded into the union."""
    from nexus_processor_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    items = spark.range(5000).select(
        F.when(F.col("id") % 3 == 0, F.lit("a"))
        .when(F.col("id") % 3 == 1, F.lit("b"))
        .otherwise(F.lit(None)).alias("g"),
        F.col("id").cast("string").alias("key"),
    )
    fused = hll_registers(items, "key", by="g", union_label="__u__")
    plain = hll_registers(items, "key", by="g")
    merged = hll_merge(plain.drop("g")).select(
        F.lit("__u__").alias("g"), "bucket", "rho")
    want = plain.unionByName(merged)
    got = sorted(
        ((r.g, r.bucket, r.rho) for r in fused.collect()),
        key=lambda t: (t[0] is None, t))
    exp = sorted(
        ((r.g, r.bucket, r.rho) for r in want.collect()),
        key=lambda t: (t[0] is None, t))
    assert got == exp
    # null-group registers survive as their own group
    assert any(g is None for g, _, _ in got)

    import pytest

    with pytest.raises(ValueError, match="union_label requires by"):
        hll_registers(items, "key", union_label="__u__")
