"""PassJoin exact edit-distance similarity join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nexus_processor_spark.operators.fuzzy import edit_distance_pairs


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[len(b)]


def _mutated_corpus(seed: int, n: int = 40):
    rng = random.Random(seed)
    alpha = "abcd"
    strings = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 10)))
               for _ in range(n)]
    for s in list(strings)[: n // 2]:
        t = list(s)
        for _ in range(rng.randint(1, 3)):
            op = rng.choice("ids")
            pos = rng.randint(0, max(len(t) - 1, 0))
            if op == "i":
                t.insert(pos, rng.choice(alpha))
            elif t:
                if op == "d":
                    del t[pos]
                else:
                    t[pos] = rng.choice(alpha)
        strings.append("".join(t))
    return [(i, s) for i, s in enumerate(strings)]


def test_matches_brute_force_k1_k2_k3(spark):
    rows = _mutated_corpus(7)
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2, 3):
        got = sorted(
            (r.id_1, r.id_2, r.dist)
            for r in edit_distance_pairs(
                df, id_col="id", text_col="s", max_dist=k
            ).collect()
        )
        want = sorted(
            (i, j, _lev(a, b))
            for (i, a) in rows for (j, b) in rows
            if i < j and _lev(a, b) <= k
        )
        assert got == want, f"k={k}"


def test_short_empty_and_null_strings(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab"), (4, "abcdef"), (5, None), (6, "")],
        "id long, s string",
    )
    got = sorted(
        (r.id_1, r.id_2, r.dist)
        for r in edit_distance_pairs(
            df, id_col="id", text_col="s", max_dist=2
        ).collect()
    )
    # "" ~ "" (0), "" ~ "a" (1), "" ~ "ab" (2), "a" ~ "ab" (1); null never
    assert got == [(1, 2, 1), (1, 3, 2), (1, 6, 0), (2, 3, 1),
                   (2, 6, 1), (3, 6, 2)]


def test_exact_duplicates_report_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "hello"), (3, "jello")], "id long, s string"
    )
    got = sorted(
        (r.id_1, r.id_2, r.dist)
        for r in edit_distance_pairs(
            df, id_col="id", text_col="s", max_dist=1
        ).collect()
    )
    assert got == [(1, 2, 0), (1, 3, 1), (2, 3, 1)]


def test_no_cartesian_in_main_path_plan(spark):
    df = spark.range(200).select(
        F.col("id"),
        F.concat(F.lit("prefix_"), (F.col("id") % 37).cast("string"))
        .alias("s"),
    )
    plan = edit_distance_pairs(
        df, id_col="id", text_col="s", max_dist=2
    )._jdf.queryExecution().executedPlan().toString()
    # the short-string block is a bounded crossJoin by construction; the
    # main path must be a hash equi-join on the segment key
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or \
        "ShuffledHashJoin" in plan


def test_base_is_disk_backed_persist_not_local_checkpoint(spark):
    # The (id, string, len) base is proportional to the input: it must
    # be a fault-tolerant, disk-spilling persist (MEMORY_AND_DISK), not
    # a localCheckpoint (which pins executor disk and kills the job on
    # executor loss). Single materialization: the cache is read by all
    # four consumers, and no ExistingRDD (localCheckpoint residue)
    # appears in the plan.
    df = spark.range(50).select(
        F.col("id"),
        F.concat(F.lit("p_"), (F.col("id") % 11).cast("string")).alias("s"),
    )
    out = edit_distance_pairs(df, id_col="id", text_col="s", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 3
    assert "ExistingRDD" not in plan
    # storage level of the cached base: memory+disk (spillable)
    jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = jmap.values().iterator()
    levels = []
    while it.hasNext():
        levels.append(it.next().getStorageLevel())
    assert any(
        lvl.useDisk() and lvl.useMemory() for lvl in levels
    ), [str(lv) for lv in levels]
