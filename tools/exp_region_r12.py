"""Round-12 experiment (VERDICT r11 next #4): re-validate
region_revenue's local price and try to cut the two serial collect
jobs.

Four variants, interleaved in ONE session (the only honest sub-second
comparison this box class supports):

* orig    — the r10 shape: all 5 joins, ASIA restriction LAST.
* semi    — the f030889 shape: broadcast LeftSemi pre-filters on
            customer/supplier, n_name attached post-agg.
* inlist  — the committed r11 shape: bounded Spark collect of the 5
            ASIA nation keys -> literal isin (PushedFilters In(...)),
            2 serial driver jobs.
* inlist_pa — NEW: same plan as inlist, but the bounded dim read
            (region+nation, <= 30 rows total at every TPC-H SF) happens
            driver-side via pyarrow — ZERO Spark jobs before the fact
            query, same In(...) pushdown.

Value-identity asserted across all variants at the end.
"""
from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "31g")

from pyspark.sql import functions as F

from nexus_processor_spark import queries as registry
from nexus_processor_spark.queries.relational_q import _ntz, _t
from nexus_processor_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("EXP_REPS", "7"))


def _facts(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return li, orders


def orig_variant(spark, sf_dir):
    """r10 shape: restriction last."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    li, orders = _facts(spark, sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


def semi_variant(spark, sf_dir):
    """f030889 shape: LeftSemi pre-filters, post-agg name attach."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    nation_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    keys = nation_asia.select(F.col("n_nationkey").alias("k"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(keys), F.col("c_nationkey") == F.col("k"), "left_semi")
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(keys), F.col("s_nationkey") == F.col("k"), "left_semi")
    li, orders = _facts(spark, sf_dir)
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .groupBy(cust.c_nationkey)
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return per_nation.join(
        F.broadcast(nation_asia),
        per_nation.c_nationkey == nation_asia.n_nationkey,
    ).select("n_name", "revenue")


def inlist_pa_variant(spark, sf_dir):
    """inlist with the bounded dim read done driver-side via pyarrow
    (region: 5 rows, nation: 25 rows — at EVERY TPC-H scale factor),
    so no Spark job runs before the fact query."""
    import pyarrow.parquet as pq

    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    asia_rk = {rk for rk, rn in zip(
        reg.column("r_regionkey").to_pylist(),
        reg.column("r_name").to_pylist()) if rn == "ASIA"}
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    asia = [(k, n) for k, n, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if r in asia_rk]
    asia_keys = [k for k, _ in asia]
    nation_asia = spark.createDataFrame(
        asia, "n_nationkey int, n_name string")

    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(asia_keys))
    sup = _t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(asia_keys))
    li, orders = _facts(spark, sf_dir)
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, (li.l_suppkey == sup.s_suppkey)
              & (cust.c_nationkey == sup.s_nationkey))
        .groupBy(cust.c_nationkey)
        .agg(F.round(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return per_nation.join(
        F.broadcast(nation_asia),
        per_nation.c_nationkey == nation_asia.n_nationkey,
    ).select("n_name", "revenue")


def main() -> None:
    spark = get_spark("exp-region-r12")
    inlist_q = registry.queries()["region_revenue"]

    variants = {
        "orig": lambda: orig_variant(spark, SF_DIR),
        "semi": lambda: semi_variant(spark, SF_DIR),
        "inlist": lambda: inlist_q(spark, SF_DIR),
        "inlist_pa": lambda: inlist_pa_variant(spark, SF_DIR),
    }

    def run(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for _ in range(2):  # JIT warm-up, all shapes, untimed
        for name, fn in variants.items():
            run(f"warm {name}", fn)

    times: dict[str, list[float]] = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            dt = run(f"{name} rep{rep}", fn)
            times[name].append(dt)
            print(f"{name} rep{rep}: {dt:.3f}s", flush=True)

    print()
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"reps {[round(t, 3) for t in ts]}")
    base = times["inlist"]
    for name in ("orig", "semi", "inlist_pa"):
        wins = sum(1 for a, b in zip(base, times[name]) if b < a)
        print(f"{name} beats inlist {wins}/{REPS} pairs")

    ref = sorted(map(tuple, variants["inlist"]().collect()))
    for name, fn in variants.items():
        got = sorted(map(tuple, fn().collect()))
        assert got == ref, f"{name} disagrees: {got[:3]} vs {ref[:3]}"
    print(f"identity: OK ({len(ref)} rows, all variants)")
    spark.stop()


if __name__ == "__main__":
    main()
