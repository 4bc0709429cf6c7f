"""Round-11 experiment: region_revenue (Q5 shape) — replace the
twice-used asia-keys broadcast SEMI-joins with a bounded 5-key collect
+ pushed `isin` filters on customer/supplier.

Rationale (guide §3.2 / §6): nation is <= 25 rows at every TPC-H scale,
so collecting the ASIA nation keys is a bounded (<=25-row) driver read.
A literal IN-list reaches the parquet scan as PushedFilters (row-group
pruning on c_nationkey/s_nationkey min-max), which a semi-join can
never do, and it removes broadcast-build/probe jobs from the AQE floor.

Interleaved A/B in one session + value-identity check.
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


def new_variant(spark, sf_dir):
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ntz("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    nation_asia = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    # bounded: nation has <= 25 rows at every TPC-H scale factor
    asia_keys = [r[0] for r in nation_asia.select("n_nationkey").collect()]
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(asia_keys))
    sup = _t(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(asia_keys))
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
    spark = get_spark("exp-region-isin")
    old_q = registry.queries()["region_revenue"]

    def run(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    old = lambda: old_q(spark, SF_DIR)  # noqa: E731
    new = lambda: new_variant(spark, SF_DIR)  # noqa: E731

    # JIT warm-up, both shapes, untimed
    for _ in range(2):
        run("warm old", old)
        run("warm new", new)

    times = {"old": [], "new": []}
    for rep in range(REPS):
        for name, fn in (("old", old), ("new", new)):
            dt = run(f"{name} rep{rep}", fn)
            times[name].append(dt)
            print(f"{name} rep{rep}: {dt:.3f}s", flush=True)

    wins = sum(1 for a, b in zip(times["old"], times["new"]) if b < a)
    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"reps {[round(t, 3) for t in ts]}")
    print(f"new wins {wins}/{REPS} pairs")

    a = sorted(map(tuple, old().collect()))
    b = sorted(map(tuple, new().collect()))
    assert a == b, f"variants disagree: {a[:3]} vs {b[:3]}"
    print(f"identity: OK ({len(a)} rows)")

    print("\n=== new plan (formatted) ===")
    new().explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
