"""Round-11 experiment: is a single-scan (cached-projection) variant of
the flagship interval rollup faster than the committed two-scan form at
data scale (100M events)?

OPTIMIZATION_r11.md "Not yet optimized" #3: at sf0.1 the scan is too
cheap to pay for cache priming; this measures the 100M-row arithmetic.

Variants (identical results, checked at the end):
  two_scan : committed form — plain agg (scan 1) + bitmap distinct
             (scan 2), each a column-pruned parquet read.
  cached   : persist the 3-column projection (MEMORY_AND_DISK), feed
             both branches, unpersist after the action.

Interleaved A/B, one session, N reps each, one untimed JIT warm-up per
variant. Prints per-rep seconds and medians.
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
from pyspark.storagelevel import StorageLevel

import bench
from nexus_processor_spark.functions.core import (
    event_seconds,
    interval_bounds,
    interval_floor,
)
from nexus_processor_spark.operators import timeslice
from nexus_processor_spark.session import get_spark

REPS = int(os.environ.get("EXP_REPS", "5"))
INTERVAL_S = 600.0


def main() -> None:
    spark = get_spark("exp-timeslice-singlescan")
    bench.ensure_big_events(spark)
    ev_raw = spark.read.parquet(f"{bench.BIG_DIR}/events.parquet")

    def events():
        return ev_raw.select(
            "event_id",
            event_seconds("ts").alias("absolute_time"),
            F.col("event_type").alias("bank"),
            F.col("user_id").alias("pulse_index"),
        )

    def two_scan():
        return timeslice.count_by_interval(events(), INTERVAL_S)

    def cached():
        t = F.col("absolute_time")
        base = (
            events()
            .filter(t.isNotNull())
            .withColumn("interval",
                        interval_floor(t, INTERVAL_S))
            .select("interval", "absolute_time", "bank", "pulse_index")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        plain = base.groupBy("interval").agg(
            F.count(F.lit(1)).alias("event_count"),
            F.min(t).alias("min_time"),
            F.max(t).alias("max_time"),
            F.count_distinct(F.col("bank")).alias("n_banks"),
        )
        pulses = timeslice.bitmap_distinct(
            base, ["interval"], "pulse_index", "n_pulses")
        df = plain.join(pulses, "interval")
        start, end = interval_bounds(
            F.col("interval"), INTERVAL_S)
        return df.select(
            "interval", start.alias("interval_start"),
            end.alias("interval_end"), "event_count", "n_banks",
            "n_pulses", "min_time", "max_time",
        ).orderBy("interval"), base

    def run(name, rep):
        spark.sparkContext.setJobDescription(f"{name} rep{rep}")
        t0 = time.perf_counter()
        if name == "cached":
            df, held = cached()
            df.write.format("noop").mode("overwrite").save()
            held.unpersist()
        else:
            two_scan().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    # untimed JIT warm-up for both plan shapes
    run("two_scan", -1)
    run("cached", -1)

    times: dict[str, list[float]] = {"two_scan": [], "cached": []}
    for rep in range(REPS):
        for name in ("two_scan", "cached"):
            dt = run(name, rep)
            times[name].append(dt)
            print(f"{name} rep{rep}: {dt:.3f}s", flush=True)

    for name, ts in times.items():
        print(f"{name}: median {statistics.median(ts):.3f}s "
              f"reps {[round(t, 3) for t in ts]}")

    # value identity
    a = two_scan().orderBy("interval").collect()
    b_df, held = cached()
    b = b_df.orderBy("interval").collect()
    held.unpersist()
    assert a == b, "variants disagree"
    print(f"identity: OK ({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
