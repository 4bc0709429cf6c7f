"""Round-12 experiment (VERDICT r11 next #5): A/B
``spark.sql.adaptive.coalescePartitions.parallelismFirst=false`` (the
r11-committed session default, shipped without a data-scale
measurement) against the engine default ``true``, at 100M rows.

The conf is runtime-settable, so the A/B interleaves on/off in ONE
session over (a) the bigbench flagship rollup and (b) the heaviest
user-key shuffle shape (funnel_stages) — the two places post-shuffle
coalescing decisions could matter at data scale.
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
from nexus_processor_spark.operators import behavior
from nexus_processor_spark.session import get_spark

BIG_DIR = str(Path(__file__).resolve().parent.parent / ".benchdata" / "sfbig")
REPS = int(os.environ.get("EXP_REPS", "5"))
CONF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"


def main() -> None:
    spark = get_spark("exp-parallelism-first")
    qs = registry.queries()
    ev = spark.read.parquet(f"{BIG_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value")

    shapes = {
        "flagship_100m": lambda: qs["timeslice_interval"](spark, BIG_DIR),
        "funnel_100m": lambda: behavior.funnel_stages(
            ev, ["view", "click", "purchase"]),
    }

    def run(fn):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        return time.perf_counter() - t0

    for shape_name, fn in shapes.items():
        # warm both conf states once, untimed
        for v in ("false", "true"):
            spark.conf.set(CONF, v)
            run(fn)
        times = {"false": [], "true": []}
        for rep in range(REPS):
            for v in ("false", "true"):
                spark.conf.set(CONF, v)
                spark.sparkContext.setJobDescription(
                    f"{shape_name} pf={v} rep{rep}")
                dt = run(fn)
                times[v].append(dt)
                print(f"{shape_name} pf={v} rep{rep}: {dt:.3f}s",
                      flush=True)
        print()
        med_f = statistics.median(times["false"])
        med_t = statistics.median(times["true"])
        wins_f = sum(1 for a, b in zip(times["true"], times["false"])
                     if b < a)
        print(f"{shape_name}: pf=false median {med_f:.3f}s, "
              f"pf=true median {med_t:.3f}s, "
              f"false wins {wins_f}/{REPS} pairs")
        print(f"  false reps {[round(t, 3) for t in times['false']]}")
        print(f"  true  reps {[round(t, 3) for t in times['true']]}")
    spark.stop()


if __name__ == "__main__":
    main()
