"""Round-12 experiment (VERDICT r11 next #8): GC probe for the
docsbench wide-text churn.

``spark.memory.fraction`` and G1 region size are static confs, so each
config gets its own JVM; configs alternate A/B/C/A/B/C/... so box
drift cancels across rounds rather than biasing one config. Inside
each JVM the probe measures best-of-2 of the heaviest docsbench
shuffle (``dup_ngram_stats`` over the 2M-doc corpus) — the operator
whose old-gen churn bench.py's comments document.

Run as: python tools/exp_gc_docs.py            (the orchestrator)
        python tools/exp_gc_docs.py --child X  (one measured JVM)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DOCS_DIR = str(Path(__file__).resolve().parent.parent
               / ".benchdata" / "docsbig")

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "g1_region_32m": {
        "spark.driver.extraJavaOptions": "-XX:G1HeapRegionSize=32m",
    },
    "memfrac_05": {
        "spark.memory.fraction": "0.5",
    },
}


def child(name: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "31g")
    from nexus_processor_spark.operators import pipeline
    from nexus_processor_spark.session import get_spark

    spark = get_spark(f"exp-gc-{name}", extra_confs=CONFIGS[name])
    docs = spark.read.parquet(f"{DOCS_DIR}/documents.parquet")
    best = float("inf")
    for rep in range(3):  # rep 0 = JIT warm-up; best-of-2 after
        t0 = time.perf_counter()
        pipeline.duplicate_ngram_stats(docs, hash_grams=True) \
            .write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        if rep > 0:
            best = min(best, el)
        spark.catalog.clearCache()
    print(json.dumps({"config": name, "best_sec": round(best, 3)}),
          flush=True)
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
        return
    rounds = int(os.environ.get("EXP_GC_ROUNDS", "3"))
    results: dict[str, list[float]] = {k: [] for k in CONFIGS}
    for r in range(rounds):
        for name in CONFIGS:
            out = subprocess.run(
                [sys.executable, __file__, "--child", name],
                capture_output=True, text=True, timeout=1200)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")][-1]
            sec = json.loads(line)["best_sec"]
            results[name].append(sec)
            print(f"round {r} {name}: {sec}s", flush=True)
    import statistics
    for name, ts in results.items():
        print(f"{name}: median {statistics.median(ts):.3f}s reps {ts}")


if __name__ == "__main__":
    main()
