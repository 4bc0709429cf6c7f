"""Per-query profiling for the headline bench set (optimization rounds).

For each headline query at $SPARK_GRAFT_SF_DIR:

* one untimed JIT warm-up rep + N timed reps through the noop sink
  (identical methodology to bench.py);
* Spark job/stage/task counts for the LAST rep via the UI REST API
  (the per-query orchestration cost that dominates at small SF);
* optionally dumps ``explain("formatted")`` + the executed plan to
  ``plans/<tag>/<name>_<suffix>.txt``.

Usage::

    python tools/headline_profile.py [--reps 3] [--plans plans/r11]
        [--suffix before] [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "31g")

HEADLINE = (
    "timeslice_interval", "timeslice_bank_interval", "enrich_broadcast_join",
    "pricing_summary", "topk_revenue", "region_revenue",
    "window_topk_per_group", "dedup_exact_groups", "dedup_minhash_pairs",
    "dedup_simhash", "sim_brute_topk", "sim_near_dup_pairs", "text_profile",
    "text_fingerprints", "semantic_dedup", "knn_graph", "lm_doc_score",
    "image_neardup_dhash",
)


def _api(port: int, path: str):
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None,
                    help="directory to write plan dumps into")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None, help="JSON results path")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from nexus_processor_spark import queries as registry
    from nexus_processor_spark.session import get_spark

    spark = get_spark("headline-profile", extra_confs={
        "spark.ui.enabled": "true", "spark.ui.port": "4049"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app = spark.sparkContext.applicationId
    qs = registry.queries()
    names = args.names or list(HEADLINE)

    # identical warm-up to bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from nexus_processor_spark.sources.tables import TESTDATA_TABLES, load_table
    for t in TESTDATA_TABLES:
        load_table(spark, args.sf, t).limit(1).count()

    results: dict[str, dict] = {}
    for name in names:
        reps = []
        jobs_before = len(_api(port, f"applications/{app}/jobs"))
        for rep in range(args.reps + 1):
            jb = len(_api(port, f"applications/{app}/jobs"))
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop") \
                .mode("overwrite").save()
            el = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
            ja = len(_api(port, f"applications/{app}/jobs"))
            if rep > 0:
                reps.append(round(el, 3))
            last = {"sec": round(el, 3), "jobs": ja - jb}
            spark.catalog.clearCache()
        # stage/task detail for the final rep's jobs
        alljobs = _api(port, f"applications/{app}/jobs")
        lastjobs = [j for j in alljobs
                    if (j.get("description") or "").startswith(
                        f"{name} rep{args.reps}")]
        n_stages = sum(len(j.get("stageIds", [])) for j in lastjobs)
        n_tasks = sum(j.get("numCompletedTasks", 0) for j in lastjobs)
        results[name] = {
            "reps": reps, "best": min(reps),
            "jobs_last_rep": last["jobs"],
            "stages_last_rep": n_stages,
            "tasks_last_rep": n_tasks,
        }
        print(f"{name:28s} best={min(reps):6.3f}s reps={reps} "
              f"jobs={last['jobs']} stages={n_stages} tasks={n_tasks}",
              flush=True)
        if args.plans:
            pdir = Path(args.plans)
            pdir.mkdir(parents=True, exist_ok=True)
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            executed = df._jdf.queryExecution().executedPlan().toString()
            (pdir / f"{name}_{args.suffix}.txt").write_text(
                "== explain(formatted) ==\n" + txt
                + "\n== executedPlan (pre-execution, AQE initial) ==\n"
                + executed)
    total = round(sum(r["best"] for r in results.values()), 3)
    print(f"TOTAL best-of-{args.reps}: {total}s over {len(results)} queries")
    if args.out:
        Path(args.out).write_text(json.dumps(
            {"total": total, "queries": results}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
