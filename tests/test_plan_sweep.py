"""Whole-registry physical-plan hygiene sweep.

Every registered query's executed plan is checked for the three
scale-killers: CartesianProduct (unbounded pair space),
BatchEvalPython (row-at-a-time Python UDF on a hot path), and
unexpected BroadcastNestedLoopJoin. BNLJ is allowed only for the
queries that deliberately attach a BOUNDED broadcast relation — a
1-row scalar (corpus totals, quantile thresholds, time bounds), a
k-row centroid/codebook table, or a fixed band list — where a nested
loop over a handful of build rows is the correct plan.
"""

from __future__ import annotations

import pytest

from nexus_processor_spark import queries as registry

SF = "/root/testdata/sf0.001"

# Each of these broadcasts a bounded relation by construction:
#   1-row scalars: global_sales, mix_temperature, price_quantile_histogram,
#     quality_orders, quality_quantile, source_divergence, tfidf_top_terms,
#     timeslice_range, bm25_search (corpus stats), important_parts (totals)
#   k-row centroids/codebooks: kmeans_assign, kmeans_fit, pq_encode,
#     pq_topk, ivf_pq_topk, semantic_dedup, sim_brute_topk (query side),
#     sim_ivf_recall, text_semantic_topk
#   fixed band list: range_join_bands
#   bounded short-string block: edit_dist_pairs (partners of len <= 2k)
BNLJ_ALLOWED = {
    "edit_dist_pairs",
    "bm25_search", "global_sales", "important_parts", "ivf_pq_topk",
    "kmeans_assign", "kmeans_fit", "mix_temperature", "pq_encode",
    "pq_topk", "price_quantile_histogram", "quality_orders",
    "quality_quantile", "range_join_bands", "semantic_dedup",
    "sim_brute_topk", "sim_ivf_recall", "source_divergence",
    "text_semantic_topk", "tfidf_top_terms", "timeslice_range",
}


@pytest.mark.slow
def test_no_plan_antipatterns_across_registry(spark):
    qs = registry.queries()
    cartesian, py_udf, bnlj_new, errors = [], [], [], []
    for name, fn in sorted(qs.items()):
        try:
            plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a query failing to PLAN is itself a bug
            errors.append((name, str(e)[:120]))
            continue
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            py_udf.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            bnlj_new.append(name)
    assert not errors, errors
    assert not cartesian, f"cartesian products: {cartesian}"
    assert not py_udf, f"row-at-a-time Python UDFs: {py_udf}"
    assert not bnlj_new, (
        f"new BroadcastNestedLoopJoin in {bnlj_new}: if the build side is "
        "a bounded scalar/centroid/band relation, add to BNLJ_ALLOWED "
        "with a justification; otherwise fix the join"
    )
