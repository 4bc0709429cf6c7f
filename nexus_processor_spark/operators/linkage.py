"""Entity resolution (record linkage): blocked candidate pairs, field
scoring, best-match selection.

The warehouse workload of reconciling two registries that describe the
same entities with drifted attributes (a re-ingested run catalog, a
vendor customer file): exact joins miss every perturbed row, and the
all-pairs comparison space is n² — the classic answer is BLOCKING
(compare only within cheap stable keys) plus a Fellegi-Sunter-style
additive field score, and that is exactly the shuffle shape Spark
rewards: one equi-join on the block key, map-side scoring, one argmax
groupBy.

Deterministic by construction: field weights are integers, string
similarity is plain Levenshtein (identical in Spark and DuckDB), so the
whole pipeline is oracle-checkable — no trained weights, no FP drift.
Weights follow the Fellegi-Sunter log-likelihood sign convention
(agreement adds, disagreement subtracts); calibrate them offline.

100 TB: the pair space is bounded per block (``max_block`` drops
oversized blocks, the same valve as the dedup family — an unusably
common block key is a data-quality bug, not a compare workload);
nothing row-scale is ever collected or windowed unpartitioned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def field_rule(
    col: str,
    kind: str = "exact",
    *,
    w_match: int = 1,
    w_miss: int = -1,
    w_near: int | None = None,
    max_edit: int = 2,
    tol: float = 0.0,
) -> dict:
    """One comparison rule: ``exact`` (equality), ``levenshtein``
    (exact -> ``w_match``, edit distance <= ``max_edit`` -> ``w_near``,
    else ``w_miss``), or ``numeric`` (absolute difference <= ``tol``).
    Null on either side scores ``w_miss`` (a missing attribute is
    evidence against, never a silent skip)."""
    if kind not in ("exact", "levenshtein", "numeric"):
        raise ValueError(f"unknown field rule kind {kind!r}")
    return {
        "col": col, "kind": kind, "w_match": w_match, "w_miss": w_miss,
        "w_near": w_match if w_near is None else w_near,
        "max_edit": max_edit, "tol": tol,
    }


def _rule_score(rule: dict) -> Column:
    ca, cb = F.col(f"a_{rule['col']}"), F.col(f"b_{rule['col']}")
    if rule["kind"] == "exact":
        hit = ca.eqNullSafe(cb) & ca.isNotNull()
        return F.when(hit, F.lit(rule["w_match"])) \
                .otherwise(F.lit(rule["w_miss"]))
    if rule["kind"] == "numeric":
        hit = F.abs(ca - cb) <= F.lit(rule["tol"])
        return F.when(hit, F.lit(rule["w_match"])) \
                .otherwise(F.lit(rule["w_miss"]))
    return (
        F.when(ca.isNull() | cb.isNull(), F.lit(rule["w_miss"]))
        .when(ca == cb, F.lit(rule["w_match"]))
        .when(F.levenshtein(ca, cb) <= F.lit(rule["max_edit"]),
              F.lit(rule["w_near"]))
        .otherwise(F.lit(rule["w_miss"]))
    )


def block_and_score(
    a: DataFrame,
    b: DataFrame,
    key_a: str,
    key_b: str,
    block_cols: list[str],
    rules: list[dict],
    *,
    max_block: int = 4096,
) -> DataFrame:
    """Candidate pairs from the block equi-join, scored additively.

    Each side is capped at ``max_block`` rows per block value BEFORE the
    join (oversized blocks drop entirely — bounded within-block fanout
    at any corpus size). Compared columns surface as ``a_<col>`` /
    ``b_<col>``; output adds the integer ``score``.
    """
    def prep(df: DataFrame, key: str, tag: str) -> DataFrame:
        need = {key, *block_cols, *(r["col"] for r in rules)}
        out = df.select(*need)
        from pyspark.sql import Window

        w = Window.partitionBy(*block_cols)
        out = (
            out.withColumn("_n", F.count(F.lit(1)).over(w))
            .filter(F.col("_n") <= max_block)
            .drop("_n")
        )
        renames = [F.col(c).alias(c) for c in block_cols]
        renames += [F.col(key).alias(f"{tag}_key")]
        renames += [
            F.col(r["col"]).alias(f"{tag}_{r['col']}") for r in rules
        ]
        return out.select(*renames)

    pa, pb = prep(a, key_a, "a"), prep(b, key_b, "b")
    score = F.lit(0)
    for r in rules:
        score = score + _rule_score(r)
    return (
        pa.join(pb, block_cols)
        .withColumn("score", score.cast("long"))
    )


def best_matches(
    scored: DataFrame,
    threshold: int,
) -> DataFrame:
    """One winning b-record per a-record: highest score, lowest
    ``b_key`` tiebreak, kept only at/above ``threshold`` (unmatched
    a-records emit nothing). ``max(struct)`` groupBy — map-side partial
    max; only (a_key, score, b_key) triples shuffle."""
    return (
        scored.filter(F.col("score") >= F.lit(threshold))
        .groupBy("a_key")
        .agg(
            F.max(
                F.struct(
                    F.col("score").alias("s"),
                    (-F.col("b_key")).alias("nb"),
                )
            ).alias("_m")
        )
        .select(
            "a_key",
            (-F.col("_m.nb")).alias("b_key"),
            F.col("_m.s").alias("score"),
        )
    )
