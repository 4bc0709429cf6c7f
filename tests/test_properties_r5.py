"""Randomized bulk invariants for the round-5 operator families:
SCD2 stream/batch parity, CDC extraction round-trip, EWMA bit-parity
with a Python reference, MMR greedy invariants, linkage best-match
optimality, temporal-join partitioning."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nexus_processor_spark.operators import linkage, scd, smoothing
from nexus_processor_spark.sources import snapshots
from nexus_processor_spark.streaming import cdc

LOG = "id long, status string, price double, seq long"


def _random_log(rng, n_keys=40, n_events=300):
    rows = []
    seqs = rng.choice(np.arange(n_events * 3), size=n_events, replace=False)
    for i in range(n_events):
        rows.append((
            int(rng.integers(0, n_keys)),
            str(rng.choice(["a", "b", "c"])) if rng.random() > 0.1 else None,
            float(rng.integers(0, 4)),
            int(seqs[i]),
        ))
    return rows


def _hist_set(df):
    return {
        (r.id, r.status, r.price, r.valid_from, r.valid_to, r.is_current)
        for r in df.collect()
    }


def test_scd2_apply_parity_random_logs_bulk(spark):
    """Incremental apply over ANY seq-ordered batch split equals the
    full-log build — including null attrs and duplicate versions."""
    rng = np.random.default_rng(123)
    for trial in range(3):
        rows = _random_log(rng)
        full = spark.createDataFrame(rows, LOG)
        cuts = sorted(rng.choice(np.arange(1, 900), 2, replace=False))
        hist = None
        for lo, hi in [(-1, cuts[0]), (cuts[0], cuts[1]), (cuts[1], 10**9)]:
            b = full.filter((F.col("seq") > lo) & (F.col("seq") <= hi))
            hist = scd.scd2_apply(hist, b, "id", "seq")
        assert _hist_set(hist) == _hist_set(
            scd.scd2_history(full, "id", "seq")
        ), f"trial {trial}"


def test_extract_changes_roundtrip_random_bulk(spark, tmp_path):
    """apply(old, extract(old, new)) == new for random overlapping
    tables with value changes, adds, drops, and nulls."""
    rng = np.random.default_rng(7)
    mk = lambda keys: [
        (int(k),
         str(rng.choice(["x", "y"])) if rng.random() > 0.15 else None,
         float(rng.integers(0, 3)))
        for k in keys
    ]
    old_keys = rng.choice(np.arange(200), 120, replace=False)
    new_keys = rng.choice(np.arange(200), 120, replace=False)
    old = spark.createDataFrame(mk(old_keys), "id long, v string, x double")
    new = spark.createDataFrame(mk(new_keys), "id long, v string, x double")
    t = str(tmp_path / "rt")
    snapshots.write_snapshot(old, t, mode="overwrite", stats_cols=("id",))
    ch = cdc.extract_changes(old, new, "id")
    cdc.apply_cdc_batch(spark, t, ch, "id", delete_col="deleted")
    got = {tuple(r) for r in snapshots.read_snapshot(spark, t).collect()}
    want = {tuple(r) for r in new.collect()}
    assert got == want
    # minimality: a key identical in both versions emits NO change row
    # (null-unsafe semi join undercounts null-identical rows, which is
    # conservative — they must also be absent, checked by the subset)
    unchanged_in_ch = (
        old.join(new, ["id", "v", "x"], "semi")
        .join(ch.select("id"), "id", "semi").count()
    )
    assert unchanged_in_ch == 0
    assert ch.count() <= new.count() + old.count()


def test_ewma_matches_python_reference_bulk(spark):
    """Bit-exact parity with an independent Python loop over random
    multi-group series with nulls (the cross-engine-exactness claim the
    unrounded oracle rests on)."""
    rng = np.random.default_rng(11)
    rows, ref = [], {}
    for g in range(6):
        state = None
        for t in range(80):
            x = None if rng.random() < 0.15 else \
                round(float(rng.normal(10, 3)), 6)
            rows.append((f"g{g}", t, x))
            if x is not None:
                state = x if state is None else 0.25 * x + 0.75 * state
            ref[(f"g{g}", t)] = state
    df = spark.createDataFrame(rows, "g string, t long, x double")
    got = {(r.g, r.t): r.ewma
           for r in smoothing.ewma(df, ["g"], "t", "x", 0.25).collect()}
    assert got == ref  # exact equality, None included


def test_mmr_greedy_invariants_bulk(spark):
    """Rank-1 equals the relevance argmax; picked ids are distinct and
    drawn from the fetch_m candidates; selection scores are
    non-increasing in rank (each round every remaining candidate's
    score can only fall as the penalty max grows)."""
    from nexus_processor_spark.operators import similarity

    rng = np.random.default_rng(5)
    corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)])
         for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    q = corpus.filter(F.col("vec_id") < 2)
    cand = similarity.brute_force_topk(q, corpus, 12)
    top = {(r.query_id, r.vec_id) for r in cand.collect()}
    rank1 = {r.query_id: r.vec_id
             for r in cand.filter("rank = 1").collect()}
    rows = similarity.mmr_topk(q, corpus, 5, fetch_m=12).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert rs[0].vec_id == rank1[qid]
        ids = [r.vec_id for r in rs]
        assert len(set(ids)) == len(ids) == 5
        assert all((qid, v) in top for v in ids)
        scores = [r.mmr_score_e7 for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


def test_linkage_best_match_is_argmax_bulk(spark):
    """best_matches returns exactly the (max score, min b_key) row per
    a_key among the >= threshold candidates."""
    rng = np.random.default_rng(3)
    rows = [(int(a), int(rng.integers(0, 50)), int(rng.integers(-3, 8)))
            for a in rng.integers(0, 25, size=400)]
    scored = spark.createDataFrame(rows, "a_key long, b_key long, score long")
    got = {r.a_key: (r.b_key, r.score)
           for r in linkage.best_matches(scored, 3).collect()}
    want: dict = {}
    for a, b, s in rows:
        if s < 3:
            continue
        cur = want.get(a)
        if cur is None or (s, -b) > (cur[1], -cur[0]):
            want[a] = (b, s)
    assert got == want


def test_temporal_join_partition_property_bulk(spark):
    """Every fact matches AT MOST one version, and the matched version
    contains the fact's time."""
    rng = np.random.default_rng(17)
    log = spark.createDataFrame(
        _random_log(rng, n_keys=20, n_events=120), LOG)
    hist = scd.scd2_history(log, "id", "seq")
    facts = spark.createDataFrame(
        [(int(i), int(rng.integers(0, 20)), int(rng.integers(0, 400)))
         for i in range(300)],
        "fact_id long, id long, at long",
    )
    j = scd.temporal_join(facts, hist, "id", "at").collect()
    seen = set()
    for r in j:
        assert r.fact_id not in seen  # at most one version
        seen.add(r.fact_id)
        assert r.valid_from <= r.at
        assert r.valid_to is None or r.at < r.valid_to
