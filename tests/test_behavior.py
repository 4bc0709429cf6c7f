"""Behavioral operator semantics on handcrafted event streams."""

from __future__ import annotations

from nexus_processor_spark.operators import behavior

NS = 10**9
WEEK = behavior.NS_PER_WEEK


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, k) for i, (u, t, k) in enumerate(rows)],
        "event_id long, user_id long, ts long, event_type string",
    )


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1 converts fully in order
        (1, 10 * NS, "view"), (1, 20 * NS, "click"), (1, 30 * NS, "purchase"),
        # user 2 clicks BEFORE viewing -> stops at stage 1
        (2, 10 * NS, "click"), (2, 20 * NS, "view"),
        # user 3 views then purchases with no click -> stops at stage 1
        (3, 10 * NS, "view"), (3, 20 * NS, "purchase"),
        # user 4 never views -> not even stage 1
        (4, 10 * NS, "click"), (4, 20 * NS, "purchase"),
    ]
    res = behavior.funnel_stages(
        _events(spark, rows), ["view", "click", "purchase"]
    )
    got = {r["step"]: r["n_users"] for r in res.collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_simultaneous_event_does_not_count(spark):
    # click at the SAME instant as the first view is not "after" it
    rows = [(1, 10 * NS, "view"), (1, 10 * NS, "click")]
    res = behavior.funnel_stages(_events(spark, rows), ["view", "click"])
    got = {r["step"]: r["n_users"] for r in res.collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_counts_monotone_on_testdata(spark):
    from nexus_processor_spark.queries.behavior_q import q_funnel_stages

    rows = sorted(
        q_funnel_stages(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["stage"],
    )
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0


def test_event_sequences_orders_by_time_and_id(spark):
    rows = [
        (1, 10 * NS, "a"), (1, 20 * NS, "b"), (1, 30 * NS, "c"),
        (1, 40 * NS, "d"),
        (2, 10 * NS, "a"), (2, 20 * NS, "b"), (2, 30 * NS, "c"),
    ]
    res = behavior.event_sequences(_events(spark, rows), n=3, top_k=10)
    got = [(r["sequence"], r["n"]) for r in res.collect()]
    assert got[0] == ("a>b>c", 2)
    assert ("b>c>d", 1) in got
    # only complete trigrams count: a>b>c twice + b>c>d once
    assert sum(n for _, n in got) == 3


def test_sequences_tie_broken_by_event_id(spark):
    # same timestamp: event_id order decides the path
    df = spark.createDataFrame(
        [(2, 1, 10 * NS, "b"), (1, 1, 10 * NS, "a"), (3, 1, 20 * NS, "c")],
        "event_id long, user_id long, ts long, event_type string",
    )
    res = behavior.event_sequences(df, n=3, top_k=5)
    assert [r["sequence"] for r in res.collect()] == ["a>b>c"]


def test_cohort_retention_offsets(spark):
    rows = [
        (1, 0 * WEEK + 5 * NS, "x"),      # cohort week 0
        (1, 2 * WEEK + 5 * NS, "x"),      # active again week 2
        (2, 0 * WEEK + 9 * NS, "x"),      # cohort week 0, never returns
        (3, 1 * WEEK + 5 * NS, "x"),      # cohort week 1
        (3, 1 * WEEK + 6 * NS, "x"),      # same week -> one cell
    ]
    res = behavior.cohort_retention(_events(spark, rows))
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in res.collect()}
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1}


def test_cohort_max_offset_filter(spark):
    rows = [(1, 0 * WEEK, "x"), (1, 5 * WEEK, "x")]
    res = behavior.cohort_retention(_events(spark, rows), max_offset=3)
    assert {r["week_offset"] for r in res.collect()} == {0}
