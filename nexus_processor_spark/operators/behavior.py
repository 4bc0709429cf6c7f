"""Behavioral / product-analytics operators over event streams.

Funnel conversion, ordered event-sequence mining, and cohort retention —
the event-table workloads that sit next to time-slicing in any analytics
engine. All are DataFrame compositions with scale-safe shapes:

* Funnels chain per-user aggregates (one shuffle on the user key per
  step; each step's input is pre-filtered to its event type, so the
  heavy table is scanned once per step with partial aggregation).
* Sequences are one user-partitioned window pass + a count aggregate.
* Retention is two aggregates on (user) then (cohort, offset).

Time contract: ``ts`` is the long-nanosecond event time (see
sources/tables.load_table); week arithmetic is exact integer division,
bit-identical to the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS_PER_WEEK = 7 * 24 * 3600 * 10**9


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user reaches step k when an event of
    ``steps[k]`` happens AFTER their first event of step k-1.

    Returns one row per step: ``(stage long, step string, n_users long)``
    with n_users monotonically non-increasing.

    ONE scan and ONE user-key shuffle for any number of steps: the
    chained "first event of step k strictly after the user's step-k-1
    time" is a sequence of conditional-min WINDOW expressions over the
    same unordered user partition (each references the previous stage's
    column, so Catalyst stacks Window operators without new exchanges),
    collapsed to one row per user, counted in a single final aggregate.
    The earlier per-stage form (min-aggregate joined to the previous
    stage's firsts, one count branch per stage) re-executed every prior
    stage's lineage per branch — k(k+1)/2 scans of the event table for
    a k-step funnel (6 scans for 3 steps, visible in the plan).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("k"),
    ).filter(F.col("k").isin(list(steps)))
    w = Window.partitionBy("u")
    df = e
    prev: str | None = None
    for i, step in enumerate(steps):
        cond = F.col("k") == step
        if prev is not None:
            # strict order: only events after the previous stage's first
            # time count (null t_prev => user never reached stage i-1,
            # the comparison is null and the min sees nothing)
            cond = cond & (F.col("t") > F.col(prev))
        df = df.withColumn(
            f"_t{i}", F.min(F.when(cond, F.col("t"))).over(w))
        prev = f"_t{i}"
    stage_cols = [f"_t{i}" for i in range(len(steps))]
    # per-user collapse runs on the window's partitioning (no exchange);
    # the final count is one tiny single-row aggregate
    per_user = df.groupBy("u").agg(
        *[F.max(c).alias(c) for c in stage_cols])
    counts = per_user.agg(
        *[F.count(c).alias(f"_c{i}") for i, c in enumerate(stage_cols)])
    stages = F.array(*[
        F.struct(
            F.lit(i + 1).cast("long").alias("stage"),
            F.lit(step).alias("step"),
            F.col(f"_c{i}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ])
    return counts.select(F.explode(stages).alias("_s")).select(
        "_s.stage", "_s.step", "_s.n_users")


def event_sequences(
    events: DataFrame,
    *,
    n: int = 3,
    top_k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most frequent length-``n`` event-type sequences across users.

    One window pass per user ordered by (ts, event_id) — the unique-id
    tiebreak makes the sequences deterministic under timestamp ties —
    then a count aggregate and a deterministic top-k
    (count desc, sequence asc). Output: ``(sequence string, n long)``.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    seq = F.concat_ws(">", *steps)
    complete = F.lead(type_col, n - 1).over(w).isNotNull()
    return (
        events.select(seq.alias("sequence"), complete.alias("_full"))
        .filter("_full")
        .groupBy("sequence")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "sequence")
        .limit(top_k)
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention matrix in long form.

    A user's cohort is the epoch-week of their FIRST event; the matrix
    counts distinct users active at each whole-week offset from that
    cohort. ONE data-scale shuffle: per-user ``min(week)`` and the
    distinct week set aggregate together on the user key (the week set
    is bounded by the retention horizon — tens of values — so the
    ``collect_set`` state stays tiny), then the exploded (user, week)
    pairs — already unique by construction — count straight into the
    matrix cells. The earlier distinct + first-week join formulation
    cost three exchanges and ran 1.7x slower at 100M events.
    Output: ``(cohort_week long, week_offset long, n_users long)``.
    """
    # `div` (exact long integer division) — a double `/` would round:
    # nanosecond epochs exceed 2^53.
    weeks = events.select(
        F.col(user_col).alias("u"),
        F.expr(f"`{ts_col}` div {NS_PER_WEEK}L").alias("w"),
    )
    per_user = weeks.groupBy("u").agg(
        F.min("w").alias("w0"), F.collect_set("w").alias("ws")
    )
    out = (
        per_user.select("w0", F.explode("ws").alias("w"))
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("week_offset") <= max_offset)
    return out
