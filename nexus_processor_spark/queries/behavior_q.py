"""Behavioral analytics queries over the events table, DuckDB-paired.

Funnel / sequence / retention semantics are defined by
``operators/behavior.py``; the oracles mirror them with window + CTE
SQL. Week arithmetic is exact long division on nanoseconds in Spark and
``epoch_us(ts) * 1000 // ns_per_week`` in DuckDB — bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.operators import behavior
from nexus_processor_spark.sources.tables import load_table, ts_ns_sql

FUNNEL_STEPS = ["view", "click", "purchase"]
SEQ_N = 3
SEQ_TOP_K = 20
NS_PER_WEEK = behavior.NS_PER_WEEK


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel view -> click -> purchase (per-user chained
    min aggregates; k shuffles on the user key, no raw self-joins)."""
    return behavior.funnel_stages(
        load_table(spark, sf_dir, "events"), FUNNEL_STEPS
    )


def q_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top length-3 event-type paths across users (one window pass,
    unique-id tiebreak, deterministic top-k)."""
    return behavior.event_sequences(
        load_table(spark, sf_dir, "events"), n=SEQ_N, top_k=SEQ_TOP_K
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (cohort = first-event epoch-week)."""
    return behavior.cohort_retention(load_table(spark, sf_dir, "events"))


QUERIES = {
    "funnel_stages": q_funnel_stages,
    "event_sequences": q_event_sequences,
    "cohort_retention": q_cohort_retention,
}

_E_NS = ts_ns_sql()  # encoding-aware: raw long nanos or epoch_us*1000

ORACLE = {
    "funnel_stages": f"""
        WITH e AS (SELECT user_id AS u, {_E_NS} AS t, event_type AS k
                   FROM events),
        s1 AS (SELECT u, min(t) AS tp FROM e WHERE k = 'view' GROUP BY u),
        s2 AS (SELECT e.u, min(t) AS tp FROM e JOIN s1 USING (u)
               WHERE k = 'click' AND t > s1.tp GROUP BY e.u),
        s3 AS (SELECT e.u, min(t) AS tp FROM e JOIN s2 USING (u)
               WHERE k = 'purchase' AND t > s2.tp GROUP BY e.u)
        SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
               CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
        UNION ALL
        SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
        UNION ALL
        SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT)
    """,
    "event_sequences": f"""
        WITH o AS (
            SELECT event_type || '>' || lead(event_type, 1) OVER w
                   || '>' || lead(event_type, 2) OVER w AS sequence,
                   lead(event_type, {SEQ_N - 1}) OVER w IS NOT NULL AS filled
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT sequence, CAST(count(*) AS BIGINT) AS n
        FROM o WHERE filled
        GROUP BY 1 ORDER BY n DESC, sequence LIMIT {SEQ_TOP_K}
    """,
    "cohort_retention": f"""
        WITH weeks AS (
            SELECT DISTINCT user_id AS u, {_E_NS} // {NS_PER_WEEK} AS w
            FROM events
        ),
        first AS (SELECT u, min(w) AS w0 FROM weeks GROUP BY u)
        SELECT w0 AS cohort_week, w - w0 AS week_offset,
               CAST(count(DISTINCT u) AS BIGINT) AS n_users
        FROM weeks JOIN first USING (u)
        GROUP BY 1, 2
    """,
}
