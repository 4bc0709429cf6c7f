"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY.md §2.9) — this extends
the replay layer with the canonical accumulator shape: per-key running
totals that survive across micro-batches through the state store. The
pattern here (Arrow-batched state handler, explicit state schema, eviction
by timeout) is the template for any custom operator Spark's built-in
windowed aggregations can't express.

Scale notes: state is partitioned by the grouping key across the cluster
(one HDFS/RocksDB-backed store per shuffle partition); a key's state is a
fixed-width tuple here, so store size is O(distinct keys), not O(events).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType([
    # nullable: the input bank column is nullable (EVENTS_SCHEMA), and a
    # null-bank group legitimately keys its own running totals
    StructField("bank", StringType(), True),
    StructField("batch_events", LongType(), True),
    StructField("total_events", LongType(), True),
    StructField("max_pulse_index", LongType(), True),
    StructField("total_weight", DoubleType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("total_events", LongType(), True),
    StructField("max_pulse_index", LongType(), True),
    StructField("total_weight", DoubleType(), True),
])


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    total, max_pulse, weight = (
        state.get if state.exists else (0, -1, 0.0)
    )
    batch = 0
    for pdf in pdfs:
        batch += len(pdf)
        total += len(pdf)
        if len(pdf):
            # pulse_index is nullable: an all-null chunk yields NaN from
            # max() and int(NaN) would kill the query — skip nulls, and
            # count/weight still accumulate for the rows
            mp = pdf["pulse_index"].dropna()
            if len(mp):
                max_pulse = max(max_pulse, int(mp.max()))
            weight += float(pdf["event_weight"].fillna(0.0).sum())
    state.update((total, max_pulse, weight))
    yield pd.DataFrame([{
        "bank": key[0],
        "batch_events": batch,
        "total_events": total,
        "max_pulse_index": max_pulse,
        "total_weight": weight,
    }])


def running_bank_totals(events: DataFrame) -> DataFrame:
    """Per-bank cumulative event statistics over an unbounded stream.

    Emits one row per (bank, micro-batch) with the batch delta and the
    running totals — the streaming twin of the batch per-bank summary
    (operators A8/A11), kept exactly consistent with it by tests.
    """
    return events.groupBy("bank").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUT_SCHEMA = StructType([
    StructField("series", StringType(), True),
    StructField("batch_rows", LongType(), True),
    StructField("last_t", DoubleType(), True),
    StructField("ewma", DoubleType(), True),
])

_EWMA_STATE_SCHEMA = StructType([
    StructField("state", DoubleType(), True),
    StructField("last_t", DoubleType(), True),
])


def _make_ewma_updater(alpha: float):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cur, last_t = state.get if state.exists else (None, None)
        if cur is not None and pd.isna(cur):
            cur = None
        n = 0
        for pdf in pdfs:
            pdf = pdf.sort_values("t")
            n += len(pdf)
            for t, x in zip(pdf["t"], pdf["x"]):
                if pd.isna(x):
                    continue
                # late rows (t <= last seen) are DROPPED, not folded out
                # of order: the recurrence is order-sensitive and the
                # state cannot be rewound — the same in-order contract
                # every streaming recurrence carries
                if last_t is not None and t <= last_t:
                    continue
                x = float(x)
                cur = x if cur is None else \
                    alpha * x + (1.0 - alpha) * cur
                last_t = float(t)
        state.update((cur, last_t))
        yield pd.DataFrame([{
            "series": key[0],
            "batch_rows": n,
            "last_t": last_t,
            "ewma": cur,
        }])

    return _update


def running_ewma(points: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Streaming EWMA per series through the state store: one
    fixed-width (state, last_t) tuple per key survives across
    micro-batches, each batch folds its in-order points through the
    same ``alpha*x + (1-alpha)*s`` recurrence as the batch operator
    (``operators/smoothing.ewma`` — cross-drain equality test-pinned),
    and late (t <= last seen) or null points are skipped, never folded
    out of order. Input columns: ``series``, ``t``, ``x``. Emits one
    row per (series, micro-batch) with the post-batch state.

    Scale: state is O(distinct series) fixed-width tuples partitioned
    by key — never O(points)."""
    return points.groupBy("series").applyInPandasWithState(
        _make_ewma_updater(alpha),
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CLOSED_SESSION_SCHEMA = StructType([
    StructField("user", StringType(), True),
    StructField("session_start", DoubleType(), True),
    StructField("session_end", DoubleType(), True),
    StructField("n_events", LongType(), True),
])

_SESSION_STATE_SCHEMA = StructType([
    StructField("start", DoubleType(), True),
    StructField("last", DoubleType(), True),
    StructField("n", LongType(), True),
])


def _make_session_updater(gap_seconds: float):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start, last, n):
            return {
                "user": key[0], "session_start": start,
                "session_end": last, "n_events": n,
            }

        if state.hasTimedOut:
            # the watermark passed last+gap with no new event: the
            # late-data-safe close — no in-watermark straggler can
            # reopen this session anymore
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n)])
            return
        start, last, n = state.get if state.exists else (None, None, 0)
        ts: list[float] = []
        for pdf in pdfs:
            for t in pdf["event_time"]:
                if not pd.isna(t):
                    ts.append(t.timestamp())
        closed: list[dict] = []
        for t in sorted(ts):
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_seconds:
                closed.append(row(start, last, n))
                start, last, n = t, t, 1
            else:
                # cross-batch stragglers inside the watermark fold into
                # the OPEN session (extending it backward if needed) —
                # the conservative late policy; anything older is
                # already behind the watermark and dropped upstream
                if t < start:
                    start = t
                last = max(last, t)
                n += 1
        state.update((start, last, n))
        # close via event-time timeout once the watermark passes
        # last+gap; if this batch itself advanced the watermark past
        # that point, arm the earliest legal timeout instead — the
        # no-data batch that follows fires it
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(int((last + gap_seconds) * 1000), wm_ms + 1))
        if closed:
            yield pd.DataFrame(closed)

    return _update


def closed_sessions(
    events: DataFrame,
    gap_seconds: float,
    *,
    key_col: str = "user_id",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful operator, emitting
    each session exactly once — when it CLOSES (a later event opens the
    next session, or the event-time timeout fires once the watermark
    passes ``last + gap``). This is the state-eviction pattern
    ``F.session_window`` implements internally, written out on
    ``applyInPandasWithState`` + ``GroupStateTimeout.EventTimeTimeout``
    — the template for stateful operators whose close condition the
    built-in windows can't express (the batch twin is
    ``operators.asof.sessionize``; drained-stream equality on closed
    sessions is test-pinned).

    Scale: state is one fixed-width (start, last, n) tuple per ACTIVE
    key — closed sessions leave the store immediately via emit+remove,
    so store size tracks concurrently-open sessions, not history.

    Output (append mode): ``user, session_start, session_end,
    n_events`` with epoch-second doubles, closed sessions only.
    """
    keyed = events.select(
        F.col(key_col).cast("string").alias("user"),
        F.col(time_col).alias("event_time"),
    ).withWatermark("event_time", watermark)
    return keyed.groupBy("user").applyInPandasWithState(
        _make_session_updater(float(gap_seconds)),
        outputStructType=CLOSED_SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
