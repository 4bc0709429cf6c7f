"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful streaming (SURVEY.md §2.9) — this extends
the replay layer with the canonical accumulator shape: per-key running
totals that survive across micro-batches through the state store. The
pattern here (Arrow-batched state handler, explicit state schema, eviction
by timeout) is the template for any custom operator Spark's built-in
windowed aggregations can't express.

Scale notes: state is partitioned by the grouping key across the cluster
(one HDFS/RocksDB-backed store per shuffle partition). The accumulator and
EWMA operators keep a fixed-width tuple per key, so their store size is
O(distinct keys), not O(events); the sessionizer keeps a variable-width
session buffer per key, bounded by watermark-delay/gap triples per ACTIVE
key (see ``closed_sessions``), never by history.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
    # CHECKPOINT COMPATIBILITY: this schema changed from a scalar
    # (start, last, n) triple to three arrays. A closed_sessions query
    # restarted from a checkpoint written by the old scalar schema fails
    # Spark's state-schema compatibility check — restart with a FRESH
    # checkpointLocation after upgrading.
    #
    # ALL not-yet-emittable sessions for the key, sorted by start,
    # pairwise separated by more than the gap: index i is the session
    # (starts[i], lasts[i], ns[i]). The newest is the open session; the
    # older ones are gap-closed but still inside the watermark, so an
    # in-watermark straggler may yet extend or bridge them — they buffer
    # here until the watermark passes last+gap (append-mode output can
    # never be retracted, so nothing is emitted before that point).
    StructField("starts", ArrayType(DoubleType()), True),
    StructField("lasts", ArrayType(DoubleType()), True),
    StructField("ns", ArrayType(LongType()), True),
])


def _fold_session_event(sessions: list[list], t: float, gap: float) -> None:
    """Insert event time ``t`` into the sorted, gap-separated session
    list IN PLACE: extend the session it lands within ``gap`` of, merge
    the two neighbors it bridges, or open a new session — exactly the
    split batch sessionize produces over the union of all folded
    events. Sessions are ``[start, last, n]`` sorted by start."""
    hits = [i for i, s in enumerate(sessions)
            if s[0] - gap <= t <= s[1] + gap]
    if not hits:
        bisect.insort(sessions, [t, t, 1])
    elif len(hits) == 1:
        s = sessions[hits[0]]
        s[0] = min(s[0], t)
        s[1] = max(s[1], t)
        s[2] += 1
    else:
        # t bridges adjacent sessions into one. The gap-separation
        # invariant means a single event can only ever hit two, but
        # merge EVERY hit (contiguous by construction) so corrupted or
        # hand-migrated state degrades to a valid merge instead of
        # silently leaving an overlapping list.
        i, j = hits[0], hits[-1]
        sessions[i] = [min(sessions[i][0], t),
                       max(sessions[j][1], t),
                       sum(sessions[k][2] for k in hits) + 1]
        del sessions[i + 1:j + 1]


def _make_session_updater(gap_seconds: float):
    def _update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(s):
            return {
                "user": key[0], "session_start": s[0],
                "session_end": s[1], "n_events": s[2],
            }

        if state.exists:
            starts, lasts, ns = state.get
            sessions = [list(s) for s in zip(starts, lasts, ns)]
        else:
            sessions = []
        if not state.hasTimedOut:
            # event times arrive pre-cast to epoch-second doubles by
            # Spark's own cast('double') — tz-exact and identical to
            # the batch twin regardless of spark.sql.session.timeZone
            # (pandas .timestamp() on the tz-naive rendering would
            # shift by the session-tz offset)
            for pdf in pdfs:
                for t in sorted(pdf["t_epoch"].dropna()):
                    _fold_session_event(sessions, float(t), gap_seconds)
        # a session is emittable only once NO in-watermark event can
        # still extend it: last + gap strictly before the watermark
        # (an event at exactly last+gap folds in, and an event at
        # exactly the watermark is still admitted)
        wm_ms = state.getCurrentWatermarkMs()
        wm_s = wm_ms / 1000.0
        closed = [s for s in sessions if s[1] + gap_seconds < wm_s]
        sessions = [s for s in sessions if s[1] + gap_seconds >= wm_s]
        if sessions:
            state.update((
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
            ))
            # wake when the earliest-closing buffered session becomes
            # emittable (lists are gap-separated so lasts are sorted);
            # Spark requires the timeout strictly beyond the watermark
            state.setTimeoutTimestamp(
                max(int((sessions[0][1] + gap_seconds) * 1000) + 1,
                    wm_ms + 1))
        else:
            state.remove()
        if closed:
            yield pd.DataFrame([row(s) for s in closed])

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
    each session exactly once — and only once the WATERMARK has passed
    ``last + gap``, the point after which no admissible event can still
    extend or bridge it. Gap-closed-in-batch sessions buffer in state
    until then (append-mode output can never be retracted; emitting on
    the in-batch gap alone would split a session a legal in-watermark
    straggler still belongs to), and a straggler older than the open
    session merges into whichever buffered session it lands within the
    gap of — bridging two into one when it falls between them — so the
    drained closed set equals batch sessionize over the same events
    even when the watermark delay is close to or above the gap. This is
    the state-eviction pattern ``F.session_window`` implements
    internally, written out on ``applyInPandasWithState`` +
    ``GroupStateTimeout.EventTimeTimeout`` — the template for stateful
    operators whose close condition the built-in windows can't express
    (the batch twin is ``operators.asof.sessionize``; drained-stream
    equality, including the straggler/backfold cases, is test-pinned).

    Epoch math happens in Spark (``cast('double')`` on the timestamp,
    tz-exact under any ``spark.sql.session.timeZone``) — never via
    pandas ``.timestamp()`` on the tz-naive rendering, which would
    shift every boundary by the session-tz offset.

    Scale: state is one (start, last, n) triple per session still
    inside the watermark horizon for each ACTIVE key — bounded by
    watermark-delay/gap per key, not history; emittable sessions leave
    the store at the next batch or event-time timeout.

    Output (append mode): ``user, session_start, session_end,
    n_events`` with epoch-second doubles, closed sessions only.
    """
    keyed = events.select(
        F.col(key_col).cast("string").alias("user"),
        F.col(time_col).alias("event_time"),
        F.col(time_col).cast("double").alias("t_epoch"),
    ).withWatermark("event_time", watermark)
    return keyed.groupBy("user").applyInPandasWithState(
        _make_session_updater(float(gap_seconds)),
        outputStructType=CLOSED_SESSION_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
