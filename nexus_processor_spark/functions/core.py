"""Scalar function surface (SURVEY.md §2.8, F1-F13) as native expressions.

The reference implements these as driver-side Python helpers
(src/nexus_processor/schemas.py:302-382, src/nexus_processor/parquet.py:90-137);
here each is a Column-in/Column-out builder over built-in
``pyspark.sql.functions`` so everything stays inside whole-stage codegen —
no Python UDFs anywhere on the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICROS_PER_SECOND = 1_000_000


def make_run_id(instrument_id: Column | str, run_number: Column | str) -> Column:
    """``"INSTRUMENT:12345"`` composite run key.

    Mirrors ``make_run_id`` (reference src/nexus_processor/parquet.py:126-137):
    colon-separated so the pair survives round-trips through a single string.
    """
    inst = F.col(instrument_id) if isinstance(instrument_id, str) else instrument_id
    run = F.col(run_number) if isinstance(run_number, str) else run_number
    return F.concat_ws(":", inst.cast("string"), run.cast("string"))


def run_id_to_filename(run_id: Column | str) -> Column:
    """Filesystem-safe form: ``INSTRUMENT_12345`` (reference
    scripts/spark_events_by_time_parquet.py:71)."""
    c = F.col(run_id) if isinstance(run_id, str) else run_id
    return F.translate(c, ":", "_")


def run_id_from_filename(name: Column | str) -> Column:
    """Inverse of :func:`run_id_to_filename` (first ``_`` only would be
    ambiguous; the reference's instrument ids never contain ``_`` before the
    run number, so a last-underscore split is exact)."""
    c = F.col(name) if isinstance(name, str) else name
    return F.concat_ws(
        ":",
        F.regexp_extract(c, r"^(.*)_([0-9]+)$", 1),
        F.regexp_extract(c, r"^(.*)_([0-9]+)$", 2),
    )


def try_parse_numeric(value: Column | str) -> Column:
    """String-or-number -> double-or-null, never throws.

    Reference ``try_parse_numeric`` (schemas.py:302-321) powers the
    dual-encoded DAS log values (``value`` string + ``value_numeric``).
    """
    c = F.col(value) if isinstance(value, str) else value
    return c.try_cast("double")


def to_attribute_map(prefix: str, *pairs: tuple[str, Column]) -> Column:
    """Build a ``map<string,string>`` attribute bag from (key, col) pairs,
    dropping null values — the engine-side analog of ``build_attribute_map``
    (reference schemas.py:346-364)."""
    entries: list[Column] = []
    for key, col in pairs:
        entries.append(F.lit(key.removeprefix(prefix)))
        entries.append(col.cast("string"))
    return F.map_filter(F.create_map(*entries), lambda _, v: v.isNotNull())


def event_micros(ts_nanos: Column | str) -> Column:
    """Long microseconds from a long nanosecond timestamp: exact
    ``floor(ns / 1000)`` in pure long/small-double codegen.

    Never plain ``/`` on the raw value (double division loses precision
    for 2024-epoch nanos, > 2**53) and not decimal division (exact but
    ~4x slower in the scan loop — measured on a 100M-row bench). Instead,
    split at bit 30: ``ns = hi·2^30 + lo`` with ``hi = ns >> 30``
    (arithmetic shift = floor, so negatives work) and ``lo`` the low 30
    bits (always non-negative). Then

        floor(ns/1000) = hi·(2^30 div 1000) + floor((hi·(2^30 mod 1000) + lo)/1000)
                       = hi·1073741         + floor((hi·824 + lo)/1000)

    where ``hi·824 + lo`` < 2^44 — exactly representable as a double, and
    a double quotient that near an integer can't floor wrong (non-integer
    quotients sit >= 1/1000 from an integer, far above rounding error).
    Verified bit-equal to decimal floor-division over hostile boundaries
    and a 20M-value random 64-bit sweep.
    """
    c = F.col(ts_nanos) if isinstance(ts_nanos, str) else ts_nanos
    hi = F.shiftright(c, 30)
    lo = c.bitwiseAND(F.lit((1 << 30) - 1))
    return hi * F.lit(1073741) + F.floor((hi * F.lit(824) + lo) / F.lit(1000)).cast("long")


def event_seconds(ts_nanos: Column | str) -> Column:
    """Exact seconds-as-double from a long nanosecond timestamp.

    Integer-divide to microseconds first, then one correctly-rounded double
    division — bit-identical to DuckDB's ``epoch(timestamp)`` (µs/1e6) for
    any input without sub-microsecond content.
    """
    return event_micros(ts_nanos) / F.lit(float(MICROS_PER_SECOND))


def event_timestamp(ts_nanos: Column | str) -> Column:
    """TimestampType (µs) from long nanos — for windowing / streaming ops."""
    return F.timestamp_micros(event_micros(ts_nanos))


def interval_floor(t_seconds: Column | str, interval_seconds: float) -> Column:
    """``floor(t / N)`` bucket id as long — the reference's tumbling window
    (scripts/spark_events_by_time.py:216-219). Half-open ``[kN, (k+1)N)``."""
    c = F.col(t_seconds) if isinstance(t_seconds, str) else t_seconds
    return F.floor(c / F.lit(float(interval_seconds))).cast("long")


def interval_bounds(interval: Column | str, interval_seconds: float) -> tuple[Column, Column]:
    """(interval_start, interval_end) doubles for a bucket id
    (reference spark_events_by_time.py:231-236)."""
    c = F.col(interval) if isinstance(interval, str) else interval
    n = F.lit(float(interval_seconds))
    return (c * n).cast("double"), ((c + F.lit(1)) * n).cast("double")
