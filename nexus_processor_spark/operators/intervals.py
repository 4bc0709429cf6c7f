"""Interval-overlap joins — range predicates without the crossJoin.

Spark turns a bare ``ON l.start < r.end AND r.start < l.end`` into
BroadcastNestedLoopJoin/cartesian unless one side fits a broadcast.
The scale path here is the standard *grid bucketization*: every
interval is exploded onto the coarse grid cells it touches
(``sequence(floor(start/grid), floor((end-eps)/grid))``), the join runs
as a hash equi-join on the cell, and the exact overlap predicate
filters the candidates. A pair that shares k cells would appear k
times, so the join keeps only the *first* shared cell
(``cell == greatest(floor(l.start/grid), floor(r.start/grid))``) —
exactly-once without a ``distinct`` shuffle.

Cost: |cells| ~ len(interval)/grid per row; pick ``grid`` near the
typical interval length so the explode factor stays O(1). Cells are
fine-grained hash keys, so skew stays bounded even when intervals pile
into one region of the timeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(start: Column, end: Column, grid: float) -> Column:
    """Grid cells [floor(start/grid) .. hi] covering a half-open
    [start, end); empty/negative intervals yield no cells (an empty
    interval has empty intersection with everything — callers wanting
    point semantics should widen, as ``point_in_interval_join`` does).

    The end cell is computed EXACTLY — ``hi = floor(end/grid)``, minus
    one iff ``end`` sits precisely on a cell boundary — never via an
    epsilon subtraction: an absolute eps both drops pairs whose overlap
    is smaller than eps and silently becomes a no-op when ``end - eps
    == end`` at epoch-second float magnitudes."""
    lo = F.floor(start / F.lit(grid)).cast("long")
    fe = F.floor(end / F.lit(grid)).cast("long")
    hi = F.when(end == fe.cast("double") * F.lit(grid), fe - 1).otherwise(fe)
    return F.when(end > start, F.sequence(lo, F.greatest(lo, hi)))


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    grid: float,
) -> DataFrame:
    """Inner join of overlapping half-open intervals:
    ``l_start < r_end AND r_start < l_end`` — grid-bucketed hash join,
    each qualifying pair emitted exactly once. Output carries all
    columns of both inputs (names must not collide)."""
    lc = left.withColumn(
        "_cell", F.explode(_cells(F.col(l_start), F.col(l_end), grid))
    )
    rc = right.withColumn(
        "_cell", F.explode(_cells(F.col(r_start), F.col(r_end), grid))
    )
    first_shared = F.greatest(
        F.floor(F.col(l_start) / F.lit(grid)).cast("long"),
        F.floor(F.col(r_start) / F.lit(grid)).cast("long"),
    )
    return (
        lc.join(rc, on="_cell", how="inner")
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (F.col("_cell") == first_shared)
        )
        .drop("_cell")
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    time_col: str,
    start_col: str,
    end_col: str,
    grid: float,
) -> DataFrame:
    """Each point joined to every half-open interval containing it —
    the degenerate overlap join with a single-cell left side (no
    explode on the big side, so the fact table is never inflated)."""
    pc = points.withColumn(
        "_cell", F.floor(F.col(time_col) / F.lit(grid)).cast("long")
    )
    ic = intervals.withColumn(
        "_cell", F.explode(_cells(F.col(start_col), F.col(end_col), grid))
    )
    return (
        pc.join(ic, on="_cell", how="inner")
        .filter(
            (F.col(time_col) >= F.col(start_col))
            & (F.col(time_col) < F.col(end_col))
        )
        .drop("_cell")
    )
