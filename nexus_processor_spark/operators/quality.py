"""Declarative data-quality expectations (deequ-style constraint suite).

The validation gate a training-data pipeline runs before promoting a
table: each expectation contributes one metric expression, ALL metrics
are computed in a single aggregation pass over the table (one scan, one
1-row HashAggregate — no per-check jobs), and the result unpivots to one
row per check with ``(check, metric, passed)``.

Referential checks (fact key ⊆ dim key) pre-join a broadcast distinct
projection of the dim and then feed the same single-pass aggregate, so a
suite with N row-level checks and R referential checks costs one scan of
the fact table plus R broadcast builds — the shape that holds at 100 TB.

Parity note: metrics are exact fractions (sums of 0/1 doubles divided by
exact counts) or exact counts — bit-identical across engines, so the
suite is fully DuckDB-oracle-checkable (query ``quality_orders``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One expectation: a metric expression over the table and a pass
    predicate over the computed metric (both lazy Columns).

    ``distinct_col`` marks exact-distinct checks so ``run_checks`` can
    route integral columns through the codegen bitmap-distinct path (a
    plain ``countDistinct`` in the shared aggregate plans as an Expand
    and shuffles one row per distinct value — measured 13.2s vs 3.9s for
    the whole 6-check suite at 100M rows); the inline metric stays the
    fallback for non-integral types."""

    name: str
    metric: Column
    passed: Callable[[Column], Column]
    distinct_col: str | None = None


def _thresh(min_fraction: float) -> str:
    """Non-default thresholds are part of the check name, so a suite can
    hold strict and loose variants of the same expectation."""
    return "" if min_fraction == 1.0 else f">={min_fraction}"


def not_null(col: str, *, min_fraction: float = 1.0) -> Check:
    """Fraction of non-null values >= ``min_fraction``."""
    return Check(
        f"not_null:{col}{_thresh(min_fraction)}",
        F.avg(F.col(col).isNotNull().cast("double")),
        lambda m: m >= F.lit(min_fraction),
    )


def unique(col: str) -> Check:
    """Exact distinct count == row count (no duplicate keys; nulls
    don't count as distinct values, so a null key also fails)."""
    return Check(
        f"unique:{col}",
        (F.countDistinct(col) - F.count(F.lit(1))).cast("double"),
        lambda m: m == F.lit(0.0),
        distinct_col=col,
    )


def in_range(col: str, lo: float, hi: float) -> Check:
    """Fraction of values inside [lo, hi] (nulls count as violations)."""
    ok = F.col(col).between(lo, hi).cast("double")
    return Check(
        f"in_range:{col}",
        F.avg(F.coalesce(ok, F.lit(0.0))),
        lambda m: m == F.lit(1.0),
    )


def in_set(col: str, values: list[str], *, min_fraction: float = 1.0) -> Check:
    """Fraction of values drawn from the accepted set >= ``min_fraction``."""
    ok = F.col(col).isin(values).cast("double")
    return Check(
        f"in_set:{col}{_thresh(min_fraction)}",
        F.avg(F.coalesce(ok, F.lit(0.0))),
        lambda m: m >= F.lit(min_fraction),
    )


def matches(col: str, pattern: str, *, min_fraction: float = 1.0) -> Check:
    """Fraction of values matching an RE2 regex >= ``min_fraction``."""
    ok = F.col(col).rlike(pattern).cast("double")
    return Check(
        f"matches:{col}{_thresh(min_fraction)}",
        F.avg(F.coalesce(ok, F.lit(0.0))),
        lambda m: m >= F.lit(min_fraction),
    )


def non_negative_count(predicate: Column, name: str) -> Check:
    """Zero rows may satisfy ``predicate`` (an anomaly counter)."""
    return Check(
        f"zero:{name}",
        F.sum(predicate.cast("double")),
        lambda m: m == F.lit(0.0),
    )


@dataclass(frozen=True)
class Referential:
    """Expectation that ``fact_col`` values appear in ``dim[dim_col]``.

    Compiled as: broadcast the distinct dim keys, left-join an indicator,
    then measure the hit fraction in the shared aggregate pass. The dim
    side is assumed dimension-sized (broadcastable); the fact side never
    shuffles.
    """

    fact_col: str
    dim: DataFrame
    dim_col: str
    min_fraction: float = 1.0

    @property
    def indicator(self) -> str:
        return f"__ref_{self.fact_col}"

    def check(self) -> Check:
        return Check(
            f"references:{self.fact_col}->{self.dim_col}"
            f"{_thresh(self.min_fraction)}",
            F.avg(F.col(self.indicator)),
            lambda m: m >= F.lit(self.min_fraction),
        )


def run_checks(
    df: DataFrame,
    checks: list[Check],
    *,
    refs: list[Referential] | None = None,
) -> DataFrame:
    """Evaluate an expectation suite in one pass.

    Output: ``(check string, metric double, passed boolean)``, one row
    per expectation, ordered by check name. The plan is R broadcast
    indicator joins (R = len(refs)) feeding a single 1-row aggregate,
    then an ``inline`` unpivot of (name, metric, passed) structs — the
    whole suite is one job over one scan of ``df``.
    """
    checks = list(checks)
    base = df  # pre-ref-join frame: same rows (dim keys are distinct)
    for r in refs or []:
        keys = r.dim.select(F.col(r.dim_col).alias("__k")).distinct()
        df = df.join(
            F.broadcast(keys), df[r.fact_col] == F.col("__k"), "left"
        ).withColumn(
            r.indicator, F.col("__k").isNotNull().cast("double")
        ).drop("__k")
        checks.append(r.check())
    if not checks:
        raise ValueError("expectation suite is empty")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        dupes = {n for n in names if names.count(n) > 1}
        raise ValueError(f"duplicate check names: {sorted(dupes)}")

    # Exact-distinct checks on integral columns leave the shared pass and
    # run through the packed-bitmap path (one extra scan each, but the
    # shuffle carries 64-bit words instead of one row per distinct value).
    integral = ("long", "int", "integer", "short", "byte", "bigint")
    bitmap_idx = [
        i for i, c in enumerate(checks)
        if c.distinct_col is not None
        and df.schema[c.distinct_col].dataType.simpleString() in integral
    ]
    metrics = []
    for i, c in enumerate(checks):
        if i in bitmap_idx:
            metrics.append(F.count(F.lit(1)).alias(f"_m{i}"))  # placeholder
        else:
            metrics.append(c.metric.alias(f"_m{i}"))
    agg = df.agg(*metrics)
    for i in bitmap_idx:
        from nexus_processor_spark.operators.timeslice import bitmap_distinct

        d = bitmap_distinct(base, [], checks[i].distinct_col, f"_d{i}")
        agg = agg.join(F.broadcast(d)).withColumn(
            f"_m{i}",
            (F.col(f"_d{i}") - F.col(f"_m{i}")).cast("double"),
        ).drop(f"_d{i}")
    rows = F.array(*[
        F.struct(
            F.lit(c.name).alias("check"),
            F.col(f"_m{i}").cast("double").alias("metric"),
            c.passed(F.col(f"_m{i}")).alias("passed"),
        )
        for i, c in enumerate(checks)
    ])
    return agg.select(F.inline(rows)).orderBy("check")
