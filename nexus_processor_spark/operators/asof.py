"""As-of joins and sessionization — temporal operators Spark lacks natively.

The reference's only as-of need (pulse lookup, J3) is satisfied by
denormalization; these are general-purpose versions for time-series
enrichment at scale, in the two recommended forms:

* ``asof_join`` — native composition: union both sides tagged, one
  window pass per key carries the last right-side value forward. One
  shuffle on ``(by, time)``, no UDF, scales like a sort-merge join.
* ``asof_join_pandas`` — cogrouped ``applyInPandas`` over
  ``pd.merge_asof``: per-key pandas, Arrow-batched. Simpler semantics
  surface (tolerance, direction) at the cost of the Python boundary.
  The two are pinned equal by tests.

* ``sessionize`` — gap-based session ids via lag + running sum, the
  batch twin of streaming ``session_window``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of: each left row gets the latest right row with
    ``right.on <= left.on`` (``<`` when ``strict``) within its ``by`` group.

    Implementation: tag and union both sides, then ``last(value,
    ignorenulls=True)`` over a window ordered by ``(on, tag)`` — right
    rows sort before left rows at equal timestamps, so equality is
    visible unless ``strict``. Left rows with no prior right row keep
    nulls. One shuffle total.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    tag_right = 0 if not strict else 1
    tag_left = 1 if not strict else 0
    lhs = left.select(
        F.col(by), F.col(on), F.lit(tag_left).alias("_tag"),
        F.struct(*left.columns).alias("_row"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
          for c in value_cols],
    )
    rhs = right.select(
        F.col(by), F.col(on), F.lit(tag_right).alias("_tag"),
        F.lit(None).cast(lhs.schema["_row"].dataType).alias("_row"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    w = (Window.partitionBy(by).orderBy(on, "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = lhs.unionByName(rhs).select(
        "*",
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
          for c in value_cols],
    )
    out = merged.filter(F.col("_row").isNotNull()).select(
        F.col("_row.*"),
        *[F.col(f"_asof_{c}").alias(c) for c in value_cols],
    )
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
) -> DataFrame:
    """Backward as-of via cogrouped ``pd.merge_asof`` — the Pandas-UDF
    form (Arrow-batched, per-``by``-group)."""
    from pyspark.sql.types import StructField, StructType

    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    # Build a FRESH StructType: StructType.add mutates in place, and
    # left.schema hands back a cached object — mutating it poisons `left`.
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    left_cols = list(left.columns)

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        ldf = ldf.sort_values(on)
        rdf = rdf[[on, *value_cols]].sort_values(on)
        kwargs = {"tolerance": tolerance} if tolerance is not None else {}
        merged = pd.merge_asof(ldf, rdf, on=on, direction="backward", **kwargs)
        return merged[[*left_cols, *value_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=out_schema)
    )


def sessionize(
    events: DataFrame,
    gap_seconds: float,
    *,
    time_col: str = "absolute_time",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    key's previous event exceeds ``gap_seconds``. Adds ``session_id``
    (0-based per key) — lag + running sum, two window passes over one
    shuffle partitioning."""
    w_order = Window.partitionBy(key_col).orderBy(time_col)
    gap = F.col(time_col) - F.lag(time_col).over(w_order)
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_new", is_new)
        .withColumn("session_id", (F.sum("_new").over(w_run) - 1).cast("long"))
        .drop("_new")
    )
