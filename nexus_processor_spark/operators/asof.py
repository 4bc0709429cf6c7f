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

    Implementation: tag and union both sides, then ``last(values,
    ignorenulls=True)`` over a window ordered by ``(on, tag)``, where
    ``values`` is ONE STRUCT of the right row's value columns — right
    rows sort before left rows at equal timestamps, so equality is
    visible unless ``strict``. Left rows with no prior right row keep
    nulls. One shuffle total.

    Null semantics match ``asof_join_pandas`` / SQL ``r.on <= l.on``
    (test-pinned): right rows with a null ``on`` key are never matches
    (they would otherwise sort first and leak values to left rows with
    no real predecessor), and the LATEST matching row wins even when
    one of its value columns is null — the struct carry means a null
    reading is returned as null, never silently replaced by a stale
    older row, and multi-column outputs always come from one row.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    tag_right = 0 if not strict else 1
    tag_left = 1 if not strict else 0
    rhs = right.filter(F.col(on).isNotNull()).select(
        F.col(by), F.col(on), F.lit(tag_right).alias("_tag"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_vals"),
    )
    lhs = left.select(
        F.col(by), F.col(on), F.lit(tag_left).alias("_tag"),
        F.lit(None).cast(rhs.schema["_vals"].dataType).alias("_vals"),
        F.struct(*left.columns).alias("_row"),
    )
    rhs = rhs.select(
        "*", F.lit(None).cast(lhs.schema["_row"].dataType).alias("_row")
    )
    w = (Window.partitionBy(by).orderBy(on, "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = lhs.unionByName(rhs).select(
        "_row", F.last("_vals", ignorenulls=True).over(w).alias("_asof")
    )
    return merged.filter(F.col("_row").isNotNull()).select(
        F.col("_row.*"),
        *[F.col(f"_asof.{c}").alias(c) for c in value_cols],
    )


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
    # Self-cogroup hazard: when left and right derive from one parent,
    # right columns that share an exprId with left columns (typically the
    # `on` time) are deduplicated out of the right child's Arrow frame and
    # the pandas rdf arrives without them. Re-alias on/value columns to
    # FRESH names (new attributes — a different-name alias can't be
    # optimized away), and merge on left_on/right_on.
    r_on = "_asof_on"
    r_val = {c: f"_asof_v_{c}" for c in value_cols}
    right = right.select(
        F.col(by),
        F.col(on).alias(r_on),
        *[F.col(c).alias(r_val[c]) for c in value_cols],
    )

    r_vals = [r_val[c] for c in value_cols]
    r_val_back = {v: c for c, v in r_val.items()}

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        # Cogroup hands an EMPTY, COLUMN-LESS frame for a key present on
        # only one side — normalize before any column selection.
        if len(ldf.columns) == 0 or ldf.empty:
            return pd.DataFrame(columns=[*left_cols, *value_cols])
        if len(rdf.columns) == 0:
            rdf = pd.DataFrame(columns=[r_on, *r_vals])
        # merge_asof refuses null keys: null-time left rows join nothing
        # (SQL `l.on >= r.on` is never true on null); null right keys
        # can never be the latest match.
        null_mask = ldf[on].isna()
        lgood = ldf[~null_mask].sort_values(on)
        rgood = rdf[[r_on, *r_vals]].dropna(subset=[r_on]).sort_values(r_on)
        if rgood.empty or lgood.empty:
            merged = lgood[left_cols].copy()
            merged[r_vals] = None
        else:
            kwargs = {"tolerance": tolerance} if tolerance is not None else {}
            merged = pd.merge_asof(
                lgood, rgood, left_on=on, right_on=r_on,
                direction="backward", **kwargs,
            )
        out = merged[[*left_cols, *r_vals]].rename(columns=r_val_back)
        if null_mask.any():
            extra = ldf[null_mask][left_cols].copy()
            extra[value_cols] = None
            out = pd.concat([out, extra], ignore_index=True)
        return out

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
