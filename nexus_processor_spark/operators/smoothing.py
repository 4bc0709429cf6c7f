"""Exponential smoothing over grouped time series.

The recurrence family the reference's monitoring queries imply (decayed
rates, smoothed detector counts) and classic pandas `.ewm()` covers
single-node: ``s_t = alpha * x_t + (1 - alpha) * s_{t-1}``, seeded with
``s_0 = x_0`` (the ``adjust=False`` form). A recurrence is inherently
sequential along the series, so the distributed decomposition mirrors
:func:`nexus_processor_spark.operators.similarity.mmr_topk`: the
grouping/bucketing is the data-scale part; the sequential part only ever
sees one bounded series.

Two shapes:

* :func:`ewma` — one ``applyInPandas`` group per series. The per-series
  float64 loop is bit-reproducible (same IEEE ops any engine runs), so
  a DuckDB recursive CTE replays it EXACTLY — this is the oracle path.
  Bound: one series fits a task, the same contract every per-series
  operator here carries (asof, LOCF, gapfill).
* :func:`ewma_scan` — for the series that does NOT fit a task: the
  affine-map two-phase scan. ``s_out = A * s_in + B`` composes per
  ORDER-GRID BUCKET (A = (1-alpha)^n via a product aggregate, B by
  running the same loop seeded with 0), an exclusive prefix over the
  BUCKET table (bounded by the grid, never the rows — same shape as
  ``prefix.distributed_running_sum``) chains the incoming states, and
  each bucket re-runs the loop from its incoming state. Mathematically
  identical; floating-point differs from the sequential loop only at
  bucket boundaries (one affine application replaces n interleaved
  steps) — test-pinned to the exact path at 1e-9, which is why this is
  the scale path and :func:`ewma` the oracle path.

Pick ``alpha`` binary-representable (0.25, 0.5, 0.375...) when
cross-engine exactness matters; the oracle queries do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ewma(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    *,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-group exponential moving average (adjust=False, s_0 = x_0).

    Null values propagate the previous state unchanged (a gap neither
    moves nor resets the smoother) and emit the held state — the LOCF
    convention the resample operators use. Output: the input columns
    plus ``out_col``; ordering ties on ``order_col`` are resolved by
    the incoming row order, so feed a unique order key.
    """
    import pandas as pd

    cols = [*group_cols, order_col, value_col]
    src = df.select(*cols)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
    )
    schema = f"{fields}, {out_col} double"

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, ignore_index=True)
        xs = g[value_col].astype("float64")
        state = float("nan")
        out = []
        for x in xs:
            if pd.notna(x):
                state = x if pd.isna(state) else \
                    alpha * x + (1.0 - alpha) * state
            out.append(state if pd.notna(state) else None)
        g[out_col] = pd.array(out, dtype="float64")
        return g

    return src.groupBy(*group_cols).applyInPandas(
        lambda _, g: kernel(g), schema
    )


def ewma_scan(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha: float,
    *,
    grid: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Single-series EWMA as a two-phase affine scan for series too
    large for one task. Nulls are dropped before scanning (the held
    state of :func:`ewma` can be re-attached with LOCF downstream);
    ``order_col`` must be numeric and unique. See the module docstring
    for the decomposition and the floating-point caveat."""
    import pandas as pd

    rows = (
        df.select(order_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .withColumn(
            "_b", F.floor(F.col(order_col) / F.lit(grid)).cast("long")
        )
    )

    # phase 1: per-bucket affine coefficients s_out = A * s_in + B,
    # derived by the SAME sequential loop (seeded 0) plus a decay power
    def coeffs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, ignore_index=True)
        b = 0.0
        for x in g[value_col].astype("float64"):
            b = alpha * x + (1.0 - alpha) * b
        return pd.DataFrame(
            {
                # fresh name: re-declaring the grouping column "_b" in
                # the output schema collides exprIds with the input plan
                "_bk": [g["_b"].iloc[0]],
                "_A": [(1.0 - alpha) ** len(g)],
                "_B": [b],
                "_first": [float(g[value_col].iloc[0])],
                "_n": [len(g)],
            }
        )

    bk = rows.groupBy("_b").applyInPandas(
        lambda _, g: coeffs(g),
        "_bk long, _A double, _B double, _first double, _n long",
    )

    # phase 2: exclusive prefix over the BUCKET table. The chain
    # s_b = A_b * s_{b-1} + B_b is an affine composition — not
    # expressible as sum/product windows alone — and the bucket table
    # is grid-bounded, so collect it and fold on the driver (the same
    # driver-bounded contract as kmeans centroids).
    coeff_rows = bk.orderBy("_bk").collect()
    incoming: dict[int, float | None] = {}
    state: float | None = None
    for r in coeff_rows:
        incoming[r._bk] = state
        if state is None:
            # seed bucket: s_0 = x_0 replaces the loop-from-0's first
            # step alpha*(1-a)^(n-1)*x_0 with (1-a)^(n-1)*x_0, so the
            # outgoing state is B + (1-a)^(n-1)*(1-a)*x_0 = B+(1-a)^n*x_0
            state = r._B + (1.0 - alpha) ** r._n * r._first
        else:
            state = r._A * state + r._B
    inc_df = df.sparkSession.createDataFrame(
        [(int(b), None if s is None else float(s))
         for b, s in incoming.items()],
        "_b long, _s double",
    )

    # phase 3: replay each bucket from its incoming state
    def replay(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, ignore_index=True)
        s = g["_s"].iloc[0]
        state = None if pd.isna(s) else float(s)
        out = []
        for x in g[value_col].astype("float64"):
            state = x if state is None else \
                alpha * x + (1.0 - alpha) * state
            out.append(state)
        g[out_col] = pd.array(out, dtype="float64")
        return g[[order_col, value_col, out_col]]

    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in rows.select(order_col, value_col).schema.fields
    )
    return (
        rows.join(F.broadcast(inc_df), "_b")
        .groupBy("_b")
        .applyInPandas(lambda _, g: replay(g), f"{fields}, {out_col} double")
    )


def holt(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    beta: float,
    *,
    horizon: int = 1,
    out_prefix: str = "holt",
) -> DataFrame:
    """Per-group Holt linear-trend double smoothing — the one-line
    forecaster monitoring dashboards run per series:

    ``level_t = alpha*x_t + (1-alpha)*(level_{t-1} + trend_{t-1})``;
    ``trend_t = beta*(level_t - level_{t-1}) + (1-beta)*trend_{t-1}``;
    seeded ``level_0 = x_0``, ``trend_0 = x_1 - x_0`` (trend undefined —
    null — until two points exist). The ``horizon``-step-ahead forecast
    is ``level + horizon * trend``.

    Same distribution contract and cross-engine story as :func:`ewma`:
    one bounded ``applyInPandas`` group per series; with binary-exact
    ``alpha``/``beta`` the float64 recurrence is bit-identical to a
    recursive-CTE replay, so outputs need no rounding. Nulls hold both
    states (and emit the held values), mirroring :func:`ewma`.

    Output: inputs + ``{prefix}_level``, ``{prefix}_trend``,
    ``{prefix}_forecast``.
    """
    import pandas as pd

    cols = [*group_cols, order_col, value_col]
    src = df.select(*cols)
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema.fields
    )
    schema = (
        f"{fields}, {out_prefix}_level double, {out_prefix}_trend double,"
        f" {out_prefix}_forecast double"
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, ignore_index=True)
        level = trend = None
        lv, tr, fc = [], [], []
        for x in g[value_col].astype("float64"):
            if pd.notna(x):
                if level is None:
                    level = float(x)
                elif trend is None:
                    trend = float(x) - level
                    level = float(x)
                else:
                    prev = level
                    level = alpha * float(x) + (1.0 - alpha) * (
                        level + trend
                    )
                    trend = beta * (level - prev) + (1.0 - beta) * trend
            lv.append(level)
            tr.append(trend)
            fc.append(
                None if level is None or trend is None
                else level + horizon * trend
            )
        g[f"{out_prefix}_level"] = pd.array(lv, dtype="float64")
        g[f"{out_prefix}_trend"] = pd.array(tr, dtype="float64")
        g[f"{out_prefix}_forecast"] = pd.array(fc, dtype="float64")
        return g

    return src.groupBy(*group_cols).applyInPandas(
        lambda _, g: kernel(g), schema
    )
