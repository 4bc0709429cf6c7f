"""Z-order layout: the multi-column pruning claim, measured on real
parquet footers — per-file min/max envelopes must be tight on BOTH
z-columns, where a single-column sort is tight on one and useless on
the other."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.plans import layout


@pytest.fixture(scope="module")
def grid(spark):
    # a 256x256 uncorrelated grid: worst case for one-column sorting
    return spark.range(65536).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )


def _mean_span(path: str, col: str) -> float:
    spans, total = [], 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
            total += 1
    return sum(spans) / total


def test_zorder_tightens_both_columns(spark, tmp_path):
    from nexus_processor_spark.plans.layout import write_zordered

    griddf = spark.range(65536).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "xsort")
    write_zordered(griddf, zpath, ["x", "y"], num_files=16)
    (griddf.repartitionByRange(16, "x").sortWithinPartitions("x")
     .write.mode("overwrite").parquet(spath))

    # x-sorted: x spans are tiny, y spans are the full domain (~255)
    assert _mean_span(spath, "x") < 64
    assert _mean_span(spath, "y") > 200
    # z-ordered: BOTH columns' envelopes are a fraction of the domain
    zx, zy = _mean_span(zpath, "x"), _mean_span(zpath, "y")
    assert zx < 128 and zy < 128
    # and the worse of the two beats the x-sort's y disaster by 2x+
    assert max(zx, zy) < _mean_span(spath, "y") / 2


def test_zorder_write_roundtrips_rows(spark, tmp_path, grid):
    from nexus_processor_spark.plans.layout import write_zordered

    p = str(tmp_path / "z2")
    write_zordered(grid, p, ["x", "y"], num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 65536
    assert sorted(back.columns) == ["x", "y"]
    got = back.agg(F.sum("x").alias("sx"), F.sum("y").alias("sy")).first()
    want = grid.agg(F.sum("x").alias("sx"), F.sum("y").alias("sy")).first()
    assert (got.sx, got.sy) == (want.sx, want.sy)
