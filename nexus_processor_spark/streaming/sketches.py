"""Streaming maintenance of mergeable sketches (HLL / CMS / KMV).

The sketch operators (operators/sketch.py) are algebraic: build on a
batch, merge with the stored state, overwrite. That is exactly the
``foreachBatch`` shape ``rollup.maintain_rollup_stream`` uses for the
continuous aggregate, so streams keep bounded-size distinct/frequency
state with per-batch cost O(batch + sketch size) — no growing keyed
state store, no watermark tuning: the sketch IS the state, and it is
bounded by construction.

Exactly-once: checkpointed source offsets + idempotent full-state
overwrite (the state is tiny — thousands of rows — so the overwrite is
the cheap part). At warehouse scale, swap for MERGE INTO on an
Iceberg/Delta state table; the batch body is unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from nexus_processor_spark.operators import sketch as sk


def maintain_sketch_stream(
    stream: DataFrame,
    state_path: str,
    *,
    checkpoint_dir: str,
    build: Callable[[DataFrame], DataFrame],
    merge: Callable[[DataFrame, DataFrame], DataFrame],
    trigger_available_now: bool = True,
):
    """Generic sketch maintenance: per micro-batch, ``build`` the
    batch's sketch, ``merge`` it with the parquet state at
    ``state_path`` (absent on the first batch), materialize, overwrite.
    Returns the started ``StreamingQuery``."""
    spark = stream.sparkSession

    def _exists(path: str) -> bool:
        # explicit existence check, NOT try/except around the read: a
        # transient read failure must FAIL the batch (checkpoint retries
        # it), never be mistaken for "first batch" — that would silently
        # reset all accumulated state to the current delta
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(p))

    def _step(batch: DataFrame, _batch_id: int) -> None:
        delta = build(batch)
        merged = (
            merge(spark.read.parquet(state_path), delta)
            if _exists(state_path) else delta
        )
        # stage-then-swap: the merged plan READS state_path, so it must
        # be fully durable somewhere else before the overwrite deletes
        # the files it depends on. persist()+count() is NOT enough — a
        # lost executor between count() and the overwrite recomputes
        # partitions from lineage against the half-deleted path. The
        # staging write depends only on the old state; the swap depends
        # only on the staging files, so every step is retry-idempotent.
        staging = state_path.rstrip("/") + "._staging"
        merged.write.mode("overwrite").parquet(staging)
        spark.read.parquet(staging).write.mode("overwrite").parquet(state_path)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_step)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_hll_stream(
    stream: DataFrame,
    key_col: str,
    state_path: str,
    *,
    checkpoint_dir: str,
    by: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming distinct-count state: HLL registers maintained by
    register-wise max. Drained state == batch registers over all data
    (max is associative+commutative+idempotent, so replays are safe)."""
    return maintain_sketch_stream(
        stream, state_path,
        checkpoint_dir=checkpoint_dir,
        build=lambda b: sk.hll_registers(b, key_col, by=by),
        merge=lambda cur, new: sk.hll_merge(cur, new),
        trigger_available_now=trigger_available_now,
    )


def maintain_cms_stream(
    stream: DataFrame,
    key_col: str,
    state_path: str,
    *,
    checkpoint_dir: str,
    width: int = 8192,
    depth: int = 4,
    trigger_available_now: bool = True,
):
    """Streaming frequency state: CMS bucket counts maintained by sum.
    NOT replay-idempotent (sums double on reprocessing) — relies on the
    checkpoint's exactly-once batch ids, same as any summing sink."""
    return maintain_sketch_stream(
        stream, state_path,
        checkpoint_dir=checkpoint_dir,
        build=lambda b: sk.cms_build(b, key_col, width=width, depth=depth),
        merge=lambda cur, new: sk.cms_merge(cur, new),
        trigger_available_now=trigger_available_now,
    )
