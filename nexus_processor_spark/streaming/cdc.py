"""Streaming CDC apply: maintain a snapshot table from a change stream.

Each micro-batch of (key, columns...) change rows MERGEs into a
manifest-committed snapshot table (``sources/snapshots.py``) — the
streaming materialized-upsert table (the lakehouse "apply a CDC feed"
flow; reference S13's table-sink surface generalized to keyed updates):

* **Last-write-wins within a batch**: a batch may carry several changes
  for one key; the row with the highest ``seq_col`` survives (ties and
  the no-``seq_col`` case take an arbitrary stable winner), so the
  table always holds one row per key.
* **Deletes** ride the same stream when ``delete_col`` names a boolean
  column: a winning tombstone removes the key — routed through
  ``upsert_snapshot(delete_keys=...)``, i.e. "replace with nothing"
  inside the same single commit.
* **Directory-level CoW**: changed keys probe the manifest's
  per-directory key ranges; only directories containing a changed key
  rewrite — a trickle of changes against a huge table touches a few
  files per batch, never the table.
* **Exactly-once**: the snapshot commit is pinned to the batch id
  (put-if-absent manifest). A replayed batch finds its manifest and
  skips — the same idempotency contract as ``streaming/curate.py``.
  Batch ids restart with a fresh checkpoint: bind one table directory
  to one checkpoint directory.
* **Compaction**: every ``compact_every`` commits, the batch's commit
  also folds the accumulated directories into one (``mode='upsert'``
  keeps appending a directory per batch otherwise); expiry trims old
  manifests so time travel stays bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_processor_spark.sources import snapshots

COMPACT_EVERY = 16


def apply_cdc_batch(
    spark: SparkSession,
    table_path: str,
    changes: DataFrame,
    key_col: str,
    *,
    seq_col: str | None = None,
    delete_col: str | None = None,
    stats_cols: tuple[str, ...] = (),
    version: int | None = None,
    compact: bool = False,
) -> int | None:
    """Apply one batch of change rows; returns the committed version
    (None = replayed pinned version, skipped). Cold start (no committed
    snapshot) commits the batch's surviving upserts as the base —
    tombstones for never-seen keys are no-ops.

    ``compact=True`` folds the whole table into one directory WITHIN
    the batch's single commit (full-table merge + overwrite manifest at
    the same pinned version) — compaction must never be a separate
    commit here, because an extra version number would collide with the
    next batch's pinned id and silently swallow that batch as a
    replay."""
    w = Window.partitionBy(key_col).orderBy(
        *([F.col(seq_col).desc()] if seq_col else [F.lit(1)])
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    deletes = None
    if delete_col is not None:
        deletes = latest.filter(
            F.coalesce(F.col(delete_col), F.lit(False))
        ).select(key_col)
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    if seq_col is not None:
        latest = latest.drop(seq_col)
    keyed_stats = tuple(dict.fromkeys((key_col, *stats_cols)))

    if snapshots.current_version(table_path) is None:
        return snapshots.write_snapshot(
            latest, table_path, mode="overwrite",
            stats_cols=keyed_stats, version=version,
        )
    if compact:
        touched = latest.select(key_col)
        if deletes is not None:
            touched = touched.unionByName(deletes)
        merged = snapshots.read_snapshot(spark, table_path).join(
            touched.distinct(), key_col, "left_anti"
        ).unionByName(latest, allowMissingColumns=True)
        return snapshots.write_snapshot(
            merged, table_path, mode="overwrite",
            stats_cols=keyed_stats, version=version,
        )
    return snapshots.upsert_snapshot(
        spark, table_path, latest, key_col,
        stats_cols=stats_cols, version=version, delete_keys=deletes,
    )


def apply_cdc_stream(
    stream: DataFrame,
    table_path: str,
    key_col: str,
    *,
    checkpoint_dir: str,
    seq_col: str | None = None,
    delete_col: str | None = None,
    stats_cols: tuple[str, ...] = (),
    compact_every: int = COMPACT_EVERY,
    trigger_available_now: bool = True,
):
    """Start the CDC-apply stream; returns the ``StreamingQuery``. Read
    the maintained table with ``snapshots.read_snapshot`` (any time, any
    retained version)."""
    spark = stream.sparkSession

    def _step(batch: DataFrame, batch_id: int) -> None:
        cur = snapshots.current_version(table_path)
        due = cur is not None and len(
            snapshots._read_manifest(table_path, cur)["data_dirs"]
        ) + 1 >= compact_every
        v = apply_cdc_batch(
            spark, table_path, batch, key_col,
            seq_col=seq_col, delete_col=delete_col,
            stats_cols=stats_cols, version=batch_id, compact=due,
        )
        if v is None:
            return  # replayed batch: table + expiry already settled
        snapshots.expire_snapshots(table_path, keep_last=2)

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_step)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
