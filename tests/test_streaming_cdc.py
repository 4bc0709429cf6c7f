"""Streaming CDC apply onto manifest-committed snapshot tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_processor_spark.sources import snapshots
from nexus_processor_spark.streaming import cdc

SCHEMA = "id long, v string, seq long, deleted boolean"


def test_apply_cdc_batch_last_write_wins_and_deletes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 0, False), (2, "b", 0, False), (3, "c", 0, False)], SCHEMA)
    cdc.apply_cdc_batch(spark, t, base, "id",
                        seq_col="seq", delete_col="deleted")
    changes = spark.createDataFrame(
        [
            (1, "a1", 5, False), (1, "a2", 9, False),   # seq 9 wins
            (2, None, 7, True),                           # delete
            (4, "d", 1, False),                           # new key
            (9, None, 1, True),                           # delete unseen: no-op
        ],
        SCHEMA,
    )
    cdc.apply_cdc_batch(spark, t, changes, "id",
                        seq_col="seq", delete_col="deleted")
    got = {r.id: r.v for r in snapshots.read_snapshot(spark, t).collect()}
    assert got == {1: "a2", 3: "c", 4: "d"}
    # the maintained table carries no seq/delete plumbing columns
    cols = [f.name for f in snapshots.read_snapshot(spark, t).schema.fields]
    assert cols == ["id", "v"]


def test_cdc_stream_exactly_once_and_cow(spark, tmp_path):
    """File-source drains: per-batch pinned commits (replay adds
    nothing), and a small change batch rewrites only the directory its
    keys land in."""
    src = tmp_path / "incoming"
    src.mkdir()
    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
        q = cdc.apply_cdc_stream(
            stream, t, "id", checkpoint_dir=ck,
            seq_col="seq", delete_col="deleted")
        q.awaitTermination(120)

    def add(name, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(str(src / name))

    add("b0", [(i, f"v{i}", 0, False) for i in range(100)])
    drain()
    assert snapshots.read_snapshot(spark, t).count() == 100

    before = snapshots._read_manifest(
        t, snapshots.current_version(t))["data_dirs"]
    add("b1", [(5, "patched", 1, False), (200, "new", 1, False),
               (7, None, 1, True)])
    drain()
    after = snapshots._read_manifest(
        t, snapshots.current_version(t))["data_dirs"]
    # base dir was the only dir and contains key 5/7 -> rewritten; at
    # least the commit structure stays one-dir-per-batch-ish
    got = {r.id: r.v for r in snapshots.read_snapshot(spark, t).collect()}
    assert got[5] == "patched" and got[200] == "new" and 7 not in got
    assert len(got) == 100  # 100 - 1 delete + 1 insert

    # replay: no new files -> no new versions, same rows
    v_before = snapshots.current_version(t)
    drain()
    assert snapshots.current_version(t) == v_before
    assert {r.id: r.v for r in snapshots.read_snapshot(spark, t).collect()} == got


def test_cdc_stream_cow_skips_disjoint_directories(spark, tmp_path):
    """Two disjoint-range base directories: a change hitting only the
    low range carries the high-range directory by reference."""
    t = str(tmp_path / "tbl")
    lo = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, v string")
    hi = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1000, 1010)], "id long, v string")
    snapshots.write_snapshot(lo, t, stats_cols=("id",))
    snapshots.write_snapshot(hi, t, mode="append", stats_cols=("id",))
    dirs0 = snapshots._read_manifest(t, 1)["data_dirs"]

    changes = spark.createDataFrame(
        [(3, "patched", 1, False)], SCHEMA).select("id", "v", "seq", "deleted")
    cdc.apply_cdc_batch(spark, t, changes.select("id", "v"), "id")
    dirs1 = snapshots._read_manifest(t, 2)["data_dirs"]
    assert dirs0[1] in dirs1      # high-range dir untouched
    assert dirs0[0] not in dirs1  # low-range dir rewritten
    got = {r.id: r.v for r in snapshots.read_snapshot(spark, t).collect()}
    assert got[3] == "patched" and got[1005] == "v1005" and len(got) == 20


def test_cdc_stream_compaction_folds_within_the_batch_commit(spark, tmp_path):
    """compact_every=2: versions stay exactly the batch ids (compaction
    NEVER takes its own version number — a separate commit would collide
    with the next pinned batch id), and the folded table is correct."""
    src = tmp_path / "incoming"
    src.mkdir()
    t = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")

    def drain():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src / "*"))
        q = cdc.apply_cdc_stream(
            stream, t, "id", checkpoint_dir=ck,
            seq_col="seq", delete_col="deleted", compact_every=2)
        q.awaitTermination(120)

    for b in range(4):
        spark.createDataFrame(
            [(100 * b + i, f"b{b}", b, False) for i in range(5)], SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{b}"))
        drain()
    assert snapshots.current_version(t) == 3  # versions == batch ids
    m = snapshots._read_manifest(t, 3)
    assert len(m["data_dirs"]) <= 2
    assert snapshots.read_snapshot(spark, t).count() == 20
