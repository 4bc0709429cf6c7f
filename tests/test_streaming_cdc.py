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


IVM_SCHEMA = "id long, grp string, x double, seq long, deleted boolean"


def _ivm_measures():
    return [
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("x"), 6).alias("sx"),
        F.max("x").alias("mx"),  # MAX: delta-rule-unmaintainable family
    ]


def _full_agg(spark, t):
    return {
        r.grp: (r.n, r.sx, r.mx)
        for r in snapshots.read_snapshot(spark, t)
        .groupBy("grp")
        .agg(*_ivm_measures())
        .collect()
    }


def _agg_table(spark, a):
    return {
        r.grp: (r.n, r.sx, r.mx)
        for r in snapshots.read_snapshot(spark, a).collect()
    }


def test_maintain_agg_batch_migration_delete_and_group_vanish(spark, tmp_path):
    """Touched-group IVM stays equal to a full recompute through group
    migration, deletes, inserts — including a group whose last row
    leaves (its agg row must vanish, not linger at stale values)."""
    t, a = str(tmp_path / "base"), str(tmp_path / "agg")
    b0 = spark.createDataFrame(
        [(1, "g1", 1.0, 0, False), (2, "g1", 2.0, 0, False),
         (3, "g2", 4.0, 0, False), (4, "g3", 8.0, 0, False)],
        IVM_SCHEMA,
    )
    cdc.maintain_agg_batch(
        spark, t, a, b0, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=0,
    )
    assert _agg_table(spark, a) == _full_agg(spark, t)
    b1 = spark.createDataFrame(
        [(1, "g2", 1.5, 1, False),   # migrate g1 -> g2 (both refresh)
         (4, None, 0.0, 2, True),    # delete the only g3 row -> g3 gone
         (5, "g4", 16.0, 1, False)], # brand-new group
        IVM_SCHEMA,
    )
    cdc.maintain_agg_batch(
        spark, t, a, b1, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=1,
    )
    got = _agg_table(spark, a)
    assert got == _full_agg(spark, t)
    assert got == {"g1": (1, 2.0, 2.0), "g2": (2, 5.5, 4.0),
                   "g4": (1, 16.0, 16.0)}
    # replayed pinned batch: both commits already present -> no-op
    assert cdc.maintain_agg_batch(
        spark, t, a, b1, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=1,
    ) is None
    assert _agg_table(spark, a) == got


def test_maintain_agg_recovers_when_agg_commit_is_missing(spark, tmp_path):
    """Crash window: base committed, agg commit lost. The replay must
    rebuild the agg at the pinned version (full recompute) instead of
    skipping or double-applying."""
    import os

    t, a = str(tmp_path / "base"), str(tmp_path / "agg")
    b0 = spark.createDataFrame(
        [(1, "g1", 1.0, 0, False), (2, "g2", 2.0, 0, False)], IVM_SCHEMA)
    cdc.maintain_agg_batch(
        spark, t, a, b0, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=0,
    )
    b1 = spark.createDataFrame([(2, "g1", 5.0, 1, False)], IVM_SCHEMA)
    cdc.maintain_agg_batch(
        spark, t, a, b1, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=1,
    )
    os.remove(os.path.join(a, "manifest.1.json"))  # simulate the crash
    v = cdc.maintain_agg_batch(
        spark, t, a, b1, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=1,
    )
    assert v == 1
    assert _agg_table(spark, a) == _full_agg(spark, t) == {
        "g1": (2, 6.0, 5.0)}


def test_maintain_agg_stream_end_to_end(spark, tmp_path):
    """Two micro-batches through the streaming IVM wrapper: the live
    aggregate equals a full groupBy of the final base table."""
    src = tmp_path / "incoming"
    src.mkdir()
    t, a = str(tmp_path / "base"), str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    b0 = spark.createDataFrame(
        [(1, "g1", 1.0, 0, False), (2, "g2", 2.0, 0, False),
         (3, "g2", 3.0, 0, False)], IVM_SCHEMA)
    b0.coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(IVM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = cdc.maintain_agg_stream(
        stream, t, a, "id", "grp", _ivm_measures(),
        checkpoint_dir=ck, seq_col="seq", delete_col="deleted",
    )
    q.awaitTermination(120)
    b1 = spark.createDataFrame(
        [(3, None, 0.0, 1, True), (4, "g1", 4.0, 1, False)], IVM_SCHEMA)
    b1.coalesce(1).write.parquet(str(src / "b1"))
    q2 = cdc.maintain_agg_stream(
        stream, t, a, "id", "grp", _ivm_measures(),
        checkpoint_dir=ck, seq_col="seq", delete_col="deleted",
    )
    q2.awaitTermination(120)
    assert _agg_table(spark, a) == _full_agg(spark, t) == {
        "g1": (2, 5.0, 4.0), "g2": (1, 2.0, 2.0)}


def test_maintain_agg_null_groups_excluded_cold_and_incremental(spark, tmp_path):
    """NULL group values are documented-unmaintainable (null merge key):
    the cold full build must not create a null-group row that the
    incremental path would silently leave stale."""
    t, a = str(tmp_path / "base"), str(tmp_path / "agg")
    b0 = spark.createDataFrame(
        [(1, None, 1.0, 0, False), (2, "g1", 2.0, 0, False)], IVM_SCHEMA)
    cdc.maintain_agg_batch(
        spark, t, a, b0, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=0,
    )
    assert set(_agg_table(spark, a)) == {"g1"}
    b1 = spark.createDataFrame(
        [(3, "g2", 3.0, 1, False)], IVM_SCHEMA)
    cdc.maintain_agg_batch(
        spark, t, a, b1, "id", "grp", _ivm_measures(),
        seq_col="seq", delete_col="deleted", version=1,
    )
    assert set(_agg_table(spark, a)) == {"g1", "g2"}
