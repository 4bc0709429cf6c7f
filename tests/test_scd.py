"""SCD Type-2 history builder + CDC extraction round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from nexus_processor_spark.operators import scd
from nexus_processor_spark.sources import snapshots
from nexus_processor_spark.streaming import cdc

LOG_SCHEMA = "id long, status string, price double, seq long"


def _hist_rows(df):
    return sorted(
        (
            (r.id, r.status, r.price, r.valid_from, r.valid_to, r.is_current)
            for r in df.collect()
        ),
        key=lambda t: (t[0], t[3]),
    )


def test_scd2_history_collapses_dups_and_chains_validity(spark):
    log = spark.createDataFrame(
        [
            (1, "a", 1.0, 0), (1, "a", 1.0, 5), (1, "b", 1.0, 9),
            (2, "x", 2.0, 0), (2, "x", 3.0, 4),   # price-only change
            (3, None, 1.0, 0), (3, None, 1.0, 2),  # null attrs: still dup
            (3, "z", 1.0, 7),
        ],
        LOG_SCHEMA,
    )
    got = _hist_rows(scd.scd2_history(log, "id", "seq"))
    assert got == [
        (1, "a", 1.0, 0, 9, False), (1, "b", 1.0, 9, None, True),
        (2, "x", 2.0, 0, 4, False), (2, "x", 3.0, 4, None, True),
        (3, None, 1.0, 0, 7, False), (3, "z", 1.0, 7, None, True),
    ]


def test_scd2_apply_matches_history_over_concatenated_log(spark):
    full = spark.createDataFrame(
        [
            (1, "a", 1.0, 0), (1, "b", 1.0, 3), (1, "b", 1.0, 6),
            (1, "c", 2.0, 8),
            (2, "x", 5.0, 1), (2, "x", 5.0, 7),
            (4, "new", 0.5, 7),
        ],
        LOG_SCHEMA,
    )
    b1 = full.filter(F.col("seq") < 5)
    b2 = full.filter(F.col("seq") >= 5)
    incremental = scd.scd2_apply(
        scd.scd2_apply(None, b1, "id", "seq"), b2, "id", "seq"
    )
    assert _hist_rows(incremental) == _hist_rows(
        scd.scd2_history(full, "id", "seq")
    )


def test_scd2_as_of_point_in_time(spark):
    log = spark.createDataFrame(
        [(1, "a", 1.0, 0), (1, "b", 1.0, 5), (2, "x", 2.0, 3)],
        LOG_SCHEMA,
    )
    hist = scd.scd2_history(log, "id", "seq")
    at4 = {(r.id, r.status) for r in scd.scd2_as_of(hist, 4).collect()}
    assert at4 == {(1, "a"), (2, "x")}
    at5 = {(r.id, r.status) for r in scd.scd2_as_of(hist, 5).collect()}
    assert at5 == {(1, "b"), (2, "x")}
    assert {(r.id,) for r in scd.scd2_as_of(hist, 0).collect()} == {(1,)}


def test_extract_changes_round_trip(spark, tmp_path):
    """apply_cdc_batch(old_table, extract_changes(old, new)) == new —
    and identical keys emit no change row at all."""
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "id long, status string, price double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged -> no row
         (2, "B", 2.0),        # changed
         (4, "d", 4.0)],       # added; 3 removed
        "id long, status string, price double",
    )
    changes = cdc.extract_changes(old, new, "id")
    got = {(r.id, r.status, r.price, r.deleted) for r in changes.collect()}
    assert got == {(2, "B", 2.0, False), (4, "d", 4.0, False),
                   (3, None, None, True)}
    t = str(tmp_path / "tbl")
    snapshots.write_snapshot(old, t, mode="overwrite", stats_cols=("id",))
    cdc.apply_cdc_batch(spark, t, changes, "id", delete_col="deleted")
    assert sorted(map(tuple, snapshots.read_snapshot(spark, t).collect())) \
        == sorted(map(tuple, new.collect()))


def test_scd2_apply_batch_snapshot_table_and_replay(spark, tmp_path):
    """Snapshot-backed SCD2: two pinned batches equal the full-log
    build; replaying a pinned batch is a no-op."""
    from nexus_processor_spark.operators import scd

    h = str(tmp_path / "hist")
    full = spark.createDataFrame(
        [(1, "a", 1.0, 0), (2, "x", 2.0, 1),
         (1, "b", 1.0, 5), (2, "x", 2.0, 6), (3, "n", 3.0, 7)],
        LOG_SCHEMA,
    )
    b1, b2 = full.filter(F.col("seq") < 5), full.filter(F.col("seq") >= 5)
    scd.scd2_apply_batch(spark, h, b1, "id", "seq", version=0)
    scd.scd2_apply_batch(spark, h, b2, "id", "seq", version=1)
    assert _hist_rows(snapshots.read_snapshot(spark, h)) == _hist_rows(
        scd.scd2_history(full, "id", "seq")
    )
    assert scd.scd2_apply_batch(spark, h, b2, "id", "seq",
                                version=1) is None


def test_scd2_stream_two_drains_match_full_build(spark, tmp_path):
    from nexus_processor_spark.operators import scd

    src = tmp_path / "incoming"
    src.mkdir()
    h, ck = str(tmp_path / "hist"), str(tmp_path / "ck")
    full = spark.createDataFrame(
        [(1, "a", 1.0, 0), (2, "x", 2.0, 1),
         (1, "b", 1.0, 5), (4, "q", 4.0, 6)],
        LOG_SCHEMA,
    )
    full.filter(F.col("seq") < 5).coalesce(1) \
        .write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1).parquet(str(src / "*"))
    )
    scd.scd2_stream(stream, h, "id", "seq",
                    checkpoint_dir=ck).awaitTermination(120)
    full.filter(F.col("seq") >= 5).coalesce(1) \
        .write.parquet(str(src / "b1"))
    scd.scd2_stream(stream, h, "id", "seq",
                    checkpoint_dir=ck).awaitTermination(120)
    assert _hist_rows(snapshots.read_snapshot(spark, h)) == _hist_rows(
        scd.scd2_history(full, "id", "seq")
    )


def test_temporal_join_matches_one_version_per_fact(spark):
    from nexus_processor_spark.operators import scd

    log = spark.createDataFrame(
        [(1, "a", 1.0, 0), (1, "b", 1.0, 5), (2, "x", 2.0, 3)],
        LOG_SCHEMA,
    )
    hist = scd.scd2_history(log, "id", "seq")
    facts = spark.createDataFrame(
        [(100, 1, 0), (101, 1, 4), (102, 1, 5), (103, 1, 99),
         (104, 2, 0),   # before key 2's first version: no match
         (105, 9, 1)],  # unknown key
        "fact_id long, id long, at long",
    )
    got = {r.fact_id: r.status
           for r in scd.temporal_join(facts, hist, "id", "at").collect()}
    assert got == {100: "a", 101: "a", 102: "b", 103: "b"}
    left = {r.fact_id: r.status
            for r in scd.temporal_join(facts, hist, "id", "at",
                                       how="left").collect()}
    assert left[104] is None and left[105] is None and left[100] == "a"
