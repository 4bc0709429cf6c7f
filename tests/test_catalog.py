from __future__ import annotations

import json

from nexus_processor_spark.schemas import table_ddl
from nexus_processor_spark.sources import catalog, nexus

from tests.test_nexus_ingest import fixture_tree


def test_write_read_partitioned_roundtrip(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    back = catalog.read_table(spark, root, "events")
    assert back.count() == 4
    # partition columns survive the directory layout
    assert {r.instrument_id for r in back.select("instrument_id").collect()} == {"REF_L"}
    # partition pruning: the run filter must reach the input paths
    plan = back.filter(
        (back.instrument_id == "REF_L") & (back.run_number == 12345)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_write_table_sort_by_yields_disjoint_file_ranges(spark, tmp_path):
    """sort_by range-clusters the rows: each written file covers a
    disjoint slice of the sort column, so row-group min/max stats can
    skip files/groups for a pushed range predicate."""
    from pyspark.sql import functions as F

    df = (spark.range(0, 20000)
          .select(F.col("id").alias("event_id"),
                  F.xxhash64("id").alias("ts")))
    root = str(tmp_path / "lake")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        (df.repartitionByRange(4, "ts").sortWithinPartitions("ts")
         .write.parquet(f"{root}/sorted"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    back = spark.read.parquet(f"{root}/sorted")
    per_file = (back.groupBy(F.input_file_name().alias("f"))
                .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
                .collect())
    assert len(per_file) >= 3
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint: stats-based skipping is possible
    assert back.count() == 20000

    # the write_table branch itself: same rows back, sorted layout
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    ev = nexus.ingest_table(spark, [str(p)], "events")
    catalog.write_table(ev, root, "events", sort_by=["time_offset"])
    assert catalog.read_table(spark, root, "events").count() == 4


def test_routing_by_directory_and_filename():
    got = catalog.route_files([
        "/lake/events/part-0.parquet",
        "/lake/daslogs/a/part-1.parquet",
        "/drop/REF_L_123_event_summary.parquet",
        "/drop/REF_L_123_events_part001.parquet",
        "/drop/REF_L_123_metadata.parquet",
        "/drop/unrelated.txt",
    ])
    assert got == {
        "events": ["/lake/events/part-0.parquet",
                    "/drop/REF_L_123_events_part001.parquet"],
        "daslogs": ["/lake/daslogs/a/part-1.parquet"],
        "event_summary": ["/drop/REF_L_123_event_summary.parquet"],
        "experiment_runs": ["/drop/REF_L_123_metadata.parquet"],
    }


def test_ingest_routed_end_to_end(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    src = str(tmp_path / "drop_events.parquet")
    nexus.ingest_table(spark, [str(p)], "events").write.parquet(src)
    root = str(tmp_path / "lake")
    written = catalog.ingest_routed(spark, [src], root)
    assert set(written) == {"events"}
    assert catalog.read_table(spark, root, "events").count() == 4


def test_chunked_write_and_compaction(spark, tmp_path):
    """S7/file sizing: maxRecordsPerFile splits; compaction merges back."""
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events", max_records_per_file=1)
    ev = catalog.read_table(spark, root, "events")
    assert len(ev.inputFiles()) >= 4  # one row per file
    n_files = catalog.compact_table(spark, root, "events")
    assert n_files < 4
    assert catalog.read_table(spark, root, "events").count() == 4


def test_upsert_table(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    # new version of event_idx 0/1 (weight bumped) + a brand-new row
    from pyspark.sql import functions as F

    updates = df.filter(F.col("event_idx") < 2).withColumn(
        "event_weight", F.lit(9.0)
    ).unionByName(
        df.filter(F.col("event_idx") == 3).withColumn("event_idx", F.lit(99).cast("long"))
    )
    catalog.upsert_table(spark, updates, root, "events",
                         keys=["run_id", "bank", "event_idx"])
    back = catalog.read_table(spark, root, "events")
    assert back.count() == 5  # 4 original - 2 replaced + 2 new versions + 1 new
    got = {r.event_idx: r.event_weight for r in back.collect()}
    assert got[0] == 9.0 and got[1] == 9.0  # updated
    assert got[2] == 1.0 and got[3] == 1.0  # untouched
    assert 99 in got                          # inserted


def test_delete_from_table(spark, tmp_path):
    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    victims = spark.createDataFrame([(100,), (103,)], "event_id long")
    removed = catalog.delete_from_table(spark, root, "events", victims,
                                        keys=["event_id"])
    assert removed == 2
    left = {r.event_id for r in
            catalog.read_table(spark, root, "events").collect()}
    assert left == {101, 102}


def test_writes_are_zstd(spark, tmp_path):
    """SURVEY §4: the reference documents ZSTD but writes snappy; our
    engine honors the documented intent — verify at the file level."""
    import pyarrow.parquet as pq

    p = tmp_path / "run.json"
    p.write_text(json.dumps(fixture_tree()))
    df = nexus.ingest_table(spark, [str(p)], "events")
    root = str(tmp_path / "lake")
    catalog.write_table(df, root, "events")
    files = catalog.read_table(spark, root, "events").inputFiles()
    meta = pq.ParquetFile(files[0].removeprefix("file:")).metadata
    codecs = {meta.row_group(i).column(0).compression
              for i in range(meta.num_row_groups)}
    assert codecs == {"ZSTD"}


def test_ddl_generation():
    ddl = table_ddl("events")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS events")
    assert "PARTITIONED BY (instrument_id, run_number)" in ddl
    assert "pulse_time DOUBLE" in ddl


def test_iceberg_ddl_matches_reference_partition_specs():
    """The emitted Iceberg DDL must carry the reference's partition specs
    (init_neutron_data.py:129-201): run-key pair for the big tables,
    instrument only for experiment_runs."""
    for table in ("events", "daslogs", "event_summary"):
        ddl = table_ddl(table, fmt="iceberg", qualifier="lake.nexus")
        assert f"CREATE TABLE IF NOT EXISTS lake.nexus.{table}" in ddl
        assert "USING iceberg" in ddl
        assert "PARTITIONED BY (instrument_id, run_number)" in ddl
    runs = table_ddl("experiment_runs", fmt="iceberg", qualifier="lake.nexus")
    assert "PARTITIONED BY (instrument_id)" in runs
    assert "USING iceberg" in runs
    # unpartitioned dims emit no partition clause
    assert "PARTITIONED BY" not in table_ddl("sample", fmt="iceberg")


def test_iceberg_write_requires_configured_catalog(spark):
    import pytest

    df = spark.createDataFrame([("REF_L", 1)], "instrument_id string, run_number long")
    with pytest.raises(RuntimeError, match="spark.sql.catalog.lake"):
        catalog.write_table(df, "lake.nexus", "events", fmt="iceberg")
    with pytest.raises(RuntimeError, match="not configured"):
        catalog.read_table(spark, "lake.nexus", "events", fmt="iceberg")
