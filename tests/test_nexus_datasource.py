"""The Spark 4 Python Data Source twin of the mapInPandas ingest."""

from __future__ import annotations

import json

import pytest

from nexus_processor_spark.sources import nexus
from nexus_processor_spark.sources.nexus_datasource import register
from tests.test_nexus_ingest import fixture_tree


@pytest.fixture()
def run_files(tmp_path):
    for i in (1, 2):
        tree = fixture_tree()
        tree["entry"]["run_number"] = 12344 + i
        (tmp_path / f"run_{i}.json").write_text(json.dumps(tree))
    return str(tmp_path / "*.json")


def _read(spark, pattern, table, **opts):
    register(spark)
    r = spark.read.format("nexus").option("table", table)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load(pattern)


def test_datasource_matches_ingest_table(spark, run_files, tmp_path):
    import glob

    paths = sorted(glob.glob(run_files))
    for table in ("events", "metadata", "daslogs", "users"):
        via_ds = _read(spark, run_files, table,
                       ingestion_time="2026-01-01T00:00:00")
        via_map = nexus.ingest_table(
            spark, paths, table, ingestion_time="2026-01-01T00:00:00"
        )
        assert via_ds.schema == via_map.schema, table
        a = sorted(map(tuple, via_ds.collect()))
        b = sorted(map(tuple, via_map.collect()))
        assert a == b, table


def test_datasource_one_partition_per_file(spark, run_files):
    df = _read(spark, run_files, "events")
    assert df.rdd.getNumPartitions() == 2


def test_datasource_unknown_table_raises(spark, run_files):
    with pytest.raises(Exception, match="unknown nexus table"):
        _read(spark, run_files, "nope").collect()


def test_datasource_skip_bad_files(spark, tmp_path):
    (tmp_path / "good.json").write_text(json.dumps(fixture_tree()))
    (tmp_path / "bad.json").write_text("{not json")
    pattern = str(tmp_path / "*.json")
    ok = _read(spark, pattern, "events", skip_bad_files="true")
    assert ok.count() == 4  # the good file's 4 events
    with pytest.raises(Exception):
        _read(spark, pattern, "events").collect()


def test_datasource_composes_with_sql_pushdown(spark, run_files):
    df = _read(spark, run_files, "events")
    df.createOrReplaceTempView("nexus_events")
    out = spark.sql(
        "SELECT bank, count(*) AS n FROM nexus_events "
        "WHERE event_id >= 102 GROUP BY bank ORDER BY bank"
    ).collect()
    assert [(r.bank, r.n) for r in out] == [("bank1_events", 4)]
