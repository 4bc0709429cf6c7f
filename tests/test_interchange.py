"""JSONL / CSV interchange: schema-enforced roundtrips + corrupt audits."""

from __future__ import annotations

import gzip
from pathlib import Path

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from nexus_processor_spark.sources import interchange
from nexus_processor_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("o_orderkey").collect()]


def test_jsonl_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_jsonl")
    interchange.export_jsonl(src, path)
    back = interchange.import_jsonl(spark, path, src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_csv")
    interchange.export_csv(src, path, delimiter="|")
    back = interchange.import_csv(spark, path, src.schema, delimiter="|")
    assert _sorted_rows(back) == _sorted_rows(src)


def test_csv_rejects_nested_columns(spark):
    df = _orders(spark).withColumn("nested", F.struct("o_orderkey"))
    with pytest.raises(ValueError, match="nested"):
        interchange.export_csv(df, "/tmp/never-written")


def test_strict_jsonl_fails_on_garbage(spark, tmp_path):
    p = tmp_path / "bad" / "part-0.json"
    p.parent.mkdir()
    p.write_text('{"a": 1}\nnot json at all\n{"a": 3}\n')
    schema = StructType().add("a", "long")
    with pytest.raises(Exception, match="FAILFAST|Malformed|malformed"):
        interchange.import_jsonl(spark, str(p.parent), schema).collect()


def test_import_with_audit_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "mixed" / "part-0.json"
    p.parent.mkdir()
    p.write_text('{"a": 1, "b": "x"}\n{oops\n{"a": 3, "b": "y"}\n[5]\n')
    schema = StructType().add("a", "long").add("b", "string")
    good, bad = interchange.import_with_audit(spark, str(p.parent), schema)
    assert sorted((r["a"], r["b"]) for r in good.collect()) == [
        (1, "x"), (3, "y")
    ]
    bad_rows = [r["raw"] for r in bad.collect()]
    assert "{oops" in bad_rows
    assert len(bad_rows) == 2
    assert good.columns == ["a", "b"]


def test_audit_rejects_reserved_column(spark):
    schema = StructType().add("_corrupt_record", "string")
    with pytest.raises(ValueError, match="_corrupt_record"):
        interchange.import_with_audit(spark, "/tmp/x", schema)


def test_jsonl_export_is_gzipped_lines(spark, tmp_path):
    src = _orders(spark).limit(5)
    path = tmp_path / "gz"
    interchange.export_jsonl(src, str(path))
    files = list(Path(path).glob("*.json.gz"))
    assert files
    line = gzip.open(files[0], "rt").readline()
    assert line.startswith("{") and '"o_orderkey"' in line


def test_orc_roundtrip(spark, tmp_path):
    src = _orders(spark)
    path = str(tmp_path / "orders_orc")
    interchange.export_orc(src, path)
    back = interchange.import_orc(spark, path)
    assert back.schema == src.schema
    assert _sorted_rows(back) == _sorted_rows(src)
    # declared-schema contract: a projection schema narrows the read
    narrow = StructType.fromDDL("o_orderkey bigint, o_totalprice double")
    got = interchange.import_orc(spark, path, narrow)
    assert got.columns == ["o_orderkey", "o_totalprice"]
    assert got.count() == src.count()
