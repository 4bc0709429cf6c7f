"""Interchange formats: schema-enforced JSONL / CSV import and export.

Parquet is the lake format; JSONL and CSV are the corpus interchange
boundary (vendor drops, crawler output, labeling exports). Two rules
keep these scale-safe:

* **Imports always take an explicit schema.** Inference
  (``inferSchema`` / sampled JSON schema discovery) reads the data
  twice and can flip types between drops — at 100 TB that is both a
  second full scan and a silent schema drift. Declared schema = one
  scan, stable types, and Spark's vectorized readers.
* **Corrupt rows are audited, not dropped silently.** PERMISSIVE mode
  retains the raw line in ``_corrupt_record``; ``import_with_audit``
  splits good rows from bad lines so pipelines can gate on a corrupt
  fraction (see operators/quality.py) instead of discovering loss later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def _complex_fields(schema: StructType) -> list[str]:
    return [
        f.name for f in schema.fields
        if f.dataType.typeName() in ("struct", "array", "map")
    ]


def export_jsonl(
    df: DataFrame, path: str, *, compression: str = "gzip", mode: str = "overwrite"
) -> None:
    """One JSON object per line, sharded by partition (each task writes
    its own file — no single-writer bottleneck; downstream globs)."""
    df.write.mode(mode).option("compression", compression).json(path)


def import_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    strict: bool = True,
) -> DataFrame:
    """Schema-enforced JSONL read. ``strict`` fails the job on the first
    malformed line (FAILFAST); otherwise malformed lines become all-null
    rows (use ``import_with_audit`` to keep and count them)."""
    return (
        spark.read.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .json(path)
    )


def export_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    delimiter: str = ",",
    compression: str = "gzip",
    mode: str = "overwrite",
) -> None:
    """CSV export. Rejects nested columns up front — CSV cannot carry
    them, and Spark's writer error at task time is far less readable."""
    bad = _complex_fields(df.schema)
    if bad:
        raise ValueError(
            f"CSV cannot represent nested columns {bad}; "
            "to_json() them first or use export_jsonl"
        )
    (
        df.write.mode(mode)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("compression", compression)
        .csv(path)
    )


def import_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    strict: bool = True,
) -> DataFrame:
    """Schema-enforced CSV read (no inferSchema — see module docstring)."""
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .csv(path)
    )


def export_orc(
    df: DataFrame, path: str, *, compression: str = "zstd", mode: str = "overwrite"
) -> None:
    """ORC export — the columnar interchange twin of parquet for Hive/Trino
    estates. Same sharded-writer model as the other exports; ORC carries
    nested types, per-stripe min/max indexes, and codec choice natively."""
    df.write.mode(mode).option("compression", compression).orc(path)


def import_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
) -> DataFrame:
    """ORC read. Schema is optional (ORC files embed one, so there is no
    inference scan to avoid); passing it enforces a contract — missing
    columns resolve to null, type clashes fail at plan time. Predicate
    pushdown reaches stripe/row-group indexes exactly as with parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def import_with_audit(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    fmt: str = "json",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE import that separates good rows from corrupt lines.

    Returns ``(good, bad)``: ``good`` has exactly ``schema``'s columns;
    ``bad`` is ``(raw string)`` — the unparseable source lines, kept for
    quarantine/inspection. One read feeds both (the reader is lazy; the
    two filters share the scan within a stage).
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not already contain {CORRUPT_COL}")
    audited = schema.add(CORRUPT_COL, "string")
    reader = (
        spark.read.schema(audited)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    # Spark refuses plans that reference ONLY the internal corrupt-record
    # column of a live reader (SPARK-21610); the documented pattern is to
    # materialize the parsed result first. Interchange drops are
    # boundary-sized; for a huge quarantine pass, persist(DISK_ONLY) or
    # re-read the good side separately.
    df = reader.format(fmt).load(path).cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return good, bad
