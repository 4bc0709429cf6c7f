"""NeXus files as a first-class Spark 4 Python Data Source.

``spark.read.format("nexus")`` wraps the same tree-parse + extractor
pipeline as ``nexus.ingest_table`` (reference: the per-script h5py read
loops, e.g. nexus-processor's parquet exporter) in the engine-native
connector API: the scheduler sees one :class:`InputPartition` per file,
so reads parallelize across executors exactly like the mapInPandas
driver, but discovery/selection now composes with everything a format
gets for free — ``.schema()`` is the declared StructType (never
inferred), readers are pickled to executors, and the source name works
from pure SQL (``CREATE TABLE ... USING nexus`` semantics via
``spark.read``).

Usage::

    from nexus_processor_spark.sources.nexus_datasource import register
    register(spark)
    df = (spark.read.format("nexus")
          .option("table", "events")          # any key of schemas.TABLES
          .option("ingestion_time", "2026-01-01T00:00:00")
          .load("/data/runs/*.json"))

The mapInPandas path (``nexus.ingest_table``) stays the bulk-ingest
fast path (Arrow-framed numpy event banks); this connector is the
interactive/SQL-facing twin and is pinned row-equal to it by tests.
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from nexus_processor_spark.schemas import TABLES

DEFAULT_TABLE = "events"


class NexusDataSource(DataSource):
    """Batch data source for NeXus run files (JSON tree form; .h5 when
    h5py is importable — the same gate as ``nexus.load_tree``)."""

    @classmethod
    def name(cls) -> str:
        return "nexus"

    def schema(self) -> StructType:
        table = self.options.get("table", DEFAULT_TABLE)
        if table not in TABLES:
            raise ValueError(
                f"unknown nexus table {table!r}; one of {sorted(TABLES)}"
            )
        return TABLES[table][0]

    def reader(self, schema: StructType) -> "NexusReader":
        return NexusReader(dict(self.options), schema)


class NexusReader(DataSourceReader):
    def __init__(self, options: dict, schema: StructType) -> None:
        self.table = options.get("table", DEFAULT_TABLE)
        self.ingestion_time = options.get("ingestion_time", "")
        self.skip_bad = (
            str(options.get("skip_bad_files", "false")).lower() == "true"
        )
        path = options.get("path")
        if not path:
            raise ValueError("nexus source requires a path: .load('<glob>')")
        # resolved at planning time so partitions() is deterministic and
        # the task count equals the file count
        self.paths = sorted(_glob.glob(path))
        self.cols = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import sys

        from nexus_processor_spark.sources.nexus import (
            EXTRACTORS,
            event_bank_frames,
            load_tree,
        )

        path = partition.value
        try:
            tree = load_tree(path)
            if self.table == "events":
                for frame in event_bank_frames(tree):
                    yield from frame[self.cols].itertuples(
                        index=False, name=None
                    )
                return
            extractor = EXTRACTORS[self.table]
            if self.table in ("metadata", "experiment_runs"):
                rows = extractor(
                    tree, source_path=path, ingestion_time=self.ingestion_time
                )
            else:
                rows = extractor(tree)
        except Exception:
            if not self.skip_bad:
                raise
            print(
                f"nexus source: skipping bad file {path!r}", file=sys.stderr
            )
            return
        for row in rows:
            yield tuple(row.get(c) for c in self.cols)


def register(spark) -> None:
    """Register the format for this session: idempotent, then
    ``spark.read.format('nexus')`` resolves."""
    spark.dataSource.register(NexusDataSource)
