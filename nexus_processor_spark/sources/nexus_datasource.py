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
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
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
        # Plain (nullable, metadata-free) twin of the table schema: the
        # simple streaming reader's prefetched-Arrow handoff asserts
        # batch/declared schema equality, and BOTH non-nullable fields
        # and field metadata fail that assert (Arrow batches arrive
        # nullable and bare). Spark's own file sources treat read
        # schemas as nullable too; the writer-side schemas (catalog)
        # keep the strict nullability + description contract.
        from pyspark.sql.types import StructField

        return StructType([
            StructField(f.name, f.dataType, True)
            for f in TABLES[table][0].fields
        ])

    def reader(self, schema: StructType) -> "NexusReader":
        return NexusReader(dict(self.options), schema)

    def simpleStreamReader(self, schema: StructType) -> "NexusStreamReader":
        return NexusStreamReader(dict(self.options), schema)

    def streamWriter(self, schema: StructType, overwrite: bool
                     ) -> "NexusJsonlStreamWriter":
        return NexusJsonlStreamWriter(dict(self.options))


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
        self.path_glob = path
        self.paths = sorted(_glob.glob(path))
        self.cols = [f.name for f in schema.fields]
        self.bank_filters: list[Filter] = []
        self.run_filters: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Prune work, not correctness: supported predicates skip event
        banks before CSR expansion (``bank``) or whole files before any
        extraction (``run_number``). Every filter is yielded back, so
        Spark re-evaluates exactly — pushdown here only avoids reading.
        """
        for f in filters:
            attr = getattr(f, "attribute", None)
            if self.table == "events" and attr == ("bank",) and isinstance(
                f, (EqualTo, In)
            ):
                self.bank_filters.append(f)
            elif attr == ("run_number",) and isinstance(
                f,
                (EqualTo, In, GreaterThan, GreaterThanOrEqual,
                 LessThan, LessThanOrEqual),
            ):
                self.run_filters.append(f)
            yield f

    @staticmethod
    def _passes(value, flt: Filter) -> bool:
        if isinstance(flt, EqualTo):
            return value == flt.value
        if isinstance(flt, In):
            return value in flt.value
        if isinstance(flt, GreaterThan):
            return value > flt.value
        if isinstance(flt, GreaterThanOrEqual):
            return value >= flt.value
        if isinstance(flt, LessThan):
            return value < flt.value
        if isinstance(flt, LessThanOrEqual):
            return value <= flt.value
        return True  # pragma: no cover - only the six above are stored

    def partitions(self) -> Sequence[InputPartition]:
        return [InputPartition(p) for p in self.paths]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import sys

        from nexus_processor_spark.sources.nexus import (
            EXTRACTORS,
            event_bank_frames,
            load_tree,
            run_key,
        )

        path = partition.value
        # Everything fallible runs INSIDE the try, and nothing is yielded
        # until the whole file has parsed: skip_bad_files must mean
        # all-or-nothing per file — a mid-file failure after partial
        # yields would emit half a file while the log claims it was
        # skipped entirely.
        try:
            tree = load_tree(path)
            if self.run_filters:
                _, run_number, _ = run_key(tree)
                if not all(
                    self._passes(run_number, f) for f in self.run_filters
                ):
                    return  # whole file pruned before any extraction
            if self.table == "events":
                bank_ok = (
                    None if not self.bank_filters else
                    lambda b: all(
                        self._passes(b, f) for f in self.bank_filters
                    )
                )
                out = [
                    tuple(t)
                    for frame in event_bank_frames(tree, bank_filter=bank_ok)
                    for t in frame[self.cols].itertuples(index=False, name=None)
                ]
            else:
                extractor = EXTRACTORS[self.table]
                if self.table in ("metadata", "experiment_runs"):
                    rows = extractor(
                        tree, source_path=path,
                        ingestion_time=self.ingestion_time,
                    )
                else:
                    rows = extractor(tree)
                out = [tuple(row.get(c) for c in self.cols) for row in rows]
        except Exception:
            if not self.skip_bad:
                raise
            print(
                f"nexus source: skipping bad file {path!r}", file=sys.stderr
            )
            return
        yield from out


class NexusStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: ``spark.readStream.format("nexus")`` watches the
    glob and ingests each run file exactly once — the "new runs appear in
    the instrument directory" flow, with recovery handled by the engine.

    The default offset is the full sorted ingested-file list — safe for
    ANY arrival order (a new file is ingested wherever its name sorts).
    Opt IN to COMPACTED offsets with ``.option("offset_compaction",
    "true")`` to keep a long-lived stream's checkpoint log bounded:
    ``{"hw": <name>, "recent": [...]}`` where every globbed file with
    name <= ``hw`` is treated as ingested (files are immutable and never
    deleted) and ``recent`` lists only out-of-order stragglers above the
    high-water mark. With the reference's naming — zero-padded run
    numbers, so new files sort after old ones — ``recent`` is empty or a
    handful of in-flight names, regardless of stream age. Compaction's
    contract: a NEW file must never sort at-or-below the fully-ingested
    prefix (it would be treated as already seen and silently skipped) —
    which is why the unbounded-but-safe list is the default and the
    bounded form requires the caller to assert monotone naming. Both
    offset forms stay readable either way, so checkpoints survive
    flipping the option.

    ``read`` parses only files not yet in the offset;
    ``readBetweenOffsets`` re-parses exactly the files between two
    offsets, which is what makes crash replay deterministic.
    """

    def __init__(self, options: dict, schema: StructType) -> None:
        # reuse the batch reader per-file parse (filters don't push into
        # streams; construct with no pushed filters)
        self._batch = NexusReader(dict(options), schema)
        self._compact = str(
            options.get("offset_compaction", "false")
        ).lower() == "true"

    def initialOffset(self) -> dict:
        return {"hw": "", "recent": []} if self._compact else {"files": []}

    def _ingested(self, off: dict, universe: list) -> set:
        if "files" in off:  # legacy / uncompacted offset
            return set(off["files"])
        hw = off.get("hw", "")
        below = {p for p in universe if hw and p <= hw}
        return below | set(off.get("recent", []))

    def _offset(self, ingested: set, universe: list) -> dict:
        if not self._compact:
            return {"files": sorted(ingested)}
        hw = ""
        for p in sorted(set(universe) | ingested):
            if p not in ingested:
                break
            hw = p
        return {"hw": hw, "recent": sorted(p for p in ingested if p > hw)}

    def read(self, start: dict) -> tuple:
        import glob as _g

        # re-glob: new files appear between micro-batches
        universe = sorted(_g.glob(self._batch.path_glob))
        self._batch.paths = universe
        done = self._ingested(start, universe)
        new = [p for p in universe if p not in done]
        end = self._offset(done | set(new), universe)
        return iter(self._rows(new)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        import glob as _g

        universe = sorted(_g.glob(self._batch.path_glob))
        done = self._ingested(start, universe)
        span = self._ingested(end, universe) - done
        return self._rows(sorted(span))

    def _rows(self, paths: list) -> list:
        # materialized, not a generator: the simple-reader harness caches
        # and copies the returned rows for replay, and generators don't
        # pickle. Values are unboxed to plain Python (the streaming
        # runner Arrow-serializes rows driver-side and rejects numpy
        # scalars). Run-file batches are bounded (few files per trigger).
        return [
            tuple(x.item() if hasattr(x, "item") else x for x in t)
            for p in paths
            for t in self._batch.read(InputPartition(p))
        ]

    def commit(self, end: dict) -> None:
        pass  # files are immutable; nothing to clean up


class JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged file and its row count.
    Must be a picklable value object."""

    def __init__(self, staged: str, rows: int) -> None:
        self.staged = staged
        self.rows = rows


class NexusJsonlStreamWriter(DataSourceStreamWriter):
    """Exactly-once streaming JSONL sink (the stdout-JSONL replay shape
    of ``streaming/replay.py``, S17, as a durable directory sink).

    Two-phase per micro-batch: executors stage one
    ``.staging/<uuid>.jsonl`` file per partition and report it in their
    commit message; the driver's ``commit`` publishes the batch — rename
    staged files to ``batch<id>-<k>.jsonl`` and write a
    ``_manifest_<id>`` listing them. Exactly-once falls out of the
    manifest: a REPLAYED batch (failure after commit, before the
    checkpoint advanced) sees its manifest already present, discards its
    re-staged files, and publishes nothing twice. ``abort`` deletes
    staged files. Readers take the union of manifest contents and never
    see staged/uncommitted data.
    """

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("nexus jsonl sink requires .option('path', dir)")
        self.path = path

    def write(self, iterator) -> "JsonlCommit":
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, ".staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return JsonlCommit(staged, n)

    def _manifest(self, batch_id: int) -> str:
        import os

        return os.path.join(self.path, f"_manifest_{batch_id}")

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os

        staged = [m.staged for m in messages if m is not None and m.rows > 0]
        empty = [m.staged for m in messages if m is not None and m.rows == 0]
        for p in empty:
            os.remove(p)
        manifest = self._manifest(batchId)
        if os.path.exists(manifest):
            # replayed batch: already published — drop the duplicates
            for p in staged:
                os.remove(p)
            return
        finals = []
        for k, p in enumerate(sorted(staged)):
            final = os.path.join(self.path, f"batch{batchId}-{k}.jsonl")
            os.replace(p, final)
            finals.append(os.path.basename(final))
        tmp = manifest + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"batch": batchId, "files": finals}, f)
        os.replace(tmp, manifest)  # atomic publish

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


def register(spark) -> None:
    """Register the format for this session: idempotent, then
    ``spark.read.format('nexus')`` resolves.

    CALLER CONTRACT — this mutates session-wide conf: Python-source
    filter pushdown is opt-in in Spark 4.1 (runtime-settable) and
    readers that implement ``pushFilters`` error without it, so
    registering the format flips ``spark.sql.python.filterPushdown.
    enabled=true`` for the WHOLE session (it affects every Python data
    source, not just this one). Call at session setup, not per-query;
    restore the conf yourself if a co-tenant source must keep pushdown
    off."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(NexusDataSource)
