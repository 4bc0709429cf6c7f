"""Arrow Flight replay server (S18, SURVEY.md §2.1).

Re-expresses the reference's Flight path (scripts/replay_events.py:147-241):
serve event tables over gRPC as Arrow record-batch streams — the
high-throughput replay channel (the reference documents ~10M events/s vs
~100K for JSONL, docs/event-replay.md:31-32).

The server is a thin adapter over Spark: each named table is produced by a
DataFrame; ``do_get`` materializes it to Arrow on demand. The Spark->Arrow
hop uses ``toArrow()`` (driver-collected), so this is a driver-egress
channel — callers stream *results* (filtered replays, slices), not raw
100 TB tables; the 100 TB path stays parquet/Kafka executor-side.

Import-gated: ``pyarrow.flight`` is optional at runtime.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

try:  # pragma: no cover - exercised via tests when flight is present
    import pyarrow.flight as _flight

    _BASE = _flight.FlightServerBase
except ImportError:  # pragma: no cover
    _flight = None
    _BASE = object


class EventFlightServer(_BASE):
    """Serves named DataFrame-producing tables as Arrow Flight streams.

    ``tables`` maps ticket names to zero-arg DataFrame factories, so the
    Spark plan (with its pushdown filters) is built per request.

    ``cache=True`` (default) memoizes the materialized Arrow table per
    name — a replay server typically serves the same slice to many
    consumers, and re-running the Spark collect per request would make
    every fetch pay query latency. Pass ``cache=False`` for live tables.
    """

    def __init__(self, tables: dict[str, Callable[[], DataFrame]],
                 location: str = "grpc://0.0.0.0:0", *, cache: bool = True):
        if _flight is None:  # pragma: no cover
            raise ImportError("pyarrow.flight is required for the Flight server")
        super().__init__(location)
        self._tables = tables
        self._cache: dict[str, object] | None = {} if cache else None

    @property
    def endpoint(self) -> str:
        return f"grpc://localhost:{self.port}"

    def _table(self, name: str):
        if name not in self._tables:
            raise KeyError(f"unknown flight table {name!r}")
        if self._cache is not None and name in self._cache:
            return self._cache[name]
        # Spark's toArrow() returns one chunk per task partition — dozens
        # of small batches. gRPC throughput is per-message-bounded, so
        # re-chunk into large contiguous batches before serving (~10x
        # fewer messages; the copy is driver-local and one-time).
        tbl = self._tables[name]().toArrow().combine_chunks()
        if self._cache is not None:
            self._cache[name] = tbl
        return tbl

    def _schema(self, name: str):
        # schema only — never materialize a table to advertise it
        return self._tables[name]().limit(0).toArrow().schema

    def list_flights(self, context, criteria):  # noqa: D102
        for name in self._tables:
            desc = _flight.FlightDescriptor.for_path(name.encode())
            yield _flight.FlightInfo(
                self._schema(name), desc, [], -1, -1
            )

    def do_get(self, context, ticket):  # noqa: D102
        name = ticket.ticket.decode()
        return _flight.RecordBatchStream(self._table(name))


def read_flight(endpoint: str, table: str):
    """Client side: fetch a served table as a pyarrow Table."""
    if _flight is None:  # pragma: no cover
        raise ImportError("pyarrow.flight is required for the Flight client")
    client = _flight.connect(endpoint)
    return client.do_get(_flight.Ticket(table.encode())).read_all()
