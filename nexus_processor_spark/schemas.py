"""Declared StructTypes for the engine's nine run tables (SURVEY.md §1.4).

Schema discipline mirrors the reference (src/nexus_processor/schemas.py:10-15,
37-210): fixed, explicit, never inferred; every non-partition field nullable;
field descriptions carried as metadata; unknown input fields land in
``additional_fields`` maps instead of widening the schema.

Type mapping (SURVEY.md §1.2): large_string->String, int64->Long,
float64->Double, map(str,str)->MapType, ISO-8601 timestamps kept as
strings for fidelity, relative times as Double seconds.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_STR = StringType()
_LONG = LongType()
_DOUBLE = DoubleType()
_MAP = MapType(StringType(), StringType())


def _f(name: str, dtype, desc: str, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable, metadata={"description": desc})


# Invariant prefix on every table: the composite run key. Partition columns
# are non-null; run_id is derived ("instrument:run", colon-separated).
def _run_key() -> list[StructField]:
    return [
        _f("instrument_id", _STR, "Instrument short name, e.g. REF_L", nullable=False),
        _f("run_number", _LONG, "Facility run number", nullable=False),
        _f("run_id", _STR, "Composite key 'instrument_id:run_number'", nullable=False),
    ]


METADATA_SCHEMA = StructType(_run_key() + [
    _f("title", _STR, "Run title"),
    _f("start_time", _STR, "Run start, ISO-8601 string"),
    _f("end_time", _STR, "Run end, ISO-8601 string"),
    _f("duration", _DOUBLE, "Run duration in seconds"),
    _f("proton_charge", _DOUBLE, "Integrated proton charge"),
    _f("total_counts", _LONG, "Total detector counts"),
    _f("experiment_identifier", _STR, "Experiment / proposal id"),
    _f("definition", _STR, "NeXus application definition"),
    _f("source_file", _STR, "Originating NeXus file name"),
    _f("source_path", _STR, "Originating NeXus file path"),
    _f("ingestion_time", _STR, "Ingestion wall-clock, ISO-8601"),
    _f("file_attributes", _MAP, "Root-level HDF5 attributes"),
    _f("entry_attributes", _MAP, "Entry-level HDF5 attributes"),
])

SAMPLE_SCHEMA = StructType(_run_key() + [
    _f("name", _STR, "Sample name"),
    _f("nature", _STR, "Sample nature/state"),
    _f("chemical_formula", _STR, "Chemical formula"),
    _f("mass", _DOUBLE, "Sample mass"),
    _f("temperature", _DOUBLE, "Sample temperature"),
    _f("additional_fields", _MAP, "Unmapped sample-group fields"),
])

INSTRUMENT_SCHEMA = StructType(_run_key() + [
    _f("name", _STR, "Instrument long name"),
    _f("beamline", _STR, "Beamline identifier"),
    _f("instrument_xml_data", _STR, "Embedded instrument XML, flattened"),
    _f("additional_fields", _MAP, "Unmapped instrument-group fields"),
])

SOFTWARE_SCHEMA = StructType(_run_key() + [
    _f("component", _STR, "Software component group name"),
    _f("name", _STR, "Software name"),
    _f("version", _STR, "Software version"),
    _f("additional_fields", _MAP, "Unmapped software fields"),
])

USERS_SCHEMA = StructType(_run_key() + [
    _f("user_id", _STR, "User group id within the entry"),
    _f("name", _STR, "Participant name (PII, opt-in)"),
    _f("facility_user_id", _STR, "Facility user id"),
    _f("role", _STR, "Role on the experiment"),
    _f("additional_fields", _MAP, "Unmapped user fields"),
])

DASLOGS_SCHEMA = StructType(_run_key() + [
    _f("log_name", _STR, "DAS log (process variable) name"),
    _f("device_name", _STR, "Source device name"),
    _f("device_id", _STR, "Source device id"),
    _f("time", _DOUBLE, "Seconds from run start (null for stats-only logs)"),
    _f("value", _STR, "Sample value, string-encoded (mixed types)"),
    _f("value_numeric", _DOUBLE, "try-parsed numeric value, null if non-numeric"),
    _f("average_value", _DOUBLE, "Run-level average carried per row"),
    _f("min_value", _DOUBLE, "Run-level minimum carried per row"),
    _f("max_value", _DOUBLE, "Run-level maximum carried per row"),
])

EVENTS_SCHEMA = StructType(_run_key() + [
    _f("bank", _STR, "Detector bank group name, e.g. bank1_events"),
    _f("event_idx", _LONG, "Event ordinal within the bank"),
    _f("pulse_index", _LONG, "Owning pulse ordinal (CSR expansion)"),
    _f("pulse_time", _DOUBLE, "Pulse wall-clock seconds from run start (denormalized)"),
    _f("event_id", _LONG, "Detector pixel id"),
    _f("time_offset", _DOUBLE, "Microseconds within the pulse"),
    _f("event_weight", _DOUBLE, "Event weight, default 1.0"),
])

EVENT_SUMMARY_SCHEMA = StructType(_run_key() + [
    _f("bank", _STR, "Detector bank group name"),
    _f("total_counts", _LONG, "Counts recorded in the source file"),
    _f("n_pulses", _LONG, "Pulse count for the bank"),
    _f("events_extracted", _LONG, "Events actually extracted"),
])

EXPERIMENT_RUNS_SCHEMA = StructType(_run_key() + [
    _f("title", _STR, "Run title"),
    _f("start_time", _STR, "Run start, ISO-8601"),
    _f("end_time", _STR, "Run end, ISO-8601"),
    _f("duration", _DOUBLE, "Run duration seconds"),
    _f("proton_charge", _DOUBLE, "Integrated proton charge"),
    _f("total_counts", _LONG, "Total detector counts"),
    _f("experiment_identifier", _STR, "Experiment / proposal id"),
    _f("sample", StructType([
        _f("name", _STR, "Sample name"),
        _f("nature", _STR, "Sample nature"),
        _f("chemical_formula", _STR, "Formula"),
        _f("mass", _DOUBLE, "Mass"),
        _f("temperature", _DOUBLE, "Temperature"),
    ]), "Denormalized sample struct"),
    _f("instrument", StructType([
        _f("name", _STR, "Instrument name"),
        _f("beamline", _STR, "Beamline"),
    ]), "Denormalized instrument struct"),
    _f("software", ArrayType(StructType([
        _f("component", _STR, "Component"),
        _f("name", _STR, "Name"),
        _f("version", _STR, "Version"),
    ])), "Software component list"),
    _f("users", ArrayType(StructType([
        _f("name", _STR, "Name"),
        _f("role", _STR, "Role"),
        _f("facility_user_id", _STR, "Facility id"),
    ])), "Participant list"),
    _f("source_file", _STR, "Originating NeXus file"),
    _f("ingestion_time", _STR, "Ingestion wall-clock, ISO-8601"),
])

# Catalog: table name -> (schema, partition columns). daslogs/events/
# event_summary partition by the run key pair; experiment_runs by
# instrument only (few rows per run). SURVEY.md §1.4.
TABLES: dict[str, tuple[StructType, tuple[str, ...]]] = {
    "metadata": (METADATA_SCHEMA, ()),
    "sample": (SAMPLE_SCHEMA, ()),
    "instrument": (INSTRUMENT_SCHEMA, ()),
    "software": (SOFTWARE_SCHEMA, ()),
    "users": (USERS_SCHEMA, ()),
    "daslogs": (DASLOGS_SCHEMA, ("instrument_id", "run_number")),
    "events": (EVENTS_SCHEMA, ("instrument_id", "run_number")),
    "event_summary": (EVENT_SUMMARY_SCHEMA, ("instrument_id", "run_number")),
    "experiment_runs": (EXPERIMENT_RUNS_SCHEMA, ("instrument_id",)),
}


def table_ddl(name: str, *, fmt: str = "parquet", qualifier: str = "") -> str:
    """CREATE TABLE DDL for a catalog table — the Spark-native analog of
    the reference's schema->Iceberg DDL generator (schemas.py:234-268).

    ``fmt="iceberg"`` emits the DDL the reference's lakehouse init issues
    (init_neutron_data.py:129-201): same columns, same PARTITIONED BY
    specs, ``USING iceberg``. ``qualifier`` prefixes a catalog.namespace.

    Rendered in pure Python (``simpleString`` type names, which the Spark
    DDL parser accepts) so the CLI ``ddl`` command needs no live session —
    ``StructType.toDDL`` would require a JVM.
    """
    schema, parts = TABLES[name]

    def col_ddl(f: StructField) -> str:
        t = f.dataType.simpleString()
        if not t.startswith(("map", "array", "struct")):
            t = t.upper()  # primitives uppercase; nested keep field casing
        return f"{f.name} {t}" + ("" if f.nullable else " NOT NULL")

    target = f"{qualifier}.{name}" if qualifier else name
    cols = ", ".join(col_ddl(f) for f in schema.fields)
    ddl = f"CREATE TABLE IF NOT EXISTS {target} ({cols}) USING {fmt}"
    if parts:
        ddl += f" PARTITIONED BY ({', '.join(parts)})"
    return ddl
