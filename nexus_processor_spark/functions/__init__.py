from nexus_processor_spark.functions.core import (  # noqa: F401
    event_micros,
    event_seconds,
    event_timestamp,
    interval_bounds,
    interval_floor,
    make_run_id,
    run_id_from_filename,
    run_id_to_filename,
    to_attribute_map,
    try_parse_numeric,
)
