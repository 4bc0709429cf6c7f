"""nexus_processor_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference toolkit ``neutrons-ai/nexus-processor``
(surveyed in /root/repo/SURVEY.md):

* ETL         — NeXus HDF5 -> typed, partitioned Parquet (``sources.nexus``)
* Lakehouse   — table schemas, routing ingest, partitioned writes (``sources.catalog``)
* Analytics   — time-slice queries over billions of events (``operators.timeslice``)
* Streaming   — event replay, batch + Structured Streaming (``streaming.replay``)

Plus large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) under ``operators``.

Everything is declared through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, and join planning; Python UDFs are
reserved for the HDF5 ingest boundary and vector math where built-in
expressions cannot express the semantics.
"""

__version__ = "0.1.0"

from nexus_processor_spark.session import get_spark  # noqa: F401
