"""Named query registry — the engine's public, oracle-checked surface.

Each submodule contributes ``QUERIES`` (name -> callable(spark, sf_dir) ->
DataFrame) and ``ORACLE`` (name -> equivalent DuckDB SQL over the testdata
views). The driver hash-compares each pair at sf0.01 (see repo
``__spark_entry__.py``); names without oracle SQL get a rows-only check.

Cross-engine determinism rules every query here follows:

* Alias every computed column identically in Spark and SQL.
* Aggregate longs are cast to BIGINT in DuckDB (its SUM on integers is
  HUGEINT) and window ordinals to long in Spark (its row_number is int).
* Double *sums* are rounded (accumulation order differs between engines);
  min/max/exact-rational divisions are left raw (bit-identical).
* Top-k queries order by (rounded measure, unique key) so the selected
  *set* is deterministic; final row order is irrelevant to the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.queries import (
    analytic_q,
    behavior_q,
    dedup_q,
    graph_q,
    multimodal_q,
    pipeline_q,
    profile_q,
    relational_q,
    similarity_q,
    spans_q,
    text_q,
    timeslice_q,
    tokenizer_q,
)

_MODULES = (timeslice_q, relational_q, dedup_q, similarity_q, text_q,
            pipeline_q, profile_q, behavior_q, graph_q, analytic_q,
            tokenizer_q, spans_q, multimodal_q)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
