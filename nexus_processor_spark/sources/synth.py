"""Deterministic synthetic-table generators (events / documents /
embeddings) for benchmarking and development at arbitrary row counts.

All columns derive from ``xxhash64(id, salt)`` — no RNG state, so any
run regenerates bit-identical data, and ``spark.range(n, numPartitions)``
generates pre-partitioned (columns are pure functions of ``id``; no
shuffle anywhere in the write path). The schemas mirror the
``/root/testdata`` corpus so every operator in the engine runs unchanged
on synthesized tables (bench.py builds its 100M-row corpus from these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_KINDS = ("click", "view", "purchase", "signup", "error")
TS_BASE_NS = 1_700_000_000 * 10**9
TS_SPAN_NS = 30 * 24 * 3600 * 10**9


def _h(salt: int | str):
    return F.xxhash64(F.col("id"), F.lit(salt))


def synth_events(
    spark: SparkSession, rows: int, *, partitions: int = 64
) -> DataFrame:
    """Events: long-ns ``ts`` over a 30-day span, 5 event types, 1M-user
    id space, 2-decimal-ish values, tiny JSON props."""
    kinds = F.array(*[F.lit(x) for x in EVENT_KINDS])
    return spark.range(rows, numPartitions=partitions).select(
        F.col("id").alias("event_id"),
        (F.lit(TS_BASE_NS) + F.pmod(_h(1), F.lit(TS_SPAN_NS))).alias("ts"),
        F.element_at(kinds, (F.pmod(_h(2), F.lit(5)) + 1).cast("int"))
        .alias("event_type"),
        F.pmod(_h(3), F.lit(1_000_000)).alias("user_id"),
        (F.pmod(_h(4), F.lit(10_000_000)) / F.lit(1e5)).alias("value"),
        F.concat(
            F.lit('{"k": '), F.pmod(_h(5), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def synth_documents(
    spark: SparkSession, rows: int, *, partitions: int = 64
) -> DataFrame:
    """Documents: 40-240 tokens each, drawn with a Zipf-like skew (token
    id modulo a hashed cap), 4 langs x 4 sources."""
    n_toks = (F.lit(40) + F.pmod(_h(0), F.lit(200))).cast("int")
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(
            F.xxhash64(F.col("id") * 1000 + i),
            F.pmod(F.xxhash64(F.col("id") * 7919 + i), F.lit(30000)) + 1,
        ),
    )
    df = spark.range(rows, numPartitions=partitions).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_toks), tok))
        .alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.pmod(_h(1), F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code"), F.lit("wiki")),
            (F.pmod(_h(2), F.lit(4)) + 1).cast("int"),
        ).alias("source"),
    )
    return df.withColumn("n_chars", F.length("text").cast("long"))


def synth_embeddings(
    spark: SparkSession,
    rows: int,
    *,
    dim: int = 64,
    cells: int = 256,
    partitions: int = 32,
) -> DataFrame:
    """Embeddings: float vectors in [-1, 1) with a coarse-cell label."""
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), F.lit(100_000))
            / F.lit(50_000.0) - F.lit(1.0)
        ).cast("float"),
    )
    return spark.range(rows, numPartitions=partitions).select(
        F.col("id").alias("vec_id"),
        vec.alias("embedding"),
        F.pmod(_h("cell"), F.lit(cells)).cast("int").alias("label"),
    )


GENERATORS = {
    "events": synth_events,
    "documents": synth_documents,
    "embeddings": synth_embeddings,
}
