"""Multimodal operator queries with DuckDB twins.

The media fixture is synthesized identically in both engines from the
``documents`` table (payload = the document text's UTF-8 bytes), and the
decode boundary uses the DIGEST decoder
(``sources.multimodal._decode_image_digest`` / ``_decode_audio_digest``):
every pixel/sample is an exact arithmetic function of ``sha256(payload)``
that DuckDB recomputes with hex-char arithmetic. That makes the ENTIRE
Spark-side pipeline — binary column plumbing, Arrow-batched mapInPandas
feature kernels, the 64-bit dhash, the banded Hamming near-dup join —
hash-checkable against an independent engine, while the real-codec path
(PIL/soundfile) stays import-gated behind the same decode contract.

Reference scope: the reference has no media pipeline; these implement the
brief's multimodal requirement (opaque binary + typed metadata, decode
stubbed deterministically, Spark plumbing real).

Float discipline: features cross the oracle as exact INTEGERS —
``mean_luma`` is a /64 (power-of-two) mean of byte sums so ``*64`` is
float32-exact; ``peak`` is ``max|b-128|/128`` so ``*128`` is exact; rms
(a sqrt) is deliberately NOT oracle-crossed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.sources import multimodal
from nexus_processor_spark.sources.tables import load_table

HAMMING_MAX = 4

# DuckDB: sha256 hex -> list of 32 digest byte values (the shared prefix
# of every oracle below; Python-side twin is np.frombuffer(digest))
_DIGEST_CTE = """
WITH m AS (
    SELECT doc_id AS media_id, sha256(text) AS h,
           octet_length(encode(text)) AS n_bytes
    FROM documents WHERE text IS NOT NULL
), b AS (
    SELECT media_id, n_bytes,
        list_transform(range(0, 32), j ->
            (strpos('0123456789abcdef',
                    substr(h, CAST(1 + 2 * j AS INT), 1)) - 1) * 16
            + strpos('0123456789abcdef',
                     substr(h, CAST(2 + 2 * j AS INT), 1)) - 1) AS d
    FROM m
)
"""

# the 8x8 digest image's difference hash, bit t = i*8+j (row-major MSB
# first): pixel(i,j) = d[(i*8+j) % 32]; bit = pixel(i,j+1) > pixel(i,j)
# for j < 7, 0 for the edge-replicated last column; bit 0 carries -2^63
# (two's-complement signed int64, matching multimodal._dhash)
_DHASH_EXPR = """
CAST(list_sum(list_transform(range(0, 64), t ->
    CASE WHEN t % 8 < 7
              AND d[CAST((t + 1) % 32 AS INT) + 1]
                  > d[CAST(t % 32 AS INT) + 1]
         THEN CASE WHEN t = 0 THEN -9223372036854775807 - 1
                   ELSE (1::BIGINT << CAST(63 - t AS INT)) END
         ELSE 0 END)) AS BIGINT)
"""


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
    )


def q_image_digest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched image feature extraction over the digest decode:
    per-media byte count and exact luma sum (mean_luma*64 is float32-
    exact — see module docstring)."""
    feats = multimodal.extract_image_features(
        _media(spark, sf_dir), decoder=multimodal._decode_image_digest)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.col("mean_luma") * 64).cast("long").alias("sum_luma"),
    )


def q_audio_digest_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform features over the 32-sample digest decode: sample count,
    exact scaled peak, zero crossings."""
    feats = multimodal.extract_audio_features(
        _media(spark, sf_dir), decoder=multimodal._decode_audio_digest)
    return feats.select(
        "media_id",
        "n_samples",
        F.round(F.col("peak") * 128).cast("long").alias("peak_x128"),
        F.col("zero_crossings"),
    )


def q_image_neardup_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dhash near-dup pairs via the banded pigeonhole join (never n²);
    the oracle's exact all-pairs Hamming join must produce the SAME set
    — recall is guaranteed by the hamming_max+1 banding."""
    pairs = multimodal.image_near_dup_pairs(
        _media(spark, sf_dir),
        hamming_max=HAMMING_MAX,
        decoder=multimodal._decode_image_digest,
    )
    return pairs.select(
        "media_a", "media_b", F.col("hamming").cast("long").alias("hamming"))


FRAME_EVERY_MS = 250


def _video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video fixture: payload = the document bytes, duration_ms = the
    payload's byte length (1 byte = 1 ms) — deterministic metadata both
    engines derive identically."""
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            F.col("text").cast("binary").alias("payload"),
            F.octet_length("text").cast("long").alias("duration_ms"),
        )
    )


def q_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full video frame pipeline: native timestamp grid (explode
    over sequence), payload equi-join, Arrow-batched seek-decode kernel
    — one row per sampled frame, sum_luma an exact integer of the
    digest decode so the oracle replays grid + decode + feature with
    zero tolerance."""
    return multimodal.extract_frame_features(
        _video(spark, sf_dir), every_ms=FRAME_EVERY_MS,
        decoder=multimodal._decode_frame_digest,
    )


QUERIES = {
    "image_digest_stats": q_image_digest_stats,
    "audio_digest_stats": q_audio_digest_stats,
    "image_neardup_dhash": q_image_neardup_dhash,
    "video_frame_stats": q_video_frame_stats,
}

ORACLE = {
    "image_digest_stats": _DIGEST_CTE + """
SELECT media_id, n_bytes,
       CAST(2 * list_sum(d) AS BIGINT) AS sum_luma
FROM b
""",
    "audio_digest_stats": _DIGEST_CTE + """
SELECT media_id,
       32::BIGINT AS n_samples,
       CAST(list_max(list_transform(range(0, 32), j ->
           abs(d[CAST(j AS INT) + 1] - 128))) AS BIGINT) AS peak_x128,
       CAST(list_sum(list_transform(range(1, 32), i ->
           CASE WHEN (d[CAST(i AS INT)] < 128)
                     != (d[CAST(i AS INT) + 1] < 128)
                THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
FROM b
""",
    "image_neardup_dhash": _DIGEST_CTE + f"""
, hsh AS (SELECT media_id, {_DHASH_EXPR} AS dhash FROM b)
SELECT a.media_id AS media_a, x.media_id AS media_b,
       CAST(bit_count(xor(a.dhash, x.dhash)) AS BIGINT) AS hamming
FROM hsh a JOIN hsh x ON a.media_id < x.media_id
WHERE bit_count(xor(a.dhash, x.dhash)) <= {HAMMING_MAX}
""",
    # grid (duration // every inclusive, ts < duration — Spark's
    # sequence(0, n) + filter replayed with integer division), then
    # frame f's luma: pixel t = (d[t % 32] + f) % 256 tiled twice
    "video_frame_stats": _DIGEST_CTE + f"""
SELECT media_id,
       CAST(f * {FRAME_EVERY_MS} AS BIGINT) AS frame_ts_ms,
       64::BIGINT AS n_px,
       CAST(2 * list_sum(list_transform(range(0, 32), j ->
           (d[CAST(j AS INT) + 1] + f) % 256)) AS BIGINT) AS sum_luma
FROM (
    SELECT media_id, d, n_bytes,
           unnest(range(0, n_bytes // {FRAME_EVERY_MS} + 1)) AS f
    FROM b
)
WHERE f * {FRAME_EVERY_MS} < n_bytes
""",
}
