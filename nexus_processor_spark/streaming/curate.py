"""Streaming corpus curation: the nightly-ingest twin of
``pipeline.curate_corpus``.

Each micro-batch of new documents is gated (length floor), exact-deduped
(within the batch AND against every previously-kept document), and
near-deduped (MinHash bands within the batch and against the kept
corpus), then the survivors are appended to a per-batch sink directory
and the dedup state advances — all exactly-once.

## State = hashes, never documents

The accumulated state holds only the SURVIVORS' content md5s and their
banded MinHash signatures (fixed-width keys, ``kind`` + ``key`` rows):
at 100 TB of kept corpus the state is ~1+num_bands short strings per
document — the key-set-not-data rule (`pipeline.incremental_dedup`).
Dropped documents contribute nothing, so one viral duplicate never
bloats the index.

Cross-batch near-dup is CANDIDATE-level: a new doc is dropped when any
of its band signatures collides with a kept doc's (collision probability
j**rows_per_band per band — the standard LSH precision dial). The exact
Jaccard verify needs both shingle sets and the state deliberately keeps
neither; within a batch, where both texts are present, pairs ARE
verified (``dedup.minhash_dedup_pairs``).

## Exactly-once

Per batch id: (1) write the full audit table (every input doc with
``keep`` + first ``drop_reason``) to ``sink_path/batch=<id>`` in
overwrite mode — idempotent under retry; (2) publish the state delta via
``sketches.apply_state_batch`` (versioned, _SUCCESS-gated). A replayed
batch finds its version complete and skips BOTH steps, so neither the
sink nor the state double-applies; a crash between (1) and (2) replays
into an overwrite of the same directory. Reference exactly-once
semantics: SURVEY.md §2 T3 (checkpointed sink contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_processor_spark.operators import dedup
from nexus_processor_spark.streaming import sketches

NUM_BANDS = 8
ROWS_PER_BAND = 2
STATE_SCHEMA = "kind string, key string"


def _band_keys(docs: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """(id, key) band-signature keys at the SAME (b, r) banding the
    verified within-batch pass uses, so cross-state collisions carry
    j**r precision, not r=1's j."""
    return dedup.band_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND,
    ).select(
        id_col,
        F.concat_ws(":", F.col("band").cast("string"), "sig").alias("key"),
    )


def _survivor_state(
    survivors: DataFrame,
    *,
    text_col: str,
    id_col: str,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """State delta rows for kept docs: content md5s + band signatures.
    ``sigs`` reuses the batch's shared (id, band, sig) table — survivors
    are a subset of the signed docs, so their band keys come from a
    semi-join on the id instead of a fresh minhash pass."""
    md5s = (
        survivors.select(F.md5(F.col(text_col)).alias("key"))
        .where(F.col("key").isNotNull())
        .distinct()
        .select(F.lit("md5").alias("kind"), "key")
    )
    if sigs is not None:
        keyed = sigs.join(
            survivors.select(id_col).distinct(), id_col, "left_semi"
        ).select(
            F.concat_ws(":", F.col("band").cast("string"), "sig")
            .alias("key")
        )
    else:
        keyed = _band_keys(survivors, text_col=text_col, id_col=id_col) \
            .select("key")
    bands = (
        keyed.distinct().select(F.lit("band").alias("kind"), "key")
    )
    return md5s.unionByName(bands)


def curate_batch(
    batch: DataFrame,
    state: DataFrame | None,
    *,
    min_chars: int = 20,
    max_dup_char_fraction: float | None = None,
    near_dup_threshold: float = 0.5,
    eval_df: DataFrame | None = None,
    max_contamination_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    _projection_out: list | None = None,
) -> DataFrame:
    """One batch through the gates against ``state`` (None = cold start).
    Returns the audit table: every input row + ``keep`` boolean + first
    ``drop_reason`` (``low_quality`` / ``repetitive`` / ``exact_dup`` /
    ``near_dup`` / ``contaminated`` / null). Pure DataFrame logic — shared by the stream
    and by tests.

    ``max_dup_char_fraction`` enables the Gopher-style repetition gate
    (same dial as ``pipeline.curate_corpus``): docs whose duplicate-
    bigram character mass exceeds it drop before the dedup stages — the
    gate is a pure per-doc statistic, so it needs no state.

    ``eval_df`` enables benchmark decontamination after the dedup
    stages (``pipeline.decontaminate`` semantics: drop when the doc
    shares more than ``max_contamination_hits`` distinct 3-grams with
    the eval set; the eval gram set broadcasts, the batch never
    shuffles on gram)."""
    t = F.col(text_col)
    quality_ok = t.isNotNull() & (F.length(t) >= min_chars)

    q = batch.withColumn("_q_ok", quality_ok)
    if max_dup_char_fraction is not None:
        from nexus_processor_spark.operators import pipeline

        rep = pipeline.duplicate_ngram_stats(
            q.filter("_q_ok"), text_col=text_col, id_col=id_col
        ).select(
            id_col,
            (F.col("dup_char_fraction") <= max_dup_char_fraction)
            .alias("_rep_ok"),
        )
        # a quality-failed doc has no repetition row; its flag stays
        # vacuously true so the first drop_reason reads low_quality
        q = q.join(rep, id_col, "left").withColumn(
            "_rep_ok", F.coalesce(F.col("_rep_ok"), F.lit(True))
        )
    else:
        q = q.withColumn("_rep_ok", F.lit(True))
    qdocs = q.filter("_q_ok AND _rep_ok")

    # exact: first-id-wins within the batch, then anti vs state md5s
    w_first = F.row_number().over(
        Window.partitionBy(F.md5(t)).orderBy(id_col)
    )
    exact_batch = qdocs.withColumn("_rn", w_first).withColumn(
        "_exact_first", F.col("_rn") == 1
    ).drop("_rn")
    if state is not None:
        seen = state.filter(F.col("kind") == "md5").select(
            F.col("key").alias("_seen_md5")).distinct()
        exact = exact_batch.join(
            seen, F.md5(t) == F.col("_seen_md5"), "left",
        ).withColumn(
            "_exact_ok", F.col("_exact_first") & F.col("_seen_md5").isNull()
        ).drop("_seen_md5")
    else:
        exact = exact_batch.withColumn("_exact_ok", F.col("_exact_first"))
    edocs = exact.filter("_exact_ok")

    # ONE banded-signature table feeds the within-batch candidate join,
    # the state-collision probe, and the survivor state delta. It is the
    # SKINNY product of the expensive salted-md5 pass (8 short strings
    # per doc — the raw shingle/minhash projection is arrays per doc and
    # costs more to cache than to recompute), persisted for the batch and
    # released by the caller via ``_projection_out``. The md5 pass runs
    # once; candidate verification re-derives only the cheap regex
    # shingles (measured on a 200k-doc cold batch: 32.5 s unshared ->
    # 40.6 s persisting the raw projection -> 13.9 s this way).
    sigs_tbl = dedup.band_signatures(
        edocs, text_col=text_col, id_col=id_col,
        num_bands=NUM_BANDS, rows_per_band=ROWS_PER_BAND,
    ).persist()
    sigs_tbl.count()  # prime eagerly: racing branches re-hash a cold cache
    if _projection_out is not None:
        _projection_out.append(sigs_tbl)

    # near-dup within the batch: banded candidates -> exact Jaccard gate
    # (same (b, r) + threshold semantics as dedup.minhash_dedup_pairs,
    # which is pinned equal by tests), drop the higher id of each pair
    cand = dedup.lsh_candidate_pairs(sigs_tbl, id_col=id_col)
    pairs = dedup.jaccard_verify(
        cand, edocs, text_col=text_col, id_col=id_col,
        threshold=near_dup_threshold, broadcast_pairs=True,
    )
    dropped_in_batch = pairs.select(F.col("id_b").alias(id_col)).distinct() \
        .withColumn("_near_batch", F.lit(True))
    # ... and vs the kept corpus (band-signature collision, no verify)
    sigs = sigs_tbl.select(
        id_col,
        F.concat_ws(":", F.col("band").cast("string"), "sig").alias("_bkey"),
    )
    if state is not None:
        kept_bands = state.filter(F.col("kind") == "band").select(
            F.col("key").alias("_bkey"))
        dropped_vs_state = (
            sigs.join(kept_bands, "_bkey", "left_semi")
            .select(id_col).distinct().withColumn("_near_state", F.lit(True))
        )
    else:
        dropped_vs_state = sigs.select(id_col).limit(0).withColumn(
            "_near_state", F.lit(True))

    if eval_df is not None:
        from nexus_processor_spark.operators import pipeline

        contaminated = (
            pipeline.decontaminate(
                edocs.select(id_col, text_col), eval_df,
                text_col=text_col, id_col=id_col,
            )
            .filter(F.col("n_eval_grams") > max_contamination_hits)
            .select(id_col).withColumn("_contam", F.lit(True))
        )
    else:
        contaminated = batch.select(id_col).limit(0).withColumn(
            "_contam", F.lit(True))

    audit = (
        exact.join(dropped_in_batch, id_col, "left")
        .join(dropped_vs_state, id_col, "left")
        .join(contaminated, id_col, "left")
    )
    near_dropped = (
        F.coalesce(F.col("_near_batch"), F.lit(False))
        | F.coalesce(F.col("_near_state"), F.lit(False))
    )
    full = q.join(
        audit.select(
            id_col, "_exact_ok",
            near_dropped.alias("_near_dropped"),
            F.coalesce(F.col("_contam"), F.lit(False)).alias("_contam"),
        ),
        id_col, "left",
    )
    # rows filtered before a stage carry nulls for its flags: fill them
    # as failed so keep stays False and reason reports the FIRST gate
    q_ok = F.col("_q_ok")
    rep_ok = F.col("_rep_ok")
    exact_ok = F.coalesce(F.col("_exact_ok"), F.lit(False))
    near_drop = F.coalesce(F.col("_near_dropped"), F.lit(False))
    contam = F.coalesce(F.col("_contam"), F.lit(False))
    keep = q_ok & rep_ok & exact_ok & ~near_drop & ~contam
    reason = (
        F.when(~q_ok, "low_quality")
        .when(~rep_ok, "repetitive")
        .when(~exact_ok, "exact_dup")
        .when(near_drop, "near_dup")
        .when(contam, "contaminated")
    )
    return full.select(
        *batch.columns, keep.alias("keep"), reason.alias("drop_reason")
    )


def curate_stream(
    stream: DataFrame,
    *,
    state_path: str,
    sink_path: str,
    checkpoint_dir: str,
    min_chars: int = 20,
    near_dup_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Start the curation stream over a document source. Audit rows land
    in ``sink_path/batch=<id>`` (survivors = ``filter(keep)``); the
    dedup state advances under ``state_path``. Returns the
    ``StreamingQuery``."""
    spark = stream.sparkSession

    def _step(batch: DataFrame, batch_id: int) -> None:
        fs, _, jvm = sketches._fs(spark, state_path)
        if fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{state_path}/v{batch_id}/_SUCCESS")):
            return  # replayed batch: sink + state already published
        state = None
        cur = sketches.current_state_dir(spark, state_path)
        if cur is not None:
            state = spark.read.parquet(cur)
        handles: list = []
        audit = curate_batch(
            batch, state,
            min_chars=min_chars, near_dup_threshold=near_dup_threshold,
            text_col=text_col, id_col=id_col, _projection_out=handles,
        ).persist()
        try:
            audit.write.mode("overwrite").parquet(
                f"{sink_path}/batch={batch_id}")
            delta = _survivor_state(
                audit.filter("keep"), text_col=text_col, id_col=id_col,
                sigs=handles[0] if handles else None,
            )
            sketches.apply_state_batch(
                spark, state_path, batch_id, delta,
                lambda cur_df, d: cur_df.unionByName(d).distinct(),
            )
        finally:
            audit.unpersist()
            for h in handles:
                h.unpersist()

    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_step)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
