"""Exact-substring duplicate spans: find and excise text regions that
are repeated verbatim elsewhere in the corpus.

The substring-granularity member of the dedup family (document-level
exact/near dedup live in operators/dedup.py): following the
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022) ExactSubstr semantics re-expressed Spark-first — instead of a
global suffix array (a monolithic sorted structure), any repeated word
sequence of length >= L contains a repeated L-gram, so one positional
L-gram pass + one vocabulary-keyed aggregate finds every duplicated
region, and a per-document gaps-and-islands merge assembles maximal
spans.

Scale design (the 100 TB shape):

* Positional grams come from ONE regex pass per document (the same
  single-pass extractor as ``word_shingles_text`` — the HOF
  slice-and-join form measured 14x slower) and are hashed to fixed
  width in the same projection: the only corpus-scale shuffle carries
  ``(gram_key, doc_id, pos)`` — never text.
* Duplicate detection is a map-side-combinable ``groupBy(gram_key)``
  aggregate (count + min occurrence), NOT a per-gram window: a
  boilerplate gram repeated 10^8 times is a single combined row here,
  where a window partition would be a hot task.
* Span assembly windows are per-document (bounded by document length),
  ordered by position — no global or skewed partitions.
* Keep-first semantics: for every duplicated gram, the globally first
  occurrence (min ``(doc_id, pos)``) survives; every other occurrence
  is redundant and contributes to excise spans. Deterministic, and the
  same rule the suffix-array pipelines apply per duplicate cluster.
  (As in the original, a surviving first occurrence can still overlap
  a span excised on behalf of a *different* gram — occurrence-level
  decisions are independent.)
* ``hash_fn="md5"`` (default) is the cross-engine-checkable scheme;
  ``"xxhash64"`` is the scale path (native long codegen) — the same
  documented dual as operators/dedup.py (ARCHITECTURE.md §hash-scheme).
* ``sample_mod=w`` is the optional sub-sampling dial: keep a gram
  occurrence only when its hash is 0 mod ``w`` (Manber-style "0 mod p"
  fingerprint selection). Content-defined — every copy of a repeated
  region keeps the SAME positions, where fixed-stride sampling breaks
  on alignment — and costs one codegen ``pmod`` filter right after the
  explode, so shuffle volume drops ~1/w with no per-element lambda
  work (a min-of-window winnowing variant was measured SLOWER than
  exact at 2M docs: interpreted HOF loops cost more than the shuffle
  they save). Detection is probabilistic: a repeat spanning ``g``
  grams is missed with probability (1-1/w)^g — under 1% at w=4 for
  repeats of ~16+ grams — and reported spans are minimum extents.
  Default 1 = exact.

Reference parity: the reference engine has no substring dedup; this
extends the curation surface (SURVEY.md "beyond the reference" §dedup)
alongside MinHash/SimHash/PassJoin.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def positional_grams(
    text: Column | str, n: int, sep: str = " "
) -> Column:
    """ALL word n-grams of ``text`` in token order (no distinct): element
    ``i`` of the result is the gram starting at 0-based token position
    ``i``. One zero-width-lookahead regex pass anchored at every token
    start — matches are attempted left-to-right at string start and after
    each separator, succeeding exactly at positions ``0 .. n_tokens-n``,
    so the match index IS the token position. Empty array for null text
    or fewer than ``n`` tokens."""
    if len(sep) != 1:
        raise ValueError("positional_grams requires a single-char separator")
    c = F.col(text) if isinstance(text, str) else text
    s = re.escape(sep)
    pat = f"(?:^|(?<={s}))(?=([^{s}]*(?:{s}[^{s}]*){{{n - 1}}}))"
    return F.when(
        c.isNotNull(), F.regexp_extract_all(c, F.lit(pat), 1)
    ).otherwise(F.array().cast("array<string>"))


def _gram_key(gram: Column, hash_fn: str) -> Column:
    # xxhash64 keys stay NATIVE LONGS (8-byte shuffle keys, codegen
    # comparisons); md5 keys are the cross-engine hex-string domain
    if hash_fn == "md5":
        return F.md5(gram)
    if hash_fn == "xxhash64":
        return F.xxhash64(gram)
    raise ValueError(f"hash_fn must be md5 or xxhash64, got {hash_fn!r}")


def redundant_occurrences(
    df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    sample_mod: int = 1,
) -> DataFrame:
    """Occurrences of duplicated ``l``-word grams that are NOT the
    globally-first occurrence of their gram: ``(id_col, pos)`` rows,
    0-based token positions, each covering words ``[pos, pos+l)``.

    Plan: positional-gram projection (map-only), skinny
    ``(key, doc, pos)`` shuffle into one combinable aggregate
    (count + min occurrence), join back on the key. ``sample_mod > 1``
    keeps only 0-mod-p gram keys (see module docstring).
    """
    if sample_mod < 1:
        raise ValueError(f"sample_mod must be >= 1, got {sample_mod}")
    keys = F.transform(
        positional_grams(F.col(text_col), l),
        lambda g: _gram_key(g, hash_fn),
    )
    occ = df.select(
        F.col(id_col),
        F.posexplode(keys).alias("pos", "_k"),
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "_k")
    if sample_mod > 1:
        # 0-mod-p selection on the key itself (xxhash64 longs directly;
        # md5 via the first 15 hex chars) — one codegen filter straight
        # after the explode, BEFORE any shuffle
        num = (
            F.col("_k")
            if hash_fn == "xxhash64"
            else F.conv(F.substring(F.col("_k"), 1, 15), 16, 10).cast("long")
        )
        occ = occ.filter(F.pmod(num, F.lit(sample_mod)) == 0)
    # duplicated grams only BEFORE the probe join: unique grams (the
    # overwhelming majority of a clean corpus) never rejoin the
    # occurrence stream, and AQE broadcasts the surviving side when the
    # duplicate vocabulary is small
    dup = (
        occ.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))
            ).alias("_first"),
        )
        .filter(F.col("_c") >= 2)
        .select("_k", "_first")
    )
    # shuffle-hash probe: sorting the full occurrence stream (SMJ) costs
    # more than hashing the duplicate-vocabulary side; AQE still demotes
    # to broadcast when the duplicate side turns out tiny
    return (
        occ.join(dup.hint("shuffle_hash"), "_k")
        .filter(
            ~(
                (F.col(id_col) == F.col("_first.d"))
                & (F.col("pos") == F.col("_first.p"))
            )
        )
        .select(id_col, "pos")
    )


def _merge_islands(red: DataFrame, l: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of gram extents ``[pos, pos+l)`` —
    overlapping OR touching extents fuse. Input: ``(id_col, pos)``
    occurrence rows; output: ``(id_col, span_start, span_end,
    span_words)`` half-open 0-based word spans. Windows are
    per-document (bounded by document length)."""
    w = Window.partitionBy(id_col).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, -1
    )
    islands = red.select(
        F.col(id_col), "pos",
        F.when(
            F.col("pos") > F.coalesce(
                F.max(F.col("pos") + F.lit(l)).over(w), F.lit(-1)
            ),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("_new"),
    ).select(
        id_col, "pos",
        F.sum("_new").over(
            Window.partitionBy(id_col).orderBy("pos").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ).alias("_island"),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(l)).alias("span_end"),
        )
        .select(
            id_col, "span_start", "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_words"),
        )
    )


def cross_source_leakage(
    df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    hash_fn: str = "md5",
) -> DataFrame:
    """Where does each source's duplicated text COME from: for every
    redundant ``l``-gram occurrence (not the corpus-wide first copy of
    its gram), attribute it to the source of that first copy, and count
    by ``(source, first_source)`` — the provenance matrix of substring
    leakage (``source == first_source`` on the diagonal is internal
    boilerplate; off-diagonal is cross-source copying, e.g. syndicated
    or mirrored text).

    Counts are redundant gram OCCURRENCES (span merging would
    double-attribute overlaps to multiple sources). Same plan skeleton
    as :func:`redundant_occurrences` with the source riding inside the
    min-struct: ``(doc, pos)`` is unique, so ordering is unchanged and
    the first copy's source comes along for free — no join back to the
    corpus for provenance.

    Output: ``(source, first_source, n_grams)`` ordered by count desc.
    """
    keys = F.transform(
        positional_grams(F.col(text_col), l),
        lambda g: _gram_key(g, hash_fn),
    )
    occ = df.select(
        F.col(id_col), F.col(source_col),
        F.posexplode(keys).alias("pos", "_k"),
    ).select(
        id_col, source_col,
        F.col("pos").cast("long").alias("pos"), "_k",
    )
    dup = (
        occ.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("pos").alias("p"),
                    F.col(source_col).alias("src"),
                )
            ).alias("_first"),
        )
        .filter(F.col("_c") >= 2)
        .select("_k", "_first")
    )
    return (
        occ.join(dup.hint("shuffle_hash"), "_k")
        .filter(
            ~(
                (F.col(id_col) == F.col("_first.d"))
                & (F.col("pos") == F.col("_first.p"))
            )
        )
        .groupBy(
            F.col(source_col).alias("source"),
            F.col("_first.src").alias("first_source"),
        )
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .orderBy(F.desc("n_grams"), "source", "first_source")
    )


def dup_spans(
    df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    sample_mod: int = 1,
) -> DataFrame:
    """Maximal duplicated spans per document (see :func:`_merge_islands`
    for the span convention)."""
    red = redundant_occurrences(
        df, l, text_col=text_col, id_col=id_col, hash_fn=hash_fn,
        sample_mod=sample_mod,
    )
    return _merge_islands(red, l, id_col)


def contamination_spans(
    corpus: DataFrame,
    eval_df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Spans of ``corpus`` documents whose ``l``-grams appear anywhere in
    the eval/benchmark set — the span-granular sibling of
    ``pipeline.decontaminate``: instead of flagging whole documents for
    overlap, it locates WHERE the contamination sits (and
    :func:`excise_contamination` removes exactly that, keeping the rest
    of the document).

    The eval side reduces to its distinct gram-key set (benchmark-sized,
    bounded) and the probe is a semi-join the optimizer broadcasts when
    the eval set is small — the corpus side never shuffles on gram.
    Output: ``(id_col, span_start, span_end, span_words)``.
    """
    from nexus_processor_spark.functions.text import word_shingles_text

    eval_keys = (
        eval_df.select(
            F.explode(word_shingles_text(text_col, l)).alias("_g")
        )
        .select(_gram_key(F.col("_g"), hash_fn).alias("_k"))
        .distinct()
    )
    keys = F.transform(
        positional_grams(F.col(text_col), l),
        lambda g: _gram_key(g, hash_fn),
    )
    occ = corpus.select(
        F.col(id_col),
        F.posexplode(keys).alias("pos", "_k"),
    ).select(id_col, F.col("pos").cast("long").alias("pos"), "_k")
    hit = occ.join(eval_keys, "_k", "left_semi").select(id_col, "pos")
    return _merge_islands(hit, l, id_col)


def _excise(
    df: DataFrame,
    span_df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    words_alias: str,
) -> DataFrame:
    """Rewrite each document with the given spans removed (words at
    covered positions dropped; survivors rejoin with the separator in
    original order). Documents with no span pass through unchanged.

    Output: ``(id_col, clean_text, n_words, <words_alias>, n_spans)``.
    The per-doc span list is collected to an array (bounded by document
    length) and applied as one native filter over token positions — the
    document text never enters Python and never shuffles: spans shuffle
    to the documents, not the reverse.
    """
    spans = (
        span_df.groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"), F.col("span_end").alias("e")
                )
            ).alias("_spans"),
            F.sum("span_words").alias("dup_words"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    toks = F.split(F.col(text_col), " ")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda i: F.struct(i.alias("i"), F.get(toks, i).alias("w")),
        ),
        lambda x: ~covered(x["i"]),
    )
    clean = F.concat_ws(
        " ", F.transform(kept, lambda x: x["w"])
    )
    return (
        df.join(spans, id_col, "left")
        .select(
            F.col(id_col),
            F.when(F.col("_spans").isNull(), F.col(text_col))
            .otherwise(clean)
            .alias("clean_text"),
            F.when(F.col(text_col).isNotNull(), F.size(toks))
            .otherwise(F.lit(0)).cast("long").alias("n_words"),
            F.coalesce(F.col("dup_words"), F.lit(0)).cast("long")
            .alias(words_alias),
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def excise_dup_spans(
    df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    sample_mod: int = 1,
) -> DataFrame:
    """:func:`dup_spans` excision — output ``(id_col, clean_text,
    n_words, dup_words, n_spans)``; see :func:`_excise`."""
    return _excise(
        df,
        dup_spans(
            df, l, text_col=text_col, id_col=id_col, hash_fn=hash_fn,
            sample_mod=sample_mod,
        ),
        text_col=text_col, id_col=id_col, words_alias="dup_words",
    )


def excise_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    l: int = 5,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
) -> DataFrame:
    """Surgical decontamination: :func:`contamination_spans` excision —
    contaminated regions are removed, the rest of each document is kept
    (``pipeline.decontaminate`` flags whole documents instead). Output
    ``(id_col, clean_text, n_words, contam_words, n_spans)``."""
    return _excise(
        corpus,
        contamination_spans(
            corpus, eval_df, l, text_col=text_col, id_col=id_col,
            hash_fn=hash_fn,
        ),
        text_col=text_col, id_col=id_col, words_alias="contam_words",
    )
