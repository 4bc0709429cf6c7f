"""Corpus-pipeline queries (sampling / splits / shuffle / quality /
scrubbing / tf-idf) over ``documents``, with DuckDB oracles.

Every selection below is md5-hex-threshold based (see operators.pipeline),
so the oracle reproduces the exact sample/split/shuffle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.operators import pipeline
from nexus_processor_spark.operators.pipeline import (
    EMAIL_RE,
    PHONE_RE,
    URL_RE,
    hex_threshold,
)
from nexus_processor_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


SAMPLE_FRACTION = 0.1
STRATA_RATES = {"en": 0.5, "de": 0.2}
STRATA_DEFAULT = 0.05
SPLIT_WEIGHTS = {"train": 0.8, "valid": 0.1, "test": 0.1}
TFIDF_K = 3


WEIGHTED_K = 100


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample (Efraimidis-Spirakis keys off
    md5 draws): longer docs proportionally likelier, no replacement, and
    the exact same 100 docs in any engine."""
    return pipeline.weighted_sample(
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars"),
        WEIGHTED_K,
        weight_col="n_chars",
    )


def q_text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 duplicate-bigram character fraction per doc."""
    return pipeline.duplicate_ngram_stats(_docs(spark, sf_dir))


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 3-gram contamination matrix."""
    return pipeline.source_overlap(_docs(spark, sf_dir))


BM25_QUERY = ["spark", "data", "merge"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 relevance of each doc to a 3-term query (the Lucene
    idf variant); postings pruned to query terms before any shuffle."""
    return pipeline.bm25_scores(_docs(spark, sf_dir), BM25_QUERY)


QUOTA_N = 10


def q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap: keep the top-N docs per source by length
    (quality proxy), unique-key tiebreak — the 'no domain dominates the
    mix' guard. One group-key shuffle; per-source state is a size-N heap
    under partial windowed row_number."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= QUOTA_N)
    )


def q_text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of each doc's distinct 3-gram shingles unique to it across
    the corpus — the anti-boilerplate/memorization signal."""
    return pipeline.novelty_scores(_docs(spark, sf_dir))


def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.hash_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"), SAMPLE_FRACTION
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.stratified_sample(
        _docs(spark, sf_dir).select("doc_id", "lang"),
        STRATA_RATES,
        default_rate=STRATA_DEFAULT,
    )


def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.hash_split(
        _docs(spark, sf_dir).select("doc_id"), SPLIT_WEIGHTS
    )


def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shard_chars pinned so the shard ids are stable across scale factors
    # (and SQL-expressible); production auto-sizes via target_rows_per_shard.
    return pipeline.shuffle_shards(
        _docs(spark, sf_dir).select("doc_id"), shard_chars=2
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.repetition_signals(_docs(spark, sf_dir))


def q_text_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.scrub_pii(_docs(spark, sf_dir))


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.tfidf_top_terms(_docs(spark, sf_dir), TFIDF_K)


EVAL_FRACTION = 0.05
EVAL_SALT = "eval"
QUANTILE_Q = 0.25
VOCAB_K = 20
BATCH_SALT = "batch"
BATCH_THRESHOLD = hex_threshold(0.5)


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-carve an eval set out of documents, then flag the rest of the
    corpus for word-3-gram overlap with it."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    h = pipeline.hash_hex(F.col("doc_id"), salt=EVAL_SALT)
    thr = hex_threshold(EVAL_FRACTION)
    eval_df = docs.filter(h < F.lit(thr))
    corpus = docs.filter(h >= F.lit(thr))
    return pipeline.decontaminate(corpus, eval_df)


def q_quality_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile here so the DuckDB twin (quantile_cont) matches
    bit-for-bit; production default is the approx_percentile sketch."""
    return pipeline.quantile_filter(_docs(spark, sf_dir), QUANTILE_Q, exact=True)


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.source_mix(_docs(spark, sf_dir))


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.vocab_topk(_docs(spark, sf_dir), VOCAB_K)


def q_bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.bigram_stats(_docs(spark, sf_dir), 200)


VOCAB_SIZE = 500


def q_tokens_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids against the corpus's own frequency-ranked vocab:
    broadcast vocab join on the exploded token stream, ordered
    re-assembly, OOV -> id 0. One doc-key shuffle of token rows."""
    docs = _docs(spark, sf_dir)
    vocab = pipeline.build_vocab(docs, VOCAB_SIZE)
    return pipeline.encode_tokens(docs, vocab)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-split documents into an existing corpus half and a new batch;
    keep batch docs whose content hash the corpus hasn't seen."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    h = pipeline.hash_hex(F.col("doc_id"), salt=BATCH_SALT)
    corpus = docs.filter(h < F.lit(BATCH_THRESHOLD))
    batch = docs.filter(h >= F.lit(BATCH_THRESHOLD))
    return pipeline.incremental_dedup(batch, corpus)


BOILERPLATE_N = 4
BOILERPLATE_MIN_DOCS = 3


def q_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate detection: word 4-grams shared by >= 3
    distinct documents."""
    return pipeline.boilerplate_phrases(
        _docs(spark, sf_dir), BOILERPLATE_N, BOILERPLATE_MIN_DOCS
    )


def q_lm_doc_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring: mean log2 bigram probability per
    doc under the corpus's own bigram LM."""
    return pipeline.lm_doc_score(_docs(spark, sf_dir))


MIX_ALPHA = 0.3
MIX_BUDGET = 1000


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced source mix (alpha=0.3) with the per-source
    sampling rates to hit a 1000-doc budget."""
    return pipeline.temperature_mix(
        _docs(spark, sf_dir), MIX_ALPHA, MIX_BUDGET
    )


CMS_WIDTH = 8192
CMS_DEPTH = 4
CMS_TOPK = 30


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with Count-Min estimates: exact top-30 tokens
    (deterministic (count desc, tok) cut) annotated with the estimate a
    bounded depth x width sketch would serve. The sketch is one
    partial-agg shuffle over <= 32k bucket rows; the md5-domain hashing
    makes the estimates themselves engine-reproducible."""
    from nexus_processor_spark.operators.sketch import cms_build, cms_lookup

    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    sketch = cms_build(toks, "tok", width=CMS_WIDTH, depth=CMS_DEPTH)
    exact = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probe = exact.orderBy(F.desc("exact_count"), "tok").limit(CMS_TOPK)
    est = cms_lookup(
        sketch, probe.select("tok"), "tok", width=CMS_WIDTH, depth=CMS_DEPTH
    )
    return probe.join(est, "tok").select(
        "tok", "exact_count", F.col("est").alias("cms_est")
    )


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same rows as ``decontaminate`` (the bloom only prefilters;
    an exact semi-join verifies candidates) — the eval membership state
    is a bounded bit-position sketch instead of the full gram table."""
    docs = _docs(spark, sf_dir)
    h = pipeline.hash_hex(F.col("doc_id"), salt=EVAL_SALT)
    thr = hex_threshold(EVAL_FRACTION)
    eval_df = docs.filter(h < F.lit(thr))
    corpus = docs.filter(h >= F.lit(thr))
    return pipeline.decontaminate_bloom(corpus, eval_df)


KMV_K = 128


def q_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token estimates from k-minimum-values sketches: one
    bounded 128-draw state per source, plus the union estimate computed
    by MERGING the per-source sketches (never re-scanning the corpus) —
    the mergeability that lets per-day/per-shard sketches roll up.
    Integer-exact hash draws into one IEEE division: the estimates are
    engine-reproducible, so the oracle checks them exactly."""
    from nexus_processor_spark.operators.sketch import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    per_source = kmv_sketch(toks, "tok", k=KMV_K, by="source")
    union = kmv_merge(per_source.drop("source"), k=KMV_K)
    return kmv_estimate(per_source, k=KMV_K, by="source").unionByName(
        kmv_estimate(union, k=KMV_K).select(
            F.lit("__union__").alias("source"), "n_draws", "est_distinct"
        )
    )


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned-corpus snapshot diff, rolled up to per-status counts.
    v2 is derived deterministically from the documents table: ids
    divisible by 20 are dropped (removed), ids divisible by 7 get
    re-crawled text (changed), and a shifted id slice is appended
    (added) — then ``pipeline.corpus_diff`` reports the delta from
    hash-only full-outer join."""
    docs = _docs(spark, sf_dir)
    old = docs.select("doc_id", "text")
    kept = docs.filter(F.col("doc_id") % 20 != 0)
    new = kept.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(" v2-recrawl")))
        .otherwise(F.col("text")).alias("text"),
    ).unionByName(
        docs.filter(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
        )
    )
    return (
        pipeline.corpus_diff(old, new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def q_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-level set algebra: union, intersection, and Jaccard
    estimates between two sources' token sets computed ONLY from their
    bounded KMV states (theta-sketch rule: the union sketch is a uniform
    sample of A∪B, so the fraction of its draws seen by both sides
    estimates Jaccard) — the cross-shard overlap report that never
    rescans either corpus. Integer-exact draws into single IEEE ops:
    oracle-checked exactly."""
    from nexus_processor_spark.operators.sketch import kmv_set_ops, kmv_sketch

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("source").isin("src0", "src1"))
    # ONE corpus pass builds both sides (grouped sketch == per-filter
    # sketch: the (source, tok) dedup and per-source top-k draws are
    # identical); the 2x256-row result splits per side. Two separate
    # kmv_sketch calls each re-scanned the whole corpus with a
    # non-pruning source filter.
    sk = kmv_sketch(toks, "tok", k=KMV_K, by="source").localCheckpoint(
        eager=True)  # 2x256 rows; both side-splits read this, not the corpus
    a = sk.filter(F.col("source") == "src0").drop("source")
    b = sk.filter(F.col("source") == "src1").drop("source")
    return kmv_set_ops(a, b, k=KMV_K)


QUERIES = {
    "corpus_diff": q_corpus_diff,
    "kmv_set_ops": q_kmv_set_ops,
    "kmv_distinct_tokens": q_kmv_distinct_tokens,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "decontaminate_bloom": q_decontaminate_bloom,
    "text_novelty": q_text_novelty,
    "source_quota": q_source_quota,
    "bm25_search": q_bm25_search,
    "sample_weighted": q_sample_weighted,
    "text_dup_ngrams": q_text_dup_ngrams,
    "source_overlap": q_source_overlap,
    "boilerplate_phrases": q_boilerplate_phrases,
    "lm_doc_score": q_lm_doc_score,
    "mix_temperature": q_mix_temperature,
    "sample_hash": q_sample_hash,
    "sample_stratified": q_sample_stratified,
    "split_assign": q_split_assign,
    "shuffle_shards": q_shuffle_shards,
    "text_repetition": q_text_repetition,
    "text_scrub": q_text_scrub,
    "tfidf_top_terms": q_tfidf_top_terms,
    "decontaminate": q_decontaminate,
    "quality_quantile": q_quality_quantile,
    "source_mix": q_source_mix,
    "vocab_topk": q_vocab_topk,
    "bigram_stats": q_bigram_stats,
    "tokens_encoded": q_tokens_encoded,
    "dedup_incremental": q_dedup_incremental,
}


def _strata_case() -> str:
    whens = " ".join(
        f"WHEN lang = '{g}' THEN '{hex_threshold(r)}'"
        for g, r in STRATA_RATES.items()
    )
    return f"CASE {whens} ELSE '{hex_threshold(STRATA_DEFAULT)}' END"


def _split_case() -> str:
    labels = list(SPLIT_WEIGHTS)
    cum = 0.0
    whens = []
    for label in labels[:-1]:
        cum += SPLIT_WEIGHTS[label]
        whens.append(
            f"WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)"
            f" < '{hex_threshold(cum)}' THEN '{label}'"
        )
    return "CASE " + " ".join(whens) + f" ELSE '{labels[-1]}' END"


# A-ES uniform draw: 15 md5 hex digits -> 60-bit int -> (v + 0.5) / 2^60,
# the exact arithmetic of pipeline.hash_uniform.
_AES_SCORE = (
    "ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 0.5)"
    " / 1152921504606846976.0) / n_chars"
)

_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY)

ORACLE = {
    "text_novelty": """
        WITH sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                     generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                     i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                   )) AS sh
            FROM documents
        ),
        g AS (SELECT doc_id, unnest(sh) AS g FROM sh),
        freq AS (SELECT g, count(*) AS df_g FROM g GROUP BY g),
        per AS (
            SELECT g.doc_id,
                   count(*) AS n_grams,
                   sum(CASE WHEN f.df_g = 1 THEN 1 ELSE 0 END) AS n_unique,
                   CAST(sum(CASE WHEN f.df_g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) AS novelty
            FROM g JOIN freq f USING (g)
            GROUP BY g.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(p.n_unique, 0) AS BIGINT) AS n_unique_grams,
               coalesce(p.novelty, 0.0) AS novelty
        FROM documents d LEFT JOIN per p USING (doc_id)
    """,
    "source_quota": f"""
        WITH r AS (
            SELECT doc_id, source, n_chars,
                   CAST(row_number() OVER (
                     PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ) AS BIGINT) AS rk
            FROM documents
        )
        SELECT doc_id, source, n_chars, rk FROM r WHERE rk <= {QUOTA_N}
    """,
    # k1 = 1.2, b = 0.75 (k1+1 = 2.2, 1-b = 0.25), Lucene idf variant.
    "bm25_search": f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                   unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        m AS (
            SELECT doc_id, term, any_value(dl) AS dl,
                   CAST(count(*) AS DOUBLE) AS tf
            FROM toks
            WHERE term IN ({_BM25_TERMS})
            GROUP BY doc_id, term
        ),
        dfreq AS (
            SELECT term, CAST(count(*) AS DOUBLE) AS dfreq FROM m GROUP BY term
        ),
        stats AS (
            SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                   avg(len(string_split(text, ' '))) AS avgdl
            FROM documents
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_matched_terms,
               round(sum(
                 ln(1 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM m JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY doc_id
    """,
    "sample_weighted": f"""
        SELECT doc_id, source, n_chars
        FROM documents
        WHERE n_chars > 0
        ORDER BY {_AES_SCORE} DESC, doc_id
        LIMIT {WEIGHTED_K}
    """,
    "text_dup_ngrams": """
        WITH g AS (
            SELECT doc_id, length(text) AS chars,
                   list_transform(
                     generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                     i -> array_to_string((string_split(text, ' '))[i:i+1], ' ')
                   ) AS grams
            FROM documents
        ),
        occ AS (
            SELECT doc_id, chars, u.gram AS gram, count(*) AS c
            FROM g, unnest(g.grams) AS u(gram)
            GROUP BY 1, 2, 3
        ),
        agg AS (
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_grams,
                   CAST(sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)
                        AS BIGINT) AS dup_gram_chars,
                   CASE WHEN any_value(chars) > 0 THEN
                        CAST(sum(CASE WHEN c >= 2 THEN c * length(gram)
                                      ELSE 0 END) AS DOUBLE)
                        / CAST(any_value(chars) AS DOUBLE)
                   ELSE 0.0 END AS dup_char_fraction
            FROM occ GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(a.n_grams, 0) AS n_grams,
               coalesce(a.n_dup_grams, 0) AS n_dup_grams,
               coalesce(a.dup_gram_chars, 0) AS dup_gram_chars,
               coalesce(a.dup_char_fraction, 0.0) AS dup_char_fraction
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    "source_overlap": """
        WITH g AS (
            SELECT DISTINCT t.source AS src, u.g AS g
            FROM (
                SELECT source,
                       list_transform(
                         generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
                         i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                       ) AS grams
                FROM documents
            ) t, unnest(t.grams) AS u(g)
        ),
        sizes AS (SELECT src, count(*) AS n FROM g GROUP BY src),
        shared AS (
            SELECT a.src AS source_a, b.src AS source_b,
                   CAST(count(*) AS BIGINT) AS shared_grams
            FROM g a JOIN g b ON a.g = b.g AND a.src < b.src
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, shared_grams,
               CAST(na.n AS BIGINT) AS n_grams_a,
               CAST(nb.n AS BIGINT) AS n_grams_b,
               CAST(shared_grams AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
                   AS overlap
        FROM shared
        JOIN sizes na ON source_a = na.src
        JOIN sizes nb ON source_b = nb.src
    """,
    "tokens_encoded": f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ),
        tok AS (
            SELECT doc_id, i AS pos, ts[i] AS token
            FROM toks, unnest(generate_series(1, len(ts))) AS u(i)
        ),
        counts AS (
            SELECT token, count(*) AS n FROM tok GROUP BY 1
            ORDER BY n DESC, token LIMIT {VOCAB_SIZE}
        ),
        vocab AS (
            SELECT token,
                   row_number() OVER (ORDER BY n DESC, token) AS token_id
            FROM counts
        )
        SELECT doc_id,
               list(coalesce(token_id, 0) ORDER BY pos) AS input_ids,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_oov
        FROM tok LEFT JOIN vocab USING (token)
        GROUP BY doc_id
    """,
    "sample_hash": f"""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
              < '{hex_threshold(SAMPLE_FRACTION)}'
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < {_strata_case()}
    """,
    "split_assign": f"""
        SELECT doc_id, {_split_case()} AS split FROM documents
    """,
    "shuffle_shards": """
        WITH h AS (
            SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents
        )
        SELECT doc_id, substr(hh, 1, 2) AS shard,
               CAST(row_number() OVER (
                   PARTITION BY substr(hh, 1, 2)
                   ORDER BY substr(hh, 3), doc_id) - 1 AS BIGINT) AS shard_rank
        FROM h
    """,
    "text_repetition": """
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
        c AS (SELECT doc_id, token, count(*) AS c FROM t GROUP BY 1, 2)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_unique_tokens,
               CAST(max(c) AS BIGINT) AS top_token_count,
               CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT)
                   AS type_token_ratio,
               CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT)
                   AS top_token_fraction
        FROM c GROUP BY doc_id
    """,
    # staged counts: each stage counts on the PREVIOUS stage's output,
    # matching scrub_pii's audit-equals-replacements contract
    "text_scrub": f"""
        WITH s AS (
            SELECT doc_id,
                   text,
                   regexp_replace(text, '{URL_RE}', '<URL>', 'g') AS t_url
            FROM documents
        ),
        s2 AS (
            SELECT *, regexp_replace(t_url, '{EMAIL_RE}', '<EMAIL>', 'g')
                          AS t_mail
            FROM s
        )
        SELECT doc_id,
               regexp_replace(t_mail, '{PHONE_RE}', '<PHONE>', 'g')
                   AS scrubbed_text,
               CAST(len(regexp_extract_all(text, '{URL_RE}')) AS BIGINT)
                   AS n_urls,
               CAST(len(regexp_extract_all(t_url, '{EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t_mail, '{PHONE_RE}')) AS BIGINT)
                   AS n_phones
        FROM s2
    """,
    "tfidf_top_terms": f"""
        WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                   FROM documents),
        tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
               FROM t GROUP BY 1, 2),
        dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS dfreq
                FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        s AS (SELECT doc_id, term, tf,
                     round(tf * ln((CAST(n_docs AS DOUBLE) + 1)
                                   / (CAST(dfreq AS DOUBLE) + 1)),
                           4) AS tfidf
              FROM tf JOIN dfq USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, tfidf FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
            FROM s
        ) WHERE rk <= {TFIDF_K}
    """,
    "decontaminate": f"""
        WITH sh AS (
            SELECT doc_id,
                   substr(md5('{EVAL_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS h,
                   list_distinct(list_transform(
                       generate_series(1,
                           greatest(len(string_split(text, ' ')) - 2, 0)),
                       i -> array_to_string(
                           (string_split(text, ' '))[i:i+2], ' '))) AS grams
            FROM documents
        ),
        eval_grams AS (
            SELECT DISTINCT unnest(grams) AS gram FROM sh
            WHERE h < '{hex_threshold(EVAL_FRACTION)}'
        ),
        corpus AS (
            SELECT doc_id, grams FROM sh
            WHERE h >= '{hex_threshold(EVAL_FRACTION)}'
        ),
        hits AS (
            SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_eval_grams
            FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) c
            JOIN eval_grams USING (gram)
            GROUP BY 1
        )
        SELECT corpus.doc_id,
               CAST(COALESCE(hits.n_eval_grams, 0) AS BIGINT) AS n_eval_grams,
               CAST(COALESCE(hits.n_eval_grams, 0) > 0 AS BIGINT)
                   AS contaminated
        FROM corpus LEFT JOIN hits USING (doc_id)
    """,
    "quality_quantile": f"""
        WITH thr AS (
            SELECT round(quantile_cont(CAST(n_chars AS DOUBLE), {QUANTILE_Q}),
                         6) AS q_threshold
            FROM documents
        )
        SELECT doc_id, n_chars, q_threshold
        FROM documents, thr
        WHERE CAST(n_chars AS DOUBLE) >= q_threshold
    """,
    "source_mix": """
        WITH a AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1
        ),
        s AS (
            SELECT *, round(CAST(n_docs AS DOUBLE)
                            / CAST(sum(n_docs) OVER () AS DOUBLE), 6) AS share
            FROM a
        )
        SELECT source, n_docs, sum_chars, share,
               round(sum(share) OVER (
                   ORDER BY n_docs DESC, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   6) AS cum_share
        FROM s
    """,
    "vocab_topk": f"""
        SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT {VOCAB_K}
    """,
    "mix_temperature": f"""
        WITH c AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   pow(CAST(count(*) AS DOUBLE), {MIX_ALPHA}) AS p
            FROM documents GROUP BY source
        ),
        t AS (SELECT sum(p) AS tp FROM c)
        SELECT source, n_docs,
               round(p / tp, 6) AS weight,
               round(p / tp * {MIX_BUDGET}, 6) AS expected_docs,
               round(least(1.0, p / tp * {MIX_BUDGET} / CAST(n_docs AS DOUBLE)), 6)
                   AS sample_rate
        FROM c, t
        ORDER BY source
    """,
    "boilerplate_phrases": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        g AS (
            SELECT doc_id,
                   array_to_string(w[i : i + {BOILERPLATE_N - 1}], ' ') AS gram
            FROM t, unnest(generate_series(1, len(w) - {BOILERPLATE_N - 1}))
                 AS s(i)
        )
        SELECT gram,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM g GROUP BY gram
        HAVING count(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
        ORDER BY n_docs DESC, n_occurrences DESC, gram
    """,
    "lm_doc_score": """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents),
        uni AS (
            SELECT t1 AS w1, CAST(count(*) AS BIGINT) AS n_first
            FROM (SELECT unnest(w) AS t1 FROM t) GROUP BY 1
        ),
        big AS (
            SELECT g AS bigram, CAST(count(*) AS BIGINT) AS n_bigram
            FROM (
                SELECT unnest(list_transform(
                    generate_series(1, greatest(len(w) - 1, 0)),
                    i -> w[i] || ' ' || w[i + 1])) AS g
                FROM t
            ) GROUP BY 1
        ),
        model AS (
            SELECT bigram,
                   CAST(n_bigram AS DOUBLE) / CAST(n_first AS DOUBLE) AS cond_p
            FROM big JOIN uni ON split_part(bigram, ' ', 1) = uni.w1
        ),
        db AS (
            SELECT doc_id, unnest(list_transform(
                generate_series(1, greatest(len(w) - 1, 0)),
                i -> w[i] || ' ' || w[i + 1])) AS bigram
            FROM t
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(log2(cond_p)), 6) AS avg_log2_p
        FROM db JOIN model USING (bigram)
        GROUP BY doc_id
    """,
    "bigram_stats": """
        WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        uni AS (
            SELECT t AS w1, CAST(count(*) AS BIGINT) AS n_first
            FROM (SELECT unnest(w) AS t FROM toks) GROUP BY 1
        ),
        big AS (
            SELECT g AS bigram, CAST(count(*) AS BIGINT) AS n_bigram
            FROM (
                SELECT unnest(list_transform(
                    generate_series(1, greatest(len(w) - 1, 0)),
                    i -> w[i] || ' ' || w[i + 1])) AS g
                FROM toks
            ) GROUP BY 1
        )
        SELECT bigram, n_bigram, n_first,
               CAST(n_bigram AS DOUBLE) / CAST(n_first AS DOUBLE) AS cond_p
        FROM big JOIN uni ON split_part(bigram, ' ', 1) = uni.w1
        ORDER BY n_bigram DESC, bigram
        LIMIT 200
    """,
    "dedup_incremental": f"""
        WITH h AS (
            SELECT doc_id, md5(text) AS content_hash,
                   substr(md5('{BATCH_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS hb
            FROM documents
        ),
        corpus AS (SELECT content_hash FROM h WHERE hb < '{BATCH_THRESHOLD}')
        SELECT b.doc_id, b.content_hash
        FROM h b
        WHERE b.hb >= '{BATCH_THRESHOLD}'
          AND NOT EXISTS (SELECT 1 FROM corpus c
                          WHERE c.content_hash = b.content_hash)
    """,
}

# Bloom prefilter + exact verify == exact decontamination: same oracle.
ORACLE["decontaminate_bloom"] = ORACLE["decontaminate"]

ORACLE["cms_heavy_hitters"] = f"""
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
    ex AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
           FROM t GROUP BY 1),
    probe AS (SELECT tok, exact_count FROM ex
              ORDER BY exact_count DESC, tok LIMIT {CMS_TOPK}),
    d AS (SELECT unnest(range({CMS_DEPTH})) AS d),
    -- bucket d = 8-hex slice d of ONE md5 digest (the minhash-banding
    -- slice convention; sketch.md5_bucket pays one md5 for depth<=4)
    cms AS (
        SELECT d.d,
               ('0x' || substr(md5(t.tok), 1 + 8 * d.d, 8))::BIGINT
                 % {CMS_WIDTH} AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM t CROSS JOIN d GROUP BY 1, 2
    ),
    est AS (
        SELECT p.tok, CAST(min(coalesce(c.n, 0)) AS BIGINT) AS cms_est
        FROM probe p CROSS JOIN d
        LEFT JOIN cms c
          ON c.d = d.d
         AND c.bucket = ('0x' || substr(md5(p.tok), 1 + 8 * d.d, 8))::BIGINT
                        % {CMS_WIDTH}
        GROUP BY 1
    )
    SELECT p.tok, p.exact_count, e.cms_est
    FROM probe p JOIN est e USING (tok)
"""

_KMV_DOM = "1152921504606846976.0"  # 2^60 as an exact double literal

ORACLE["kmv_distinct_tokens"] = f"""
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
               FROM documents),
    dk AS (SELECT DISTINCT source, tok FROM t),
    h AS (SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
          FROM dk),
    rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM h),
    sk AS (SELECT source, h FROM rk WHERE rn <= {KMV_K}),
    uh AS (SELECT DISTINCT h FROM sk),
    urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uh),
    usk AS (SELECT h FROM urk WHERE rn <= {KMV_K}),
    groups AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_draws,
               max(h) AS h_max
        FROM sk GROUP BY 1
        UNION ALL
        SELECT '__union__', CAST(count(*) AS BIGINT), max(h) FROM usk
    )
    SELECT source, n_draws,
           round(CASE WHEN n_draws < {KMV_K}
                      THEN CAST(n_draws AS DOUBLE)
                      ELSE {float(KMV_K - 1)} * {_KMV_DOM}
                           / CAST(h_max AS DOUBLE)
                 END, 4) AS est_distinct
    FROM groups
"""

ORACLE["corpus_diff"] = """
    WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
    kept AS (SELECT doc_id,
                    CASE WHEN doc_id % 7 = 0 THEN text || ' v2-recrawl'
                         ELSE text END AS text
             FROM documents WHERE doc_id % 20 != 0),
    new AS (
        SELECT doc_id, md5(text) AS h FROM kept
        UNION ALL
        SELECT doc_id + 10000000, md5(text) FROM documents
        WHERE doc_id % 13 = 0
    ),
    j AS (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.h IS NOT DISTINCT FROM n.h THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    )
    SELECT status, CAST(count(*) AS BIGINT) AS n_docs FROM j GROUP BY 1
"""

ORACLE["kmv_set_ops"] = f"""
    WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
               FROM documents WHERE source IN ('src0', 'src1')),
    dk AS (SELECT DISTINCT source, tok FROM t),
    h AS (SELECT source, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
          FROM dk),
    rk AS (SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
           FROM h),
    a AS (SELECT h FROM rk WHERE source = 'src0' AND rn <= {KMV_K}),
    b AS (SELECT h FROM rk WHERE source = 'src1' AND rn <= {KMV_K}),
    uh AS (SELECT DISTINCT h
           FROM (SELECT h FROM a UNION ALL SELECT h FROM b)),
    urk AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uh),
    usk AS (SELECT h FROM urk WHERE rn <= {KMV_K}),
    common AS (SELECT a.h FROM a JOIN b USING (h)),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_union_draws,
               CAST(count(c.h) AS BIGINT) AS n_common_draws,
               max(u.h) AS hmax
        FROM usk u LEFT JOIN common c ON u.h = c.h
    ),
    ue AS (
        SELECT n_union_draws, n_common_draws,
               round(CASE WHEN n_union_draws < {KMV_K}
                          THEN CAST(n_union_draws AS DOUBLE)
                          ELSE {float(KMV_K - 1)} * {_KMV_DOM}
                               / CAST(hmax AS DOUBLE)
                     END, 4) AS union_est
        FROM stats
    ),
    ae AS (SELECT round(CASE WHEN count(*) < {KMV_K}
                             THEN CAST(count(*) AS DOUBLE)
                             ELSE {float(KMV_K - 1)} * {_KMV_DOM}
                                  / CAST(max(h) AS DOUBLE)
                        END, 4) AS a_est FROM a),
    be AS (SELECT round(CASE WHEN count(*) < {KMV_K}
                             THEN CAST(count(*) AS DOUBLE)
                             ELSE {float(KMV_K - 1)} * {_KMV_DOM}
                                  / CAST(max(h) AS DOUBLE)
                        END, 4) AS b_est FROM b)
    SELECT n_union_draws, n_common_draws, union_est,
           round(CAST(n_common_draws AS DOUBLE) / n_union_draws, 6)
               AS inter_jaccard,
           round(CAST(n_common_draws AS DOUBLE) / n_union_draws * union_est,
                 4) AS inter_est,
           a_est, b_est
    FROM ue, ae, be
"""


DSIR_DIM = 64
DSIR_K = 100
DSIR_TARGET_SOURCES = ("src0", "src1", "src2")


def _dsir_target(docs: DataFrame) -> DataFrame:
    return docs.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance log-weights (Xie et al. 2023) of every doc
    against a 3-source target domain — exact-integer scaled weights, so
    the oracle replays the whole hashed-bucket log-ratio pipeline."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    return pipeline.dsir_logweights(docs, _dsir_target(docs), dim=DSIR_DIM)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR selection step: top-100 docs by importance weight."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    return pipeline.dsir_select(
        docs, _dsir_target(docs), DSIR_K, dim=DSIR_DIM)


QUERIES["dsir_weights"] = q_dsir_weights
QUERIES["dsir_select"] = q_dsir_select

CONTAM_N = 3
CONTAM_CAP = 20


def q_contamination_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graded, per-eval-item contamination evidence: the containment
    fraction of each eval doc's distinct 3-grams inside each
    overlapping corpus doc (binary decontaminate's graded dial), with
    the heavy-gram cap (eval-side df <= 20) dropping attribution-free
    boilerplate grams. Same hash-carved eval split as decontaminate."""
    docs = _docs(spark, sf_dir)
    h = pipeline.hash_hex(F.col("doc_id"), salt=EVAL_SALT)
    thr = hex_threshold(EVAL_FRACTION)
    eval_df = docs.filter(h < F.lit(thr))
    corpus = docs.filter(h >= F.lit(thr))
    return pipeline.contamination_scores(
        corpus, eval_df, n=CONTAM_N, max_gram_eval_df=CONTAM_CAP)


QUERIES["contamination_scores"] = q_contamination_scores

ORACLE["contamination_scores"] = f"""
    WITH sh AS (
        SELECT doc_id,
               substr(md5('{EVAL_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS h,
               list_distinct(list_transform(
                   generate_series(1,
                       greatest(len(string_split(text, ' '))
                                - {CONTAM_N - 1}, 0)),
                   i -> array_to_string(
                       (string_split(text, ' '))[i:i+{CONTAM_N - 1}],
                       ' '))) AS grams
        FROM documents
    ),
    eg0 AS (
        SELECT doc_id AS eval_id, unnest(grams) AS gram FROM sh
        WHERE h < '{hex_threshold(EVAL_FRACTION)}'
    ),
    totals AS (
        SELECT eval_id, CAST(count(*) AS BIGINT) AS eval_grams
        FROM eg0 GROUP BY 1
    ),
    capped AS (
        SELECT gram FROM eg0 GROUP BY gram
        HAVING count(*) <= {CONTAM_CAP}
    ),
    eg AS (SELECT eg0.* FROM eg0 JOIN capped USING (gram)),
    cg AS (
        SELECT doc_id, unnest(grams) AS gram FROM sh
        WHERE h >= '{hex_threshold(EVAL_FRACTION)}'
    ),
    pairs AS (
        SELECT cg.doc_id, eg.eval_id,
               CAST(count(*) AS BIGINT) AS shared_grams
        FROM cg JOIN eg USING (gram) GROUP BY 1, 2
    )
    SELECT p.doc_id, p.eval_id, p.shared_grams, t.eval_grams,
           round(CAST(p.shared_grams AS DOUBLE) / t.eval_grams, 6)
               AS containment
    FROM pairs p JOIN totals t USING (eval_id)
"""


DSIR_HIDIM = 4096


def q_dsir_weights_hidim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR weights at a REALISTIC bucket dimension (4096; the paper's
    hashed n-gram space is 10k — dim=64 is a toy that aliases most of
    the vocabulary into shared buckets). Same exact-integer pipeline,
    same dim-row broadcast shape: only the broadcast table grows, the
    corpus still pays one token explode (VERDICT r6 next #7)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    return pipeline.dsir_logweights(
        docs, _dsir_target(docs), dim=DSIR_HIDIM)


QUERIES["dsir_weights_hidim"] = q_dsir_weights_hidim

_DSIR_TGT = "('" + "', '".join(DSIR_TARGET_SOURCES) + "')"


def _dsir_w_sql(dim: int) -> str:
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    b AS (
        SELECT doc_id,
               CAST((('0x' || substr(md5(tok), 1, 8))::BIGINT
                    % {dim}) AS INT) AS bucket
        FROM tok
    ),
    tb AS (
        SELECT b.bucket FROM b
        JOIN documents d ON d.doc_id = b.doc_id
        WHERE d.source IN {_DSIR_TGT}
    ),
    raw_n AS (SELECT bucket, count(*) AS rn FROM b GROUP BY 1),
    tgt_n AS (SELECT bucket, count(*) AS tn FROM tb GROUP BY 1),
    tot AS (SELECT (SELECT count(*) FROM b) AS rt,
                   (SELECT count(*) FROM tb) AS tt),
    dom AS (SELECT CAST(unnest(range({dim})) AS INT) AS bucket),
    lr AS (
        SELECT dom.bucket,
               CAST(round(
                   (ln((coalesce(tn, 0) + 1.0) / (tot.tt + {dim}.0))
                    - ln((coalesce(rn, 0) + 1.0) / (tot.rt + {dim}.0)))
                   * 1000000, 0) AS BIGINT) AS lr
        FROM dom
        CROSS JOIN tot
        LEFT JOIN raw_n ON raw_n.bucket = dom.bucket
        LEFT JOIN tgt_n ON tgt_n.bucket = dom.bucket
    )
    SELECT d.doc_id,
           CAST(coalesce((
               SELECT sum(lr.lr) FROM b JOIN lr ON lr.bucket = b.bucket
               WHERE b.doc_id = d.doc_id
           ), 0) AS BIGINT) AS logw_e6
    FROM (SELECT DISTINCT doc_id FROM documents) d
"""


_DSIR_W = _dsir_w_sql(DSIR_DIM)
ORACLE["dsir_weights"] = _DSIR_W
ORACLE["dsir_weights_hidim"] = _dsir_w_sql(DSIR_HIDIM)
ORACLE["dsir_select"] = f"""
    SELECT doc_id, logw_e6, rn AS rank FROM (
        SELECT *, row_number() OVER (ORDER BY logw_e6 DESC, doc_id) AS rn
        FROM ({_DSIR_W})
    ) WHERE rn <= {DSIR_K}
"""


COVERAGE_K = 100


def q_token_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage curve of the top-100 tokens."""
    return pipeline.token_coverage(_docs(spark, sf_dir), COVERAGE_K)


QUERIES["token_coverage"] = q_token_coverage

ORACLE["token_coverage"] = f"""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    c AS (SELECT token, CAST(count(*) AS BIGINT) AS n_occurrences
          FROM t GROUP BY 1),
    tot AS (SELECT CAST(sum(n_occurrences) AS BIGINT) AS total FROM c),
    top AS (
        SELECT token, n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, token)
               AS rank
        FROM c
        ORDER BY n_occurrences DESC, token
        LIMIT {COVERAGE_K}
    )
    SELECT CAST(rank AS BIGINT) AS rank, token, n_occurrences,
           CAST(sum(n_occurrences) OVER (ORDER BY rank) AS DOUBLE)
           / tot.total AS cum_share
    FROM top, tot
"""
