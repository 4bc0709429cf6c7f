"""Text-analysis queries over ``documents``, with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.operators import textstats
from nexus_processor_spark.operators.textstats import BPE_TOKEN_RE, LANG_MARKERS, STOPWORDS
from nexus_processor_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.text_profile(_docs(spark, sf_dir))


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.language_id(_docs(spark, sf_dir))


def q_text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.fingerprints(_docs(spark, sf_dir))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score from profile features — the gating signal a
    training-data pipeline thresholds on. Exact per-row arithmetic (no
    accumulation), so the doubles match the oracle bit-for-bit."""
    from pyspark.sql import functions as F

    prof = textstats.text_profile(_docs(spark, sf_dir))
    length_ok = F.when((F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000), 1.0).otherwise(0.0)
    token_ok = F.when(F.col("n_tokens") >= 20, 1.0).otherwise(0.0)
    digit_pen = F.col("n_digits").cast("double") / F.col("n_chars")
    score = (length_ok * 0.4 + token_ok * 0.4
             + F.col("stopword_ratio") * 2.0 - digit_pen)
    return prof.select(
        "doc_id",
        score.alias("quality_score"),
        (score >= 0.5).alias("keep"),
    )


CHUNK_TOKENS = 64
CHUNK_OVERLAP = 8
PACK_BUDGET = 2000


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.normalize_text(_docs(spark, sf_dir))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.chunk_documents(
        _docs(spark, sf_dir), chunk_tokens=CHUNK_TOKENS, overlap=CHUNK_OVERLAP
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    return textstats.pack_sequences(docs, PACK_BUDGET)


HASH_DIM = 64


def q_text_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing vectorization (sparse long form): md5-bucketed
    signed token counts at fixed dim — no vocabulary pass; the bridge
    from text to the vector/ANN operators via hashed_dense."""
    return textstats.hashed_features(_docs(spark, sf_dir), HASH_DIM)


TEXT_TOPK = 5
TEXT_N_QUERIES = 3


def q_text_semantic_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end model-free semantic search: docs -> hashed features ->
    dense vectors -> exact cosine top-k (doc_id < 3 as queries). The
    integration path from the text operators into the ANN family."""
    from pyspark.sql import functions as F

    from nexus_processor_spark.operators import similarity

    dense = textstats.hashed_dense(
        textstats.hashed_features(_docs(spark, sf_dir), HASH_DIM), HASH_DIM
    ).withColumnRenamed("doc_id", "vec_id")
    return similarity.brute_force_topk(
        dense.filter(F.col("vec_id") < TEXT_N_QUERIES), dense, TEXT_TOPK
    )


LOGREG_ITERATIONS = 5
LOGREG_LR = 0.1
# seed labels: half the sources are "high quality" — what matters for
# the oracle is that the label is a pure function of the row
_POS_SOURCES = tuple(f"src{i}" for i in range(10))


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality filter, end to end: hashed features -> dense
    vectors -> full-batch-GD logistic regression (one skinny aggregate
    per iteration, weights broadcast as literals) -> map-only corpus
    scoring. The learned replacement for the heuristic text_quality
    gate; the DuckDB oracle re-derives the exact GD trajectory
    (round-6 probs / round-9 updates) and must match every score."""
    from pyspark.sql import functions as F

    from nexus_processor_spark.operators import classifier

    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    dense = textstats.hashed_dense(
        textstats.hashed_features(docs, HASH_DIM), HASH_DIM
    )
    labeled = dense.join(
        docs.select(
            "doc_id",
            F.col("source").isin(*_POS_SOURCES).cast("long").alias("label"),
        ),
        "doc_id",
    ).localCheckpoint(eager=True)  # fit AND score read it; one pass
    w, b = classifier.logreg_fit(
        labeled, HASH_DIM, iterations=LOGREG_ITERATIONS, lr=LOGREG_LR
    )
    return classifier.logreg_score(labeled, w, b).join(
        labeled.select("doc_id", "label"), "doc_id"
    )


QUERIES = {
    "text_semantic_topk": q_text_semantic_topk,
    "quality_classifier": q_quality_classifier,
    "text_hashed_features": q_text_hashed_features,
    "text_normalize": q_text_normalize,
    "doc_chunks": q_doc_chunks,
    "pack_sequences": q_pack_sequences,
    "text_profile": q_text_profile,
    "text_langid": q_text_langid,
    "text_fingerprints": q_text_fingerprints,
    "text_quality": q_text_quality,
}


def _hits(markers: tuple[str, ...]) -> str:
    quoted = ", ".join(f"'{m}'" for m in markers)
    return (
        "CAST(len(list_filter(string_split(text, ' '), "
        f"t -> t IN ({quoted}))) AS BIGINT)"
    )


def _langid_sql() -> str:
    langs = list(LANG_MARKERS)
    scores = ", ".join(f"{_hits(m)} AS score_{lang}" for lang, m in LANG_MARKERS.items())
    cases = []
    for lang in langs:
        others = ", ".join(f"score_{o}" for o in langs if o != lang)
        cases.append(
            f"WHEN score_{lang} > 0 AND score_{lang} >= greatest({others}) THEN '{lang}'"
        )
    case = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
        SELECT doc_id, {', '.join(f'score_{lang}' for lang in langs)},
               {case} AS pred_lang
        FROM (SELECT doc_id, {scores} FROM documents)
    """


_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

def _cos_sql(a: str, b: str) -> str:
    from nexus_processor_spark.queries.similarity_q import _cos

    return _cos(a, b)


_HASHED_F = f"""
    SELECT doc_id,
           CAST((('0x' || substr(md5(tok), 1, 8))::BIGINT
                % {HASH_DIM}) AS INT) AS bucket,
           CASE WHEN ('0x' || substr(md5(tok), 9, 1))::INT % 2 = 0
                THEN 1 ELSE -1 END AS s
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
          FROM documents)
"""

def _logreg_sql(dim: int, iterations: int, lr: float) -> str:
    """Unrolled GD trajectory mirroring operators.classifier exactly:
    same md5 feature hashing, index-ordered dot, round-6 sigmoid,
    round-9 ``w - (lr*g)/n`` updates (engine half-away rounding on both
    sides)."""
    pos = ", ".join(f"'{s}'" for s in _POS_SOURCES)
    dot = (
        f"list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> w.w[i] * s.v[i]))"
    )
    ctes = [f"""WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE text IS NOT NULL
        ),
        f AS (
            SELECT doc_id,
                   CAST((('0x' || substr(md5(tok), 1, 8))::BIGINT
                        % {dim}) AS INT) AS bucket,
                   CASE WHEN ('0x' || substr(md5(tok), 9, 1))::INT % 2 = 0
                        THEN 1 ELSE -1 END AS sg
            FROM tok
        ),
        x AS MATERIALIZED (
            SELECT d.doc_id,
                   CASE WHEN d.source IN ({pos}) THEN 1 ELSE 0 END AS label,
                   list(CAST(COALESCE(fw.weight, 0) AS DOUBLE)
                        ORDER BY t.j) AS v
            FROM documents d
            CROSS JOIN generate_series(0, {dim - 1}) AS t(j)
            LEFT JOIN (SELECT doc_id, bucket, sum(sg) AS weight
                       FROM f GROUP BY 1, 2) fw
                   ON fw.doc_id = d.doc_id AND fw.bucket = t.j
            WHERE d.text IS NOT NULL
            GROUP BY d.doc_id, d.source
        ),
        nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM x),
        w0 AS (SELECT list_transform(generate_series(1, {dim}),
                                     i -> CAST(0.0 AS DOUBLE)) AS w,
                      CAST(0.0 AS DOUBLE) AS b),"""]
    for k in range(1, iterations + 1):
        # MATERIALIZED: each CTE is referenced more than once down the
        # chain; without the hint DuckDB may inline and re-evaluate the
        # whole prefix per reference (exponential in iterations)
        ctes.append(f"""s{k} AS MATERIALIZED (
            SELECT s.doc_id, s.label, s.v,
                   round(1.0 / (1.0 + exp(-({dot} + w.b))), 6) AS p
            FROM x s, w{k - 1} w
        ),
        w{k} AS MATERIALIZED (
            SELECT
              (SELECT list(round(pw.w[g.j + 1] - ({lr} * g.g) / nv.n, 9)
                           ORDER BY g.j)
               FROM (SELECT t.j, sum((s.p - s.label) * s.v[t.j + 1]) AS g
                     FROM s{k} s
                     CROSS JOIN generate_series(0, {dim - 1}) AS t(j)
                     GROUP BY t.j) g, w{k - 1} pw, nv) AS w,
              (SELECT round(pw.b
                            - ({lr} * (SELECT sum(p - label) FROM s{k}))
                              / nv.n, 9)
               FROM w{k - 1} pw, nv) AS b
        ),""")
    ctes.append(f"""sc AS (
            SELECT s.doc_id, s.label,
                   round(1.0 / (1.0 + exp(-({dot} + w.b))), 6) AS p
            FROM x s, w{iterations} w
        )""")
    body = "\n".join(ctes)
    return f"""{body}
        SELECT doc_id, p AS prob,
               CAST(p >= 0.5 AS BIGINT) AS predicted,
               CAST(label AS BIGINT) AS label
        FROM sc"""


ORACLE = {
    "quality_classifier": _logreg_sql(
        HASH_DIM, LOGREG_ITERATIONS, LOGREG_LR
    ),
    "text_semantic_topk": f"""
        WITH f AS (
            SELECT doc_id, bucket, sum(s) AS weight
            FROM ({_HASHED_F}) GROUP BY 1, 2
        ),
        dense AS (
            SELECT d.doc_id,
                   list(CAST(coalesce(f.weight, 0) AS DOUBLE)
                        ORDER BY r.b) AS embedding
            FROM (SELECT DISTINCT doc_id FROM documents) d
            CROSS JOIN (SELECT unnest(range({HASH_DIM})) AS b) r
            LEFT JOIN f ON f.doc_id = d.doc_id AND f.bucket = r.b
            GROUP BY d.doc_id
        ),
        scored AS (
            SELECT q.doc_id AS query_id, c.doc_id AS vec_id,
                   {{COS}} AS cos
            FROM dense q JOIN dense c ON c.doc_id <> q.doc_id
            WHERE q.doc_id < {TEXT_N_QUERIES}
        )
        SELECT query_id, vec_id, cos, rn AS rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, vec_id) AS rn
            FROM scored
        ) WHERE rn <= {TEXT_TOPK}
    """,
    "text_hashed_features": f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ),
        f AS (
            SELECT doc_id,
                   CAST((('0x' || substr(md5(tok), 1, 8))::BIGINT
                        % {HASH_DIM}) AS INT) AS bucket,
                   CASE WHEN ('0x' || substr(md5(tok), 9, 1))::INT % 2 = 0
                        THEN 1 ELSE -1 END AS s
            FROM tok
        )
        SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
        FROM f GROUP BY 1, 2
    """,
    "text_normalize": """
        SELECT doc_id,
               trim(regexp_replace(
                    regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                    ' +', ' ', 'g')) AS norm_text
        FROM documents
    """,
    "doc_chunks": f"""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        c AS (SELECT doc_id, toks,
                     greatest(CAST(ceil((len(toks) - {CHUNK_OVERLAP}) / {float(_STRIDE)})
                                   AS BIGINT), 1) AS n_chunks
              FROM t)
        SELECT doc_id, CAST(u.k AS BIGINT) AS chunk_id,
               array_to_string(toks[u.k * {_STRIDE} + 1 : u.k * {_STRIDE} + {CHUNK_TOKENS}],
                               ' ') AS chunk_text,
               CAST(len(string_split(
                   array_to_string(toks[u.k * {_STRIDE} + 1 : u.k * {_STRIDE} + {CHUNK_TOKENS}],
                                   ' '), ' ')) AS BIGINT) AS chunk_tokens
        FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(k)
    """,
    "pack_sequences": f"""
        WITH d AS (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                   FROM documents)
        SELECT doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / {float(PACK_BUDGET)}) AS BIGINT) AS pack_id
        FROM d
    """,
    # Same left-to-right association as the Spark expression so the double
    # arithmetic is bit-identical.
    "text_quality": f"""
        WITH p AS (
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   {_hits(STOPWORDS)} AS stop_hits,
                   CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
            FROM documents
        )
        SELECT doc_id,
               (CASE WHEN n_chars >= 100 AND n_chars <= 2000
                     THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                   * CAST(0.4 AS DOUBLE)
                 + (CASE WHEN n_tokens >= 20
                         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                   * CAST(0.4 AS DOUBLE)
                 + (CAST(stop_hits AS DOUBLE) / n_tokens) * CAST(2.0 AS DOUBLE)
                 - CAST(n_digits AS DOUBLE) / n_chars AS quality_score,
               ((CASE WHEN n_chars >= 100 AND n_chars <= 2000
                      THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                   * CAST(0.4 AS DOUBLE)
                 + (CASE WHEN n_tokens >= 20
                         THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
                   * CAST(0.4 AS DOUBLE)
                 + (CAST(stop_hits AS DOUBLE) / n_tokens) * CAST(2.0 AS DOUBLE)
                 - CAST(n_digits AS DOUBLE) / n_chars) >= CAST(0.5 AS DOUBLE) AS keep
        FROM p
    """,
    "text_profile": f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS avg_token_len,
               {_hits(STOPWORDS)} AS stopword_hits,
               CAST({_hits(STOPWORDS)} AS DOUBLE)
                 / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT)
                 AS bpe_tokens,
               CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits
        FROM documents
    """,
    "text_langid": _langid_sql(),
    "text_fingerprints": """
        SELECT doc_id,
               md5(text) AS fp_md5,
               md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fp_norm_md5,
               CASE WHEN length(text) >= 8 THEN
                 list_aggregate(
                   list_transform(
                     list_distinct(
                       list_transform(generate_series(1, length(text) - 7),
                                      i -> substr(text, i, 8))
                     ), s -> md5(s)
                   ), 'min')
               END AS fp_rolling_min
        FROM documents
    """,
}

ORACLE["text_semantic_topk"] = ORACLE["text_semantic_topk"].replace(
    "{COS}", _cos_sql("q.embedding", "c.embedding")
)
