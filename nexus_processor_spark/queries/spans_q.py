"""Substring-dedup registry queries: duplicated-span detection and
excision (operators/spans.py), oracle-checked against a full SQL replay
of the positional-gram pass, keep-first redundancy rule, and
gaps-and-islands span merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.operators import spans
from nexus_processor_spark.sources.tables import load_table

L = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated word spans per document (L=5 grams, keep-first:
    the globally-first occurrence of each gram is not reported)."""
    return spans.dup_spans(_docs(spark, sf_dir), L)


def q_dup_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents rewritten with duplicated spans removed, plus per-doc
    redundancy stats — the full excision machinery end to end."""
    return spans.excise_dup_spans(_docs(spark, sf_dir), L)


def q_contam_span_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical decontamination: hash-carve an eval set out of documents
    (same carve as the ``decontaminate`` query), then excise exactly the
    contaminated spans from the rest of the corpus instead of flagging
    whole documents."""
    from pyspark.sql import functions as F

    from nexus_processor_spark.operators.pipeline import hash_hex, hex_threshold
    from nexus_processor_spark.queries.pipeline_q import EVAL_FRACTION, EVAL_SALT

    docs = _docs(spark, sf_dir)
    h = hash_hex(F.col("doc_id"), salt=EVAL_SALT)
    thr = hex_threshold(EVAL_FRACTION)
    eval_df = docs.filter(h < F.lit(thr))
    corpus = docs.filter(h >= F.lit(thr))
    return spans.excise_contamination(corpus, eval_df, L)


LEAK_L = 4


def q_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-leakage provenance matrix: redundant 4-gram occurrences
    attributed to the source of their corpus-wide first copy."""
    return spans.cross_source_leakage(_docs(spark, sf_dir), LEAK_L)


QUERIES = {
    "dup_spans": q_dup_spans,
    "dup_span_excise": q_dup_span_excise,
    "contam_span_excise": q_contam_span_excise,
    "source_leakage": q_source_leakage,
}


# Shared replay pieces: positional 5-grams (1-based DuckDB positions
# shifted to the operator's 0-based convention), islands merged when
# extents [pos, pos+L) overlap or touch, excision rebuilds the text.
# Parameterized by the corpus source so the duplicate replay (over
# `documents`) and the decontamination replay (over the carved corpus)
# share every decision.

def _grams_cte(src: str) -> str:
    return f"""t AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM {src} WHERE text IS NOT NULL
    ),
    occ AS MATERIALIZED (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(ws[i:i + {L - 1}], ' ')) AS k
        FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws) - {L - 1})) AS i
              FROM t)
    )"""


def _islands_cte(hits: str) -> str:
    return f"""isl0 AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(
                        max(pos + {L}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS nw
        FROM {hits}
    ),
    isl AS (
        SELECT doc_id, pos,
               sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM isl0
    ),
    sp AS MATERIALIZED (
        SELECT doc_id, min(pos) AS span_start, max(pos) + {L} AS span_end
        FROM isl GROUP BY doc_id, island
    )"""


def _excise_sql(base: str, words_alias: str) -> str:
    return f""",
    stats AS (
        SELECT doc_id, sum(span_end - span_start) AS dw,
               count(*) AS n_spans
        FROM sp GROUP BY doc_id
    ),
    kept AS (
        SELECT wp.doc_id, wp.w, wp.i
        FROM (SELECT doc_id, unnest(ws) AS w,
                     unnest(generate_series(1, len(ws))) AS i FROM t) wp
        WHERE NOT EXISTS (
            SELECT 1 FROM sp
            WHERE sp.doc_id = wp.doc_id
              AND wp.i - 1 >= sp.span_start AND wp.i - 1 < sp.span_end)
    ),
    cleaned AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS clean_text
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN st.doc_id IS NULL THEN d.text
                ELSE coalesce(c.clean_text, '') END AS clean_text,
           CAST(CASE WHEN d.text IS NULL THEN 0
                     ELSE len(string_split(d.text, ' ')) END AS BIGINT)
               AS n_words,
           CAST(coalesce(st.dw, 0) AS BIGINT) AS {words_alias},
           CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans
    FROM {base} d
    LEFT JOIN stats st USING (doc_id)
    LEFT JOIN cleaned c USING (doc_id)
"""


# redundant = any occurrence of a gram other than the (doc_id, pos)-first
_RED_CTE = """red AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY doc_id, pos) AS rn
            FROM occ)
        WHERE rn >= 2
    )"""

_SPANS_CTE = (
    "\n    WITH " + _grams_cte("documents") + ",\n    " + _RED_CTE
    + ",\n    " + _islands_cte("red")
)


_DUP_SPANS_SQL = _SPANS_CTE + """
    SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end AS BIGINT) AS span_end,
           CAST(span_end - span_start AS BIGINT) AS span_words
    FROM sp
"""


_DUP_SPAN_EXCISE_SQL = _SPANS_CTE + _excise_sql("documents", "dup_words")


def _contam_cte() -> str:
    from nexus_processor_spark.operators.pipeline import hex_threshold
    from nexus_processor_spark.queries.pipeline_q import EVAL_FRACTION, EVAL_SALT

    thr = hex_threshold(EVAL_FRACTION)
    return f"""
    WITH carve AS MATERIALIZED (
        SELECT doc_id, text,
               substr(md5('{EVAL_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
        FROM documents
    ),
    ev AS MATERIALIZED (SELECT doc_id, text FROM carve WHERE h < '{thr}'),
    corp AS MATERIALIZED (SELECT doc_id, text FROM carve WHERE h >= '{thr}'),
    ek AS MATERIALIZED (
        SELECT DISTINCT md5(array_to_string(ws[i:i + {L - 1}], ' ')) AS k
        FROM (SELECT ws, unnest(generate_series(1, len(ws) - {L - 1})) AS i
              FROM (SELECT string_split(text, ' ') AS ws
                    FROM ev WHERE text IS NOT NULL))
    ),
    """ + _grams_cte("corp") + """,
    hit AS MATERIALIZED (
        SELECT doc_id, pos FROM occ WHERE k IN (SELECT k FROM ek)
    ),
    """ + _islands_cte("hit")


_CONTAM_EXCISE_SQL = _contam_cte() + _excise_sql("corp", "contam_words")


_SOURCE_LEAKAGE_SQL = f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id, source, string_split(text, ' ') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    occ AS MATERIALIZED (
        SELECT doc_id, source, i - 1 AS pos,
               md5(array_to_string(ws[i:i + {LEAK_L - 1}], ' ')) AS k
        FROM (SELECT doc_id, source, ws,
                     unnest(generate_series(1, len(ws) - {LEAK_L - 1})) AS i
              FROM t)
    ),
    r AS (
        SELECT source,
               row_number() OVER w AS rn,
               first_value(source) OVER w AS first_source
        FROM occ
        WINDOW w AS (PARTITION BY k ORDER BY doc_id, pos)
    )
    SELECT source, first_source, CAST(count(*) AS BIGINT) AS n_grams
    FROM r WHERE rn >= 2
    GROUP BY source, first_source
    ORDER BY n_grams DESC, source, first_source
"""


ORACLE = {
    "dup_spans": _DUP_SPANS_SQL,
    "dup_span_excise": _DUP_SPAN_EXCISE_SQL,
    "contam_span_excise": _CONTAM_EXCISE_SQL,
    "source_leakage": _SOURCE_LEAKAGE_SQL,
}
