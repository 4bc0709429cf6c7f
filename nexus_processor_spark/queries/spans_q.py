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


QUERIES = {
    "dup_spans": q_dup_spans,
    "dup_span_excise": q_dup_span_excise,
}


# Shared replay: positional 5-grams (1-based DuckDB positions shifted to
# the operator's 0-based convention), redundant = any occurrence of a
# gram other than the (doc_id, pos)-first, islands merged when extents
# [pos, pos+L) overlap or touch.
_SPANS_CTE = f"""
    WITH t AS MATERIALIZED (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE text IS NOT NULL
    ),
    occ AS MATERIALIZED (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(ws[i:i + {L - 1}], ' ')) AS k
        FROM (SELECT doc_id, ws,
                     unnest(generate_series(1, len(ws) - {L - 1})) AS i
              FROM t)
    ),
    red AS MATERIALIZED (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY k
                                      ORDER BY doc_id, pos) AS rn
            FROM occ)
        WHERE rn >= 2
    ),
    isl0 AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(
                        max(pos + {L}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                        -1)
                    THEN 1 ELSE 0 END AS nw
        FROM red
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


_DUP_SPANS_SQL = _SPANS_CTE + """
    SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end AS BIGINT) AS span_end,
           CAST(span_end - span_start AS BIGINT) AS span_words
    FROM sp
"""


_DUP_SPAN_EXCISE_SQL = _SPANS_CTE + """,
    stats AS (
        SELECT doc_id, sum(span_end - span_start) AS dup_words,
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
           CAST(coalesce(st.dup_words, 0) AS BIGINT) AS dup_words,
           CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans
    FROM documents d
    LEFT JOIN stats st USING (doc_id)
    LEFT JOIN cleaned c USING (doc_id)
"""


ORACLE = {
    "dup_spans": _DUP_SPANS_SQL,
    "dup_span_excise": _DUP_SPAN_EXCISE_SQL,
}
