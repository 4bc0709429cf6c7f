"""Tokenizer-training registry queries: BPE merge learning and corpus
segmentation (operators/bpe.py), oracle-checked against a fully
unrolled SQL replay of the merge loop — every pair count, argmax
tiebreak, and greedy overlap decision is reproduced in DuckDB, the same
way the k-means oracle unrolls Lloyd iterations (similarity_q.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nexus_processor_spark.operators import bpe
from nexus_processor_spark.sources.tables import load_table

N_MERGES = 6


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned merge table (exact: no word cap) — the corpus-scale pass
    is one word-count aggregate; the merge loop runs on the collected
    dictionary (see operators/bpe.py scale notes)."""
    return bpe.bpe_train(_docs(spark, sf_dir), N_MERGES, max_words=None)


def q_bpe_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-segment: the learned merges applied to every document
    via the JVM-native per-merge projection chain (distinct words encode
    once; documents never enter Python)."""
    docs = _docs(spark, sf_dir)
    merges = bpe.bpe_train(docs, N_MERGES, max_words=None)
    pairs = [
        (r.left_sym, r.right_sym)
        for r in merges.orderBy("merge_rank").collect()
    ]
    return bpe.encode_native(docs, pairs)


PACK_BUDGET = 1024


def q_bpe_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data endgame chain: learn merges, segment every
    document, pack the per-doc piece counts into fixed-budget training
    sequences (textstats.pack_sequences' distributed id-order cumsum —
    no single-task window)."""
    from nexus_processor_spark.operators.textstats import pack_sequences

    docs = _docs(spark, sf_dir)
    merges = bpe.bpe_train(docs, N_MERGES, max_words=None)
    pairs = [
        (r.left_sym, r.right_sym)
        for r in merges.orderBy("merge_rank").collect()
    ]
    enc = bpe.encode_native(docs, pairs).select("doc_id", "n_pieces")
    return pack_sequences(enc, PACK_BUDGET, tokens_col="n_pieces")


QUERIES = {
    "bpe_merges": q_bpe_merges,
    "bpe_encoded": q_bpe_encoded,
    "bpe_packed": q_bpe_packed,
}


# --- unrolled merge-loop oracle --------------------------------------------
#
# One iteration = five CTEs over the (vocabulary-sized) word table:
#   pc{k}: adjacent-pair counts weighted by word count
#   p{k} : argmax pair, ties (count desc, left asc, right asc)
#   c{k} : candidate positions of that pair in each word
#   k{k} : greedy non-overlap selection — candidates can only be
#          adjacent when left == right, and the run-alternation rule
#          ((i - run_start) % 2 = 0) IS the left-to-right greedy scan
#   w{k} : rewritten words (kept position -> merged symbol, its
#          successor dropped, everything else carried)

def _bpe_iteration(k: int) -> str:
    prev = f"w{k - 1}"
    return f"""
    pc{k} AS MATERIALIZED (
        SELECT s[i] AS l, s[i + 1] AS r, sum(wc) AS c
        FROM (SELECT s, wc, unnest(generate_series(1, len(s) - 1)) AS i
              FROM {prev})
        GROUP BY 1, 2
    ),
    p{k} AS MATERIALIZED (SELECT l, r, c FROM pc{k} ORDER BY c DESC, l, r LIMIT 1),
    c{k} AS MATERIALIZED (
        SELECT t.word, t.i
        FROM (SELECT word, s, unnest(generate_series(1, len(s) - 1)) AS i
              FROM {prev}) t, p{k} p
        WHERE t.s[t.i] = p.l AND t.s[t.i + 1] = p.r
    ),
    k{k} AS MATERIALIZED (
        SELECT word, i FROM (
            SELECT word, i, min(i) OVER (PARTITION BY word, grp) AS g0
            FROM (SELECT word, i,
                         i - row_number() OVER (PARTITION BY word
                                                ORDER BY i) AS grp
                  FROM c{k})
        ) WHERE (i - g0) % 2 = 0
    ),
    w{k} AS MATERIALIZED (
        SELECT x.word, min(x.wc) AS wc,
               list(CASE WHEN ki.word IS NOT NULL
                         THEN (SELECT l || r FROM p{k})
                         ELSE x.sym END ORDER BY x.i) AS s
        FROM (SELECT word, wc, unnest(generate_series(1, len(s))) AS i,
                     unnest(s) AS sym FROM {prev}) x
        LEFT JOIN k{k} ki ON ki.word = x.word AND ki.i = x.i
        LEFT JOIN k{k} kp ON kp.word = x.word AND kp.i = x.i - 1
        WHERE kp.word IS NULL
        GROUP BY x.word
    )"""


_BPE_CHAIN = """
    WITH d AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    w0 AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS wc,
               string_split(w, '') AS s
        FROM (SELECT unnest(ws) AS w FROM d)
        WHERE w <> '' GROUP BY w
    ),""" + ",".join(_bpe_iteration(k) for k in range(1, N_MERGES + 1))


_BPE_MERGES_SQL = _BPE_CHAIN + "\n    " + "\n    UNION ALL ".join(
    f"SELECT CAST({k - 1} AS BIGINT) AS merge_rank, l AS left_sym, "
    f"r AS right_sym, l || r AS merged, CAST(c AS BIGINT) AS pair_count "
    f"FROM p{k}"
    for k in range(1, N_MERGES + 1)
)


_BPE_ENCODED_SQL = _BPE_CHAIN + f"""
    SELECT e.doc_id, flatten(list(wk.s ORDER BY e.pos)) AS pieces,
           CAST(sum(len(wk.s)) AS BIGINT) AS n_pieces
    FROM (SELECT doc_id, unnest(ws) AS word,
                 unnest(generate_series(1, len(ws))) AS pos FROM d) e
    JOIN w{N_MERGES} wk USING (word)
    WHERE e.word <> ''
    GROUP BY e.doc_id
"""


_BPE_PACKED_SQL = _BPE_CHAIN + f""",
    enc AS (
        SELECT e.doc_id, CAST(sum(len(wk.s)) AS BIGINT) AS n_pieces
        FROM (SELECT doc_id, unnest(ws) AS word FROM d) e
        JOIN w{N_MERGES} wk USING (word)
        WHERE e.word <> ''
        GROUP BY e.doc_id
    )
    SELECT doc_id, n_pieces,
           CAST(floor((sum(n_pieces) OVER (ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)
                       - n_pieces) / {float(PACK_BUDGET)}) AS BIGINT)
               AS pack_id
    FROM enc
"""


ORACLE = {
    "bpe_merges": _BPE_MERGES_SQL,
    "bpe_encoded": _BPE_ENCODED_SQL,
    "bpe_packed": _BPE_PACKED_SQL,
}
