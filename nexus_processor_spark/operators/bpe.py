"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The missing tokenization stage of the training-data pipeline: learn a
subword merge table from corpus statistics, then segment every document
with it (the step between ``pipeline.build_vocab``'s whitespace vocab
and model-ready input ids).

Scale design (the 100 TB shape):

* The only corpus-scale pass is **word counting** — one hash aggregate
  producing the distinct-word table ``(word, wc)``, which is *vocabulary*
  -sized (tens of millions of rows for web-scale corpora), not corpus-
  sized. Everything after runs on that table; this is the same reduction
  every production tokenizer trainer makes (word-count dictionaries,
  not raw text).
* ``bpe_train`` then runs the merge loop on the **driver** over a
  deterministically capped top-``max_words`` slice of that table, with
  incremental pair-count maintenance — O(cap) memory, like collecting k
  centroids in k-means. Thousands of merges cost no Spark jobs at all.
* ``bpe_train_spark`` is the fully-distributed twin (one pair-count
  aggregate + one 1-row argmax collect per merge) for word tables too
  large to cap; it is equality-pinned to the driver form in tests.
* ``bpe_encode`` segments the corpus by encoding each **distinct word
  once** (Arrow-batched ``mapInPandas`` — per-word greedy loops are not
  expressible in native expressions for unbounded merge tables) and
  joining the pieces back to the exploded corpus — the word table
  shuffles, never full documents.
* ``merge_pair_col`` / ``encode_native`` are JVM-native (higher-order
  function) forms for SMALL merge tables, used by the oracle-paired
  registry queries so the checked path stays whole-stage-codegen.

Merge semantics (identical across all four implementations and the SQL
oracle, test- and property-pinned):

* Words never merge across boundaries; initial symbols are codepoints.
* Pair choice per step: highest summed word-count, ties broken by
  ``(left, right)`` ascending — the same corpus always yields the same
  merge table.
* Applying one merge rewrites each word's symbol sequence greedily
  left-to-right, non-overlapping (``[a,a,a] -> [aa,a]``).
* Encoding applies the learned merges in rank order. The rank-priority
  loop in ``bpe_encode`` is equivalent: a merge can never create a new
  occurrence of a LOWER-ranked pair (later merges only create
  adjacencies involving their own newer symbol), so "repeatedly merge
  the lowest-ranked pair present" replays the training order exactly.

Reference parity: the reference engine ships no tokenizer trainer; this
family extends the corpus-curation surface (SURVEY.md "beyond the
reference" §text) the way its ETL extends ingest.
"""

from __future__ import annotations

from typing import Iterable, Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.functions.text import tokens

MERGES_SCHEMA = (
    "merge_rank long, left_sym string, right_sym string, "
    "merged string, pair_count long"
)


def word_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Distinct-word counts ``(word, wc)`` — the one corpus-scale pass
    (map-side combined hash aggregate). Empty-string tokens (produced by
    leading/trailing/double separators) are dropped: they have no
    symbols to merge."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _sym_split(word: Column) -> Column:
    """Codepoint symbol sequence of a word (``split`` on the empty
    regex; Spark emits no trailing empty element)."""
    return F.split(word, "")


def merge_pair_col(s: Column, left: str, right: str) -> Column:
    """Native greedy left-to-right non-overlapping application of ONE
    merge ``(left, right) -> left+right`` to a symbol-array column.

    Pure higher-order expressions (filter / aggregate / transform) —
    whole-stage-codegen, no Python. The overlap subtlety: candidates at
    ``i`` and ``i+1`` only coexist when ``left == right``; the fold
    skips a candidate whose predecessor position was itself kept, which
    is exactly the greedy scan (``[a,a,a,a] -> [aa,aa]``)."""
    merged = left + right
    n = F.size(s)
    cand = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(0), n - 2),
            lambda i: (F.get(s, i) == left) & (F.get(s, i + 1) == right),
        ),
    ).otherwise(F.array().cast("array<int>"))
    kept = F.aggregate(
        cand,
        F.struct(
            F.array().cast("array<int>").alias("k"),
            F.lit(-2).alias("last"),
        ),
        lambda acc, i: F.when(i == acc["last"] + 1, acc).otherwise(
            F.struct(
                F.concat(acc["k"], F.array(i)).alias("k"), i.alias("last")
            )
        ),
        lambda acc: acc["k"],
    )
    rebuilt = F.filter(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.when(F.array_contains(kept, i), F.lit(merged))
            .when(F.array_contains(kept, i - 1), F.lit(None))
            .otherwise(F.get(s, i)),
        ),
        lambda x: x.isNotNull(),
    )
    # guard BEFORE building sequence(0, n-1): Spark sequences count DOWN
    # when stop < start, so an empty array must short-circuit
    return F.when(n >= 2, rebuilt).otherwise(s)


def _adjacent_pairs(s: Column) -> Column:
    """``array<struct<l,r>>`` of adjacent symbol pairs (empty when the
    word is a single symbol — guarded against Spark's descending
    ``sequence``)."""
    n = F.size(s)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                F.get(s, i).alias("l"), F.get(s, i + 1).alias("r")
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<l:string,r:string>>")
    )


def bpe_train_spark(
    wc: DataFrame, n_merges: int
) -> DataFrame:
    """Fully-distributed BPE training over a word-count table
    ``(word, wc)``: per merge, ONE (pair -> summed count) hash aggregate
    and a 1-row argmax collect, then a native map-only rewrite of the
    symbol column. The word table is eagerly localCheckpoint-ed each
    step: :func:`merge_pair_col` references its input ~8 times, so
    nesting rewrites multiplies the expression tree 8x per merge —
    truncating to a materialized RDD keeps each step's analysis O(1).

    Use when the distinct-word table exceeds driver memory; otherwise
    :func:`bpe_train` (same result, test-pinned) costs no jobs per merge.
    """
    spark = wc.sparkSession
    w = wc.select("word", "wc", _sym_split(F.col("word")).alias("s"))
    rows = []
    for rank in range(n_merges):
        top = (
            w.select(F.col("wc"), F.explode(_adjacent_pairs(F.col("s"))).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.desc("c"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0].l, top[0].r, int(top[0].c)
        rows.append((rank, l, r, l + r, c))
        w = w.select(
            "word", "wc", merge_pair_col(F.col("s"), l, r).alias("s")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(rows, MERGES_SCHEMA)


def _merge_word(sym: list[str], left: str, right: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == left and sym[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def train_dict(
    counts: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """In-memory BPE merge loop over ``(word, count)`` pairs with
    incremental pair-count maintenance: each merge touches only the
    words that contain the chosen pair (indexed), not the whole
    dictionary. Pure Python, deterministic; shared by
    :func:`bpe_train` and unit tests."""
    words: list[list[str]] = []
    wcs: list[int] = []
    pair_counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for word, c in counts:
        idx = len(words)
        sym = list(word)
        words.append(sym)
        wcs.append(int(c))
        for p in zip(sym, sym[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + int(c)
            index.setdefault(p, set()).add(idx)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), c = best
        merges.append((rank, l, r, l + r, c))
        for idx in sorted(index.get((l, r), ())):
            sym = words[idx]
            wc = wcs[idx]
            old = list(zip(sym, sym[1:]))
            new_sym = _merge_word(sym, l, r)
            new = list(zip(new_sym, new_sym[1:]))
            for p in old:
                pair_counts[p] -= wc
                if pair_counts[p] <= 0:
                    del pair_counts[p]
            new_set = set(new)
            for p in set(old) - new_set:
                index.get(p, set()).discard(idx)
            for p in new:
                pair_counts[p] = pair_counts.get(p, 0) + wc
                index.setdefault(p, set()).add(idx)
            words[idx] = new_sym
        index.pop((l, r), None)
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    max_words: int | None = 1_000_000,
    word_counts_df: DataFrame | None = None,
) -> DataFrame:
    """Learn a BPE merge table: one corpus-scale word-count aggregate,
    then the in-memory merge loop over the collected dictionary.

    ``max_words`` caps driver memory by keeping the top slice by
    ``(wc desc, word asc)`` — deterministic, and the dropped tail is
    the words whose counts steer no merge decision at real vocabulary
    skew (the standard trainer approximation; pass ``None`` to keep
    every word, which is exact and equality-pinned to
    :func:`bpe_train_spark`).

    Returns ``(merge_rank, left_sym, right_sym, merged, pair_count)``.
    """
    spark = df.sparkSession
    wc = word_counts_df if word_counts_df is not None \
        else word_counts(df, text_col=text_col)
    if max_words is not None:
        wc = wc.orderBy(F.desc("wc"), "word").limit(max_words)
    collected = [(row.word, row.wc) for row in wc.collect()]
    collected.sort(key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        train_dict(collected, n_merges), MERGES_SCHEMA
    )


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word: repeatedly apply the lowest-ranked merge whose
    pair is present (greedy left-to-right per application) — equivalent
    to replaying the merges in rank order (see module docstring), at
    O(occurrences) instead of O(|merge table|) per word."""
    sym = list(word)
    while len(sym) >= 2:
        best_rank: int | None = None
        best_pair: tuple[str, str] | None = None
        for p in zip(sym, sym[1:]):
            rk = ranks.get(p)
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_pair = rk, p
        if best_pair is None:
            break
        sym = _merge_word(sym, best_pair[0], best_pair[1])
    return sym


def bpe_encode(
    df: DataFrame,
    merges: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment every document with a learned merge table.

    Plan: distinct words (hash aggregate), Arrow-batched ``mapInPandas``
    encode of each word ONCE (the merge table broadcasts to workers as a
    plain rank dict — it is vocabulary-sized by construction), equi-join
    the pieces back to the exploded corpus on the word key, re-assemble
    per document in token order. Documents never carry through the
    Python stage and the join shuffles (word, pieces) rows, not text.

    Output: ``(id_col, pieces array<string>, n_pieces)``.
    """
    rank_list = [
        (r.left_sym, r.right_sym, int(r.merge_rank))
        for r in merges.select("left_sym", "right_sym", "merge_rank").collect()
    ]
    ranks = {(l, r): k for l, r, k in rank_list}

    def _encode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["pieces"] = [encode_word(w, ranks) for w in pdf["word"]]
            yield pdf[["word", "pieces"]]

    wdf = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    encoded = wdf.mapInPandas(_encode, "word string, pieces array<string>")
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "word"),
    ).filter(F.col("word") != "")
    return (
        tok.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces"),
        )
        .select(
            id_col, "pieces", F.size("pieces").cast("long").alias("n_pieces")
        )
    )


def encode_native(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """JVM-native encode for SMALL merge tables: chains one
    :func:`merge_pair_col` rewrite per merge in rank order over the
    distinct-word table — whole-stage codegen end to end, no Python.
    Each merge is its own PROJECTION (not a nested expression): the
    rewrite references its input ~8 times, so inlining would grow the
    tree 8x per merge, while chained projects stay linear (Catalyst's
    CollapseProject declines to inline non-cheap multiply-referenced
    aliases). Use :func:`bpe_encode` beyond a few dozen merges."""
    encoded = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .distinct()
        .select("word", _sym_split(F.col("word")).alias("pieces"))
    )
    for l, r in merges:
        encoded = encoded.select(
            "word", merge_pair_col(F.col("pieces"), l, r).alias("pieces")
        )
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "word"),
    ).filter(F.col("word") != "")
    return (
        tok.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces"),
        )
        .select(
            id_col, "pieces", F.size("pieces").cast("long").alias("n_pieces")
        )
    )
