"""BPE tokenizer training/encoding: the four implementations (driver
dict, Spark loop, pandas encode, native encode) agree with each other
and with the documented greedy/tiebreak semantics; the rank-priority
encode is property-pinned to sequential merge replay."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nexus_processor_spark.operators import bpe

CORPUS = [
    (0, "low low lower aaaa newest"),
    (1, "widest newest aaaa aa"),
    (2, "low newest west wide"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_merge_word_greedy_overlap():
    assert bpe._merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe._merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe._merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert bpe._merge_word(list("x"), "a", "b") == ["x"]
    assert bpe._merge_word([], "a", "b") == []


def test_merge_pair_col_matches_python(spark):
    words = ["aaaa", "aaa", "abab", "banana", "x", "aa"]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r.word: r.s
        for r in df.select(
            "word",
            bpe.merge_pair_col(F.split("word", ""), "a", "a").alias("s"),
        ).collect()
    }
    for w in words:
        assert got[w] == bpe._merge_word(list(w), "a", "a"), w


def test_train_spark_equals_driver(spark):
    df = _df(spark)
    via_spark = [
        tuple(r) for r in bpe.bpe_train_spark(bpe.word_counts(df), 5).collect()
    ]
    via_driver = [
        tuple(r) for r in bpe.bpe_train(df, 5, max_words=None).collect()
    ]
    assert via_spark == via_driver
    assert len(via_driver) == 5
    ranks = [m[0] for m in via_driver]
    assert ranks == [0, 1, 2, 3, 4]
    # counts are non-increasing only per tie-class, but every chosen
    # pair must have been the argmax at its step: spot-pin step 0
    assert via_driver[0][4] >= via_driver[1][4]


def test_train_exhausts_when_no_pairs_left(spark):
    df = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    merges = bpe.bpe_train(df, 10, max_words=None).collect()
    # "ab" collapses in one merge; nothing is left to pair afterwards
    assert [(m.left_sym, m.right_sym) for m in merges] == [("a", "b")]


def test_encode_pandas_equals_native(spark):
    df = _df(spark)
    merges = bpe.bpe_train(df, 5, max_words=None)
    pairs = [
        (r.left_sym, r.right_sym) for r in merges.orderBy("merge_rank").collect()
    ]
    a = sorted(tuple(r) for r in bpe.bpe_encode(df, merges).collect())
    b = sorted(tuple(r) for r in bpe.encode_native(df, pairs).collect())
    assert a == b
    assert len(a) == len(CORPUS)
    # segmentation is a partition of each doc's characters
    by_id = {r[0]: r for r in a}
    for doc_id, text in CORPUS:
        pieces = by_id[doc_id][1]
        assert "".join(pieces) == text.replace(" ", "")
        assert by_id[doc_id][2] == len(pieces)


def test_encode_skips_empty_tokens(spark):
    df = spark.createDataFrame(
        [(0, "  ab  ab "), (1, "ab")], "doc_id long, text string"
    )
    merges = bpe.bpe_train(df, 1, max_words=None)
    got = {r.doc_id: r.pieces for r in bpe.bpe_encode(df, merges).collect()}
    assert got == {0: ["ab", "ab"], 1: ["ab"]}


def test_max_words_cap_is_deterministic(spark):
    df = _df(spark)
    full = [tuple(r) for r in bpe.bpe_train(df, 3, max_words=None).collect()]
    capped = [tuple(r) for r in bpe.bpe_train(df, 3, max_words=4).collect()]
    again = [tuple(r) for r in bpe.bpe_train(df, 3, max_words=4).collect()]
    assert capped == again
    # the cap changes counts but never the schema/rank structure
    assert [m[0] for m in capped] == [m[0] for m in full] == [0, 1, 2]


@settings(max_examples=200, deadline=None)
@given(
    word=st.text(alphabet="ab c", min_size=0, max_size=14),
    seed=st.integers(0, 10_000),
)
def test_priority_encode_equals_sequential_replay(word, seed):
    """encode_word's lowest-rank-first loop must equal applying the
    merges one by one in rank order — for merge tables actually
    learnable from a corpus (the equivalence argument relies on that:
    later merges only create adjacencies involving their own symbol)."""
    import random

    rng = random.Random(seed)
    corpus_words = [
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 8)))
        for _ in range(12)
    ]
    counts = [(w, rng.randint(1, 5)) for w in sorted(set(corpus_words))]
    merges = bpe.train_dict(counts, n_merges=6)
    ranks = {(l, r): k for k, l, r, _, _ in merges}

    target = [w for w in word.split(" ") if w]
    for w in target:
        seq = list(w)
        for _, l, r, _, _ in merges:
            seq = bpe._merge_word(seq, l, r)
        assert bpe.encode_word(w, ranks) == seq, (w, merges)
