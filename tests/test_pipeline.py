"""Corpus-pipeline operator tests: deterministic sampling/splits/shuffle,
repetition signals, PII scrubbing, tf-idf."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_processor_spark.operators import pipeline


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"doc {i} filler tokens", ["en", "de", "fr"][i % 3]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_hash_sample_deterministic_and_sized(docs):
    a = pipeline.hash_sample(docs, 0.2)
    b = pipeline.hash_sample(docs, 0.2)
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b  # same draw every run
    assert 30 <= len(ids_a) <= 90  # ~60 expected; loose binomial bounds
    # a bigger fraction strictly contains the smaller draw (nested samples)
    wider = sorted(r.doc_id for r in pipeline.hash_sample(docs, 0.5).collect())
    assert set(ids_a) <= set(wider)


def test_hash_sample_salt_changes_draw(docs):
    a = {r.doc_id for r in pipeline.hash_sample(docs, 0.3).collect()}
    b = {r.doc_id for r in pipeline.hash_sample(docs, 0.3, salt="v2").collect()}
    assert a != b


def test_stratified_rates_respected(docs):
    out = pipeline.stratified_sample(
        docs, {"en": 1.0, "de": 0.0}, default_rate=0.2
    ).groupBy("lang").count().collect()
    by_lang = {r.lang: r["count"] for r in out}
    assert by_lang.get("en") == 100  # rate 1.0 keeps every row
    assert "de" not in by_lang  # rate 0.0 keeps none
    assert 5 <= by_lang.get("fr", 0) <= 45  # default 0.2 of 100


def test_hash_split_total_and_disjoint(docs):
    out = pipeline.hash_split(docs, {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 300  # exhaustive
    assert counts["train"] > counts.get("valid", 0)
    # stability: the same doc never migrates between splits
    again = pipeline.hash_split(docs, {"train": 0.8, "valid": 0.1, "test": 0.1})
    assert sorted(map(tuple, out.select("doc_id", "split").collect())) == sorted(
        map(tuple, again.select("doc_id", "split").collect())
    )


def test_shuffle_shards_is_permutation(docs):
    out = pipeline.shuffle_shards(docs).collect()
    assert sorted(r.doc_id for r in out) == list(range(300))
    # ranks are dense 0..n-1 within each shard
    by_shard: dict[str, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_rank)
    for ranks in by_shard.values():
        assert sorted(ranks) == list(range(len(ranks)))
    # and the shuffle actually permutes (not identity order)
    first_shard = min(by_shard)
    sharded_ids = [r.doc_id for r in sorted(out, key=lambda r: (r.shard, r.shard_rank))]
    assert sharded_ids != list(range(300))


def test_shards_scale_with_input():
    """Auto-sized shard width keeps expected rows/shard <= target at any
    corpus size; never fewer than 16 shards, capped at 16^8."""
    t = 1_000_000
    assert pipeline.shards_for(1, target_rows_per_shard=t) == 1
    assert pipeline.shards_for(16 * t, target_rows_per_shard=t) == 1
    assert pipeline.shards_for(16 * t + 1, target_rows_per_shard=t) == 2
    assert pipeline.shards_for(256 * t, target_rows_per_shard=t) == 2
    # 100 TB-ish: 100B rows -> 16^5 = 1M shards -> ~100k rows/shard
    n = 100_000_000_000
    c = pipeline.shards_for(n, target_rows_per_shard=t)
    assert 16**c >= n / t and 16 ** (c - 1) < n / t
    assert pipeline.shards_for(10**30) == 8  # cap


def test_shuffle_shards_auto_width(docs):
    """300 rows with a 100-row target -> ceil(log16(3)) = 1 hex digit."""
    out = pipeline.shuffle_shards(docs, target_rows_per_shard=100).collect()
    assert {len(r.shard) for r in out} == {1}
    assert sorted(r.doc_id for r in out) == list(range(300))


def test_repetition_signals_flag_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),
            (2, "all tokens here are unique words"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pipeline.repetition_signals(df).collect()}
    assert rows[1].n_unique_tokens == 1
    assert rows[1].top_token_fraction == 1.0
    assert rows[1].type_token_ratio == pytest.approx(0.2)
    assert rows[2].type_token_ratio == 1.0
    assert rows[2].top_token_count == 1


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or visit https://x.io/a?b=1 now"),
            (2, "call 555-867-5309 twice: 555-867-5309"),
            (3, "clean text, nothing to scrub"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pipeline.scrub_pii(df).collect()}
    assert rows[1].scrubbed_text == "mail <EMAIL> or visit <URL> now"
    assert (rows[1].n_emails, rows[1].n_urls) == (1, 1)
    assert rows[2].scrubbed_text == "call <PHONE> twice: <PHONE>"
    assert rows[2].n_phones == 2
    assert rows[3].scrubbed_text == rows[3].scrubbed_text == "clean text, nothing to scrub"


def test_tfidf_prefers_rare_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "shared shared rareword"),
            (2, "shared shared shared"),
            (3, "shared other other"),
        ],
        "doc_id long, text string",
    )
    top = pipeline.tfidf_top_terms(df, 1).collect()
    best = {r.doc_id: r.term for r in top}
    # 'shared' appears in every doc -> idf ln(4/4)=0; rare terms win
    assert best[1] == "rareword"
    assert best[3] == "other"
    assert len(top) == 3  # k=1 per doc, ties included deterministically


def test_hex_threshold_edges():
    assert pipeline.hex_threshold(0.0) == "00000000"
    assert pipeline.hex_threshold(1.0) == "g"
    assert pipeline.hex_threshold(0.5) == "80000000"
    # every hex string sorts below the >=1.0 sentinel
    assert "ffffffff" < "g"


def test_quantize_int8_roundtrip(spark):
    """Dequantized int8 vectors approximate the original within one
    quantization step; unit vectors have norm 1."""
    import math

    from nexus_processor_spark.functions import vector

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    v = F.col("embedding")
    rows = {
        r.vec_id: r
        for r in df.select(
            "vec_id",
            vector.quant_scale(v).alias("scale"),
            vector.quantize_int8(v).alias("q8"),
            vector.l2_normalize(v).alias("unit"),
        ).collect()
    }
    r1 = rows[1]
    assert r1.scale == 1.0
    assert r1.q8 == [64, -127, 32]  # round(x/scale*127)
    for orig, q in zip([0.5, -1.0, 0.25], r1.q8):
        assert abs(q * r1.scale / 127 - orig) <= r1.scale / 127
    assert math.isclose(sum(u * u for u in r1.unit), 1.0, rel_tol=1e-4)
    # zero vector: no scale, no quantization, no unit projection
    assert rows[2].q8 is None and rows[2].unit is None


def test_decontaminate_flags_ngram_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox today"),  # shares 2 eval 3-grams
            (2, "completely unrelated words entirely here"),
            (3, "short doc"),  # < 3 tokens: no grams, never contaminated
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in pipeline.decontaminate(corpus, eval_df).collect()}
    assert rows[1].contaminated == 1 and rows[1].n_eval_grams == 2
    assert rows[2].contaminated == 0 and rows[2].n_eval_grams == 0
    assert rows[3].contaminated == 0
    assert len(rows) == 3  # audit table keeps every corpus row


def test_quantile_filter_drops_bottom_quarter(spark):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 101)], "doc_id long, n_chars long"
    )
    out = pipeline.quantile_filter(df, 0.25, exact=True).collect()
    # p25 of 10..1000 = 257.5 -> keep n_chars >= 257.5 (docs 26..100)
    assert len(out) == 75
    assert min(r.n_chars for r in out) == 260
    assert all(r.q_threshold == 257.5 for r in out)


def test_source_mix_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [(i, ["web", "web", "web", "books"][i % 4], 100 + i) for i in range(40)],
        "doc_id long, source string, n_chars long",
    )
    rows = sorted(pipeline.source_mix(df).collect(), key=lambda r: -r.n_docs)
    assert [r.source for r in rows] == ["web", "books"]
    assert rows[0].share == 0.75 and rows[1].share == 0.25
    assert rows[-1].cum_share == 1.0  # cumulative reaches the full corpus


def test_vocab_topk_orders_by_frequency(spark):
    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b z")], "doc_id long, text string"
    )
    rows = pipeline.vocab_topk(df, 2).collect()
    assert [(r.token, r.n_occurrences, r.n_docs) for r in rows] == [
        ("a", 4, 2),
        ("b", 3, 2),
    ]


def test_incremental_dedup_anti_joins_seen_hashes(spark):
    corpus = spark.createDataFrame(
        [(1, "already ingested"), (2, "also known")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "already ingested"),  # exact content repeat -> dropped
            (11, "genuinely new text"),
            (12, None),  # null text: can't be proven seen -> kept
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in pipeline.incremental_dedup(batch, corpus).collect()}
    assert kept == {11, 12}


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "same"),
            (2, "before"),
            (3, "gone"),
            (4, None),        # null text both sides -> unchanged
            (5, None),        # text appears -> changed
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "same"),
            (2, "after"),     # content changed
            (4, None),
            (5, "appeared"),
            (6, "brand new"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in pipeline.corpus_diff(old, new).collect()}
    assert got == {
        1: "unchanged", 2: "changed", 3: "removed",
        4: "unchanged", 5: "changed", 6: "added",
    }


def test_quantile_filter_approx_close_to_exact(spark):
    """The scale-path t-digest threshold lands on a real value near the
    exact cut (within a few percent of corpus rank)."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 101)], "doc_id long, n_chars long"
    )
    out = pipeline.quantile_filter(df, 0.25).collect()
    assert 70 <= len(out) <= 80  # exact keeps 75


def test_build_vocab_and_encode_tokens(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b zzz"), (3, "a")],
        "doc_id long, text string",
    )
    vocab = pipeline.build_vocab(docs, 2)  # head: a (5), b (2)
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert v == {"a": 1, "b": 2}

    enc = {r["doc_id"]: r for r in
           pipeline.encode_tokens(docs, vocab).collect()}
    assert enc[1]["input_ids"] == [1, 2, 1, 0]   # c -> OOV 0
    assert enc[1]["n_tokens"] == 4 and enc[1]["n_oov"] == 1
    assert enc[2]["input_ids"] == [1, 2, 0]
    assert enc[3]["input_ids"] == [1] and enc[3]["n_oov"] == 0


def test_encode_tokens_order_preserved_under_shuffle(spark):
    # a long doc: ids must come back in exact token order
    text = " ".join(str(i % 7) for i in range(200))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    vocab = pipeline.build_vocab(docs, 7)
    (row,) = pipeline.encode_tokens(docs, vocab).collect()
    v = {r["token"]: r["token_id"] for r in vocab.collect()}
    assert row["input_ids"] == [v[str(i % 7)] for i in range(200)]


def test_rrf_fuse_semantics(spark):
    # leg A ranks: d1=1, d2=2, d3=3; leg B ranks: d2=1, d4=2
    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(2, 0.9), (4, 0.7)], "doc_id long, score double"
    )
    got = {
        r.doc_id: (r.rank_a, r.rank_b, r.rrf)
        for r in pipeline.rrf_fuse(
            [("a", a), ("b", b)], top_m=10, k=60, n=10
        ).collect()
    }
    assert got[1] == (1, None, round(1 / 61, 9))
    assert got[2] == (2, 1, round(1 / 62 + 1 / 61, 9))
    assert got[3] == (3, None, round(1 / 63, 9))
    assert got[4] == (None, 2, round(1 / 62, 9))
    # top_m cuts a leg before ranking; ties break by id ascending
    t = spark.createDataFrame(
        [(7, 1.0), (5, 1.0), (6, 1.0)], "doc_id long, score double"
    )
    cut = {
        r.doc_id: r.rank_t
        for r in pipeline.rrf_fuse([("t", t)], top_m=2, n=10).collect()
    }
    assert cut == {5: 1, 6: 2}


def test_rrf_fuse_validation(spark):
    import pytest

    with pytest.raises(ValueError):
        pipeline.rrf_fuse([])
