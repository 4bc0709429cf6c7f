"""Dedup operator queries over the ``documents`` table, with DuckDB twins.

The md5-hex hash domain (functions.text) makes every signature —
minhash bands, simhash bits, fingerprints — reproducible in ANSI-ish SQL,
so the whole near-dup pipeline is oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nexus_processor_spark.operators import dedup
from nexus_processor_spark.sources.tables import load_table

NUM_BANDS = 8
SHINGLE_WORDS = 3
SIMHASH_BITS = 16
HAMMING_MAX = 4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(_docs(spark, sf_dir))


def q_dedup_exact_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_docs(spark, sf_dir)).select("doc_id", "lang", "n_chars")


def q_dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = dedup.minhash_signatures(
        _docs(spark, sf_dir), num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS
    )
    return sigs.select("doc_id", F.col("band").cast("long").alias("band"), "sig")


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full LSH pipeline: candidates from band buckets, exact Jaccard out."""
    return dedup.minhash_dedup_pairs(
        _docs(spark, sf_dir),
        num_bands=NUM_BANDS,
        shingle_words=SHINGLE_WORDS,
        threshold=0.0,
    )


CURATE_MIN_CHARS = 20
CURATE_THRESHOLD = 0.5


def q_curate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming-curation batch kernel (streaming/curate.py,
    cold start): quality floor -> first-id-wins exact dedup -> banded
    MinHash candidates -> exact-Jaccard near-dup, every doc tagged with
    keep + first drop_reason. The oracle replays the identical gates in
    SQL (same md5 minhash chunks as dedup_minhash_pairs), so the
    streaming pipeline's per-batch decision logic is hash-checked, not
    just unit-tested."""
    from nexus_processor_spark.streaming import curate

    audit = curate.curate_batch(
        _docs(spark, sf_dir).select("doc_id", "text"), None,
        min_chars=CURATE_MIN_CHARS, near_dup_threshold=CURATE_THRESHOLD,
    )
    return audit.select("doc_id", "keep", "drop_reason")


def q_curate_state_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CROSS-BATCH curation semantics (streaming/curate.py): even
    doc_ids are curated cold, their survivors' hash-only state is built
    (content md5s, band signatures + owner refs, 16 minhash values),
    and odd doc_ids are curated AGAINST that state — exact dedup vs the
    kept md5 set, then band-collision candidates verified by
    estimated Jaccard (agreeing minhashes / 16) >= threshold. The
    oracle replays both batches and the verify in SQL, so the
    state-side drop decision — including the r4-advisor fix that a raw
    band collision alone must NOT drop — is hash-checked end to end."""
    from nexus_processor_spark.streaming import curate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    a1 = curate.curate_batch(
        b1, None,
        min_chars=CURATE_MIN_CHARS, near_dup_threshold=CURATE_THRESHOLD,
    )
    state = curate._survivor_state(
        a1.filter("keep"), text_col="text", id_col="doc_id"
    )
    a2 = curate.curate_batch(
        b2, state,
        min_chars=CURATE_MIN_CHARS, near_dup_threshold=CURATE_THRESHOLD,
    )
    return a2.select("doc_id", "keep", "drop_reason")


def q_curate_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-relative quantile quality gate (curate_batch
    ``quality_q`` — the streaming twin of ``pipeline.curate_corpus``'s
    quantile_filter): a cold batch gated on the exact interpolated
    25th-percentile of n_chars via the frequency-weighted histogram
    percentile. Oracle replays the threshold with DuckDB quantile_cont,
    pinning the cross-engine quantile semantics the accumulated
    streaming gate relies on."""
    from nexus_processor_spark.streaming import curate

    docs = _docs(spark, sf_dir).select("doc_id", "text", "n_chars")
    audit = curate.curate_batch(
        docs, None,
        min_chars=CURATE_MIN_CHARS, quality_q=CURATE_QUALITY_Q,
        near_dup_threshold=CURATE_THRESHOLD,
    )
    return audit.select("doc_id", "keep", "drop_reason")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_signatures(_docs(spark, sf_dir), bits=SIMHASH_BITS)


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs within Hamming <= 4 of the 16-bit simhash, via banded
    candidate generation (pigeonhole over hamming_max+1 bit bands gives
    perfect recall) + exact Hamming verify. Same rows as an all-pairs scan,
    no cross join in the plan — pinned by tests/test_plans.py."""
    return dedup.simhash_dedup_pairs(
        _docs(spark, sf_dir), bits=SIMHASH_BITS, hamming_max=HAMMING_MAX
    )


WIDE_BITS = 60
WIDE_HAMMING_MAX = 3


def q_dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit simhash via the explode + hash-aggregate formulation
    (whole-stage-codegen conditional sums, map-side combine) — the wide
    signature that keeps collision rates meaningful at corpus scale."""
    return dedup.simhash_signatures_agg(_docs(spark, sf_dir), bits=WIDE_BITS)


def q_dedup_simhash_wide_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs within Hamming <= 3 of the 60-bit simhash: banded
    candidates (4 x 15-bit bands, pigeonhole recall) + exact popcount
    verify — same shape as the 16-bit path, stronger signature."""
    docs = _docs(spark, sf_dir)
    sigs = dedup.simhash_signatures_agg(docs, bits=WIDE_BITS)
    return dedup.simhash_dedup_pairs(
        docs, bits=WIDE_BITS, hamming_max=WIDE_HAMMING_MAX, signatures=sigs
    )


NGRAM_MAX_BLOCK = 4096


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact char-5-gram Jaccard over pairs blocked by (lang, source) —
    the no-LSH near-dup baseline. Blocks larger than ``NGRAM_MAX_BLOCK``
    are dropped before the self-join (same ``max_bucket`` guard as the LSH
    path), so the within-block n² is bounded at any corpus size: a
    quasi-global block at 100 TB is skipped, not exploded. LSH
    (dedup_minhash_pairs) is the unblocked-recall upgrade. Oracle is
    unchanged: every test-scale block is far below the cap."""
    from pyspark.sql import Window

    from nexus_processor_spark.functions.text import char_shingles
    from nexus_processor_spark.plans.layout import spread

    docs = spread(_docs(spark, sf_dir).select("doc_id", "lang", "source", "text"))
    w = Window.partitionBy("lang", "source")
    docs = (
        docs.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= NGRAM_MAX_BLOCK)
        .drop("_n")
    )
    grams = docs.select(
        "doc_id", "lang", "source", char_shingles(F.col("text"), 5).alias("g")
    )
    a = grams.select(F.col("doc_id").alias("id_a"), "lang", "source",
                     F.col("g").alias("g_a"))
    b = grams.select(F.col("doc_id").alias("id_b"), "lang", "source",
                     F.col("g").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size("g_a") + F.size("g_b") - inter
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


CONTAINMENT_THRESHOLD = 0.4


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment near-dup: C(A->B) = |A∩B| / |A| over the
    same blocked char-5-gram sets as dedup_ngram_jaccard — catches a
    short document embedded verbatim inside a longer one, which
    symmetric Jaccard scores near zero (|union| is dominated by the
    container). Directed pairs, both directions scored; empty gram sets
    (docs shorter than the gram) emit nothing. Same bounded-block
    guard, so the within-block pair space never explodes at scale."""
    from pyspark.sql import Window

    from nexus_processor_spark.functions.text import char_shingles
    from nexus_processor_spark.plans.layout import spread

    docs = spread(
        _docs(spark, sf_dir).select("doc_id", "lang", "source", "text")
    )
    w = Window.partitionBy("lang", "source")
    docs = (
        docs.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") <= NGRAM_MAX_BLOCK)
        .drop("_n")
    )
    grams = docs.select(
        "doc_id", "lang", "source", char_shingles(F.col("text"), 5).alias("g")
    )
    a = grams.select(F.col("doc_id").alias("id_a"), "lang", "source",
                     F.col("g").alias("g_a")).filter(F.size("g_a") > 0)
    b = grams.select(F.col("doc_id").alias("id_b"), "lang", "source",
                     F.col("g").alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    return (
        a.join(b, ["lang", "source"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a", "id_b",
            (inter.cast("double") / F.size("g_a").cast("double"))
            .alias("containment"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


PREFIX_THRESHOLD = 0.5


def q_dedup_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup join (Jaccard >= 0.5 over word-3-shingle sets) via
    prefix filtering — full recall without LSH's probabilistic miss rate,
    candidates only from rarest-shingle bucket collisions. The DuckDB twin
    is the brute-force all-pairs Jaccard, so the hash match proves the
    filter lost nothing."""
    return dedup.prefix_filter_pairs(
        _docs(spark, sf_dir),
        threshold=PREFIX_THRESHOLD,
        shingle_words=SHINGLE_WORDS,
    )


def q_dedup_incremental_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly-ingest near-dup gate: docs with doc_id % 10 == 0 play the
    incoming batch, the rest the persisted corpus index. Matches come
    from band-key hits against the index; Jaccard is estimated from
    minhash agreement alone — no stored text is re-read."""
    docs = _docs(spark, sf_dir)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    idx = dedup.build_minhash_index(
        docs.filter(F.col("doc_id") % 10 != 0),
        num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS,
    )
    return dedup.incremental_near_dup(
        new, idx, num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS,
        threshold=0.5,
    )


def q_dedup_near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dedup pipeline: LSH pairs -> connected components -> one
    survivor per cluster. Spark side is iterative (driver-looped label
    propagation); the DuckDB oracle closes the same components with a
    recursive transitive-closure CTE (exact at test scale), so even the
    iterative operator gets a full hash check."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(
        docs, num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS, threshold=0.5
    )
    return dedup.near_dedup(docs, pairs).select("doc_id", "lang", "n_chars")


def q_dup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health histogram of duplicate-cluster sizes: LSH pairs ->
    connected components -> per-cluster size -> (cluster_size,
    n_clusters, n_docs), with a singleton row (size 1) for every doc
    that joined no cluster. The metric a curation run publishes to show
    HOW duplicated a crawl is, not just how many rows dedup removed.

    The singleton count is total docs minus clustered docs, computed as
    one +1/-1 union aggregate — no driver collect, no 1-row crossJoin."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(
        docs, num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS, threshold=0.5
    )
    labels = dedup.dup_clusters(pairs)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )
    n_single = (
        docs.select(F.lit(1).alias("_w"))
        .unionByName(labels.select(F.lit(-1).alias("_w")))
        .agg(F.sum("_w").cast("long").alias("_n"))
    )
    singles = n_single.select(
        F.lit(1).cast("long").alias("cluster_size"),
        F.col("_n").alias("n_clusters"),
        F.col("_n").alias("n_docs"),
    )
    return hist.unionByName(singles)


def q_dedup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-copy survivor per duplicate cluster: LSH pairs -> connected
    components -> per-cluster argmax on n_chars (longest copy wins, id
    tiebreak), singletons representing themselves — the production
    survivor rule, vs near_dedup's keep-lowest-id."""
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(
        docs, num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS, threshold=0.5
    )
    return dedup.cluster_representatives(docs, dedup.dup_clusters(pairs))


_LEAK_SPLIT_WEIGHTS = {"train": 0.8, "valid": 0.1, "test": 0.1}


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/valid/test split: hash-split on the dup
    CLUSTER representative, not the doc id, so near-duplicate documents
    can never straddle a split boundary (the classic eval-leakage bug —
    a test doc whose near-twin sits in train). Singletons split on
    their own id; the per-key hash rule is identical to split_assign."""
    from nexus_processor_spark.operators import pipeline

    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_dedup_pairs(
        docs, num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS, threshold=0.5
    )
    labels = dedup.dup_clusters(pairs).withColumnRenamed("id", "doc_id")
    rep = docs.select("doc_id").join(labels, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_key"),
    )
    return pipeline.hash_split(
        rep, _LEAK_SPLIT_WEIGHTS, key_col="cluster_key"
    )


QUERIES = {
    "dedup_incremental_near": q_dedup_incremental_near,
    "dup_cluster_stats": q_dup_cluster_stats,
    "dedup_cluster_reps": q_dedup_cluster_reps,
    "dedup_containment": q_dedup_containment,
    "leakage_safe_split": q_leakage_safe_split,
    "dedup_prefix_pairs": q_dedup_prefix_pairs,
    "dedup_near_corpus": q_dedup_near_corpus,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_exact_groups": q_dedup_exact_groups,
    "dedup_exact_survivors": q_dedup_exact_survivors,
    "dedup_minhash_signatures": q_dedup_minhash_signatures,
    "dedup_minhash_pairs": q_dedup_minhash_pairs,
    "curate_audit": q_curate_audit,
    "curate_state_audit": q_curate_state_audit,
    "curate_quality_audit": q_curate_quality_audit,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "dedup_simhash_wide": q_dedup_simhash_wide,
    "dedup_simhash_wide_pairs": q_dedup_simhash_wide_pairs,
}

# --- oracle SQL -------------------------------------------------------------

# Distinct word 3-gram shingles of each doc (empty when < 3 tokens).
_SHINGLES = """
    SELECT doc_id,
           list_distinct(
             list_transform(
               generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
               i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
             )
           ) AS sh
    FROM documents
"""

# (doc_id, band, sig) minhash signatures, bands 0..7, r=1. Chunk scheme
# mirrors functions.text.chunk_min: salt = chunk//4, 8-hex slice = chunk%4.
_SIGS = f"""
    SELECT s.doc_id, b.band,
           list_aggregate(
             list_transform(s.sh,
               x -> substr(md5(CAST(b.band // 4 AS VARCHAR) || '|' || x),
                           1 + 8 * (b.band % 4), 8)),
             'min'
           ) AS sig
    FROM ({_SHINGLES}) s, (SELECT unnest(range({NUM_BANDS})) AS band) b
    WHERE len(s.sh) > 0
"""


def _chunk_sql(j: str) -> str:
    return (
        "list_aggregate(list_transform(s.sh, "
        f"x -> substr(md5(CAST(({j}) // 4 AS VARCHAR) || '|' || x), "
        f"1 + 8 * (({j}) % 4), 8)), 'min')"
    )


# r=2 banded signatures used by the LSH pipeline (dedup.minhash_dedup_pairs):
# band b concatenates minhashes 2b and 2b+1.
_SIGS_R2 = f"""
    SELECT s.doc_id, b.band,
           {_chunk_sql('2 * b.band')} || {_chunk_sql('2 * b.band + 1')} AS sig
    FROM ({_SHINGLES}) s, (SELECT unnest(range({NUM_BANDS})) AS band) b
    WHERE len(s.sh) > 0
"""


def _simhash_sql(bits: int = SIMHASH_BITS) -> str:
    """Mirror functions.text.simhash: hex-digit math on md5(token).
    Generalizes to any width <= 60 (the value stays in signed BIGINT)."""
    hexv = "0123456789abcdef"
    hexdigits = (bits + 3) // 4
    h = lambda k: f"(strpos('{hexv}', substr(md5(t), {k}, 1)) - 1)"
    d = "(" + " + ".join(
        f"{16 ** (hexdigits - k)}*{h(k)}" for k in range(1, hexdigits + 1)
    ) + ")"
    ds = f"list_transform(list_distinct(string_split(text, ' ')), t -> {d})"
    votes = [
        f"CASE WHEN list_sum(list_transform(ds, d -> CASE WHEN ((d >> {j}) & 1) = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END"
        for j in range(bits)
    ]
    return f"""
        SELECT doc_id, CAST({' + '.join(votes)} AS BIGINT) AS simhash
        FROM (SELECT doc_id, {ds} AS ds FROM documents
              WHERE text IS NOT NULL)
    """


_SIMHASH = _simhash_sql()
_SIMHASH_WIDE = _simhash_sql(WIDE_BITS)

# Per-doc minhash j = 0..15 (salt j//4, 8-hex slice j%4 — the chunk_min
# scheme), for the incremental-index oracle.
_MINS_16 = f"""
    SELECT s.doc_id, j.j,
           list_aggregate(
             list_transform(s.sh,
               x -> substr(md5(CAST(j.j // 4 AS VARCHAR) || '|' || x),
                           1 + 8 * (j.j % 4), 8)),
             'min'
           ) AS m
    FROM ({_SHINGLES}) s, (SELECT unnest(range(16)) AS j) j
    WHERE len(s.sh) > 0
"""

ORACLE = {
    "dedup_incremental_near": f"""
        WITH m AS ({_MINS_16}),
        bands AS (
            SELECT doc_id, j // 2 AS band,
                   string_agg(m, '' ORDER BY j) AS sig
            FROM m GROUP BY doc_id, j // 2
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS indexed_id
            FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        )
        SELECT c.new_id, c.indexed_id,
               sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) / 16.0 AS est_jaccard
        FROM cand c
        JOIN m x ON x.doc_id = c.new_id
        JOIN m y ON y.doc_id = c.indexed_id AND x.j = y.j
        GROUP BY c.new_id, c.indexed_id
        HAVING sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) / 16.0 >= 0.5
    """,
    # Brute-force all-pairs Jaccard: the prefix filter on the Spark side
    # claims full recall, so the exhaustive twin must produce identical rows.
    "dedup_prefix_pairs": f"""
        WITH sh AS ({_SHINGLES})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                      AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(a.sh) > 0 AND len(b.sh) > 0
          AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
                     AS DOUBLE) >= {PREFIX_THRESHOLD}
    """,
    # Connected components via recursive transitive closure: every vertex
    # labels itself with the min id it can reach (undirected edges), which
    # is exactly the fixpoint dup_clusters' min-label propagation reaches.
    # O(n*m) closure rows — fine at oracle scale, which is the point of
    # keeping the scalable iterative form on the Spark side only.
    # transitive closure -> cluster representative -> the SAME md5
    # hash-range rule as split_assign, applied to the cluster key
    "leakage_safe_split": f"""
        WITH RECURSIVE
        sh AS ({_SHINGLES}),
        sig AS ({_SIGS_R2}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id < b.doc_id
        ),
        pairs AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sh x ON c.id_a = x.doc_id
            JOIN sh y ON c.id_b = y.doc_id
            WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / CAST(len(x.sh) + len(y.sh)
                         - len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= 0.5
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS id, least(min(b), a) AS cluster_id
            FROM reach GROUP BY a
        ),
        keyed AS (
            SELECT d.doc_id,
                   COALESCE(l.cluster_id, d.doc_id) AS cluster_key
            FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
        )
        SELECT doc_id, cluster_key, {{split_case}} AS split FROM keyed
    """,
    # same transitive closure as dedup_near_corpus, reduced to the
    # cluster-size histogram plus the singleton (size-1) remainder row
    "dup_cluster_stats": f"""
        WITH RECURSIVE
        sh AS ({_SHINGLES}),
        sig AS ({_SIGS_R2}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id < b.doc_id
        ),
        pairs AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sh x ON c.id_a = x.doc_id
            JOIN sh y ON c.id_b = y.doc_id
            WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / CAST(len(x.sh) + len(y.sh)
                         - len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= 0.5
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS id, least(min(b), a) AS cluster_id
            FROM reach GROUP BY a
        ),
        sizes AS (
            SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
            FROM labels GROUP BY 1
        ),
        hist AS (
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                   CAST(sum(cluster_size) AS BIGINT) AS n_docs
            FROM sizes GROUP BY 1
        )
        SELECT * FROM hist
        UNION ALL
        SELECT CAST(1 AS BIGINT),
               CAST((SELECT count(*) FROM documents)
                    - (SELECT count(*) FROM labels) AS BIGINT),
               CAST((SELECT count(*) FROM documents)
                    - (SELECT count(*) FROM labels) AS BIGINT)
    """,
    "dedup_near_corpus": f"""
        WITH RECURSIVE
        sh AS ({_SHINGLES}),
        sig AS ({_SIGS_R2}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id < b.doc_id
        ),
        pairs AS (
            SELECT c.id_a, c.id_b
            FROM cand c
            JOIN sh x ON c.id_a = x.doc_id
            JOIN sh y ON c.id_b = y.doc_id
            WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                  / CAST(len(x.sh) + len(y.sh)
                         - len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= 0.5
        ),
        edges AS (
            SELECT id_a AS a, id_b AS b FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (
            SELECT a AS id, least(min(b), a) AS cluster_id
            FROM reach GROUP BY a
        )
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        WHERE d.doc_id NOT IN
              (SELECT id FROM labels WHERE cluster_id <> id)
    """,
    "dedup_ngram_jaccard": """
        WITH g AS (
            SELECT doc_id, lang, source,
                   list_distinct(
                     list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                                    i -> substr(text, i, 5))
                   ) AS gr
            FROM documents
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
               / CAST(len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))
                      AS DOUBLE) AS jaccard
        FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source
        WHERE a.doc_id < b.doc_id
          AND CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
              / CAST(len(a.gr) + len(b.gr) - len(list_intersect(a.gr, b.gr))
                     AS DOUBLE) >= 0.2
    """,
    # null-text rows carry no content: no group membership, and they
    # all survive dedup (matching the Spark operators' semantics)
    "dedup_exact_groups": """
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_dups
        FROM documents WHERE text IS NOT NULL GROUP BY 1
    """,
    "dedup_exact_survivors": """
        WITH keep AS (SELECT min(doc_id) AS k FROM documents
                      WHERE text IS NOT NULL GROUP BY md5(text))
        SELECT d.doc_id, d.lang, d.n_chars
        FROM documents d
        WHERE d.doc_id IN (SELECT k FROM keep) OR d.text IS NULL
    """,
    "dedup_minhash_signatures": f"SELECT doc_id, band, sig FROM ({_SIGS})",
    "dedup_minhash_pairs": f"""
        WITH sh AS ({_SHINGLES}),
        sig AS ({_SIGS_R2}),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id < b.doc_id
        )
        SELECT c.id_a, c.id_b,
               CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               / CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
               AS jaccard
        FROM cand c
        JOIN sh x ON c.id_a = x.doc_id
        JOIN sh y ON c.id_b = y.doc_id
    """,
    "dedup_simhash": _SIMHASH,
    "dedup_simhash_wide": _SIMHASH_WIDE,
    "dedup_simhash_wide_pairs": f"""
        WITH s AS ({_SIMHASH_WIDE})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {WIDE_HAMMING_MAX}
    """,
    "dedup_simhash_pairs": f"""
        WITH s AS ({_SIMHASH})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_MAX}
    """,
}


def _leak_split_case() -> str:
    """The hash_split CASE over cluster_key — cumulative md5-prefix
    thresholds, identical arithmetic to pipeline_q's _split_case."""
    from nexus_processor_spark.operators.pipeline import hex_threshold

    labels = list(_LEAK_SPLIT_WEIGHTS)
    cum = 0.0
    whens = []
    for label in labels[:-1]:
        cum += _LEAK_SPLIT_WEIGHTS[label]
        whens.append(
            f"WHEN substr(md5(CAST(cluster_key AS VARCHAR)), 1, 8)"
            f" < '{hex_threshold(cum)}' THEN '{label}'"
        )
    return "CASE " + " ".join(whens) + f" ELSE '{labels[-1]}' END"


ORACLE["leakage_safe_split"] = ORACLE["leakage_safe_split"].replace(
    "{split_case}", _leak_split_case()
)


def _curate_cold_sql(q_cte: str) -> str:
    """Cold-batch curation replay (quality CTE pluggable): exact dedup
    (first id per md5) -> banded candidates -> exact-Jaccard near-dup,
    reasons in gate order."""
    return f"""
    WITH q AS ({q_cte}),
    ex AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) = 1 AS exact_ok
        FROM q WHERE q_ok
    ),
    ed AS (SELECT doc_id, text FROM ex WHERE exact_ok),
    sh AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   generate_series(1,
                     greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                 )
               ) AS sh
        FROM ed
    ),
    sig AS (
        SELECT s.doc_id, b.band,
               {_chunk_sql('2 * b.band')} || {_chunk_sql('2 * b.band + 1')}
                   AS sig
        FROM sh s, (SELECT unnest(range({NUM_BANDS})) AS band) b
        WHERE len(s.sh) > 0
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    dropped AS (
        SELECT DISTINCT c.id_b AS doc_id
        FROM cand c JOIN sh x ON c.id_a = x.doc_id
                    JOIN sh y ON c.id_b = y.doc_id
        WHERE CASE WHEN len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh)) > 0
                   THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                        / CAST(len(x.sh) + len(y.sh)
                               - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                   ELSE 0.0 END >= {CURATE_THRESHOLD}
    )
    SELECT q.doc_id,
           q.q_ok AND coalesce(ex.exact_ok, FALSE)
               AND d.doc_id IS NULL AS keep,
           CASE WHEN NOT q.q_ok THEN 'low_quality'
                WHEN NOT coalesce(ex.exact_ok, FALSE) THEN 'exact_dup'
                WHEN d.doc_id IS NOT NULL THEN 'near_dup'
           END AS drop_reason
    FROM q
    LEFT JOIN ex ON q.doc_id = ex.doc_id
    LEFT JOIN dropped d ON q.doc_id = d.doc_id
"""


ORACLE["curate_audit"] = _curate_cold_sql(f"""
    SELECT doc_id, text,
           text IS NOT NULL AND length(text) >= {CURATE_MIN_CHARS} AS q_ok
    FROM documents
""")

CURATE_QUALITY_Q = 0.25

# Corpus-relative quantile gate: DuckDB's quantile_cont is the same
# interpolated percentile Spark's exact `percentile` computes; both
# sides round to 6 digits (quantile_filter's cut-stability rule).
ORACLE["curate_quality_audit"] = _curate_cold_sql(f"""
    SELECT doc_id, text,
           text IS NOT NULL AND length(text) >= {CURATE_MIN_CHARS}
           AND coalesce(
                 CAST(n_chars AS DOUBLE) >=
                 (SELECT round(quantile_cont(CAST(n_chars AS DOUBLE),
                                             {CURATE_QUALITY_Q}), 6)
                  FROM documents WHERE n_chars IS NOT NULL),
                 FALSE) AS q_ok
    FROM documents
""")


def _sh_from(src: str) -> str:
    """Distinct word-3-gram shingles of a (doc_id, text) CTE."""
    return f"""
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   generate_series(1,
                     greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                 )
               ) AS sh
        FROM {src}
    """


def _sig_r2_from(shsrc: str) -> str:
    """(doc_id, band, sig) r=2 banded signatures from a shingle CTE."""
    return f"""
        SELECT s.doc_id, b.band,
               {_chunk_sql('2 * b.band')} || {_chunk_sql('2 * b.band + 1')}
                   AS sig
        FROM {shsrc} s, (SELECT unnest(range({NUM_BANDS})) AS band) b
        WHERE len(s.sh) > 0
    """


def _mins16_from(shsrc: str) -> str:
    """(doc_id, j, m): the 16 per-doc minhash chunks from a shingle CTE."""
    return f"""
        SELECT s.doc_id, j.j,
               list_aggregate(
                 list_transform(s.sh,
                   x -> substr(md5(CAST(j.j // 4 AS VARCHAR) || '|' || x),
                               1 + 8 * (j.j % 4), 8)),
                 'min'
               ) AS m
        FROM {shsrc} s, (SELECT unnest(range(16)) AS j) j
        WHERE len(s.sh) > 0
    """


_JACCARD_XY = """
    CASE WHEN len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) > 0
         THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / CAST(len(x.sh) + len(y.sh)
                     - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
         ELSE 0.0 END
"""

ORACLE["curate_state_audit"] = f"""
    WITH
    q1 AS (
        SELECT doc_id, text,
               text IS NOT NULL AND length(text) >= {CURATE_MIN_CHARS}
                   AS q_ok
        FROM documents WHERE doc_id % 2 = 0
    ),
    ex1 AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) = 1 AS exact_ok
        FROM q1 WHERE q_ok
    ),
    ed1 AS (SELECT doc_id, text FROM ex1 WHERE exact_ok),
    sh1 AS ({_sh_from('ed1')}),
    sig1 AS ({_sig_r2_from('sh1')}),
    cand1 AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig1 a JOIN sig1 b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    drop1 AS (
        SELECT DISTINCT c.id_b AS doc_id
        FROM cand1 c JOIN sh1 x ON c.id_a = x.doc_id
                     JOIN sh1 y ON c.id_b = y.doc_id
        WHERE {_JACCARD_XY} >= {CURATE_THRESHOLD}
    ),
    keep1 AS (
        SELECT doc_id FROM ed1
        WHERE doc_id NOT IN (SELECT doc_id FROM drop1)
    ),
    smd5 AS (
        SELECT DISTINCT md5(d.text) AS m
        FROM ed1 d JOIN keep1 k ON d.doc_id = k.doc_id
    ),
    ssig AS (
        SELECT s.band, s.sig, md5(d.text) AS ref
        FROM sig1 s
        JOIN keep1 k ON s.doc_id = k.doc_id
        JOIN ed1 d ON s.doc_id = d.doc_id
    ),
    mins1 AS ({_mins16_from('sh1')}),
    smins AS (
        SELECT md5(d.text) AS ref, m.j, m.m
        FROM mins1 m
        JOIN keep1 k ON m.doc_id = k.doc_id
        JOIN ed1 d ON m.doc_id = d.doc_id
    ),
    q2 AS (
        SELECT doc_id, text,
               text IS NOT NULL AND length(text) >= {CURATE_MIN_CHARS}
                   AS q_ok
        FROM documents WHERE doc_id % 2 = 1
    ),
    ex2 AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) = 1
               AND md5(text) NOT IN (SELECT m FROM smd5) AS exact_ok
        FROM q2 WHERE q_ok
    ),
    ed2 AS (SELECT doc_id, text FROM ex2 WHERE exact_ok),
    sh2 AS ({_sh_from('ed2')}),
    sig2 AS ({_sig_r2_from('sh2')}),
    mins2 AS ({_mins16_from('sh2')}),
    cand2 AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig2 a JOIN sig2 b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    drop2b AS (
        SELECT DISTINCT c.id_b AS doc_id
        FROM cand2 c JOIN sh2 x ON c.id_a = x.doc_id
                     JOIN sh2 y ON c.id_b = y.doc_id
        WHERE {_JACCARD_XY} >= {CURATE_THRESHOLD}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id, s.ref
        FROM sig2 a JOIN ssig s ON a.band = s.band AND a.sig = s.sig
    ),
    est AS (
        SELECT c.doc_id, c.ref,
               sum(CASE WHEN x.m = y.m THEN 1 ELSE 0 END) / 16.0 AS e
        FROM cands c
        JOIN mins2 x ON x.doc_id = c.doc_id
        JOIN smins y ON y.ref = c.ref AND y.j = x.j
        GROUP BY c.doc_id, c.ref
    ),
    drops AS (
        SELECT DISTINCT doc_id FROM est WHERE e >= {CURATE_THRESHOLD}
    ),
    dropn AS (
        SELECT doc_id FROM drop2b UNION SELECT doc_id FROM drops
    )
    SELECT q2.doc_id,
           q2.q_ok AND coalesce(ex2.exact_ok, FALSE)
               AND dn.doc_id IS NULL AS keep,
           CASE WHEN NOT q2.q_ok THEN 'low_quality'
                WHEN NOT coalesce(ex2.exact_ok, FALSE) THEN 'exact_dup'
                WHEN dn.doc_id IS NOT NULL THEN 'near_dup'
           END AS drop_reason
    FROM q2
    LEFT JOIN ex2 ON q2.doc_id = ex2.doc_id
    LEFT JOIN dropn dn ON q2.doc_id = dn.doc_id
"""


# same transitive closure as dup_cluster_stats, reduced to the per-cluster
# argmax representative (n_chars DESC, doc_id tiebreak) with singletons
# representing themselves
ORACLE["dedup_cluster_reps"] = f"""
    WITH RECURSIVE
    sh AS ({_SHINGLES}),
    sig AS ({_SIGS_R2}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN sh x ON c.id_a = x.doc_id
        JOIN sh y ON c.id_b = y.doc_id
        WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
              / CAST(len(x.sh) + len(y.sh)
                     - len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= 0.5
    ),
    edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    labels AS (
        SELECT a AS id, least(min(b), a) AS cluster_id
        FROM reach GROUP BY a
    ),
    keyed AS (
        SELECT d.doc_id, d.n_chars,
               COALESCE(l.cluster_id, d.doc_id) AS cluster_key
        FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
    )
    SELECT cluster_key, doc_id AS rep_id,
           CAST(n AS BIGINT) AS n_members, n_chars AS rep_n_chars
    FROM (
        SELECT *, row_number() OVER (PARTITION BY cluster_key
                                     ORDER BY n_chars DESC, doc_id) AS rn,
               count(*) OVER (PARTITION BY cluster_key) AS n
        FROM keyed
    ) WHERE rn = 1
"""


# directed containment over the same distinct char-5-gram sets; empty
# gram sets (len 0) excluded on the contained side exactly as Spark does
ORACLE["dedup_containment"] = f"""
    WITH g AS (
        SELECT doc_id, lang, source,
               list_distinct(
                 list_transform(generate_series(1, greatest(length(text) - 4, 0)),
                                i -> substr(text, i, 5))
               ) AS gr
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
           / CAST(len(a.gr) AS DOUBLE) AS containment
    FROM g a JOIN g b ON a.lang = b.lang AND a.source = b.source
    WHERE a.doc_id <> b.doc_id AND len(a.gr) > 0
      AND CAST(len(list_intersect(a.gr, b.gr)) AS DOUBLE)
          / CAST(len(a.gr) AS DOUBLE) >= {CONTAINMENT_THRESHOLD}
"""


NEARDUP_EVAL_T = 0.5


def q_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-aware downweighting: exact copies share mass 1/n."""
    return dedup.soft_dedup_weights(_docs(spark, sf_dir))


def q_neardup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of banded LSH vs the exact J>=0.5 pair set."""
    return dedup.neardup_eval(
        _docs(spark, sf_dir), threshold=NEARDUP_EVAL_T,
        num_bands=NUM_BANDS, shingle_words=SHINGLE_WORDS,
    )


QUERIES["soft_dedup_weights"] = q_soft_dedup_weights
QUERIES["neardup_eval"] = q_neardup_eval

ORACLE["soft_dedup_weights"] = """
    SELECT doc_id, CAST(round(1000000.0 / n, 0) AS BIGINT) AS weight_e6
    FROM (
        SELECT doc_id,
               count(*) OVER (PARTITION BY coalesce(
                   md5(text), 'null:' || CAST(doc_id AS VARCHAR))) AS n
        FROM documents
    )
"""

_J_SQL = ("CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / "
          "CAST(len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh))"
          " AS DOUBLE)")
ORACLE["neardup_eval"] = f"""
    WITH sh AS ({_SHINGLES}),
    sig AS ({_SIGS_R2}),
    pred AS (
        SELECT c.id_a, c.id_b FROM (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
            WHERE a.doc_id < b.doc_id
        ) c
        JOIN sh x ON c.id_a = x.doc_id
        JOIN sh y ON c.id_b = y.doc_id
        WHERE {_J_SQL} >= {NEARDUP_EVAL_T}
    ),
    g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
    tc AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM g a JOIN g b ON a.gram = b.gram WHERE a.doc_id < b.doc_id
    ),
    truth AS (
        SELECT c.id_a, c.id_b FROM tc c
        JOIN sh x ON c.id_a = x.doc_id
        JOIN sh y ON c.id_b = y.doc_id
        WHERE {_J_SQL} >= {NEARDUP_EVAL_T}
    ),
    m AS (SELECT
        (SELECT count(*) FROM pred) AS n_pred,
        (SELECT count(*) FROM truth) AS n_true,
        (SELECT count(*) FROM pred JOIN truth USING (id_a, id_b)) AS n_hit)
    SELECT CAST(n_pred AS BIGINT) AS n_pred,
           CAST(n_true AS BIGINT) AS n_true,
           CAST(n_hit AS BIGINT) AS n_hit,
           CASE WHEN n_pred > 0 THEN
               CAST(round(1000000.0 * n_hit / n_pred, 0) AS BIGINT) END
               AS precision_e6,
           CASE WHEN n_true > 0 THEN
               CAST(round(1000000.0 * n_hit / n_true, 0) AS BIGINT) END
               AS recall_e6
    FROM m
"""


# --- curate_semantic_audit: the embedding near-dup gate, replayed ----------

SEM_AUDIT_T = 0.4           # quantized-cosine threshold (t2 = 160000/1e6)
SEM_AUDIT_T2_NUM = 160000   # round(0.4^2 * 1e6) — exact
SEM_AUDIT_BANDS = 16
SEM_AUDIT_PLANES = 4
SEM_AUDIT_DIM = 64


def q_curate_semantic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-dedup gate (curate_batch ``semantic_threshold``,
    cold batch): docs carry the ``embeddings`` table's vector (doc_id =
    vec_id), bucket into 16 bands x 4 integer md5-hyperplanes over the
    int8-quantized code, and every bucket collision is verified with
    the exact integer predicate dot^2*10^6 >= 160000*na*nb. The oracle
    replays the full gate order (quality -> exact -> lexical near-dup
    -> semantic) including the weights' hex-char derivation — zero
    float anywhere in the semantic stage."""
    from nexus_processor_spark.streaming import curate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    audit = curate.curate_batch(
        docs.join(emb, "doc_id", "left"), None,
        min_chars=CURATE_MIN_CHARS, near_dup_threshold=CURATE_THRESHOLD,
        embedding_col="embedding", semantic_threshold=SEM_AUDIT_T,
        semantic_bands=SEM_AUDIT_BANDS, semantic_planes=SEM_AUDIT_PLANES,
        semantic_dim=SEM_AUDIT_DIM,
    )
    return audit.select("doc_id", "keep", "drop_reason")


QUERIES["curate_semantic_audit"] = q_curate_semantic_audit

_HEXVAL = "(strpos('0123456789abcdef', substr(h, {k}, 1)) - 1)"

def _sem_audit_oracle(probes: int) -> str:
    """The semantic-audit oracle SQL, parameterized on the multiprobe
    count: ``probes`` = 0 is the base gate; ``probes`` > 0 expands the
    QUERY side of the bucket join with per-band flips of the lowest-
    |dot| planes (ties to the lower plane — row_number ORDER BY
    (abs(dot), p), the exact stable-argsort rule of
    ``curate._sem_tables``), XORed onto the base bucket. The stored
    side stays base buckets, matching the gate's asymmetric probing."""
    if probes:
        scand = f"""
    ranked AS (
        SELECT doc_id, b, p,
               row_number() OVER (PARTITION BY doc_id, b
                                  ORDER BY abs(dot), p) AS rnk
        FROM dots
    ),
    probekeys AS (
        SELECT doc_id, b, bucket FROM bkt
        UNION ALL
        SELECT r.doc_id, r.b,
               xor(k.bucket, (1::BIGINT << CAST(r.p AS INT)))
        FROM ranked r JOIN bkt k ON r.doc_id = k.doc_id AND r.b = k.b
        WHERE r.rnk <= {probes}
    ),
    scand AS (
        SELECT DISTINCT least(a.doc_id, b.doc_id) AS ia,
                        greatest(a.doc_id, b.doc_id) AS ib
        FROM probekeys a JOIN bkt b ON a.b = b.b AND a.bucket = b.bucket
        WHERE a.doc_id <> b.doc_id
    ),"""
    else:
        scand = """
    scand AS (
        SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
        FROM bkt a JOIN bkt b ON a.b = b.b AND a.bucket = b.bucket
        WHERE a.doc_id < b.doc_id
    ),"""
    return f"""
    WITH q AS (
        SELECT doc_id, text,
               text IS NOT NULL AND length(text) >= {CURATE_MIN_CHARS}
                   AS q_ok
        FROM documents
    ),
    ex AS (
        SELECT doc_id, text,
               row_number() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) = 1 AS exact_ok
        FROM q WHERE q_ok
    ),
    ed AS (SELECT doc_id, text FROM ex WHERE exact_ok),
    sh AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(
                   generate_series(1,
                     greatest(len(string_split(text, ' ')) - 2, 0)),
                   i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')
                 )
               ) AS sh
        FROM ed
    ),
    sig AS (
        SELECT s.doc_id, b.band,
               {_chunk_sql('2 * b.band')} || {_chunk_sql('2 * b.band + 1')}
                   AS sig
        FROM sh s, (SELECT unnest(range({NUM_BANDS})) AS band) b
        WHERE len(s.sh) > 0
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sig a JOIN sig b ON a.band = b.band AND a.sig = b.sig
        WHERE a.doc_id < b.doc_id
    ),
    dropped AS (
        SELECT DISTINCT c.id_b AS doc_id
        FROM cand c JOIN sh x ON c.id_a = x.doc_id
                    JOIN sh y ON c.id_b = y.doc_id
        WHERE CASE WHEN len(x.sh) + len(y.sh)
                        - len(list_intersect(x.sh, y.sh)) > 0
                   THEN CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                        / CAST(len(x.sh) + len(y.sh)
                               - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                   ELSE 0.0 END >= {CURATE_THRESHOLD}
    ),
    -- semantic stage: int8 codes of exact survivors' embeddings
    z AS (
        SELECT e.doc_id,
               list_max(list_transform(em.embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS s,
               em.embedding
        FROM ed e JOIN embeddings em ON em.vec_id = e.doc_id
        WHERE len(em.embedding) = {SEM_AUDIT_DIM}
    ),
    qz AS (
        SELECT doc_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) / s * 127)
                             AS BIGINT)) AS q
        FROM z WHERE s > 0
    ),
    qn AS (
        SELECT doc_id, q,
               CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT)
                   AS na
        FROM qz
    ),
    -- integer hyperplane weights: w = int(md5('vsem|b|p|j')[:4], 16)
    -- - 32768 (same hex-char arithmetic as curate._sem_weights)
    w AS (
        SELECT b, p, j,
               {_HEXVAL.format(k=1)} * 4096 + {_HEXVAL.format(k=2)} * 256
               + {_HEXVAL.format(k=3)} * 16 + {_HEXVAL.format(k=4)}
               - 32768 AS w
        FROM (
            SELECT b.range AS b, p.range AS p, j.range AS j,
                   md5('vsem|' || b.range || '|' || p.range || '|'
                       || j.range) AS h
            FROM range({SEM_AUDIT_BANDS}) b, range({SEM_AUDIT_PLANES}) p,
                 range({SEM_AUDIT_DIM}) j
        )
    ),
    dots AS (
        SELECT z.doc_id, w.b, w.p,
               SUM(z.q[CAST(w.j + 1 AS INT)] * w.w) AS dot
        FROM qn z JOIN w ON TRUE
        GROUP BY z.doc_id, w.b, w.p
    ),
    bkt AS (
        SELECT doc_id, b,
               SUM(CASE WHEN dot > 0
                        THEN (1::BIGINT << CAST(p AS INT)) ELSE 0 END)
                   AS bucket
        FROM dots GROUP BY doc_id, b
    ),
{scand}
    sver AS (
        SELECT c.ib,
               CAST(list_sum(list_transform(generate_series(1,
                   {SEM_AUDIT_DIM}), i -> x.q[i] * y.q[i])) AS BIGINT)
                   AS dot,
               x.na AS na, y.na AS nb
        FROM scand c JOIN qn x ON c.ia = x.doc_id
                     JOIN qn y ON c.ib = y.doc_id
    ),
    sdrop AS (
        SELECT DISTINCT ib AS doc_id FROM sver
        WHERE dot > 0
          AND dot * dot * 1000000 >= {SEM_AUDIT_T2_NUM} * na * nb
    )
    SELECT q.doc_id,
           q.q_ok AND coalesce(ex.exact_ok, FALSE)
               AND d.doc_id IS NULL AND sd.doc_id IS NULL AS keep,
           CASE WHEN NOT q.q_ok THEN 'low_quality'
                WHEN NOT coalesce(ex.exact_ok, FALSE) THEN 'exact_dup'
                WHEN d.doc_id IS NOT NULL THEN 'near_dup'
                WHEN sd.doc_id IS NOT NULL THEN 'semantic_dup'
           END AS drop_reason
    FROM q
    LEFT JOIN ex ON q.doc_id = ex.doc_id
    LEFT JOIN dropped d ON q.doc_id = d.doc_id
    LEFT JOIN sdrop sd ON q.doc_id = sd.doc_id
"""


def q_curate_semantic_multiprobe_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The semantic gate with LSH MULTIPROBE (semantic_probes=2): per
    band the two lowest-|dot| plane bits flip into extra query-side
    bucket keys, catching near-dup pairs whose signs disagree on one
    low-confidence plane. Same exact integer verify — multiprobe moves
    recall only. The oracle replays the flip selection with the
    identical (abs(dot), plane) stable ranking."""
    from nexus_processor_spark.streaming import curate

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    audit = curate.curate_batch(
        docs.join(emb, "doc_id", "left"), None,
        min_chars=CURATE_MIN_CHARS, near_dup_threshold=CURATE_THRESHOLD,
        embedding_col="embedding", semantic_threshold=SEM_AUDIT_T,
        semantic_bands=SEM_AUDIT_BANDS, semantic_planes=SEM_AUDIT_PLANES,
        semantic_dim=SEM_AUDIT_DIM, semantic_probes=2,
    )
    return audit.select("doc_id", "keep", "drop_reason")


QUERIES["curate_semantic_multiprobe_audit"] = (
    q_curate_semantic_multiprobe_audit)
ORACLE["curate_semantic_audit"] = _sem_audit_oracle(0)
ORACLE["curate_semantic_multiprobe_audit"] = _sem_audit_oracle(2)
