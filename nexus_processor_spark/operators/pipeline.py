"""Corpus-pipeline operators: deterministic sampling / splits / shuffles,
repetition quality signals, and PII scrubbing for training-data curation.

All selection decisions hash a stable key through md5 and compare the hex
prefix lexicographically — the repo's portable hash domain (identical in
Spark, DuckDB, and any future engine), so a sample drawn today is
reproducible bit-for-bit tomorrow and by the SQL oracle. No randomness, no
driver state: every operator is a map-only filter/projection except
``repetition_signals`` (two partial-aggregating groupBys) and
``shuffle_shards`` (per-shard window — shards bound task size, so the sort
never collapses to one partition at corpus scale).

Reference anchor: the reference engine has no corpus operators (its P*/A*
surface stops at relational analytics — see SURVEY.md §2); these extend the
engine toward the 100 TB training-data workload the driver's
``documents``/``embeddings`` tables model.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nexus_processor_spark.functions.text import tokens

HEX_WIDTH = 8  # 32 bits of md5 prefix: plenty below 1e-9 rate granularity


def hash_hex(key: Column, *, salt: str = "", width: int = HEX_WIDTH) -> Column:
    """Deterministic uniform hash of a key as a fixed-width hex string."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, width)


def hex_threshold(fraction: float, width: int = HEX_WIDTH) -> str:
    """Hex string such that P[hash_hex < threshold] == fraction (to 1/16^w).

    ``"g"`` (sorts after every hex digit) for fraction >= 1 so the
    comparison stays a fixed-width string compare in both engines.
    """
    n = int(round(fraction * 16**width))
    if n <= 0:
        return "0" * width
    if n >= 16**width:
        return "g"
    return format(n, f"0{width}x")


def hash_sample(
    df: DataFrame, fraction: float, *, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff md5(salt+key) lands
    below the fraction threshold. Unlike ``df.sample`` this is stable
    across runs, partitionings, and engines — the property a training
    pipeline needs for reproducible corpus draws. Map-only; the filter
    does not push to the scan (it's computed), but column pruning does.
    """
    return df.filter(hash_hex(F.col(key_col), salt=salt) < F.lit(hex_threshold(fraction)))


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    *,
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic sampling — the domain-mixing primitive
    (e.g. keep 50% of English, 10% of everything else). One map-only
    filter; no shuffle regardless of group count.
    """
    thr: Column = F.lit(hex_threshold(default_rate))
    for group, rate in rates.items():
        thr = F.when(F.col(group_col) == group, F.lit(hex_threshold(rate))).otherwise(thr)
    return df.filter(hash_hex(F.col(key_col), salt=salt) < thr)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float],
    *,
    key_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/valid/test) by hash range.

    Weights are cumulative left-to-right; the last label absorbs any
    floating-point remainder so assignment is total. Disjoint and
    exhaustive by construction, stable under any row order or
    repartitioning — the contamination-proof split a training pipeline
    requires (a given doc_id is ALWAYS in the same split).
    """
    labels = list(weights)
    if not labels:
        raise ValueError("weights must name at least one split")
    h = hash_hex(F.col(key_col), salt=salt)
    expr: Column = F.lit(labels[-1])
    cum = 0.0
    bounds: list[tuple[str, str]] = []
    for label in labels[:-1]:
        cum += weights[label]
        bounds.append((label, hex_threshold(cum)))
    for label, bound in reversed(bounds):
        expr = F.when(h < F.lit(bound), F.lit(label)).otherwise(expr)
    return df.withColumn(split_col, expr)


_U60 = float(1 << 60)  # md5-prefix uniform granularity (15 hex digits)


def hash_uniform(key: Column, *, salt: str = "") -> Column:
    """Deterministic uniform draw in (0, 1) from md5(salt + key).

    15 hex digits -> 60-bit integer -> ``(v + 0.5) / 2^60``: the +0.5
    keeps the draw strictly inside (0, 1) so ``ln(u)`` is finite. Every
    step is IEEE double arithmetic on the same integer in both engines
    (DuckDB twin: ``(('0x' || substr(md5(..), 1, 15))::BIGINT + 0.5) /
    2^60``), so draws are bit-identical cross-engine.
    """
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16, 10,
    ).cast("double")
    return (v + F.lit(0.5)) / F.lit(_U60)


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    key_col: str = "doc_id",
    group_cols: tuple[str, ...] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-Res, public literature): row i draws ``u_i`` uniformly from
    its key hash and scores ``ln(u_i) / w_i``; the k largest scores win.
    P[row in sample] is proportional-to-weight without replacement, and the
    draw is reproducible across runs, partitionings, and engines — the
    weighted analog of :func:`hash_sample`.

    Global form (``group_cols=None``) plans as TakeOrderedAndProject —
    each task keeps its local top-k, the driver merges k-sized heaps; no
    global sort, no single-partition window. Grouped form ranks inside
    each group (one hash shuffle on the group key).

    Rows with non-positive weight are excluded (their score is undefined).
    Ties (impossible in practice at 60 random bits) break on the key for
    determinism.
    """
    score = F.log(hash_uniform(F.col(key_col), salt=salt)) / F.col(weight_col)
    d = df.filter(F.col(weight_col) > 0).withColumn("_aes", score)
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(
            F.col("_aes").desc(), F.col(key_col)
        )
        return (
            d.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn", "_aes")
        )
    return (
        d.orderBy(F.col("_aes").desc(), F.col(key_col)).limit(k).drop("_aes")
    )


def shards_for(n_rows: int, *, target_rows_per_shard: int = 1_000_000) -> int:
    """Hex digits of shard key needed so the per-shard window sort stays
    bounded: the smallest ``shard_chars`` with 16^n shards >= rows/target.
    1M rows/shard keeps a shard's sort comfortably in one task's memory at
    any corpus size (capped at 8 digits = 4B shards)."""
    import math

    need = max(1, -(-n_rows // target_rows_per_shard))
    return min(8, max(1, math.ceil(math.log(need, 16))))


def shuffle_shards(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    salt: str = "",
    shard_chars: int | None = None,
    target_rows_per_shard: int = 1_000_000,
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    shard = first ``shard_chars`` hex of md5 (16^n shards), rank = position
    within the shard by the remaining hash bits. Readers stream shards in
    any order and rows within a shard by rank — a reproducible permutation
    with NO global sort: each shard sorts independently, so the operator
    scales with executors instead of collapsing to a single ordered
    partition.

    ``shard_chars`` defaults to scaling with the input: one count job picks
    the smallest hex-prefix width that keeps every shard at or under
    ``target_rows_per_shard`` expected rows (md5 spreads uniformly), so the
    per-shard window sort is bounded at 100 TB instead of fixed at 256
    shards. Pass an explicit ``shard_chars`` for a reproducible shard
    *count* across differently-sized runs.
    """
    if shard_chars is None:
        shard_chars = shards_for(
            df.count(), target_rows_per_shard=target_rows_per_shard
        )
    full = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    with_h = df.withColumn("_h", full)
    shard = F.substring(F.col("_h"), 1, shard_chars)
    rest = F.substring(F.col("_h"), shard_chars + 1, 32 - shard_chars)
    w = Window.partitionBy("shard").orderBy("_rest", key_col)
    return (
        with_h.withColumn("shard", shard)
        .withColumn("_rest", rest)
        .withColumn("shard_rank", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h", "_rest")
    )


def repetition_signals(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals: type/token ratio and the
    mass of the single most frequent token. Low TTR or a dominant token
    marks boilerplate/spam for corpus filtering.

    Shape: explode -> (doc, token) count -> per-doc agg. Both groupBys
    partial-aggregate map-side, and the second groups a strict subset of
    the first's keys, so the heavy shuffle happens once on (doc, token).
    Exact-rational divisions only — bit-identical cross-engine.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    n_toks = F.sum("c").cast("long")
    n_unique = F.count("*").cast("long")
    top = F.max("c").cast("long")
    return counts.groupBy(id_col).agg(
        n_toks.alias("n_tokens"),
        n_unique.alias("n_unique_tokens"),
        top.alias("top_token_count"),
        (n_unique.cast("double") / n_toks).alias("type_token_ratio"),
        (top.cast("double") / n_toks).alias("top_token_fraction"),
    )


def duplicate_ngram_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_words: int = 2,
    hash_grams: bool = False,
) -> DataFrame:
    """Gopher/C4-style duplicate n-gram character fraction per document:
    the share of the doc's characters covered by word n-grams that occur
    MORE THAN ONCE within it. High values mark templated/looping text that
    per-token signals (:func:`repetition_signals`) miss.

    Occurrences are non-distinct (every window position counts); a gram
    appearing c >= 2 times contributes c * len(gram) duplicated chars.
    Same shuffle shape as repetition_signals: one (doc, gram) hash agg,
    then a per-doc agg over a subset of those keys — partial-agg both.
    Exact-rational division; docs shorter than ``ngram_words`` emit a zero
    row (no grams, fraction 0), keeping the output total over inputs.

    Gram occurrences come from the single-regex pass
    (``word_shingles_text_all``) — the HOF ``transform``+``slice`` form
    measured 5x slower on the 2M-doc bench corpus (215s vs 40s), the same
    lesson word_shingles_text documents. ``hash_grams=True`` additionally
    groups on ``xxhash64(gram)`` carrying only the gram's length, so the
    shuffle rows are three fixed-width longs instead of strings (~10%
    more on top). Within-doc 64-bit collisions (~g²/2⁶⁵ per doc) are
    negligible at any real doc size; the string path remains the
    cross-engine-checkable default (the DuckDB oracle groups real grams).
    """
    from nexus_processor_spark.functions.text import word_shingles_text_all

    grams = word_shingles_text_all(text_col, ngram_words)
    g = df.select(
        F.col(id_col),
        F.length(text_col).alias("_chars"),
        F.explode_outer(grams).alias("gram"),
    )
    if hash_grams:
        g = g.select(
            id_col, "_chars",
            F.when(F.col("gram").isNotNull(), F.xxhash64("gram")).alias("gk"),
            F.length("gram").alias("glen"),
        )
    else:
        g = g.select(
            id_col, "_chars",
            F.col("gram").alias("gk"), F.length("gram").alias("glen"),
        )
    per_gram = g.groupBy(id_col, "gk").agg(
        F.count("*").alias("c"),
        F.first("glen").alias("glen"),
        F.first("_chars").alias("_chars"),
    )
    has_gram = F.col("gk").isNotNull()
    dup_chars = F.sum(
        F.when(has_gram & (F.col("c") >= 2), F.col("c") * F.col("glen"))
        .otherwise(F.lit(0))
    ).cast("long")
    return per_gram.groupBy(id_col).agg(
        F.sum(F.when(has_gram, F.col("c")).otherwise(F.lit(0)))
        .cast("long").alias("n_grams"),
        F.sum(F.when(has_gram & (F.col("c") >= 2), 1).otherwise(0))
        .cast("long").alias("n_dup_grams"),
        dup_chars.alias("dup_gram_chars"),
        # zero-length text: fraction 0.0, never 0/0 (Spark 4's default
        # ANSI mode turns the division into a job-killing exception).
        # NOTE the fraction counts OVERLAPPING gram windows, so heavy
        # repetition can exceed 1.0 — it is a repetition-mass ratio,
        # not a coverage share; threshold accordingly
        F.when(
            F.first("_chars") > 0,
            dup_chars.cast("double") / F.first("_chars").cast("double"),
        ).otherwise(F.lit(0.0)).alias("dup_char_fraction"),
    )


# Conservative, RE2-compatible (no backreferences/lookaround) so the same
# pattern runs identically under Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
# \S, not [^ ]: a line-final URL must stop at the newline instead of
# swallowing it plus the next line's first word
URL_RE = "https?://\\S+"
PHONE_RE = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"


def scrub_pii(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / URLs / phone numbers with typed placeholder tokens
    and count what was removed (the audit trail a takedown pipeline logs).
    URL first so mailto-ish URLs don't leave half-scrubbed emails behind.
    Map-only, single projection."""
    t = F.col(text_col)
    # each count runs against the PREVIOUS stage's output so the audit
    # trail reports exactly what its own replacement redacted — counting
    # everything on the raw text over-reported (an email inside an
    # already-scrubbed URL was counted but never individually replaced)
    t_url = F.regexp_replace(t, URL_RE, "<URL>")
    t_mail = F.regexp_replace(t_url, EMAIL_RE, "<EMAIL>")
    scrubbed = F.regexp_replace(t_mail, PHONE_RE, "<PHONE>")
    n_urls = F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).cast("long")
    n_emails = F.size(
        F.regexp_extract_all(t_url, F.lit(EMAIL_RE), 0)).cast("long")
    n_phones = F.size(
        F.regexp_extract_all(t_mail, F.lit(PHONE_RE), 0)).cast("long")
    return df.select(
        F.col(id_col),
        scrubbed.alias("scrubbed_text"),
        n_urls.alias("n_urls"),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )


def _contamination_audit(
    corpus: DataFrame, matched_grams: DataFrame, id_col: str
) -> DataFrame:
    """Shared tail of the decontamination variants: per-doc distinct-hit
    counts + 0/1 flag, keeping EVERY corpus row as an audit table."""
    hits = (
        matched_grams.groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_eval_grams"))
    )
    found = F.coalesce(F.col("n_eval_grams"), F.lit(0)).cast("long")
    return corpus.select(id_col).join(hits, id_col, "left").select(
        F.col(id_col),
        found.alias("n_eval_grams"),
        (found > 0).cast("long").alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, how many distinct word
    n-grams it shares with an eval/benchmark set (and a 0/1 flag).

    The eval side reduces to its distinct n-gram set — small even for big
    benchmarks, so it BROADCASTS and the contamination probe is a map-side
    semi-join over the corpus: the 100 TB side never shuffles on gram. Only
    the per-doc hit counts (≤ corpus rows) shuffle, on ``id_col``. Keeping
    every corpus row (hits or not) makes the result a stable audit table a
    curation run can filter or join downstream.
    """
    from nexus_processor_spark.functions.text import word_shingles_text

    eval_grams = eval_df.select(
        F.explode(word_shingles_text(text_col, n)).alias("gram")
    ).distinct()
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles_text(text_col, n)).alias("gram")
    )
    matched = corpus_grams.join(F.broadcast(eval_grams), "gram", "left_semi")
    return _contamination_audit(corpus, matched, id_col)


def contamination_scores(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    max_gram_eval_df: int | None = None,
) -> DataFrame:
    """Graded, ATTRIBUTED eval-overlap: for every (corpus doc, eval doc)
    pair sharing at least one distinct word ``n``-gram, the shared-gram
    count and the CONTAINMENT fraction
    ``shared / |eval doc's distinct n-grams|`` — the graded dial behind
    binary :func:`decontaminate` (which only says "some eval gram
    matched somewhere in the benchmark"): containment 0.9 against a
    specific benchmark item is a leak to excise; 0.02 is a
    stopword-phrase collision to ignore. This is the per-item evidence
    table an eval-integrity report is built from.

    Scale shape: the eval side explodes to (eval_id, gram) — benchmark-
    sized, broadcast; the corpus pays ONE distinct-shingle explode and
    a broadcast gram join, then per-pair counts shuffle on the
    (corpus, eval) key — bounded by TRUE overlapping pairs, not the
    pair space. The quadratic risk is grams common across MANY eval
    docs (each corpus hit fans out to all of them); ``max_gram_eval_df``
    drops grams whose eval-side document frequency exceeds the cap —
    they carry no per-item attribution signal (same dial as
    ``dedup.neardup_eval``'s heavy-shingle cap). Deterministic and
    SQL-replayable.

    Output: ``(id_col, eval_id, shared_grams, eval_grams,
    containment)``.
    """
    from nexus_processor_spark.functions.text import word_shingles_text

    eval_id = eval_id_col or id_col
    # benchmark-sized and consumed 2-3 times (totals, the optional df
    # cap, the probe join's broadcast build) — materialize once so the
    # eval explode doesn't re-run per consumer
    eg = eval_df.select(
        F.col(eval_id).alias("eval_id"),
        F.explode(word_shingles_text(text_col, n)).alias("gram"),
    ).localCheckpoint(eager=True)
    # denominator = the eval doc's FULL distinct gram count (computed
    # before the df cap, so capping can only lower a containment score,
    # never inflate one)
    totals = eg.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("eval_grams"))
    if max_gram_eval_df is not None:
        gram_df = eg.groupBy("gram").agg(
            F.count(F.lit(1)).alias("_df"))
        eg = eg.join(
            F.broadcast(gram_df.filter(
                F.col("_df") <= max_gram_eval_df).select("gram")),
            "gram", "left_semi",
        )
    cg = corpus.select(
        F.col(id_col),
        F.explode(word_shingles_text(text_col, n)).alias("gram"),
    )
    pairs = (
        cg.join(F.broadcast(eg), "gram")
        .groupBy(id_col, "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    return (
        pairs.join(F.broadcast(totals), "eval_id")
        .select(
            id_col,
            "eval_id",
            F.col("shared_grams").cast("long").alias("shared_grams"),
            F.col("eval_grams").cast("long").alias("eval_grams"),
            F.round(
                F.col("shared_grams") / F.col("eval_grams"), 6
            ).alias("containment"),
        )
    )


def decontaminate_bloom(
    corpus: DataFrame,
    eval_df: DataFrame,
    *,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """:func:`decontaminate` behind a Bloom prefilter — same exact output
    (the bloom only generates *candidates*; an exact semi-join verifies
    them), but the first pass over the 100 TB side tests membership
    against a bounded ``bits``-position sketch instead of the full
    distinct-gram relation. When the eval set's gram table outgrows the
    broadcast budget, the bloom still fits; only the candidate trickle
    (true hits + deterministic false positives) reaches the exact join.
    """
    from nexus_processor_spark.functions.text import word_shingles_text
    from nexus_processor_spark.operators.sketch import (
        bloom_build,
        bloom_filter_candidates,
    )

    # Materialize the eval gram set once: it feeds BOTH the bloom build
    # and the exact verification semi-join, and the bloom's position
    # table (≤ bits rows) once: the k-probe filter broadcasts it k
    # times, and without the lineage cuts every one of those consumers
    # re-ran the eval-side explode+distinct (7 scans of the input in
    # the declared query's before-plan; 2 after). Both tables are
    # bounded by the eval set / bits, never the 100 TB side.
    eval_grams = eval_df.select(
        F.explode(word_shingles_text(text_col, n)).alias("gram")
    ).distinct().localCheckpoint(eager=True)
    bloom = bloom_build(eval_grams, "gram", bits=bits, k=k).localCheckpoint(
        eager=True)
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(word_shingles_text(text_col, n)).alias("gram")
    )
    candidates = bloom_filter_candidates(
        corpus_grams, "gram", bloom, bits=bits, k=k
    )
    # deliberately NOT broadcast: this variant exists for eval sets too
    # big to broadcast, and the candidate side is a trickle — a shuffle
    # semi-join on gram is the right shape in that regime
    matched = candidates.join(eval_grams, "gram", "left_semi")
    return _contamination_audit(corpus, matched, id_col)


def source_overlap(
    df: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    ngram_words: int = 3,
) -> DataFrame:
    """Cross-source n-gram overlap matrix — the contamination report a
    curation pipeline runs before mixing corpora (is source A a re-crawl
    of source B? does a benchmark dump leak into a web source?).

    For every source pair: the count of shared DISTINCT word n-grams and
    the overlap coefficient ``shared / min(|A|, |B|)`` (1.0 when the
    smaller gram set is fully contained in the larger).

    Shape: doc grams -> distinct (source, gram) [one shuffle, output
    bounded by vocabulary x sources, not by corpus rows] -> gram-key
    self-join [fanout per gram <= n_sources, never doc-pair scale] ->
    per-pair count. Output is n_sources², a driver-safe matrix.
    """
    from nexus_processor_spark.functions.text import word_shingles_text

    grams = (
        df.select(
            F.col(source_col).alias("src"),
            F.explode(word_shingles_text(text_col, ngram_words)).alias("g"),
        )
        .distinct()
        # three consumers below (sizes + both self-join sides); the cut
        # makes the corpus explode + distinct shuffle run ONCE instead
        # of per consumer (before-plan: 4 corpus scans; after: 1) —
        # cheaper at every scale, since each re-run WAS itself a
        # corpus-scale (src, gram) shuffle on top of the scan
        .localCheckpoint(eager=True)
    )
    sizes = grams.groupBy("src").agg(F.count("*").alias("n"))
    a = grams.select(F.col("src").alias("source_a"), "g")
    b = grams.select(F.col("src").alias("source_b"), "g")
    shared = (
        a.join(b, "g")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("shared_grams"))
    )
    na = sizes.select(F.col("src").alias("source_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("src").alias("source_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(na), "source_a").join(F.broadcast(nb), "source_b")
        .select(
            "source_a", "source_b", "shared_grams",
            F.col("n_a").cast("long").alias("n_grams_a"),
            F.col("n_b").cast("long").alias("n_grams_b"),
            (F.col("shared_grams").cast("double")
             / F.least("n_a", "n_b").cast("double")).alias("overlap"),
        )
    )


def novelty_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_words: int = 3,
) -> DataFrame:
    """Per-document novelty: the share of the doc's distinct word n-grams
    that occur in NO other document. Low novelty marks boilerplate,
    mirror content, and template families that per-doc repetition signals
    miss (the gram is unique within the doc but everywhere in the
    corpus); high novelty is the long tail worth keeping.

    Shape: distinct (doc, gram) projection -> corpus gram document
    frequency (one gram-key shuffle, partial-agg) -> per-doc aggregate.
    Exact-rational division; docs with no grams score 0 novelty over 0
    grams (emitted, not dropped).
    """
    from nexus_processor_spark.functions.text import word_shingles_text

    g = df.select(
        F.col(id_col),
        F.explode_outer(word_shingles_text(text_col, ngram_words)).alias("g"),
    )
    freq = (
        g.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("df_g"))
    )
    joined = g.join(freq, "g", "left")
    n_grams = F.sum(F.when(F.col("g").isNotNull(), 1).otherwise(0)).cast("long")
    n_unique = F.sum(
        F.when(F.col("g").isNotNull() & (F.col("df_g") == 1), 1).otherwise(0)
    ).cast("long")
    return joined.groupBy(id_col).agg(
        n_grams.alias("n_grams"),
        n_unique.alias("n_unique_grams"),
        F.when(n_grams > 0, n_unique.cast("double") / n_grams.cast("double"))
        .otherwise(F.lit(0.0)).alias("novelty"),
    )


def quantile_filter(
    df: DataFrame,
    q: float = 0.25,
    *,
    metric_col: str = "n_chars",
    id_col: str = "doc_id",
    round_digits: int = 6,
    exact: bool = False,
) -> DataFrame:
    """Keep rows at/above the corpus q-quantile of a quality metric — the
    "drop the worst quartile" curation gate. The threshold comes from a
    one-row aggregate broadcast back over the corpus (no driver collect,
    one lazy job). Threshold is rounded so cross-engine interpolation ulps
    can't flip membership of a row sitting exactly on the cut.

    Default is ``approx_percentile`` (t-digest sketch: bounded memory,
    mergeable map-side — the only shape that survives 100 TB). ``exact``
    uses interpolated ``percentile``, which buffers every value in the
    final aggregate — reserved for oracle comparison at test scale."""
    m = F.col(metric_col).cast("double")
    pct = (
        F.percentile(m, F.lit(q))
        if exact
        else F.approx_percentile(m, F.lit(q), F.lit(10_000))
    )
    thr = df.agg(F.round(pct, round_digits).alias("q_threshold"))
    return (
        df.crossJoin(F.broadcast(thr))
        .filter(F.col(metric_col).cast("double") >= F.col("q_threshold"))
        .select(id_col, metric_col, "q_threshold")
    )


def source_mix(
    df: DataFrame,
    *,
    group_col: str = "source",
    weight_col: str = "n_chars",
    round_digits: int = 6,
) -> DataFrame:
    """Domain-mixing report: per-source doc count, char mass, corpus share,
    and cumulative share in descending-count order — the table a data-mix
    decision reads. One shuffle (the groupBy); the windows then run over
    group-count rows (tiny at any corpus scale), so the unpartitioned
    window is safe here and only here."""
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(weight_col).cast("long").alias("sum_chars"),
    )
    w_all = Window.partitionBy()
    share = F.round(
        F.col("n_docs").cast("double") / F.sum("n_docs").over(w_all).cast("double"),
        round_digits,
    )
    shared = agg.withColumn("share", share)
    w_cum = Window.orderBy(F.col("n_docs").desc(), F.col(group_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return shared.withColumn(
        "cum_share", F.round(F.sum("share").over(w_cum), round_digits)
    )


def vocab_topk(
    df: DataFrame, k: int = 20, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Global vocabulary head: top-k tokens by occurrence count with their
    document frequency — the Zipf-curve summary a tokenizer/quality pass
    starts from. Partial map-side counts collapse the token space before
    the shuffle; top-k is a tiny ordered limit after the agg. Ties break
    on the token itself so the cut is deterministic cross-engine."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    return (
        tok.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(k)
    )


def bigram_stats(
    df: DataFrame,
    k: int = 200,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus bigrams with conditional probability P(w2 | w1) —
    the n-gram LM statistics a data-quality / repetition analysis reads.

    Bigrams extract in one regex pass (non-distinct twin of
    ``word_shingles_text``: one occurrence per starting token), counts
    partial-combine map-side, and the conditional divides two exact longs
    (bit-identical cross-engine, no rounding needed). The unigram join
    runs after both aggs, so it joins count-rows, never token rows.
    """
    from nexus_processor_spark.functions.text import tokens

    pat = "(?:^|(?<= ))(?=([^ ]*(?: [^ ]*){1}))"
    uni = (
        df.select(F.explode(tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("n_first"))
    )
    big = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n_bigram"))
    )
    first = F.substring_index(F.col("bigram"), " ", 1)
    return (
        big.withColumn("w1", first)
        .join(uni, "w1")
        .select(
            "bigram",
            "n_bigram",
            "n_first",
            (F.col("n_bigram").cast("double") / F.col("n_first").cast("double"))
            .alias("cond_p"),
        )
        .orderBy(F.col("n_bigram").desc(), "bigram")
        .limit(k)
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nightly-ingest dedup: batch docs whose exact content hash is not
    already in the corpus. The corpus side reduces to its DISTINCT hash set
    before the anti-join, so the shuffle carries 32-byte hashes, not
    documents — at 100 TB the join key set is ~3 orders of magnitude
    smaller than the data. Null text hashes to null and survives (an
    anti-join can't prove a null was seen), matching NOT EXISTS."""
    seen = corpus.select(F.md5(F.col(text_col)).alias("content_hash")).distinct()
    return batch.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("content_hash")
    ).join(seen, "content_hash", "left_anti")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot delta between two corpus versions: per-id status
    ``added`` (id only in new), ``removed`` (only in old), ``changed``
    (same id, different content hash), ``unchanged`` — the audit table a
    versioned training corpus publishes with each refresh so downstream
    consumers re-process only the delta.

    Both sides reduce to ``(id, md5(text))`` BEFORE the full-outer join,
    so the shuffle carries fixed-width hashes, never documents — the
    same key-set-not-data rule as :func:`incremental_dedup`. Null text
    hashes to null and compares null-safely: two null texts are
    ``unchanged``; text appearing or disappearing reports ``changed``.

    Output: ``(id_col, status)`` — one row per id in either snapshot.
    """
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("_ho"),
                   F.lit(1).alias("_in_o"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("_hn"),
                   F.lit(1).alias("_in_n"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(F.col("_ho").eqNullSafe(F.col("_hn")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 4,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf.

    tf = term count in doc; idf = ln((N+1)/(df+1)). The corpus size N
    arrives via a crossJoin of a 1-row aggregate (broadcast — no driver
    collect, stays one lazy job). Scores are rounded so cross-engine ln()
    ulp differences can't flip the top-k ordering; ties after rounding
    break on the term itself.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("dfreq"))
    n_docs = df.agg(F.count("*").cast("long").alias("n_docs"))
    idf = F.log((F.col("n_docs").cast("double") + 1) / (F.col("dfreq").cast("double") + 1))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.round(F.col("tf") * idf, round_digits).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Okapi BM25 relevance of every matching document to a bag-of-words
    query — the classic full-text ranking function (Robertson & Walker,
    public literature; the Lucene/Elasticsearch default).

    idf uses the non-negative Lucene variant
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; the tf term saturates at k1
    and normalizes by doc length against the corpus average.

    Scale shape: the token explode is filtered to the query's terms FIRST
    (an ``isin`` over a literal list — map-side, prunes ~everything), so
    the (doc, term) aggregate touches only matching postings. Corpus
    stats (N, avgdl) ride in as a broadcast 1-row aggregate; per-term df
    over the matched postings only. Output rows = docs matching >= 1 term.

    Scores are rounded so cross-engine ``ln`` ulp differences cannot
    change the value hash.
    """
    toks = df.select(
        F.col(id_col),
        F.size(tokens(text_col)).cast("double").alias("dl"),
        F.explode(tokens(text_col)).alias("term"),
    ).filter(F.col("term").isin(query_terms))
    tf = toks.groupBy(id_col, "term").agg(
        F.count("*").cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("dfreq"))
    stats = df.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(F.size(tokens(text_col))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + 0.5) / (F.col("dfreq") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_matched_terms"),
            F.round(F.sum(term_score), round_digits).alias("bm25"),
        )
    )


def rrf_fuse(
    legs: list[tuple[str, DataFrame]],
    *,
    id_col: str = "doc_id",
    score_col: str = "score",
    top_m: int = 50,
    k: int = 60,
    n: int = 20,
    round_digits: int = 9,
) -> DataFrame:
    """Reciprocal-rank fusion of scored retrieval legs (Cormack et al.
    2009, the hybrid-search default): each leg contributes
    ``1/(k + rank)`` for its top-``top_m`` results, missing legs
    contribute 0, and the fused top-``n`` is returned.

    Scale shape: each leg is cut to ``top_m`` by a distributed
    TakeOrdered FIRST (``orderBy().limit()`` — no global sort
    materializes), so the rank window runs over an m-row pre-limited
    head, never the corpus — fusing leg-local top-m lists is the
    standard RRF contract, not an approximation of something bigger.
    Ties break by id ascending in both the cut and the rank.

    Output: ``(id_col, rank_<leg>..., rrf)``, ranks null where a doc
    appears in only some legs.
    """
    fused: DataFrame | None = None
    terms = []
    for name, leg in legs:
        top = leg.orderBy(F.desc(score_col), id_col).limit(top_m)
        w = Window.orderBy(F.desc(score_col), id_col)
        r = top.select(
            F.col(id_col),
            F.row_number().over(w).cast("long").alias(f"rank_{name}"),
        )
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
        terms.append(
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")), F.lit(0.0)
            )
        )
    if fused is None:
        raise ValueError("rrf_fuse needs at least one leg")
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return (
        fused.select(
            F.col(id_col),
            *[F.col(f"rank_{name}") for name, _ in legs],
            F.round(total, round_digits).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), id_col)
        .limit(n)
    )


def boilerplate_phrases(
    df: DataFrame,
    n: int = 4,
    min_docs: int = 3,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word n-grams shared by >= ``min_docs`` distinct documents — the
    corpus-frequency boilerplate detector (header/footer/license text at
    web-corpus scale repeats across thousands of pages).

    One regex pass per doc extracts every n-gram occurrence (lookahead
    capture, same non-distinct trick as ``bigram_stats``); the per-gram
    agg partial-combines the occurrence count map-side, and the distinct
    doc count shuffles (gram, doc) once. Output ordered by spread.
    """
    pat = f"(?:^|(?<= ))(?=([^ ]*(?: [^ ]*){{{n - 1}}}))"
    grams = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count_distinct(F.col(id_col)).cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= F.lit(min_docs))
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "gram")
    )


def lm_doc_score(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 6,
) -> DataFrame:
    """Bigram-LM quality score per document: mean log2 P(w2 | w1) under
    the corpus's own bigram statistics (the cheap stand-in for
    perplexity-based quality filtering — low scores mark improbable /
    machine-garbled token sequences).

    The model is the ``bigram_stats`` estimator without the top-k cut:
    P(w2|w1) = n(w1 w2) / n(w1·), both exact longs, so every probability
    is bit-identical cross-engine; only the log-sum needs rounding. The
    doc-bigram -> model join keys on the bigram string — a plain shuffle
    join that scales with corpus vocab (no broadcast assumption); docs
    with fewer than two tokens drop out (no bigrams to score).

    Output: ``id_col, n_bigrams, avg_log2_p`` (higher = more typical).
    """
    pat = "(?:^|(?<= ))(?=([^ ]*(?: [^ ]*){1}))"
    uni = (
        df.select(F.explode(tokens(text_col)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("n_first"))
    )
    big = (
        df.select(
            F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("n_bigram"))
    )
    model = (
        big.withColumn("w1", F.substring_index(F.col("bigram"), " ", 1))
        .join(uni, "w1")
        .select(
            "bigram",
            (F.col("n_bigram").cast("double") / F.col("n_first").cast("double"))
            .alias("cond_p"),
        )
    )
    doc_bigrams = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(pat), 1)).alias("bigram"),
    )
    return (
        doc_bigrams.join(model, "bigram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log2("cond_p")), round_digits).alias("avg_log2_p"),
        )
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    budget_docs: int | None = None,
    *,
    source_col: str = "source",
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-based source mixing: sampling weights w_s proportional
    to n_s^alpha — the standard rebalancing that up-weights small sources
    (alpha < 1) when composing a training mix.

    With ``budget_docs``, also emits each source's effective sampling
    rate ``min(1, w_s * budget / n_s)`` — the per-source fraction a
    downstream ``stratified_sample`` call would take to hit the budget.
    One groupBy plus a 1-row total broadcast-crossJoin (the same
    no-collect shape as ``tfidf_top_terms``); weights round so
    cross-engine pow() ulp noise can't leak into the hash.

    Output: ``source_col, n_docs, weight, expected_docs[, sample_rate]``.
    """
    counts = df.groupBy(source_col).agg(F.count("*").cast("long").alias("n_docs"))
    powed = counts.withColumn("_p", F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha))))
    total = powed.agg(F.sum("_p").alias("_tp"))
    out = (
        powed.crossJoin(F.broadcast(total))
        .withColumn("weight", F.round(F.col("_p") / F.col("_tp"), round_digits))
    )
    cols = [F.col(source_col), F.col("n_docs"), F.col("weight")]
    if budget_docs is not None:
        expected = F.col("_p") / F.col("_tp") * F.lit(float(budget_docs))
        cols.append(F.round(expected, round_digits).alias("expected_docs"))
        cols.append(
            F.round(
                F.least(F.lit(1.0), expected / F.col("n_docs").cast("double")),
                round_digits,
            ).alias("sample_rate")
        )
    return out.select(*cols).orderBy(source_col)


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    *,
    quality_q: float = 0.25,
    metric_col: str = "n_chars",
    quality_exact: bool = False,
    max_dup_char_fraction: float | None = None,
    near_dup_threshold: float = 0.5,
    contamination_grams: int = 3,
    max_contamination_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed curation pipeline: quality gate → (optional
    Gopher-style repetition gate) → exact dedup → MinHash near-dedup →
    (optional) benchmark decontamination, returning every input doc
    tagged with ``keep`` and the FIRST ``drop_reason`` that eliminated it
    (``low_quality`` / ``repetitive`` / ``exact_dup`` / ``near_dup`` /
    ``contaminated`` / null).

    ``max_dup_char_fraction`` enables the repetition gate: docs whose
    duplicate-bigram character mass (:func:`duplicate_ngram_stats`)
    exceeds it are dropped before the dedup stages see them.

    Stages apply sequentially (dedup only among quality survivors, etc.),
    matching how a real curation run orders the passes: each stage is the
    existing oracle-checked operator, composed via id anti/semi joins —
    one lazy plan, no driver materialization. The audit-table shape (all
    rows kept, reasons tagged) is what a 100 TB run wants: the kept
    corpus is ``filter(keep)``, the drop accounting is one groupBy away.
    """
    from nexus_processor_spark.operators import dedup as _dedup

    # quality_exact swaps the t-digest threshold for the interpolated
    # exact percentile — the anchor the STREAMING gate reproduces
    # bit-for-bit from its accumulated histogram (streaming/curate.py;
    # parity test-pinned), since a t-digest's value drifts with merge
    # order and can't be replayed from per-value counts
    q_pass = quantile_filter(
        docs, quality_q, metric_col=metric_col, id_col=id_col,
        exact=quality_exact,
    ).select(id_col)

    s1 = docs.join(q_pass, id_col, "left_semi")
    stages = [("low_quality", q_pass)]
    if max_dup_char_fraction is not None:
        # anti-join on FAILURES: a doc without a stats row (null text,
        # no grams) has no repetition evidence and must PASS this gate
        # (a <=-filter silently tagged every such doc 'repetitive')
        rep_fail = (
            duplicate_ngram_stats(
                s1, text_col=text_col, id_col=id_col, hash_grams=True
            )
            .filter(F.col("dup_char_fraction") > max_dup_char_fraction)
            .select(id_col)
        )
        rep_pass = s1.join(rep_fail, id_col, "left_anti").select(id_col)
        stages.append(("repetitive", rep_pass))
        s1 = s1.join(rep_pass, id_col, "left_semi")
    exact_pass = _dedup.exact_dedup(s1, text_col=text_col, id_col=id_col).select(id_col)

    s2 = s1.join(exact_pass, id_col, "left_semi")
    pairs = _dedup.minhash_dedup_pairs(
        s2, threshold=near_dup_threshold, text_col=text_col, id_col=id_col
    )
    near_pass = _dedup.near_dedup(s2, pairs, id_col=id_col).select(id_col)

    stages += [
        ("exact_dup", exact_pass),
        ("near_dup", near_pass),
    ]
    if eval_df is not None:
        s3 = s2.join(near_pass, id_col, "left_semi")
        contam = decontaminate(
            s3, eval_df, n=contamination_grams,
            text_col=text_col, id_col=id_col,
        )
        clean = contam.filter(
            F.col("n_eval_grams") <= max_contamination_hits
        ).select(id_col)
        stages.append(("contaminated", clean))

    out = docs
    reason = F.lit(None).cast("string")
    survivor = F.lit(True)
    flags = []
    for name, passed in stages:
        flag = f"_pass_{name}"
        flags.append(flag)
        out = out.join(
            passed.withColumn(flag, F.lit(True)), id_col, "left"
        )
        # a doc is dropped at this stage if it was still alive and did
        # not pass; reason keeps the FIRST stage that dropped it
        dropped_here = survivor & F.col(flag).isNull()
        reason = F.when(reason.isNotNull(), reason).when(
            dropped_here, F.lit(name)
        )
        survivor = survivor & F.col(flag).isNotNull()
    return (
        out.withColumn("drop_reason", reason)
        .withColumn("keep", F.col("drop_reason").isNull())
        .drop(*flags)
    )


def build_vocab(
    df: DataFrame,
    size: int,
    *,
    text_col: str = "text",
    reserved: int = 1,
) -> DataFrame:
    """Frequency-ranked token vocabulary: ``(token, token_id)`` with ids
    ``reserved .. reserved+size-1`` (id 0 = OOV by default). Rank is
    (count desc, token asc) — ties cut deterministically, so the same
    corpus always yields the same vocabulary. One token-count aggregate
    plus a window over the (tiny) top-``size`` head.
    """
    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), "token")
        .limit(size)
    )
    w = Window.orderBy(F.col("_n").desc(), "token")
    return counts.select(
        "token",
        (F.row_number().over(w).cast("long") + F.lit(reserved - 1))
        .alias("token_id"),
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = 0,
) -> DataFrame:
    """Encode each doc's token stream to ids against a vocabulary —
    the tokenize step of training-data prep (whitespace tokens here; the
    id mapping, OOV policy, and plan shape are what carry over to a real
    subword vocab).

    Plan: posexplode the token stream, broadcast-join the vocabulary
    (dimension-sized by construction), re-assemble in order via
    ``sort_array`` over (position, id) structs — ONE shuffle of the
    token rows on the doc key; the vocab never shuffles. Unknown tokens
    map to ``oov_id``.

    Output: ``(id_col, input_ids array<long>, n_tokens, n_oov)``.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "token"),
    )
    joined = tok.join(F.broadcast(vocab), "token", "left").select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(oov_id)).alias("tid"),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("input_ids"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("tid") == oov_id).cast("long")).alias("n_oov"),
        )
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance weights — Data Selection via Importance
    Resampling (Xie et al., NeurIPS 2023; public literature): score each
    corpus doc by how much more likely its hashed-token bag is under the
    TARGET domain's bucket distribution than under the corpus's own,
    ``logw(doc) = sum_tokens log(p_tgt(bucket) / p_raw(bucket))``. The
    standard cheap proxy for "select raw-web data that looks like the
    high-quality target domain" ahead of LLM pretraining.

    Buckets are the ``md5(token) % dim`` space of
    ``textstats.hashed_features`` (engine-reproducible); both
    distributions are Laplace-smoothed exact integer counts,
    ``p(b) = (n_b + 1) / (N + dim)``. The per-bucket log-ratio is
    computed once over a ``dim``-row broadcast table, scaled to 1e-6
    and rounded to a BIGINT, so every per-doc weight is an exact
    integer SUM — addition-order-free, hash-matched by the DuckDB
    oracle. Docs with no tokens score 0.

    Scale shape: the corpus pays TWO token explodes — the per-bucket
    distribution aggregate, then the scoring pass whose ``groupBy(id)``
    is map-side combinable — and the target pays one; the token TOTALS
    derive from the per-bucket counts instead of dedicated full-input
    count passes (see the in-body comment). The distribution tables are
    dim-row aggregates that broadcast. No reference counterpart — the
    reference engine has no data-selection operators.

    Output: ``(id_col, logw_e6 bigint)``, one row per corpus doc.
    """
    spark = corpus.sparkSession
    bucket = (
        F.conv(F.substring(F.md5("_tok"), 1, 8), 16, 10).cast("long")
        % F.lit(dim)
    ).cast("int")

    def bucketed(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), F.explode(tokens(text_col)).alias("_tok"))
            .select(F.col(id_col), bucket.alias("bucket"))
        )

    corp_b = bucketed(corpus)
    tgt_b = bucketed(target)
    raw_n = corp_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_rn"))
    tgt_n = tgt_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_tn"))
    dom = spark.range(dim).select(F.col("id").cast("int").alias("bucket"))
    smoothed = lambda n, t: (  # noqa: E731  (n+1)/(N+dim), both integers
        (F.coalesce(n, F.lit(0)) + F.lit(1.0)) / (t + F.lit(float(dim)))
    )
    # The token totals are the SUMS of the per-bucket counts (every
    # token lands in exactly one bucket of [0, dim)), so they are
    # derived from the dim-row joined table via an unpartitioned window
    # — NOT via `corp_b.agg(count)` / `tgt_b.agg(count)`, each of which
    # re-runs a full explode+md5 pass of its input (exchange reuse
    # cannot dedup an agg branch against a differently-grouped one).
    # The window moves <= dim (8192 max) rows to one task inside a
    # subtree that broadcasts anyway. Same exact integers, so the
    # declared dsir_* query hashes are unchanged; measured 3 corpus
    # passes -> 2 (see OPTIMIZATION_r11.md).
    whole = Window.partitionBy()
    lr = (
        dom.join(F.broadcast(raw_n), "bucket", "left")
        .join(F.broadcast(tgt_n), "bucket", "left")
        .select(
            "bucket", "_rn", "_tn",
            F.sum(F.coalesce(F.col("_rn"), F.lit(0))).over(whole).alias("_rt"),
            F.sum(F.coalesce(F.col("_tn"), F.lit(0))).over(whole).alias("_tt"),
        )
        .select(
            "bucket",
            F.round(
                (F.log(smoothed(F.col("_tn"), F.col("_tt")))
                 - F.log(smoothed(F.col("_rn"), F.col("_rt")))) * 1e6,
                0,
            ).cast("long").alias("_lr"),
        )
    )
    per_doc = (
        corp_b.join(F.broadcast(lr), "bucket")
        .groupBy(id_col)
        .agg(F.sum("_lr").alias("_w"))
    )
    return (
        corpus.select(id_col).distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_w"), F.lit(0)).cast("long").alias("logw_e6"),
        )
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    *,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` corpus docs by :func:`dsir_logweights` (deterministic
    id tiebreak) — the selection step of DSIR. A global TakeOrdered-k,
    never a full sort materialization.

    Output: ``(id_col, logw_e6, rank)``.
    """
    w = dsir_logweights(
        corpus, target, dim=dim, text_col=text_col, id_col=id_col
    )
    # cut to k rows with a TakeOrdered FIRST; the rank window then runs
    # over a k-bounded relation (same discipline as hybrid_rrf's legs —
    # a bare global row_number would single-partition the corpus)
    top = w.orderBy(F.desc("logw_e6"), F.col(id_col)).limit(k)
    win = Window.orderBy(F.desc("logw_e6"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(win).cast("long"))


def token_coverage(
    df: DataFrame, k: int = 100, *, text_col: str = "text"
) -> DataFrame:
    """Vocabulary coverage curve: for the top-``k`` tokens by occurrence
    count (deterministic (count desc, token) cut), the CUMULATIVE share
    of all corpus token occurrences they cover — the Zipf curve a
    tokenizer-vocab-size or stopword-list decision reads ("the top 100
    tokens cover 38% of the stream"). One token-count aggregate (partial
    map-side combine), a 1-row total that broadcasts, and a running sum
    over the k-bounded head (never the corpus).

    Output: ``(rank, token, n_occurrences, cum_share)``.
    """
    tok = df.select(F.explode(tokens(text_col)).alias("token"))
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    total = counts.agg(F.sum("n_occurrences").alias("_total"))
    head = counts.orderBy(F.desc("n_occurrences"), "token").limit(k)
    w = Window.orderBy(F.desc("n_occurrences"), F.col("token"))
    return (
        head.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).cast("long").alias("rank"),
            "token",
            "n_occurrences",
            (F.sum("n_occurrences").over(w).cast("double")
             / F.col("_total")).alias("cum_share"),
        )
    )
