"""Text analysis operators: profiling, language-ID, token counting,
fingerprinting — all native-expression, one narrow projection per doc.

These are per-row map-only transforms: no shuffle at any scale; the plan
is scan -> project, and column pruning keeps the scan to the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nexus_processor_spark.functions.text import char_shingles, tokens
from nexus_processor_spark.plans.layout import spread

# Marker stopwords per language for the n-gram/stopword-hit heuristic.
# Deterministic tie-break: earlier entry wins (en > fr > de > es).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "fr": ("le", "la", "les", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "y", "es", "una"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: letter runs, digit runs, other non-space singles.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")


def text_profile(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-scoring features: lengths, token stats, stopword ratio,
    BPE-ish token count. Exact-rational divisions only (no rounding needed
    cross-engine)."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_toks = F.size(toks).cast("long")
    stop_hits = _marker_hits(toks, STOPWORDS)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_toks.alias("n_tokens"),
        (F.length(F.regexp_replace(t, " ", "")).cast("double") / n_toks)
        .alias("avg_token_len"),
        stop_hits.alias("stopword_hits"),
        (stop_hits.cast("double") / n_toks).alias("stopword_ratio"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), 0)).cast("long")
        .alias("bpe_tokens"),
        F.size(F.regexp_extract_all(t, F.lit("[0-9]"), 0)).cast("long")
        .alias("n_digits"),
    )


def language_id(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-hit language heuristic: per-language marker counts and the
    argmax (first-listed language wins ties)."""
    toks = tokens(text_col)
    scores = {lang: _marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # Build the CASE from the lowest priority up so earlier langs override.
    for lang in reversed(langs):
        others = [scores[o] for o in langs if o != lang]
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] >= F.greatest(*others)), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in langs],
        pred.alias("pred_lang"),
    )


def fingerprints(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Document fingerprints: full-content md5, normalized md5 (lowercase,
    collapsed whitespace), and a rolling min-hash over char k-grams (the
    winnowing-style shift-robust fingerprint)."""
    t = F.col(text_col)
    norm = F.regexp_replace(F.lower(t), "\\s+", " ")
    grams = char_shingles(t, k)
    rolling = F.when(
        F.size(grams) > 0, F.array_min(F.transform(grams, F.md5))
    )
    df = spread(df.select(F.col(id_col), t))
    return df.select(
        F.col(id_col),
        F.md5(t).alias("fp_md5"),
        F.md5(norm).alias("fp_norm_md5"),
        rolling.alias("fp_rolling_min"),
    )
