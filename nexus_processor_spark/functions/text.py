"""Text primitives for the training-data pipeline operators.

All JVM-side (split / transform / filter / md5 higher-order expressions) —
no Python UDFs. Hash-based operators (MinHash, SimHash, fingerprints) use
**md5 hex strings** as the hash domain: md5 is bit-identical across engines
(Spark, DuckDB, anything), so every dedup signature here is reproducible by
the SQL oracle and by any future re-implementation. Lexicographic order on
the hex strings stands in for integer order.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def tokens(text: Column | str, sep: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (set semantics —
    Jaccard inputs). Empty array when the doc has fewer than ``n`` tokens
    (``sequence(1,0)`` would count *down* in Spark, so guard explicitly)."""
    count = F.size(toks) - F.lit(n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.array_distinct(F.when(count >= 1, grams).otherwise(F.array().cast("array<string>")))


def char_shingles(text: Column | str, k: int = 8) -> Column:
    """Distinct character k-grams — the rolling-hash fingerprint domain.

    One regex pass: a zero-width match at every position captures the next
    ``k`` chars via lookahead (overlapping matches), so the whole gram
    extraction runs as a single JVM regexp_extract_all instead of a
    per-gram higher-order ``transform``+``substring`` chain (~8x faster on
    corpus scans — HOF lambdas are interpreted per element)."""
    c = F.col(text) if isinstance(text, str) else text
    grams = F.regexp_extract_all(c, F.lit(f"(?s)(?=(.{{{k}}}))"), 1)
    return F.array_distinct(
        F.when(c.isNotNull(), grams).otherwise(F.array().cast("array<string>"))
    )


def word_shingles_text(text: Column | str, n: int = 3, sep: str = " ") -> Column:
    """``word_shingles(tokens(text, sep), n)`` computed straight off the
    text in ONE regex pass — the corpus-scan fast path.

    Equivalence to the split-then-join form: for a single-char separator,
    joining ``n`` consecutive split-tokens with ``sep`` reproduces the
    literal text substring spanning them (split tokens are exactly the
    runs between separators, including empty runs). So each shingle is the
    capture of a zero-width match anchored at a token start (string start
    or just after a separator), looking ahead over ``n`` separator-free
    runs. ``[^sep]*`` (star) keeps empty tokens, matching split semantics;
    test_properties.py pins the equivalence under adversarial spacing.

    Perf note: the obvious native form — ``split`` + ``transform(sequence,
    i -> concat_ws(' ', slice(toks, i, n)))`` — measured 14x SLOWER on the
    2M-doc bench corpus (122s vs 8.4s): interpreted HOF lambdas allocate a
    sliced array + joined string per shingle, while the single regex pass
    stays inside one generated loop. Don't "optimize" this into array ops.
    """
    if len(sep) != 1:
        raise ValueError("word_shingles_text requires a single-char separator")
    c = F.col(text) if isinstance(text, str) else text
    s = re.escape(sep)
    pat = f"(?:^|(?<={s}))(?=([^{s}]*(?:{s}[^{s}]*){{{n - 1}}}))"
    return F.array_distinct(
        F.when(c.isNotNull(), F.regexp_extract_all(c, F.lit(pat), 1))
        .otherwise(F.array().cast("array<string>"))
    )


def word_shingles_text_all(text: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Every word n-gram OCCURRENCE in order (non-distinct) — the bag
    form of :func:`word_shingles_text`, for operators that count
    repetitions (duplicate-n-gram mass) rather than compare sets. Same
    single-regex pass and the same 14x-over-HOF rationale."""
    if len(sep) != 1:
        raise ValueError("word_shingles_text_all requires a single-char separator")
    c = F.col(text) if isinstance(text, str) else text
    s = re.escape(sep)
    pat = f"(?:^|(?<={s}))(?=([^{s}]*(?:{s}[^{s}]*){{{n - 1}}}))"
    return (
        F.when(c.isNotNull(), F.regexp_extract_all(c, F.lit(pat), 1))
        .otherwise(F.array().cast("array<string>"))
    )


BANDS_PER_MD5 = 4  # a 32-hex md5 yields four 8-hex (32-bit) band chunks


def salted_md5s(shingles: Column, salt: int) -> Column:
    """Per-shingle md5 array for one salt — the expensive projection.
    Compute/persist this once; every band signature below is a cheap
    substring over it."""
    return F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{salt}|"), s)))


def chunk_min(hashes: Column, chunk: int) -> Column:
    """One minhash: lexicographic min of an 8-hex-char (32-bit) chunk of a
    salted-md5 array. A 32-hex md5 carries four chunks. Null (not
    min-of-empty) for shingle-less docs so they never collide."""
    sigs = F.transform(hashes, lambda h: F.substring(h, 1 + 8 * (chunk % BANDS_PER_MD5), 8))
    return F.when(F.size(hashes) > 0, F.array_min(sigs))


def minhash_xx(shingles: Column, seed: int) -> Column:
    """One 64-bit minhash: min over the shingle set of the seeded
    ``xxhash64``. This is the scale path — xxhash64 is a native codegen
    long expression, roughly an order of magnitude cheaper than the
    salted-md5 + substring chunk scheme. The md5 variant stays as the
    cross-engine twin (DuckDB has md5; it has no xxhash64), so only
    md5-based signatures are oracle-comparable. Null for shingle-less
    docs, like ``chunk_min``."""
    return F.when(
        F.size(shingles) > 0,
        F.array_min(
            F.transform(shingles, lambda s: F.xxhash64(F.lit(seed), s))
        ),
    )


def band_sig_from_hashes(hashes: Column, band: int) -> Column:
    """Single-row band signature (r=1): chunk ``band%4`` of salt ``band//4``
    — kept for the standalone signature operator; the LSH pipeline bands
    multiple minhashes per signature (see dedup.minhash_dedup_pairs)."""
    return chunk_min(hashes, band)


def minhash_band(shingles: Column, band: int) -> Column:
    """One MinHash band value straight from the shingle set (see
    band_sig_from_hashes for the chunk scheme)."""
    return band_sig_from_hashes(salted_md5s(shingles, band // BANDS_PER_MD5), band)


def hex_prefix_value(hash_hex: Column, digits: int = 4) -> Column:
    """First ``digits`` hex chars of a hash as a long (0..16**digits-1)."""
    return F.conv(F.substring(hash_hex, 1, digits), 16, 10).cast("long")


def simhash_values(toks: Column, bits: int = 16) -> Column:
    """Per-distinct-token hash values feeding the simhash vote — the
    expensive projection (one md5 per distinct token). Materialize this
    as its own column, then fold with ``simhash_from_values``: inlining it
    would recompute the md5 transform inside every per-bit aggregate."""
    hexdigits = (bits + 3) // 4
    return F.transform(
        F.array_distinct(toks), lambda t: hex_prefix_value(F.md5(t), hexdigits)
    )


def simhash_from_values(vals: Column, bits: int = 16) -> Column:
    """Fold precomputed token-hash values into the ``bits``-bit signature:
    each bit position votes +1/-1 per token; sign of the vote is the
    output bit. Near-duplicate docs land within small Hamming distance.

    Kept as ``bits`` independent integer folds ON PURPOSE: the
    single-fold alternative (accumulator = array<long> of per-bit
    set-counts via zip_with) traverses the value array once but
    allocates two 16-element arrays PER TOKEN, and an interleaved A/B
    (5 reps/side, one session, sf0.1) measured it consistently slower
    (median 1.12 s vs 1.06 s; 4/5 pairs). Scalar folds allocate
    nothing."""
    # Bit j via modulo math — F.shiftright chokes on lambda variables (py4j
    # arg conversion). Closure factory, NOT a default arg: pyspark derives
    # the lambda's variable count from its arity, so extra params would be
    # bound to lambda variables.
    def vote_fn(j: int):
        lo, hi = 1 << j, 1 << (j + 1)
        return lambda acc, d: acc + F.when((d % hi) >= lo, F.lit(1)).otherwise(F.lit(-1))

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(vals, F.lit(0).cast("long"), vote_fn(j))
        out = out + F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


def simhash(toks: Column, bits: int = 16) -> Column:
    """SimHash over the distinct-token set (single-expression form — for
    the two-step projection the operators use, see ``simhash_values`` +
    ``simhash_from_values``). 16 bits is enough to band on; widen via
    multiple calls with salted tokens."""
    return simhash_from_values(simhash_values(toks, bits), bits)


def hamming64(a: Column, b: Column, bits: int = 16) -> Column:
    """Hamming distance between two ≤64-bit signatures: native popcount of
    XOR (one codegen intrinsic — the per-bit conditional chain this
    replaces was the hot path of simhash pair verification). ``bits`` is
    accepted for signature compatibility; popcount covers all 64."""
    del bits  # popcount is width-agnostic for non-negative signatures
    return F.bit_count(a.bitwiseXOR(b))
