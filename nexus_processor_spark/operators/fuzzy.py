"""Exact edit-distance similarity join — PassJoin segment blocking.

``levenshtein(s1, s2) <= k`` over a corpus without the n^2 pair space:
the PassJoin family (Li et al., PVLDB 2011 — public literature)
partitions every indexed string into ``k+1`` contiguous segments; if
``ed(s1, s2) <= k`` then at least one of s1's segments occurs VERBATIM
in s2, within a start-position shift of at most ``k`` (pigeonhole over
the k+1 segments plus the bounded alignment drift of <= k edits). So:

* index side: one ``(len, seg_idx, seg_text)`` key per segment —
  ``k+1`` rows per string;
* probe side: for each candidate partner length ``len in [L-k, L+k]``
  and segment, the substrings at starts shifted by ``|shift| <= k`` —
  at most ``(2k+1)^2 (k+1)`` bounded, skew-free keys per string;
* hash equi-join on the key -> candidate id pairs (complete recall by
  the lemma), then one exact ``levenshtein`` verify.

Fanout is a CONSTANT per row (75 keys at k=2), not a function of gram
frequency — unlike q-gram count filters there is no hot-token skew and
no threshold bookkeeping, and recall is exact.

Strings shorter than ``k+1`` have zero-length segments the lemma can't
use; they are handled by a separate tiny block (any partner must have
length <= 2k). A real corpus dedups empty/near-empty texts upstream.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(
    length: Column, i: "int | Column", k: int
) -> tuple[Column, Column]:
    """1-based start and length of segment ``i`` (0-based) in the fixed
    scheme for a string of ``length``: the first ``length % (k+1)``
    segments take the ceiling size. ``i`` may be a literal or a Column
    (the probe side iterates it with ``explode(sequence(...))``)."""
    n = k + 1
    ic = i if isinstance(i, Column) else F.lit(i)
    q = F.floor(length / n).cast("int")
    r = (length % n).cast("int")
    extra = F.when(ic < r, 1).otherwise(0)
    m = (q + extra).cast("int")
    start = (ic * q + F.least(ic, r) + 1).cast("int")
    return start, m


def edit_distance_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist``:
    ``(id_1, id_2, dist)`` with ``id_1 < id_2``, each pair once.
    Null texts never match (SQL three-valued comparison semantics)."""
    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be >= 1")
    # (_id, _s, _l) is consumed FOUR times below (index, probe grid,
    # and both short-string sides) — materialize it once so the source
    # scan (and its full text-column read, when _s is a projection of a
    # document table) doesn't re-run per consumer. Rows are id + the
    # edit-distance key string: proportional to the input, never wider —
    # which is why this is a PERSIST, not a localCheckpoint: a local
    # checkpoint of an input-proportional table pins executor disk and
    # is not fault-tolerant (an executor loss kills the job instead of
    # recomputing the lost blocks from lineage). MEMORY_AND_DISK keeps
    # the single-materialization plan (InMemoryTableScan x4) and spills
    # under pressure.
    base = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_s"))
        .filter(F.col("_s").isNotNull())
        .withColumn("_l", F.length("_s").cast("int"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    long_side = base.filter(F.col("_l") >= k + 1)

    # index: one row per segment of the stored string
    index = long_side.select(
        F.col("_id").alias("id_a"),
        F.col("_l").alias("len_a"),
        F.col("_s").alias("s_a"),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("i"),
                     F.substr("_s", *_seg_bounds(F.col("_l"), i, k))
                     .alias("seg"))
            for i in range(k + 1)
        ])).alias("e"),
    ).select(
        "id_a", "len_a", "s_a", F.col("e.i").alias("i"),
        F.col("e.seg").alias("seg"),
    )

    # probe: substrings of THIS string at the scheme positions of every
    # candidate partner length, shifted within +-k. The (dl, i, shift)
    # grid unrolls through ONE explode of a flat index sequence decoded
    # arithmetically — a single tiny generate — instead of one literal
    # array of (2k+1)^2 (k+1) struct entries, whose generated consume
    # method exceeds janino's 64 KB limit at k=2 (75 entries) and
    # silently dropped the whole probe stage to interpreted execution
    # (and instead of chained per-dimension explodes, which re-amplify
    # the carried string through three generates — measured slower).
    span, segs = 2 * k + 1, k + 1
    n_grid = span * segs * span
    g = F.col("_g")
    grid = base.select(
        F.col("_id").alias("id_b"),
        F.col("_s").alias("s_b"),
        "_l",
        F.explode(F.sequence(F.lit(0), F.lit(n_grid - 1))).alias("_g"),
    ).select(
        "id_b", "s_b", "_l",
        (g / (segs * span)).cast("int").alias("_dl_i"),
        ((g / span).cast("int") % segs).alias("_i"),
        (g % span - k).cast("int").alias("_shift"),
    ).withColumn("_dl", F.col("_dl_i") - k).drop("_dl_i")
    part_len = (F.col("_l") + F.col("_dl")).cast("int")
    start, m = _seg_bounds(part_len, F.col("_i"), k)
    p = (start + F.col("_shift")).cast("int")
    valid = (
        (part_len >= k + 1)
        & (m >= 1)
        & (p >= 1)
        & (p + m - 1 <= F.col("_l"))
    )
    probes = (
        grid.filter(valid)
        .select(
            "id_b", "s_b",
            part_len.alias("len_a"),
            F.col("_i").alias("i"),
            F.substr(F.col("s_b"), p, m).alias("seg"),
        )
        .distinct()
    )

    cand = (
        index.join(probes, ["len_a", "i", "seg"])
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_1"),
            F.greatest("id_a", "id_b").alias("id_2"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_a"))
            .otherwise(F.col("s_b")).alias("s_1"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("s_b"))
            .otherwise(F.col("s_a")).alias("s_2"),
        )
        .distinct()
    )

    # short strings (< k+1 chars): the lemma needs a non-empty segment;
    # pair them directly against everything of length <= 2k (the only
    # possible partners) — a bounded side block
    short = base.filter(F.col("_l") <= k)
    near = base.filter(F.col("_l") <= 2 * k)
    short_cand = (
        short.select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"))
        .crossJoin(
            near.select(F.col("_id").alias("id_b"), F.col("_s").alias("s_b"))
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.col("id_a").alias("id_1"), F.col("id_b").alias("id_2"),
            F.col("s_a").alias("s_1"), F.col("s_b").alias("s_2"),
        )
    )

    verified = (
        cand.unionByName(short_cand).distinct()
        .withColumn("dist", F.levenshtein("s_1", "s_2"))
        .filter(F.col("dist") <= k)
        .select("id_1", "id_2", F.col("dist").cast("long").alias("dist"))
    )
    return verified
