"""Skew mitigation for hot-key joins.

AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on in the
engine session) handles moderate skew by splitting oversized partitions
at shuffle-read time — prefer it. Manual salting remains the tool when a
single key is so hot the *map side* already can't emit it efficiently,
when the skewed side must stay sort-merge (AQE skips splitting under
some required distributions), or when running without AQE. The classic
construction: salt the fact side with a deterministic shard in
[0, salt_factor), replicate the (small) dimension side once per shard,
and join on (key, salt) — the hot key fans out over ``salt_factor``
tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__skew_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    *,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left (fact/skewed) side salted and the right
    (dimension) side replicated ``salt_factor`` times.

    The salt is a deterministic hash of the left row's full column set —
    reruns produce identical task assignment (no ``rand()``, which would
    break retry idempotence in a speculative-execution cluster). The
    replicated right is ``salt_factor`` x its size: keep it to true
    dimension tables (if the right is small enough to broadcast, just
    broadcast — salting is for the mid-size dim / sort-merge regime).

    Supports ``inner`` and ``left`` joins (each left row carries exactly
    one salt and every right row exists under every salt, so multiplicity
    is unchanged). Right/full-outer would need the mirrored construction.

    Output: the same columns a plain ``left.join(right, on, how)`` gives.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(salt_factor)).cast("int")
    lhs = left.withColumn(_SALT, salt)
    rhs = right.withColumn(
        _SALT,
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    return lhs.join(rhs, [*keys, _SALT], how).drop(_SALT)
