"""Physical-layout helpers.

``spread`` exists because compute-heavy per-row operators (md5 shingling,
vector math) inherit their parallelism from the *scan*: a corpus stored as
a few small files arrives as a few partitions, and a 32-core executor then
grinds the whole operator on one task. At warehouse scale input splits
provide parallelism naturally; ``spread`` guarantees it regardless of file
layout for a trivial shuffle of the narrow input projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Round-robin repartition to the session's default parallelism (or
    ``parallelism``) when the current layout has fewer partitions."""
    sc = df.sparkSession.sparkContext
    target = parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
