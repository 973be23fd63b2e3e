"""Small physical-plan helpers shared by operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 0.5) -> DataFrame:
    """Round-robin repartition when the input has too few partitions for
    the cluster's cores.

    Small local files arrive as 1 split, serializing CPU-heavy derivations
    (shingling, hashing) onto one core. On a real cluster a 100-TB table
    already has thousands of splits and this is a no-op — the check costs
    one plan inspection, no job.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, int(target * min_factor)):
        return df.repartition(target)
    return df
