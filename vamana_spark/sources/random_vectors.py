"""Deterministic random-vector generator source.

Reference parity: the reference ships a uniform random vector generator
used by its test drivers (generate_random_vectors, vamana.h:46-63 and
the Go fixture path). Here it is a *source*: a lazily-evaluated
DataFrame of seeded vectors, generated JVM-side from ``spark.range`` —
no driver materialization, no Python in the hot path, partitioned like
any other range scan, so a 10^9-row generate is just a bigger range.

Randomness is the engine-portable md5 scheme used across the repo
(sampling.py, declared.py): component (seed, vec_id, i) hashes to
md5 hex, the first 8 hex digits give an exact-in-double 32-bit uniform,
mapped to [-1, 1). Any engine that can md5 reproduces the values
bit-for-bit, which makes the generator itself oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def random_vectors(
    spark: SparkSession,
    n: int,
    dim: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """(vec_id, embedding array<float>): n seeded uniform vectors in
    [-1, 1)^dim. Deterministic in (n, dim, seed) and independent of
    partitioning."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    ids = rng.select(F.col("id").alias("vec_id"))

    def comp(i):
        h = F.md5(F.concat_ws(":", F.lit(seed), F.col("vec_id"), i))
        u = (
            F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            + F.lit(0.5)
        ) / F.lit(float(16**8))
        return (u * 2.0 - 1.0).cast("float")

    return ids.withColumn(
        "embedding",
        F.transform(F.sequence(F.lit(0), F.lit(dim - 1)), comp),
    )
