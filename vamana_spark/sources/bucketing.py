"""Bucketed-table utilities — shuffle-free fact-fact joins.

At 100 TB the single most expensive plan node is the shuffle of two fact
tables onto their join key. Bucketing both sides by that key at write
time (`bucketBy` + `sortBy`) lets SortMergeJoin run with NO Exchange:
tasks read co-numbered buckets directly. This module wraps the write and
read so pipelines can opt into the layout; `tests/test_plans.py` asserts
the Exchange actually disappears.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed+sorted managed table (Parquet).

    ``num_buckets`` should match the downstream join's parallelism target;
    both sides of a co-located join must use the SAME bucket count and key.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    w = w.sortBy(*(sort_cols or [bucket_col]))
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the catalog,
    so this MUST go through the table, not the raw files)."""
    return spark.table(table)
