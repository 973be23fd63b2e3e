"""Canonical table loaders for the test-data star schema + pipeline tables.

Centralizes the one genuine source-level quirk: ``events.ts`` is Parquet
TIMESTAMP(NANOS), which Spark only reads via
``spark.sql.legacy.parquet.nanosAsLong`` — so the loader converts the
ns-long back to a proper timestamp (microsecond truncation, exact for
µs-precision data). Everything else is a plain columnar Parquet scan that
Catalyst prunes/pushes into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict:
    names = names or TABLE_NAMES
    return {n: load_table(spark, sf_dir, n) for n in names}
