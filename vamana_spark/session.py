"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "vamana_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Local-mode tuned session. On a real cluster the master/memory knobs
    come from spark-submit; only the SQL confs below matter there.

    - AQE on: runtime coalescing + skew-join splitting.
    - shuffle.partitions sized to cores in local mode (not the 200
      default, which makes 32-core local runs pay 6x task overhead).
    - ``nanosAsLong``: the events table stores TIMESTAMP(NANOS), which
      vanilla Spark refuses; we read ns-as-long and convert on load
      (sources.tables.load_table).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or cpus)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", driver_memory or "16g")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    return s
