"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os
import threading

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
    # SPARK_GRAFT_DRIVER_MEM lets CLI invocations (whose JVM starts
    # inside get_session — no spark-submit to set it) size the local
    # driver for 10M+ corpora; explicit argument still wins
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM")
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
    _ship_package(s)
    return s


_SHIPPED_APPS: set = set()
_SHIP_LOCK = threading.Lock()


def _ship_package(spark: SparkSession) -> None:
    """Make ``vamana_spark`` importable on Python workers regardless of
    the driver's cwd: zip the installed package and addPyFile it
    (idempotent per application, thread-safe: a concurrent first call —
    e.g. sessions obtained from a driver thread pool, guide §2.6 —
    used to race the zip write + addPyFile into an 'exists and does
    not match contents' failure). Without this, any mapInPandas
    closure defined inside the package fails to unpickle on workers
    when the driver runs from a foreign directory."""
    app = spark.sparkContext.applicationId
    if app in _SHIPPED_APPS:
        return
    with _SHIP_LOCK:
        if app in _SHIPPED_APPS:
            return
        import shutil
        import tempfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        tmp = tempfile.mkdtemp(prefix="vamana_spark_pyfiles_")
        base = os.path.join(tmp, "vamana_spark_pkg")
        shutil.make_archive(
            base, "zip", root_dir=os.path.dirname(pkg_dir), base_dir="vamana_spark"
        )
        spark.sparkContext.addPyFile(base + ".zip")
        _SHIPPED_APPS.add(app)
