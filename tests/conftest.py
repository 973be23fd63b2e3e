import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # r15 (VERDICT r14 #1): the suite used to pin local[8] regardless of
    # the box, leaving 24 of 32 cores idle for the whole 30-47 min run —
    # part of why the driver's verification window expired. Default to
    # every core; SPARK_GRAFT_CPUS still overrides (the bench contract
    # env var), and results are core-count-independent (no test asserts
    # partition counts).
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 8)
    s = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vamana_spark_tests")
        # 8 shuffle partitions regardless of cores: test data is tiny, so
        # per-task scheduling overhead dominates past a few partitions
        # (A/B'd at 32 cores: semantic_dedup subset 193 s @ 8 vs 226 s
        # @ 32); the wide parallelism still pays off across the many
        # CONCURRENT jobs (parity prefetch) and multi-task stages.
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", "12g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from vamana_spark.sources import load_table

    return load_table(spark, sf_dir, "events")
