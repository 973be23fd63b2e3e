"""Size-targeted parquet sink — the small-files / giant-files guard.

At 100 TB the default writer inherits whatever partitioning the last
shuffle left: thousands of KB-sized files (metadata pressure on every
downstream scan and on the object store) or a handful of multi-GB
files (giant tasks, no read parallelism). ``write_parquet_sized``
aims each output file at a byte target instead: estimate bytes/row
from a sampled JSON-serialized width, derate by an assumed parquet
compression ratio, round-robin ``repartition`` to the implied file
count, and cap stragglers with ``maxRecordsPerFile``.

The estimate is deliberately cheap (one sampled aggregate, no probe
write); compression ratios vary ~2-5× by content, so treat the target
as a band, not a contract — exactly how production compaction jobs
size their outputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def estimate_row_bytes(
    df: DataFrame, sample_rows: int = 10_000, compression_ratio: float = 3.0
) -> float:
    """Approximate on-disk parquet bytes per row: mean JSON-serialized
    width of a head sample, derated by ``compression_ratio``. JSON
    over-counts numerics and under-counts dictionary-encodable strings;
    the derate is calibrated for mixed text/numeric rows (parquet+snappy
    typically lands 2-5x under the JSON width)."""
    row = (
        df.limit(int(sample_rows))
        .select(
            F.avg(F.length(F.to_json(F.struct(*df.columns)))).alias("b")
        )
        .first()
    )
    raw = float(row["b"] or 64.0)
    return max(raw / float(compression_ratio), 1.0)


def _count_part_files(spark, path: str) -> int:
    """Actual data files written under ``path`` (recursive, Hadoop FS —
    works for local paths and object stores alike)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return 0  # first write to a fresh path (pre-count under append)
    it = fs.listFiles(p, True)
    n = 0
    while it.hasNext():
        name = it.next().getPath().getName()
        if name.startswith("part-"):
            n += 1
    return n


def write_parquet_sized(
    df: DataFrame,
    path: str,
    target_file_mb: float = 128.0,
    partition_by: tuple = (),
    mode: str = "overwrite",
    sample_rows: int = 10_000,
    compression_ratio: float = 3.0,
    materialize: bool = True,
) -> dict:
    """Write ``df`` as parquet with files sized near ``target_file_mb``.

    Plain layout: round-robin ``repartition(n_files)`` gives evenly
    sized files (hash-free — no skew possible). Hive layout
    (``partition_by``): rows cluster by the partition columns so each
    task writes few directories, and ``maxRecordsPerFile`` caps any
    hot partition's files at the target size (the skewed-partition
    guard — a task that received a whale partition still emits
    size-bounded files).

    ``materialize`` (default on): ``localCheckpoint`` the input first,
    so the row-count probe and the write share ONE computation of the
    lineage instead of running it twice (r5 ADVICE — the compaction
    target is exactly the expensive-lineage case). Costs one
    executor-local copy of the data; pass ``materialize=False`` for
    inputs that are already cheap rescans (a plain parquet read).

    Returns {rows, est_row_bytes, n_files, rows_per_file} — ``n_files``
    counts the part-files actually written (both layouts), not the
    planned figure (r5 ADVICE: the plan formula was wrong for the hive
    layout).
    """
    spark = df.sparkSession
    # snapshot pre-existing files so n_files reports THIS write's output
    # even under mode='append' (cumulative counts misled compaction
    # verification)
    pre_files = _count_part_files(spark, path) if mode == "append" else 0
    if materialize:
        df = df.localCheckpoint()
    rows = df.count()
    est = estimate_row_bytes(df, sample_rows, compression_ratio)
    target_bytes = max(float(target_file_mb) * (1 << 20), 1.0)
    rows_per_file = max(int(target_bytes / est), 1)
    n_files = max(1, math.ceil(rows / rows_per_file)) if rows else 1

    writer = df
    if partition_by:
        writer = writer.repartition(*[F.col(c) for c in partition_by])
        out = (
            writer.write.mode(mode)
            .option("maxRecordsPerFile", rows_per_file)
            .partitionBy(*partition_by)
        )
    else:
        writer = writer.repartition(n_files)
        out = writer.write.mode(mode).option(
            "maxRecordsPerFile", rows_per_file
        )
    out.parquet(path)
    return {
        "rows": rows,
        "est_row_bytes": round(est, 1),
        "n_files": _count_part_files(spark, path) - pre_files,
        "rows_per_file": rows_per_file,
    }
