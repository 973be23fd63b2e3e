"""1M-corpus incremental-dedup smoke — reproduces the SCALE.md rung.

Synthesizes a 1M-doc corpus and a 100k batch with 20k planted corpus
copies, then times all three tiers (broadcast Bloom, sharded/distributed
filters, sequential hash-range passes) and asserts the survivor set is exactly the 80k fresh docs.

    python tools/scale_smoke_inc_dedup.py [--n 1000000] [--batch 100000]
                                          [--filters 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--planted", type=int, default=20_000)
    ap.add_argument("--filters", type=int, default=32)
    ap.add_argument("--ranges", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from vamana_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_ranged,
        incremental_dedup_sharded,
    )

    def mk(lo: int, hi: int, off: int = 0):
        return spark.range(lo, hi).select(
            (F.col("id") + off).alias("doc_id"),
            F.concat(
                F.lit("document body "),
                F.md5(F.col("id").cast("string")),
                F.lit(" "),
                F.md5((F.col("id") + 1).cast("string")),
            ).alias("text"),
        )

    n, b, p = args.n, args.batch, args.planted
    corpus = mk(0, n).repartition(64).localCheckpoint()
    batch = mk(n, n + b - p).unionByName(mk(0, p, 5_000_000)).localCheckpoint()
    expect = b - p

    for name, fn in [
        ("broadcast", lambda: incremental_dedup(batch, corpus, expected_seen=n)),
        (
            "sharded",
            lambda: incremental_dedup_sharded(
                batch, corpus, expected_seen=n, num_filters=args.filters
            ),
        ),
        (
            "ranged",
            lambda: incremental_dedup_ranged(
                batch, corpus, expected_seen=n, num_ranges=args.ranges
            ),
        ),
    ]:
        t0 = time.perf_counter()
        got = fn().count()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        got2 = fn().count()
        warm = time.perf_counter() - t0
        assert got == got2 == expect, (name, got, got2, expect)
        print(
            f"{name}: survivors={got} (exact), "
            f"cold={cold:.2f}s warm={warm:.2f}s"
        )


if __name__ == "__main__":
    main()
