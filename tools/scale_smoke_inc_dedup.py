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
    ap.add_argument(
        "--near-dups",
        action="store_true",
        help="run the incremental NEAR-dup rung instead (stored-signature "
        "scan at --n corpus / --batch batch with --planted verbatim copies)",
    )
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

    if args.near_dups:
        _near_dup_rung(spark, n, min(b, 5_000), min(p, 1_000))
        return

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


def _near_dup_rung(spark, n: int, b: int, p: int) -> None:
    """Incremental NEAR-dup at an n-doc corpus: build+store the corpus
    MinHash signature table once, then scan a b-doc batch with p
    planted verbatim corpus copies against the STORED signatures —
    the re-ingest path (seen_signatures) whose corpus cost amortizes.
    Docs are 10 distinct md5 tokens each (token space disjoint across
    docs, so the ONLY >=0.7-Jaccard pairs are the planted copies)."""
    import time as _t

    from pyspark.sql import functions as F

    from vamana_spark.operators.dedup import (
        incremental_near_dups,
        minhash_signatures,
    )

    def mk(lo: int, hi: int, off: int = 0):
        toks = [F.md5((F.col("id") * 10 + j).cast("string")) for j in range(10)]
        return spark.range(lo, hi).select(
            (F.col("id") + off).alias("doc_id"),
            F.concat_ws(" ", *toks).alias("text"),
        )

    corpus = mk(0, n).repartition(64).localCheckpoint()
    # planted copies re-derive the ORIGINAL ids' tokens (id - offset)
    batch = (
        mk(n, n + b - p).unionByName(mk(0, p, 5_000_000)).localCheckpoint()
    )

    t0 = _t.perf_counter()
    sigs = minhash_signatures(corpus).localCheckpoint()
    sigs.count()
    t_sig = _t.perf_counter() - t0

    t0 = _t.perf_counter()
    pairs = incremental_near_dups(
        batch, corpus, threshold=0.7, seen_signatures=sigs
    ).collect()
    t_scan = _t.perf_counter() - t0

    got = {(r.batch_id - 5_000_000, r.seen_id) for r in pairs}
    want = {(i, i) for i in range(p)}
    recall = len(got & want) / len(want)
    assert all(r.jaccard == 1.0 for r in pairs), "planted copies are verbatim"
    print(
        f"near_dups: corpus={n} batch={b} planted={p} "
        f"sig_build={t_sig:.2f}s scan={t_scan:.2f}s "
        f"pairs={len(pairs)} planted_recall={recall:.4f}"
    )
    assert recall == 1.0, (len(got), len(want))


if __name__ == "__main__":
    main()
