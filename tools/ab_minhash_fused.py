#!/usr/bin/env python
"""Interleaved same-process A/B for the r15 minhash_near_dups rewrite
(fused text→signature UDF + candidate-only verification) vs the r14
shape (full-corpus shingle localCheckpoint shared by signature and
verify paths). The OLD variant is reconstructed inline from the same
public building blocks it was composed of (shingle_sets + checkpoint,
minhash_lsh_candidates(shingles=...), verify joins on the full shingle
frame), so both variants run alternated in ONE Spark session —
min-of-N per variant is immune to the box's between-run throttle waves
(box-noise protocol).

Also records per-variant Spark job counts (statusTracker) and asserts
the two variants return identical pair counts.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_minhash_fused.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def main() -> int:
    from vamana_spark.operators import dedup
    from vamana_spark.plans import declared as D
    from vamana_spark.session import get_session
    from pyspark.sql import functions as F

    spark = get_session("ab_minhash_fused")
    sc = spark.sparkContext
    docs = D._docs(spark, SF_DIR)

    def old_pairs():
        # pre-r15 composition, verbatim (dedup.py @ b286dc8)
        sh = dedup.shingle_sets(docs, "text", "doc_id", 3).localCheckpoint()
        cands = dedup.minhash_lsh_candidates(
            docs, "text", "doc_id", 64, 16, 3, shingles=sh,
            max_bucket_size=512,
        )
        av = sh.select(F.col("doc_id").alias("a_id"), F.col("_sh").alias("a_sh"))
        bv = sh.select(F.col("doc_id").alias("b_id"), F.col("_sh").alias("b_sh"))
        inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
        return (
            cands.join(av, "a_id")
            .join(bv, "b_id")
            .select(
                "a_id",
                "b_id",
                F.round(inter / F.greatest(union, F.lit(1.0)), 4).alias("jaccard"),
            )
            .where(F.col("jaccard") >= 0.5)
            .orderBy("a_id", "b_id")
        )

    def new_pairs():
        return dedup.minhash_near_dups(docs, threshold=0.5).orderBy(
            "a_id", "b_id"
        )

    def run(fn, label):
        sc.setJobDescription(f"minhash A/B: {label}")
        t0 = time.perf_counter()
        j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        n = fn().count()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        return dt, n

    # warm both once (JIT/codegen), then alternate
    w_old = run(old_pairs, "old warm")
    w_new = run(new_pairs, "new warm")
    assert w_old[1] == w_new[1], f"count mismatch: {w_old[1]} vs {w_new[1]}"
    print(f"warm: old={w_old[0]:.3f}s new={w_new[0]:.3f}s pairs={w_old[1]}")

    olds, news = [], []
    for i in range(REPS):
        olds.append(run(old_pairs, f"old r{i}")[0])
        news.append(run(new_pairs, f"new r{i}")[0])
        print(f"rep {i}: old={olds[-1]:.3f}s new={news[-1]:.3f}s")
    print(
        f"min-of-{REPS}: old={min(olds):.3f}s new={min(news):.3f}s "
        f"speedup={min(olds)/min(news):.3f}x"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
