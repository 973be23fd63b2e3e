#!/usr/bin/env python
"""Interleaved same-process A/B for connected_components' barrier
cadence (r15, VERDICT r14 #7): check_every=1 (the old per-round
localCheckpoint + convergence count) vs check_every=2 (span cadence).

Graph: path graphs (chains) of length CHAIN over N nodes — diameter
CHAIN-1, so pointer jumping needs ~log2(CHAIN) rounds; this is the
large-diameter regime the cadence exists for (LSH near-cliques
converge in 2-3 rounds and barely feel it). Asserts both cadences
return the IDENTICAL (node, component) set, reports wall seconds and
Spark job counts per variant, alternated old/new, min-of-N.

    python tools/ab_cc_cadence.py [reps] [n_nodes] [chain_len]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
N = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
CHAIN = int(sys.argv[3]) if len(sys.argv) > 3 else 64


def main() -> int:
    from pyspark.sql import functions as F

    from vamana_spark.operators.dedup import connected_components
    from vamana_spark.session import get_session

    spark = get_session("ab_cc_cadence")
    sc = spark.sparkContext
    # chains: node i -- i+1 unless i+1 starts a new chain
    pairs = (
        spark.range(N - 1)
        .where((F.col("id") + 1) % CHAIN != 0)
        .select(F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"))
        .cache()
    )
    pairs.count()

    def run(cadence: int):
        st = sc.statusTracker()
        j0 = len(st.getJobIdsForGroup(None) or [])
        sc.setJobDescription(f"cc cadence={cadence}")
        t0 = time.perf_counter()
        cc = connected_components(pairs, check_every=cadence)
        # order-insensitive content hash of the full labeling
        h = cc.select(
            F.sum(F.xxhash64("node", "component").cast("decimal(38,0)")).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        dt = time.perf_counter() - t0
        j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        sc.setJobDescription(None)
        return dt, (h["h"], h["n"]), j1 - j0

    w1, h1, jobs1 = run(1)
    w2, h2, jobs2 = run(2)
    assert h1 == h2, f"labelings differ: {h1} vs {h2}"
    print(f"warm: cad1={w1:.2f}s ({jobs1} jobs) cad2={w2:.2f}s ({jobs2} jobs)")
    t1s, t2s = [], []
    for i in range(REPS):
        a, ha, _ = run(1)
        b, hb, _ = run(2)
        assert ha == h1 and hb == h1
        t1s.append(a)
        t2s.append(b)
        print(f"rep {i}: cad1={a:.2f}s cad2={b:.2f}s")
    print(
        f"min-of-{REPS}: cad1={min(t1s):.2f}s cad2={min(t2s):.2f}s "
        f"speedup={min(t1s)/min(t2s):.3f}x jobs {jobs1}->{jobs2}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
