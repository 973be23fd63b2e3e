#!/usr/bin/env python
"""One side of the 25k sustained-qps code-vs-box A/B (VERDICT r14 #3).

Replicates the dense part of bench.py's `_scale_25k_block` verbatim
(same /tmp/sf25k fixture, same VamanaParams incl. 64 shards x overlap
3, same warm + best-of-N full-batch search) against whatever code tree
``VSP_CODE_ROOT`` points at, and prints one JSON line. Drive it
interleaved from a shell loop (HEAD, d627686 worktree, HEAD, ...) so
box throttle waves cannot land on only one side; adjudicate on
min-of-N per side. A fixed 1536^2 gemm probe runs before and after as
the box-state marker (box-noise protocol).

    python tools/ab_25k_sustained.py [reps]
    VSP_CODE_ROOT=/tmp/r13_worktree python tools/ab_25k_sustained.py
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CODE = os.environ.get("VSP_CODE_ROOT", _REPO)
sys.path.insert(0, CODE)

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _gemm_probe() -> float:
    import numpy as np

    a = np.random.default_rng(0).standard_normal((1536, 1536), dtype=np.float32)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a @ a
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from vamana_spark import VamanaIndex, VamanaParams
    from vamana_spark.session import get_session

    g0 = _gemm_probe()
    spark = get_session("ab_25k_sustained")

    path = "/tmp/sf25k/embeddings.parquet"
    if not os.path.exists(path):
        os.makedirs("/tmp/sf25k", exist_ok=True)
        X = np.random.default_rng(42).uniform(-1, 1, (25_000, 64)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(25_000), type=pa.int64()),
                    "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
                    "label": pa.array([0] * 25_000, type=pa.int32()),
                }
            ),
            path,
        )
    emb = spark.read.parquet(path).cache()
    emb.count()
    params = VamanaParams(
        dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42,
        num_shards=64, shard_overlap=3,
    )
    t0 = time.perf_counter()
    idx = VamanaIndex.build(spark, emb, params)
    build_sec = round(time.perf_counter() - t0, 3)

    q = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    q.count()
    idx.search(q.limit(5), k=10).count()  # warm broadcast (same as bench)
    allq = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    n_all = allq.count()
    secs = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        idx.search(allq, k=10).count()
        secs.append(round(time.perf_counter() - t0, 3))
    g1 = _gemm_probe()
    print("AB25K:" + json.dumps({
        "code": CODE,
        "gemm_before": g0,
        "gemm_after": g1,
        "build_sec": build_sec,
        "search_secs": secs,
        "best_qps": round(n_all / min(secs), 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
