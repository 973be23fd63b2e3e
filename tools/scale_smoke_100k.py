#!/usr/bin/env python
"""One-off 100k-vector scale checkpoint (4x the bench's 25k block).

Not part of the per-round bench (keeps its runtime bounded); run
manually to refresh the SCALE.md scale-ladder row:

    python tools/scale_smoke_100k.py

Measures, at n=100k / dim=64 on local[32]:
  * sharded broadcast-tier build (the auto-tier route at this size)
  * sustained batch search qps over a 25k-query batch + recall@10
  * partitioned-tier build + flat and PQ serving qps at nprobe=8/32
Prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, NQ = 100_000, 64, 25_000


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import VamanaIndex, VamanaParams, exact, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    path = "/tmp/sf100k/embeddings.parquet"
    if not os.path.exists(path):
        os.makedirs("/tmp/sf100k", exist_ok=True)
        X = np.random.default_rng(42).uniform(-1, 1, (N, DIM)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(N), type=pa.int64()),
                    "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
                }
            ),
            path,
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(path).cache()
    emb.count()
    out: dict = {"n": N, "dim": DIM}

    # ---- sharded broadcast-tier build (same shards-scale-with-n recipe
    # as the 25k bench block: per-shard dense-kernel cost is
    # (n*overlap/shards)^2, so shards grow linearly with n)
    # operating point from the r5 tuning sweep (/tmp/tune100k.txt,
    # recorded in SCALE.md): 96x3 + ef=200 holds recall ~0.91 on
    # uniform-random 64-d data (the adversarial no-cluster case);
    # 256x3 builds ~25% faster but needs ef=400 for the same recall.
    params = VamanaParams(
        dim=DIM, alpha=1.2, R=32, L=64, ef_search=200, seed=42,
        num_shards=96, shard_overlap=3,
    )
    t0 = time.perf_counter()
    idx = VamanaIndex.build(spark, emb, params)
    out["build_sec"] = round(time.perf_counter() - t0, 2)

    allq = emb.where(F.col("vec_id") % 4 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    idx.search(allq.limit(8), k=10).count()  # warm the broadcast
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        idx.search(allq, k=10).count()
        best = min(best, time.perf_counter() - t0)
    out["nq"] = nq
    out["qps_sustained"] = round(nq / best, 1)

    sample = allq.where(F.col("query_id") % 100 == 0)  # 250 queries
    truth = exact.exact_knn_batch(emb, sample, k=10)
    out["recall_at_10"] = round(
        quality.avg_recall(idx.search(sample, k=10), truth, k=10), 4
    )
    idx.release()

    # ---- partitioned serving tier (the beyond-broadcast path)
    pparams = VamanaParams(
        dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42
    )
    t0 = time.perf_counter()
    pidx = PartitionedVamanaIndex.build(
        spark, emb, pparams, num_shards=32, overlap=2
        # 32 shards -> ~6k points/shard: keeps the per-shard dense
        # build O(n^2) cost bounded (16 shards doubled it for nothing)
    )
    pidx.shards_df = pidx.shards_df.cache()
    pidx.shards_df.count()
    pidx._packed_df("flat")
    out["partitioned_build_plus_pack_sec"] = round(time.perf_counter() - t0, 2)

    for mode, key in (("flat", "partitioned"), ("pq", "partitioned_pq")):
        fn = pidx.search if mode == "flat" else pidx.search_pq
        # nprobe=8 == default_nprobe at S=32; PQ uses the library
        # defaults (m=16/rerank=100 since r7 — the m=8 default measured
        # 0.72 here, subspace coarseness, see SCALE.md sweep section)
        kw = {"nprobe": 8}
        fn(allq.limit(8), k=10, **kw).count()  # warm the pack
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(allq, k=10, **kw).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{key}_qps_nprobe8"] = round(nq / best, 1)
        out[f"{key}_recall_at_10_nprobe8"] = round(
            quality.avg_recall(fn(sample, k=10, **kw), truth, k=10), 4
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
