#!/usr/bin/env python
"""Measure the recall-vs-knob curves the serving defaults are derived
from (VERDICT r6 #1/#3): at the bench's 25k shape (8 shards x overlap
2, uniform 64-d — the adversarial no-cluster case),

  * flat search recall/qps at nprobe = 2..S  — the default nprobe must
    clear the 0.8 gate with >=0.05 margin, not sit on its edge;
  * PQ search recall/qps over (pq_m, rerank) — the rerank default must
    put the true neighbors inside the exact-re-ranked shortlist.

Usage:  python tools/sweep_operating_points.py
Prints one JSON object; the chosen defaults live in
``index/partitioned.py`` (``default_nprobe``, ``search_pq`` rerank).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import VamanaParams, exact, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

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
    params = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    pidx = PartitionedVamanaIndex.build(spark, emb, params, num_shards=8, overlap=2)
    pidx.shards_df = pidx.shards_df.cache()
    pidx.shards_df.count()

    q = emb.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    allq = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    n_all = allq.count()
    truth = exact.exact_knn_batch(emb, q, k=10).cache()
    truth.count()

    out: dict = {"n": 25_000, "num_shards": 8, "overlap": 2}

    pidx.search(allq.limit(5), k=10).count()  # warm flat pack
    out["flat_nprobe"] = {}
    for nprobe in (2, 3, 4, 8):
        rec = round(
            quality.avg_recall(pidx.search(q, k=10, nprobe=nprobe), truth, k=10), 4
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pidx.search(allq, k=10, nprobe=nprobe).count()
            best = min(best, time.perf_counter() - t0)
        out["flat_nprobe"][nprobe] = {
            "recall_at_10": rec,
            "qps_sustained": round(n_all / best, 1),
        }
        print(json.dumps({"nprobe": nprobe, **out["flat_nprobe"][nprobe]}), flush=True)

    out["pq"] = {}
    for m in (8, 16):
        for rerank in (40, 100, 250, 500):
            pidx.search_pq(allq.limit(5), k=10, pq_m=m, rerank=rerank).count()
            rec = round(
                quality.avg_recall(
                    pidx.search_pq(q, k=10, pq_m=m, rerank=rerank, nprobe=3),
                    truth,
                    k=10,
                ),
                4,
            )
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                pidx.search_pq(allq, k=10, pq_m=m, rerank=rerank, nprobe=3).count()
                best = min(best, time.perf_counter() - t0)
            out["pq"][f"m{m}_rerank{rerank}"] = {
                "recall_at_10": rec,
                "qps_sustained": round(n_all / best, 1),
            }
            print(
                json.dumps({"m": m, "rerank": rerank, **out["pq"][f"m{m}_rerank{rerank}"]}),
                flush=True,
            )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
