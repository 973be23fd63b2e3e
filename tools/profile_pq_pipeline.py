#!/usr/bin/env python
"""Stage-level wall profile of the PQ serving path at the bench shape
(VERDICT r5 #6 follow-up): where do `partitioned_pq_search`'s seconds
go — the ADC kernel, the candidate merge windows, or the exact-re-rank
joins?  Times cumulative plan prefixes at the exact bench operating
point (sf0.1: n=2000, 8 shards x overlap 2, 16k-query sustained load,
k=10) so the deltas attribute cost per stage.

Usage:  python tools/profile_pq_pipeline.py
Prints one JSON object of best-of-3 wall seconds per prefix.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best_of(fn, reps=3):
    b = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return round(b, 3)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F, Window

    from vamana_spark import VamanaParams
    from vamana_spark.functions.vector import pairwise_distance
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    emb.count()
    params = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    pidx = PartitionedVamanaIndex.build(spark, emb, params, num_shards=8)
    pidx.shards_df = pidx.shards_df.cache()

    allq = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    big = allq
    for i in range(1, 8):
        big = big.unionByName(
            allq.withColumn("query_id", F.col("query_id") + F.lit(i * 1_000_000))
        )
    big = big.cache()
    n_big = big.count()

    # warm packs + python workers
    pidx.search_pq(big.limit(5), k=10).count()
    pidx.search(big.limit(5), k=10).count()

    out = {"n_queries": n_big, "sf_dir": sf_dir}

    # ---- full paths for reference
    out["flat_full"] = best_of(lambda: pidx.search(big, k=10).count())
    out["pq_full"] = best_of(lambda: pidx.search_pq(big, k=10).count())

    # ---- cumulative prefixes of the PQ plan (mirrors search_pq internals)
    k, kprime, nprobe = 10, 40, 8
    pk = max(k, min(kprime, 2 * -(-kprime // nprobe)))
    packed = pidx._packed_df("pq", 8, 256)
    routed = pidx._route(big, nprobe, "query_id", "query_vec")
    out["route_only"] = best_of(lambda: routed.count())

    import io

    import numpy as np
    import pandas as pd

    from vamana_spark.index import kernels

    def search_shard(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"query_id": [], "vec_id": [], "dist": []})
        z = np.load(io.BytesIO(left["blob"].iloc[0]))
        codes, cents, ids = z["codes"], z["cents"], z["ids"]
        Q = np.stack(right["qv"].to_numpy()).astype(np.float64)
        qids = right["query_id"].to_numpy(dtype=np.int64)
        rq, rid, rd = kernels.brute_topk_batch_adc(codes, cents, Q, pk)
        return pd.DataFrame({"query_id": qids[rq], "vec_id": ids[rid], "dist": rd})

    cg = pidx._cogrouped_partial(packed, routed, search_shard, 8)
    out["cogroup_kernel"] = best_of(lambda: cg.count())

    dd = pidx._dedupe_overlap(cg)
    out["plus_dedupe"] = best_of(lambda: dd.count())

    wadc = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    sl = dd.withColumn("_r", F.row_number().over(wadc)).where(F.col("_r") <= kprime).drop("_r")
    out["plus_shortlist"] = best_of(lambda: sl.count())

    p = pidx.shards_df.select("vec_id", F.col("embedding").alias("_pv"))
    cand = sl.drop("dist").join(p, "vec_id").dropDuplicates(["query_id", "vec_id"])
    out["plus_vec_join"] = best_of(lambda: cand.count())

    q = big.select("query_id", F.col("query_vec").alias("_qv"))
    exactd = cand.join(q, "query_id").select(
        "query_id", "vec_id", pairwise_distance("_qv", "_pv", "l2sq").alias("dist")
    )
    out["plus_exact_dist"] = best_of(lambda: exactd.count())

    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    final = (
        exactd.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "dist", "rank")
    )
    out["plus_final_window"] = best_of(lambda: final.count())

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
