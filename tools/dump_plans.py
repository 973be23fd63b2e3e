#!/usr/bin/env python
"""Dump .explain("formatted") physical plans for the bench-visible query
paths to a directory (r14 optimization evidence: plans/r14/<name>_{before,after}.txt).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/dump_plans.py \
        plans/r14 before [name ...]

Only plan construction happens for declared queries (no actions); the
index-backed paths (ann/partitioned/pq searches) need a built index, so
they run a bounded build first. Pass names to restrict the dump.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r14"
    tag = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from vamana_spark import VamanaIndex, VamanaParams, exact
    from vamana_spark.plans import declared as D
    from vamana_spark.session import get_session

    spark = get_session("vamana_spark_plandump")

    # --- declared queries used by the bench query mix (plan-only) ---
    declared = {
        "minhash_near_dups": lambda: D.q_minhash_pairs(spark, SF_DIR),
        "exact_dedup": lambda: D.q_dedup_exact(spark, SF_DIR),
        "incremental_dedup": lambda: D.q_incremental_dedup(spark, SF_DIR),
        "text_stats": lambda: D.q_text_stats(spark, SF_DIR),
        "events_hourly": lambda: D.q_events_hourly(spark, SF_DIR),
        "sessionize": lambda: D.q_session_stats(spark, SF_DIR),
        "tpch_pricing": lambda: D.q_tpch_pricing(spark, SF_DIR),
        "tpch_join_agg": lambda: D.q_tpch_join_agg(spark, SF_DIR),
        "top_customers": lambda: D.q_top_customers(spark, SF_DIR),
        "range_search": lambda: D.q_range_search(spark, SF_DIR),
        "filtered_knn": lambda: D.q_filtered_knn(spark, SF_DIR),
        "token_chunks": lambda: D.q_token_chunks(spark, SF_DIR),
        "funnel": lambda: D.q_funnel(spark, SF_DIR),
    }

    def dump(name, df):
        if only and name not in only:
            return
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(_explain_str(df))
        print("wrote", path)

    for name, fn in declared.items():
        if only and name not in only:
            continue
        try:
            dump(name, fn())
        except Exception as e:
            print(f"SKIP {name}: {type(e).__name__}: {e}")

    # --- bench-only composed pipelines (plan-only) ---
    if not only or {"quality_pipeline", "dsir_sample", "pq_knn", "knn_exact",
                    "knn_batch"} & only:
        from vamana_spark.operators import dedup as DD, quantization as qz
        from vamana_spark.operators import text as T
        from vamana_spark.operators.sampling import dsir_sample
        from vamana_spark.plans.declared import _docs

        docs = _docs(spark, SF_DIR)
        gated = (
            T.gopher_quality_filter(docs)
            .where((F.col("n_words") >= 10) & (F.col("alpha_word_frac") > 0.5))
            .select("doc_id")
        )
        kept = docs.join(gated, "doc_id").select("doc_id", "text")
        try:
            dump("quality_pipeline", DD.dedup_lines(T.pii_scrub(kept)))
        except Exception as e:
            print("SKIP quality_pipeline:", e)
        try:
            dump(
                "dsir_sample",
                dsir_sample(_docs(spark, SF_DIR), F.col("lang") == "en",
                            n=500, seed=7),
            )
        except Exception as e:
            print("SKIP dsir_sample:", e)

        emb = D._emb(spark, SF_DIR)
        queries = D._fixed_queries(emb, 25)
        try:
            dump("knn_exact", exact.exact_knn(emb, queries, k=10))
            dump("knn_batch", exact.exact_knn_batch(emb, queries, k=10))
        except Exception as e:
            print("SKIP knn:", e)
        try:
            cb = qz.pq_train(emb, 64, m=8, ksub=64, seed=42)
            codes = qz.pq_encode(emb, cb)
            dump(
                "pq_knn",
                qz.pq_search(codes, cb, queries, k=10, shortlist=100,
                             points=emb),
            )
        except Exception as e:
            print("SKIP pq_knn:", e)

    # --- index-backed search paths (need a build; bounded at sf scale) ---
    if not only or {"ann_search", "partitioned_search",
                    "partitioned_pq_search"} & only:
        emb = D._emb(spark, SF_DIR).cache()
        emb.count()
        allq = emb.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        params = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100,
                              seed=42)
        try:
            idx = VamanaIndex.build(spark, emb, params)
            dump("ann_search", idx.search(allq, k=10))
            idx.release()
        except Exception as e:
            print("SKIP ann_search:", e)
        try:
            from vamana_spark.index.partitioned import PartitionedVamanaIndex

            pidx = PartitionedVamanaIndex.build(spark, emb, params,
                                                num_shards=8)
            dump("partitioned_search", pidx.search(allq, k=10))
            dump("partitioned_pq_search", pidx.search_pq(allq, k=10))
        except Exception as e:
            print("SKIP partitioned:", e)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
