#!/usr/bin/env python
"""Witness-cap sweep on the borderline 10M rung (r14): the miss
attribution proved the cap — not banding — is the recall lever for
paraphrase-grade near-dups at the threshold edge (91% of audit misses
were cap misses). This tool prices the lever: for each cap it computes
the PREDICTED flag count (== the scan's flag count, proven bit-exact
by the attribution replay: a plant is flagged iff its one true mate
sits in the capped witness list of a shared band — no scan needed) and
the candidate-pair count the verify join would pay. The output is the
measured recall-vs-cost curve for `max_bucket_witnesses`.

    python tools/borderline_cap_sweep.py                # 10M, caps 8..4096
    N_DOCS=200000 CAPS=8,512,2048 python tools/borderline_cap_sweep.py

Reuses the EXACT planted-batch construction of the borderline arm
(scale_smoke_10m_dedup.borderline_batch) and the same witness-capping
recipe the scan applies (min-id per bucket).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_smoke_10m_dedup import (  # noqa: E402
    N_DOCS, _group_sizes, DUP_MASS_FRAC, borderline_batch,
)


def main() -> None:
    from pyspark.sql import SparkSession, Window, functions as F

    from vamana_spark.operators import dedup

    base_dir = f"/tmp/sf10m_dedup_{N_DOCS}"
    doc_path = os.path.join(base_dir, "documents.parquet")
    store = os.path.join(base_dir, "sig_store")
    caps = [int(c) for c in os.environ.get(
        "CAPS", "8,512,1024,2048,4096").split(",")]

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "56g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(doc_path)
    sizes = _group_sizes(int(N_DOCS * DUP_MASS_FRAC))
    n_dup = sum(sizes)
    if not os.path.exists(os.path.join(store, "_meta.json")):
        dedup.save_signatures(docs, store)
    sigs, meta = dedup.load_signatures(spark, store)

    src, batch, n_planted = borderline_batch(spark, docs, sizes, n_dup)
    planted_ids = src.select("doc_id", "_src")

    keys = ["band_id", "band_hash"]
    banded = sigs.select(
        "doc_id",
        F.posexplode(dedup.band_hash_array(
            "minhash", meta["num_hashes"], meta["bands"]
        )).alias(*keys),
    )
    sig_b = dedup.minhash_signatures(
        batch.select("doc_id", "text"), "text", "doc_id",
        meta["num_hashes"], meta["shingle_n"],
    )
    banded_b = F.broadcast(sig_b.select(
        F.col("doc_id").alias("batch_id"),
        F.posexplode(dedup.band_hash_array(
            "minhash", meta["num_hashes"], meta["bands"]
        )).alias(*keys),
    ))

    mates = F.broadcast(planted_ids.select(
        F.col("_src").alias("doc_id")).distinct())
    mate_bands = (
        banded.join(mates, "doc_id", "left_semi")
        .withColumnRenamed("doc_id", "_src")
    )
    pair_map = F.broadcast(planted_ids.select(
        F.col("doc_id").alias("batch_id"), "_src"))
    shared = (
        banded_b.join(pair_map, "batch_id")
        .join(mate_bands, keys + ["_src"], "left_semi")
        .select("batch_id", "_src", *keys)
        .localCheckpoint(eager=True)
    )
    ceiling = shared.select("batch_id").distinct().count()

    def _wit(cap):
        overfull = F.broadcast(
            banded.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_bsz"))
            .where(F.col("_bsz") > cap)
        )
        ann = banded.join(overfull, keys, "left")
        small = ann.where(F.col("_bsz").isNull()).select("doc_id", *keys)
        wov = Window.partitionBy(*keys).orderBy(F.col("doc_id").asc())
        capped = (
            ann.where(F.col("_bsz").isNotNull())
            .withColumn("_wrn", F.row_number().over(wov))
            .where(F.col("_wrn") <= cap)
            .select("doc_id", *keys)
        )
        return small.unionByName(capped).withColumnRenamed(
            "doc_id", "seen_id")

    out = {
        "n_docs": N_DOCS, "planted": int(n_planted),
        "banding_ceiling_flags": ceiling,
        "banding_ceiling_recall": round(ceiling / max(n_planted, 1), 4),
        "caps": {},
    }
    for cap in caps:
        t0 = time.perf_counter()
        wit = _wit(cap)
        flags = (
            shared.join(
                wit.withColumnRenamed("seen_id", "_src"),
                keys + ["_src"], "left_semi",
            )
            .select("batch_id").distinct().count()
        )
        cand_pairs = (
            wit.join(banded_b, keys)
            .select("batch_id", "seen_id").distinct().count()
        )
        out["caps"][str(cap)] = {
            "predicted_flags": flags,
            "planted_recall": round(flags / max(n_planted, 1), 4),
            "cap_missed": ceiling - flags,
            "candidate_pairs": cand_pairs,
            "sweep_sec": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({"cap": cap, **out["caps"][str(cap)]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
