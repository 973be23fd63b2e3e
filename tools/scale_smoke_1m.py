#!/usr/bin/env python
"""One-off 1M-vector scale checkpoint — the first ladder rung where the
broadcast ceiling and shard stitching genuinely bind (VERDICT r5 #7).

Not part of the per-round bench (runtime ~tens of minutes); run
manually to refresh the SCALE.md ladder row:

    python tools/scale_smoke_1m.py

The CLUSTERED rung (r8 — measures the SCALE.md claim that clustered
corpora reach uniform-rung recall at a fraction of the probes, and
that center-sharding co-locates each cluster's points):

    CLUSTERED=256 ONLY_PARTITIONED=1 NPROBE_SWEEP=64,32,16,8 \\
        python tools/scale_smoke_1m.py

The MAINTENANCE rung (r9 — FreshDiskANN-style cycle: build 1M, add 5%,
delete 5%, consolidate the pack; wall-times + touched-shard counts +
serving-recall drift vs a fresh build on the same final membership):

    MAINTENANCE=1 python tools/scale_smoke_1m.py

Measures, at n=1M / dim=64 on local[32]:
  * sharded broadcast-tier build — default 480 shards x overlap 3 with
    R=64/L=128, the operating point the r6 sweep landed on (extending
    the 100k per-shard recipe to 960x3 R=32 builds 2.8x faster but
    recall at ef=200 collapses to 0.62 — shard size and degree must
    both grow with n on uniform data; see SCALE.md). The packed index
    is ~0.75 GB, approaching the 2 GiB broadcast guard honestly rather
    than synthetically. NUM_SHARDS/OVERLAP/GRAPH_R/GRAPH_L/EF_SWEEP
    env vars re-run any other frontier point.
  * sustained batch search qps over a 25k-query batch + recall@10
    against exact ground truth on a 250-query sample, per swept ef
  * partitioned-tier build (256 shards x overlap 2 — ~7.8k rows/shard
    keeps each dense kernel's n^2 scratch at ~250 MB so 32 concurrent
    Python workers stay within the box) + flat and PQ serving at
    nprobe=64/256 (the same 1/4 probe fraction as the 100k rung)
Prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, NQ_MOD = 1_000_000, 64, 40  # vec_id % 40 == 0 -> 25k queries


def _gen(path: str, blobs: int = 0) -> None:
    """Uniform [-1,1]^64 by default; ``blobs`` > 0 writes a k-blob
    Gaussian-mixture corpus instead (centers uniform in [-1,1]^64,
    per-component sigma 0.15 — inter-center distance ~6.5 at dim=64,
    so blobs are well separated; blob membership is i % blobs, so it
    interleaves with vec_id and every shard-assignment pattern is
    data-driven, not id-driven)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(42)
    centers = (
        rng.uniform(-1, 1, (blobs, DIM)).astype(np.float32) if blobs else None
    )
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    chunk = 100_000
    with pq.ParquetWriter(path, schema) as w:
        for lo in range(0, N, chunk):
            if blobs:
                which = (np.arange(lo, lo + chunk) % blobs).astype(np.int64)
                X = (
                    centers[which]
                    + rng.normal(0.0, 0.15, (chunk, DIM)).astype(np.float32)
                ).astype(np.float32)
            else:
                X = rng.uniform(-1, 1, (chunk, DIM)).astype(np.float32)
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(range(lo, lo + chunk), type=pa.int64()),
                        "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
                    },
                    schema=schema,
                )
            )


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import VamanaIndex, VamanaParams, exact, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    blobs = int(os.environ.get("CLUSTERED", "0"))  # k-blob corpus rung
    path = (
        f"/tmp/sf1m_blob{blobs}/embeddings.parquet"
        if blobs
        else "/tmp/sf1m/embeddings.parquet"
    )
    if not os.path.exists(path):
        _gen(path, blobs=blobs)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "64g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(path).cache()
    emb.count()
    out: dict = {"n": N, "dim": DIM}

    if os.environ.get("MAINTENANCE"):
        # FreshDiskANN-style maintenance cycle rung (VERDICT r8 #4):
        #     MAINTENANCE=1 python tools/scale_smoke_1m.py
        # Clustered variant (r9 — the LOCALIZED-delta shape where
        # shard-local maintenance actually pays, plus a measured
        # resplit_oversized consolidation):
        #     MAINTENANCE=1 CLUSTERED=256 python tools/scale_smoke_1m.py
        if blobs:
            _clustered_maintenance_rung(spark, emb, out, blobs)
        else:
            _maintenance_rung(spark, emb, out)
        print(json.dumps(out))
        return

    if os.environ.get("ONLY_PARTITIONED"):
        # partitioned-tier-only rerun (e.g. PQ operating-point sweeps):
        # skip the ~7 min sharded-broadcast build + ef sweep
        allq = emb.where(F.col("vec_id") % NQ_MOD == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        ).cache()
        out["nq"] = allq.count()
        sample = allq.where(F.col("query_id") % 4000 == 0)
        truth = exact.exact_knn_batch(emb, sample, k=10).cache()
        truth.count()
        _partitioned_block(spark, emb, allq, sample, truth, out)
        print(json.dumps(out))
        return

    # ---- sharded broadcast-tier build: shards scale linearly with n so
    # the per-shard dense-kernel point stays at the 100k-validated
    # ~3.1k rows (96x3 at 100k -> 960x3 at 1M), ef=200 for recall ~0.9
    # defaults = the recorded SCALE.md 1M operating point (480x3 R=64;
    # the r6 sweep showed shard size AND degree must grow with n —
    # 960x3 R=32 builds 2.8x faster but recall at ef=200 is 0.62)
    n_shards = int(os.environ.get("NUM_SHARDS", "480"))
    overlap = int(os.environ.get("OVERLAP", "3"))
    R = int(os.environ.get("GRAPH_R", "64"))
    L = int(os.environ.get("GRAPH_L", str(2 * R)))
    out["num_shards"], out["shard_overlap"] = n_shards, overlap
    out["R"], out["L"] = R, L
    params = VamanaParams(
        dim=DIM, alpha=1.2, R=R, L=L, ef_search=200, seed=42,
        num_shards=n_shards, shard_overlap=overlap,
    )
    t0 = time.perf_counter()
    idx = VamanaIndex.build(spark, emb, params)
    out["build_sec"] = round(time.perf_counter() - t0, 2)

    allq = emb.where(F.col("vec_id") % NQ_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    out["nq"] = nq
    idx.search(allq.limit(8), k=10).count()  # warm the broadcast
    sample = allq.where(F.col("query_id") % 4000 == 0)  # 250 queries
    truth = exact.exact_knn_batch(emb, sample, k=10).cache()
    truth.count()
    # ef is a pure search-time knob on the fixed stitched graph: the
    # first 1M run showed the 100k trend continuing (recall at ef=200
    # sags to 0.62 when per-shard coverage drops to 1/960 of a uniform
    # cloud), so sweep the beam to map the recall/qps frontier and
    # record the operating point that clears 0.8.
    efs = [int(x) for x in os.environ.get("EF_SWEEP", "200,400,800").split(",")]
    out["ef_sweep"] = {}
    for ef in efs:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            idx.search(allq, k=10, ef_search=ef).count()
            best = min(best, time.perf_counter() - t0)
        rec = round(
            quality.avg_recall(idx.search(sample, k=10, ef_search=ef), truth, k=10),
            4,
        )
        out["ef_sweep"][ef] = {"qps_sustained": round(nq / best, 1), "recall_at_10": rec}
        print(json.dumps({"ef": ef, **out["ef_sweep"][ef]}), flush=True)
    out["qps_sustained"] = out["ef_sweep"][efs[0]]["qps_sustained"]
    out["recall_at_10"] = out["ef_sweep"][efs[0]]["recall_at_10"]
    idx.release()

    if os.environ.get("SKIP_PARTITIONED"):
        print(json.dumps(out))
        return
    sample = allq.where(F.col("query_id") % 4000 == 0)
    _partitioned_block(spark, emb, allq, sample, truth, out)
    print(json.dumps(out))


def _partitioned_block(spark, emb, allq, sample, truth, out: dict) -> None:
    """Partitioned serving tier (the beyond-broadcast path): build +
    flat and PQ serving at nprobe=64/256 (= default_nprobe at S=256).
    PQ_SWEEP env ("m,rerank;m,rerank") measures extra PQ operating
    points; the default point is m=16/rerank=100 (the r7 sweep at 25k
    showed m=8's 8-dim subspaces quantize too coarsely at dim=64 —
    recall 0.68 here at 1M — while m=16 rides the nprobe ceiling)."""
    from pyspark.sql import functions as F

    from vamana_spark import VamanaParams, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    nq = allq.count()
    pparams = VamanaParams(
        dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42
    )
    # PGRAPH=0 forces the IVF-flat (graph-free) build — on clustered
    # corpora the split sub-shards sit just past the graph crossover
    # and their dense kernels dominate the build for no recall benefit
    # (routing already delivers ~0.999)
    graph = False if os.environ.get("PGRAPH") == "0" else None
    out["pgraph"] = "off" if graph is False else "auto"
    t0 = time.perf_counter()
    pidx = PartitionedVamanaIndex.build(
        spark, emb, pparams, num_shards=256, overlap=2, graph=graph
    )
    pidx.shards_df = pidx.shards_df.cache()
    pidx.shards_df.count()
    pidx._packed_df("flat")
    out["partitioned_build_plus_pack_sec"] = round(time.perf_counter() - t0, 2)
    if os.environ.get("CALIBRATE"):
        # r9: measure the serving defaults from the data and serve at
        # them — calibrated nprobe + profile-chosen pq_m
        t0 = time.perf_counter()
        out["calibrated_nprobe"] = pidx.calibrate_nprobe()
        out["calibrate_nprobe_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        out["pq_profile"] = pidx.pq_profile()
        out["pq_profile_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "calibrated_nprobe": out["calibrated_nprobe"],
            "calibrate_nprobe_sec": out["calibrate_nprobe_sec"],
            "pq_profile": out["pq_profile"],
            "pq_profile_sec": out["pq_profile_sec"],
        }), flush=True)
    out["default_nprobe"] = pidx.default_nprobe

    def measure(key, fn, nprobe, **kw):
        fn(allq.limit(8), k=10, nprobe=nprobe, **kw).count()  # warm the pack
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(allq, k=10, nprobe=nprobe, **kw).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{key}_qps_nprobe{nprobe}"] = round(nq / best, 1)
        out[f"{key}_recall_at_10_nprobe{nprobe}"] = round(
            quality.avg_recall(
                fn(sample, k=10, nprobe=nprobe, **kw), truth, k=10
            ),
            4,
        )
        print(json.dumps({key: {
            "nprobe": nprobe,
            "qps": out[f"{key}_qps_nprobe{nprobe}"],
            "recall": out[f"{key}_recall_at_10_nprobe{nprobe}"],
        }}), flush=True)

    # NPROBE_SWEEP maps the probe-fraction frontier (the clustered rung
    # runs "64,32,16,8" to test SCALE.md's claim that clustered corpora
    # reach uniform-rung recall at a fraction of the probes). Default:
    # the index's own default_nprobe — the calibrated value when
    # CALIBRATE ran, else the S/4 floor (=64 at S=256).
    nprobes = [
        int(x)
        for x in os.environ.get(
            "NPROBE_SWEEP", str(pidx.default_nprobe)
        ).split(",")
    ]
    # None lets the pq_profile decide the codebook strategy (r9);
    # PER_SHARD_CB=1 forces the pre-r8 per-shard fits
    per_shard_cb = True if os.environ.get("PER_SHARD_CB") else None
    out["pq_per_shard_codebooks"] = bool(per_shard_cb)
    for p in nprobes:
        measure("partitioned", pidx.search, nprobe=p)
    measure("partitioned_pq", pidx.search_pq, nprobe=nprobes[0],
            per_shard_codebooks=per_shard_cb)
    for spec in filter(None, os.environ.get("PQ_SWEEP", "").split(";")):
        m, rr = (int(x) for x in spec.split(","))
        measure(f"partitioned_pq_m{m}_rr{rr}", pidx.search_pq,
                nprobe=nprobes[0], pq_m=m, rerank=rr,
                per_shard_codebooks=per_shard_cb)
    if len(nprobes) > 1:
        measure("partitioned_pq", pidx.search_pq, nprobe=nprobes[-1],
                per_shard_codebooks=per_shard_cb)

    # center-sharding co-location: how many distinct PRIMARY shards
    # (nearest build center) hold a query's true 10-NN? Uniform data
    # scatters them (measured 8.64 at 256 shards); a clustered corpus
    # collapses them onto ~1 (measured 1.12) — the structural reason
    # recall holds at a fraction of the probes. Library operator, fully
    # distributed (diagnostics.routing_concentration).
    from vamana_spark.index.diagnostics import routing_concentration

    out["nn_primary_shards_avg"] = round(
        float(
            routing_concentration(pidx, truth)
            .agg(F.avg("n_primary_shards"))
            .first()[0]
        ),
        2,
    )
    print(json.dumps(
        {"nn_primary_shards_avg": out["nn_primary_shards_avg"]}
    ), flush=True)


def _maintenance_rung(spark, emb, out: dict) -> None:
    """FreshDiskANN-style maintenance cycle at 1M (VERDICT r8 #4):
    build → add 5% fresh points → delete 5% of the originals →
    consolidate (re-pack the serving artifact) — wall-time every step,
    count the shards each delta touched, then compare serving recall at
    the same nprobe against a FRESH build on the identical final
    membership. The claim under test: maintenance costs scale with the
    touched shards, and the maintained index serves within 0.01 recall
    of a fresh build (the graph-free shards are exact within probed
    shards, so the only drift channel is routing geometry — the fresh
    build re-trains centers on the final membership, the maintained one
    keeps the originals).

    Uniform corpus, 256 shards × overlap 2 (the 1M partitioned
    operating point): a uniform random 5% delta touches ~every shard —
    recorded honestly; locality pays off exactly when deltas are
    clustered, which the touched-shard accounting makes visible."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from vamana_spark import VamanaParams, exact, quality
    from vamana_spark.index.partitioned import (
        PartitionedVamanaIndex,
        add_points,
        delete_points,
    )

    S, OV = 256, 2
    out["num_shards"], out["shard_overlap"] = S, OV
    pparams = VamanaParams(dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42)

    t0 = time.perf_counter()
    idx = PartitionedVamanaIndex.build(spark, emb, pparams, num_shards=S, overlap=OV)
    idx.shards_df = idx.shards_df.cache()
    idx.shards_df.count()
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"build_sec": out["build_sec"]}), flush=True)

    # --- add 5%: fresh points, same distribution, new ids
    n_add = N // 20
    rng = np.random.default_rng(777)
    Xa = rng.uniform(-1, 1, (n_add, DIM)).astype(np.float32)
    add_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(N, N + n_add, dtype=np.int64),
                "embedding": list(Xa),
            }
        ),
        "vec_id long, embedding array<float>",
    ).cache()
    add_df.count()
    t0 = time.perf_counter()
    idx2 = add_points(idx, add_df)
    idx2.shards_df = idx2.shards_df.cache()
    idx2.shards_df.count()
    out["add_sec"] = round(time.perf_counter() - t0, 2)
    out["add_touched_shards"] = (
        idx2.shards_df.where(F.col("vec_id") >= N)
        .select("shard").distinct().count()
    )
    print(json.dumps({
        "add_sec": out["add_sec"],
        "add_touched_shards": out["add_touched_shards"],
    }), flush=True)

    # --- delete 5% of the ORIGINAL points
    doomed = emb.where(F.col("vec_id") % 20 == 7).select("vec_id")
    t0 = time.perf_counter()
    idx3 = delete_points(idx2, doomed)
    idx3.shards_df = idx3.shards_df.cache()
    idx3.shards_df.count()
    out["delete_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"delete_sec": out["delete_sec"]}), flush=True)
    idx.shards_df.unpersist()
    idx2.shards_df.unpersist()

    # --- consolidate: rebuild the serving artifact (the packed form a
    # restart reads; maintenance invalidated the old pack)
    t0 = time.perf_counter()
    idx3._packed_df("flat")
    out["consolidate_pack_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(
        {"consolidate_pack_sec": out["consolidate_pack_sec"]}
    ), flush=True)

    # --- fresh build on the identical final membership
    final = emb.where(F.col("vec_id") % 20 != 7).unionByName(add_df).cache()
    n_final = final.count()
    out["n_final"] = n_final
    t0 = time.perf_counter()
    fresh = PartitionedVamanaIndex.build(
        spark, final, pparams, num_shards=S, overlap=OV
    )
    fresh.shards_df = fresh.shards_df.cache()
    fresh.shards_df.count()
    fresh._packed_df("flat")
    out["fresh_build_plus_pack_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(
        {"fresh_build_plus_pack_sec": out["fresh_build_plus_pack_sec"]}
    ), flush=True)

    # --- serving comparison at the same nprobe
    allq = final.where(F.col("vec_id") % NQ_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    sample = allq.where(F.col("query_id") % 4000 == 0)
    truth = exact.exact_knn_batch(final, sample, k=10).cache()
    truth.count()
    nprobe = int(os.environ.get("NPROBE", "64"))
    out["nprobe"] = nprobe
    for name, ix in (("maintained", idx3), ("fresh", fresh)):
        ix.search(allq.limit(8), k=10, nprobe=nprobe).count()  # warm
        t0 = time.perf_counter()
        ix.search(allq, k=10, nprobe=nprobe).count()
        out[f"{name}_qps"] = round(nq / (time.perf_counter() - t0), 1)
        out[f"{name}_recall_at_10"] = round(
            quality.avg_recall(
                ix.search(sample, k=10, nprobe=nprobe), truth, k=10
            ),
            4,
        )
        print(json.dumps({name: {
            "qps": out[f"{name}_qps"],
            "recall": out[f"{name}_recall_at_10"],
        }}), flush=True)
    out["recall_drift"] = round(
        out["fresh_recall_at_10"] - out["maintained_recall_at_10"], 4
    )


def _clustered_maintenance_rung(spark, emb, out: dict, blobs: int) -> None:
    """Clustered maintenance cycle (r9): the delta shape production
    corpora actually have — appends land in a FEW blobs, so shard-local
    maintenance touches a few shards instead of all of them (the
    uniform rung's honest worst case), and a sustained single-blob
    append eventually outgrows its cell's split count, which
    ``resplit_oversized`` consolidates on measured populations.

    Cycle: graph-free clustered build → append 10% of n INTO ONE BLOB
    (center-localized, the worst-case hot cell) → measure wall +
    touched shards → resplit_oversized → measure wall + the restored
    per-shard bound → calibrate and serve, recall vs exact GT on the
    grown corpus."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from vamana_spark import VamanaParams, exact, quality
    from vamana_spark.index.partitioned import (
        PartitionedVamanaIndex,
        _cell_layout,
        add_points,
        resplit_oversized,
    )

    S, OV = 256, 2
    out["num_shards"], out["shard_overlap"] = S, OV
    pparams = VamanaParams(dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    t0 = time.perf_counter()
    idx = PartitionedVamanaIndex.build(
        spark, emb, pparams, num_shards=S, overlap=OV, graph=False
    )
    idx.shards_df = idx.shards_df.cache()
    idx.shards_df.count()
    out["build_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"build_sec": out["build_sec"]}), flush=True)

    # 10% of n appended into blob 0 alone (same generator recipe:
    # centers are the seed-42 uniform draws)
    n_add = N // 10
    rng = np.random.default_rng(42)
    centers = rng.uniform(-1, 1, (blobs, DIM)).astype(np.float32)
    arng = np.random.default_rng(777)
    Xa = (
        centers[0][None, :]
        + arng.normal(0.0, 0.15, (n_add, DIM)).astype(np.float32)
    ).astype(np.float32)
    add_df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(N, N + n_add, dtype=np.int64),
                "embedding": list(Xa),
            }
        ),
        "vec_id long, embedding array<float>",
    ).cache()
    add_df.count()
    # graph=False mirrors the build: the auto rule is crossover-based,
    # so the hot shard (now ~100k rows) would otherwise pay a
    # single-task beam-graph kernel the graph-free serving never walks
    t0 = time.perf_counter()
    grown = add_points(idx, add_df, graph=False)
    grown.shards_df = grown.shards_df.cache()
    grown.shards_df.count()
    out["add_sec"] = round(time.perf_counter() - t0, 2)
    out["add_touched_shards"] = (
        grown.shards_df.where(F.col("vec_id") >= N)
        .select("shard").distinct().count()
    )
    sizes = grown.shards_df.groupBy("shard").count()
    out["max_shard_before_resplit"] = int(sizes.agg(F.max("count")).first()[0])
    print(json.dumps({
        "add_sec": out["add_sec"],
        "add_touched_shards": out["add_touched_shards"],
        "max_shard_before_resplit": out["max_shard_before_resplit"],
    }), flush=True)
    idx.shards_df.unpersist()

    t0 = time.perf_counter()
    split = resplit_oversized(grown, max_shard_factor=2.0, graph=False)
    split.shards_df = split.shards_df.cache()
    split.shards_df.count()
    out["resplit_sec"] = round(time.perf_counter() - t0, 2)
    out["resplit_fired"] = split is not grown
    out["shards_after_resplit"] = int(split.params.num_shards)
    sizes2 = split.shards_df.groupBy("shard").count()
    out["max_shard_after_resplit"] = int(sizes2.agg(F.max("count")).first()[0])
    base, nsplit, _ = _cell_layout(split.centers)
    out["max_cell_split"] = int(nsplit.max())
    print(json.dumps({
        "resplit_sec": out["resplit_sec"],
        "resplit_fired": out["resplit_fired"],
        "shards_after_resplit": out["shards_after_resplit"],
        "max_shard_before": out["max_shard_before_resplit"],
        "max_shard_after": out["max_shard_after_resplit"],
        "max_cell_split": out["max_cell_split"],
    }), flush=True)
    grown.shards_df.unpersist()

    # serve at freshly calibrated defaults on the grown corpus
    out["calibrated_nprobe"] = split.calibrate_nprobe()
    full = emb.unionByName(add_df)
    allq = full.where(F.col("vec_id") % NQ_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    sample = allq.where(F.col("query_id") % 4000 == 0)
    truth = exact.exact_knn_batch(full, sample, k=10).cache()
    truth.count()
    nprobe = split.default_nprobe
    out["nprobe"] = nprobe
    split.search(allq.limit(8), k=10, nprobe=nprobe).count()
    t0 = time.perf_counter()
    split.search(allq, k=10, nprobe=nprobe).count()
    out["qps"] = round(nq / (time.perf_counter() - t0), 1)
    out["recall_at_10"] = round(
        quality.avg_recall(
            split.search(sample, k=10, nprobe=nprobe), truth, k=10
        ),
        4,
    )
    print(json.dumps({
        "calibrated_nprobe": out["calibrated_nprobe"],
        "qps": out["qps"],
        "recall_at_10": out["recall_at_10"],
    }), flush=True)


if __name__ == "__main__":
    main()
