#!/usr/bin/env python
"""One-off 10M-vector scale checkpoint — the first ladder rung where
the FLAT vectors themselves (10M x 64 f32 = 2.56 GB) exceed the 2 GiB
broadcast-tier ceiling, so the partitioned tier stops being an option
and becomes the only serving path. This is the rung the beyond-RAM
design exists for; 1M (tools/scale_smoke_1m.py) still fits broadcast.

Not part of the per-round bench (runtime ~1 h); run manually to extend
the SCALE.md ladder:

    python tools/scale_smoke_10m.py

Measures, at n=10M / dim=64 on local[32]:
  * partitioned-tier IVF-FLAT build (graph=False; 2560 shards x
    overlap 2 — the 1M-validated ~7.8k rows/shard operating point).
    At this shard size BOTH searchers serve via the exact brute
    kernels (4·ef·R flat / 16·ef·R ADC crossovers), so per-shard
    Vamana graphs are dead weight: byte-identical results
    (test_partitioned.py::test_graph_free_build_serves_identically)
    and the build drops its dominant stage. The graph build was
    measured anyway before the pivot: 2560x2 graph kernels saturate a
    single box's memory bandwidth (~17/128 salt-tasks in 36 min →
    ~2.5 h projected; embarrassingly parallel across a real cluster's
    aggregate bandwidth, pointless to wait out on one box). GRAPH=1
    re-runs with graphs for the wall measurement.
  * flat and PQ (m=16/rerank=100, the r7 defaults) serving at
    nprobe=640/2560 — the same 1/4 probe fraction every rung uses —
    over a 25k-query batch, recall@10 against exact ground truth on a
    250-query sample
  * exact ground truth wall (exact_knn_batch over all 10M — itself a
    scale datapoint for the partial-top-k kernel)

Uniform-random data (the no-cluster adversarial case, matching the
rest of the ladder). NUM_SHARDS / OVERLAP / NPROBE env vars re-run
other frontier points. Prints one JSON object.

The CLUSTERED rung (r9 — VERDICT r8 #7: the configuration that
exercises the skew guard, the pack-time PQ auto-calibration, and the
calibrated-nprobe serving default TOGETHER, at the scale where the
partitioned tier is the only option):

    CLUSTERED=256 python tools/scale_smoke_10m.py

k-blob Gaussian mixture (same generator recipe as the 1M clustered
rung: centers uniform in [-1,1]^64, sigma 0.15, membership i % k so it
interleaves with vec_id). With CLUSTERED set the smoke runs
calibrate_nprobe() and pq_profile() after the build and serves at the
CALIBRATED defaults — nprobe and pq_m are measured from the data, not
passed in.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM = 10_000_000, 64
# vec_id % NQ_MOD == 0 queries for sustained throughput; default 10k —
# at nprobe=640 each query emits 640*k candidate rows into the merge,
# so the batch size bounds the merge-window working set
NQ_MOD = int(os.environ.get("NQ_MOD", "1000"))
GT_MOD = 40_000   # query_id % 40000 == 0 -> 250 ground-truth queries


def _gen(path: str, blobs: int = 0) -> None:
    """Uniform [-1,1]^64 by default; ``blobs`` > 0 writes a k-blob
    Gaussian mixture instead (same recipe as the 1M clustered rung)."""
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


def _jvm_gc(spark) -> None:
    """Nudge both GCs so the ContextCleaner releases shuffle files of
    dereferenced lineage (local-mode disk is the scarce resource)."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def _metrics_probe(spark):
    """Cumulative (disk-spill, memory-spill, shuffle-write) bytes across
    all completed stages, via the UI REST API — call twice and diff to
    attribute spill to a phase. Returns zeros if the UI is unreachable
    (never fails the smoke)."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = _json.load(r)
        return (
            sum(s.get("diskBytesSpilled", 0) for s in stages),
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (0, 0, 0)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import VamanaParams, exact, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    blobs = int(os.environ.get("CLUSTERED", "0"))  # k-blob corpus rung
    path = (
        f"/tmp/sf10m_blob{blobs}/embeddings.parquet"
        if blobs
        else "/tmp/sf10m/embeddings.parquet"
    )
    if not os.path.exists(path):
        t0 = time.perf_counter()
        _gen(path, blobs=blobs)
        print(json.dumps({"gen_sec": round(time.perf_counter() - t0, 1)}),
              flush=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        # NOT sized to the box: a 96g heap let the JVM balloon to ~82 GB
        # RSS on the 64M-row candidate merge and the kernel OOM-killed it
        # (the 125 GB box also hosts 32 Python workers + page cache).
        # 56g forces Spark to spill the big windows instead of dying.
        .config("spark.driver.memory", "56g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # SPILL_METRICS=1 turns the UI on so the REST stage metrics can
        # attribute spill per phase (r7 verdict #8). Off by default: the
        # listener bus measurably drags qps on 64M-row candidate merges
        # (the r8 instrumented run served 54 qps flat vs 85 without).
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPILL_METRICS") else "false",
        )
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(path).cache()
    emb.count()
    out: dict = {"n": N, "dim": DIM, "blobs": blobs}

    allq = emb.where(F.col("vec_id") % NQ_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    out["nq"] = nq
    sample = allq.where(F.col("query_id") % GT_MOD == 0)

    t0 = time.perf_counter()
    truth = exact.exact_knn_batch(emb, sample, k=10).cache()
    truth.count()
    out["exact_gt_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"exact_gt_sec": out["exact_gt_sec"]}), flush=True)

    n_shards = int(os.environ.get("NUM_SHARDS", "2560"))
    overlap = int(os.environ.get("OVERLAP", "2"))
    with_graph = bool(os.environ.get("GRAPH"))
    out["num_shards"], out["shard_overlap"] = n_shards, overlap
    out["graph"] = with_graph
    pparams = VamanaParams(dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    t0 = time.perf_counter()
    pidx = PartitionedVamanaIndex.build(
        spark, emb, pparams, num_shards=n_shards, overlap=overlap,
        graph=with_graph,
    )
    pidx.shards_df = pidx.shards_df.cache()
    pidx.shards_df.count()
    out["partitioned_build_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"build_sec": out["partitioned_build_sec"]}), flush=True)
    t0 = time.perf_counter()
    pidx._packed_df("flat")
    out["pack_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps({"pack_sec": out["pack_sec"]}), flush=True)
    per_shard_cb = (
        True if os.environ.get("PER_SHARD_CB") else None  # None = profile
    )
    calibrate = blobs or os.environ.get("CALIBRATE")
    if calibrate:
        # r9: the full calibrated-defaults stack — measure the serving
        # nprobe from ground-truth reachability and the PQ m from ADC
        # shortlist agreement, both persisted index properties.
        # TARGET_RECALL (r11) sets the calibration operating point; the
        # maintenance rung then carries it automatically
        cal_kw = {}
        if os.environ.get("TARGET_RECALL"):
            cal_kw["target_recall"] = float(os.environ["TARGET_RECALL"])
        t0 = time.perf_counter()
        out["calibrated_nprobe"] = pidx.calibrate_nprobe(**cal_kw)
        out["calibration_target"] = pidx.calibration_target
        out["calibrate_nprobe_sec"] = round(time.perf_counter() - t0, 2)
        if not os.environ.get("SKIP_PQ"):
            # r12: the lifecycle rung serves flat only — profiling PQ
            # packs there is minutes of dead wall
            t0 = time.perf_counter()
            out["pq_profile"] = pidx.pq_profile()
            out["pq_profile_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({
            "calibrated_nprobe": out["calibrated_nprobe"],
            "calibrate_nprobe_sec": out["calibrate_nprobe_sec"],
            "pq_profile": out.get("pq_profile"),
            "pq_profile_sec": out.get("pq_profile_sec"),
        }), flush=True)
    if not os.environ.get("SKIP_PQ"):
        prof = pidx.pq_profile()
        out["pq_per_shard_codebooks"] = (
            per_shard_cb if per_shard_cb is not None
            else prof["per_shard_codebooks"]
        )
        t0 = time.perf_counter()
        pidx._packed_df(
            "pq", pq_m=int(prof["pq_m"]), pq_ksub=256,
            per_shard_codebooks=bool(out["pq_per_shard_codebooks"]),
        )
        out["pq_m"] = int(prof["pq_m"])
        out["pq_pack_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({"pq_pack_sec": out["pq_pack_sec"],
                          "pq_m": out["pq_m"]}), flush=True)
    # flat serving reads only the packed blobs and PQ re-rank reads
    # shards_df: the raw emb cache (~5 GB at 10M) is dead weight past
    # this point — drop it before the query fan-out
    emb.unpersist()
    out["default_nprobe"] = pidx.default_nprobe
    nprobe = int(os.environ.get("NPROBE", str(pidx.default_nprobe)))
    out["nprobe"] = nprobe

    def measure(key, fn, **kw):
        # r11 (VERDICT r10 next-round #4): warm with the FULL batch,
        # not 8 queries — the 8-query warm leaves the full-load plan's
        # codegen/exchange setup to the first timed rep, and the flat
        # row swung 846-1,596 qps across r10 runs partly on that; the
        # min-of-2 then measures the steady state a serving deployment
        # sees (the same protocol the bench's warm=True uses)
        fn(allq.limit(8), k=10, **kw).count()  # pack materialization
        fn(allq, k=10, **kw).count()           # full-load plan warm
        m0 = _metrics_probe(spark)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(allq, k=10, **kw).count()
            best = min(best, time.perf_counter() - t0)
        m1 = _metrics_probe(spark)
        out[f"{key}_qps"] = round(nq / best, 1)
        # per-rep attribution of the full-batch candidate merge (2 reps)
        out[f"{key}_spill_disk_gb_per_rep"] = round(
            (m1[0] - m0[0]) / 2 / 2**30, 2
        )
        out[f"{key}_spill_mem_gb_per_rep"] = round(
            (m1[1] - m0[1]) / 2 / 2**30, 2
        )
        out[f"{key}_shuffle_write_gb_per_rep"] = round(
            (m1[2] - m0[2]) / 2 / 2**30, 2
        )
        out[f"{key}_recall_at_10"] = round(
            quality.avg_recall(fn(sample, k=10, **kw), truth, k=10), 4
        )
        print(json.dumps({key: {
            "qps": out[f"{key}_qps"],
            "recall": out[f"{key}_recall_at_10"],
            "spill_disk_gb_per_rep": out[f"{key}_spill_disk_gb_per_rep"],
            "spill_mem_gb_per_rep": out[f"{key}_spill_mem_gb_per_rep"],
            "shuffle_write_gb_per_rep": out[f"{key}_shuffle_write_gb_per_rep"],
        }}), flush=True)

    if not os.environ.get("SKIP_FLAT"):
        measure("partitioned", pidx.search, nprobe=nprobe)
    # PQ_RERANK sweeps shortlist depth (comma-separated); empty = the
    # library default (max(10k, 100))
    reranks = [
        int(x)
        for x in os.environ.get("PQ_RERANK", "").split(",")
        if x.strip()
    ] or [None]
    if not os.environ.get("SKIP_PQ"):
        for rr in reranks:
            key = "partitioned_pq" if rr is None else f"partitioned_pq_rr{rr}"
            kw = {} if rr is None else {"rerank": rr}
            measure(
                key, pidx.search_pq, nprobe=nprobe,
                per_shard_codebooks=per_shard_cb, **kw,
            )
    if os.environ.get("OPQ"):
        # r11: the learned-rotation pack at the profile's m — measures
        # what the rotation buys back of the PQ-vs-flat recall gap at
        # the same serving memory (the profile itself only picks opq
        # when plain MISSES the bar; this forces the comparison row)
        prof = pidx.pq_profile()
        t0 = time.perf_counter()
        pidx._packed_df("opq", int(prof["pq_m"]), 256)
        out["opq_pack_sec"] = round(time.perf_counter() - t0, 2)
        print(json.dumps({"opq_pack_sec": out["opq_pack_sec"]}), flush=True)
        measure(
            "partitioned_opq", pidx.search_pq, nprobe=nprobe,
            pq_m=int(prof["pq_m"]), opq=True,
        )

    if os.environ.get("MAINTENANCE"):
        _maintenance_rung(spark, emb, pidx, out, blobs)
    print(json.dumps(out))


def _maintenance_rung(spark, emb, pidx, out: dict, blobs: int) -> None:
    """r10 (VERDICT r9 missing #3): the full 10M lifecycle —
    build (already done by the caller) → 10% HOT-BLOB append (every new
    point lands in blob 0, the production shape of a growing clustered
    corpus) → resplit_oversized → recalibrate (automatic now: the input
    index is calibrated, so add/resplit carry it) → serve — compared
    against a FRESH build+calibrate on the same 11M corpus.

        CLUSTERED=256 MAINTENANCE=1 python tools/scale_smoke_10m.py
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from vamana_spark import VamanaParams, exact, quality
    from vamana_spark.index.partitioned import (
        PartitionedVamanaIndex,
        resplit_oversized,
    )
    from vamana_spark.index.partitioned import add_points as padd

    n_app = N // 10
    app_path = f"/tmp/sf10m_blob{blobs}_append/embeddings.parquet"
    if not os.path.exists(app_path):
        os.makedirs(os.path.dirname(app_path), exist_ok=True)
        rng = np.random.default_rng(43)
        # SAME center recipe as _gen (seed 42's first uniform draw):
        # the hot blob is blob 0 of the existing mixture
        c0 = np.random.default_rng(42).uniform(-1, 1, (max(blobs, 1), DIM))[
            0
        ].astype(np.float32)
        schema = pa.schema(
            [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
        )
        chunk = 100_000
        with pq.ParquetWriter(app_path, schema) as w:
            for lo in range(0, n_app, chunk):
                X = (
                    c0[None, :]
                    + rng.normal(0.0, 0.15, (chunk, DIM)).astype(np.float32)
                ).astype(np.float32)
                w.write_table(
                    pa.table(
                        {
                            "vec_id": pa.array(
                                range(N + lo, N + lo + chunk), type=pa.int64()
                            ),
                            "embedding": pa.array(
                                list(X), type=pa.list_(pa.float32())
                            ),
                        },
                        schema=schema,
                    )
                )
    app = spark.read.parquet(app_path)
    mnt: dict = {"n_appended": n_app}
    # graph mode mirrors the build (same rationale as the 1M rung): the
    # auto rule is crossover-based and would build beam graphs in the
    # swollen hot shards that graph-free serving never walks
    gmode = True if out["graph"] else False

    # the serving packs (~15 GB persisted flat+pq at 10M) are dead
    # weight past this point; run 2 filled /tmp's shuffle space with
    # them still held while the maintained index materialized
    pidx.unpersist_packed()

    # --- append (auto-recalibrates: the input index is calibrated)
    t0 = time.perf_counter()
    grown = padd(pidx, app, graph=gmode)
    mnt["add_sec"] = round(time.perf_counter() - t0, 2)
    mnt["add_recalibrated_nprobe"] = grown.recommended_nprobe
    mnt["add_touched_shards"] = (
        grown.shards_df.where(F.col("vec_id") >= N)
        .select("shard").distinct().count()
    )
    mnt["shards_after_add"] = int(grown.params.num_shards)
    print(json.dumps({"maintenance_add": mnt}), flush=True)
    pidx.shards_df.unpersist()
    # cut lineage so the ContextCleaner can release the phase's shuffle
    # files — runs 2/3 filled the disk with shuffles pinned by cached
    # DataFrames' lineage accumulated across build→add→resplit→fresh
    grown.shards_df = grown.shards_df.localCheckpoint()
    _jvm_gc(spark)

    # --- resplit the hot cell (auto-recalibrates too)
    t0 = time.perf_counter()
    split = resplit_oversized(grown, max_shard_factor=2.0, graph=gmode)
    mnt["resplit_sec"] = round(time.perf_counter() - t0, 2)
    mnt["resplit_fired"] = split is not grown
    mnt["shards_after_resplit"] = int(split.params.num_shards)
    mnt["resplit_recalibrated_nprobe"] = split.recommended_nprobe
    # the carried operating point (r12: must equal the build's
    # TARGET_RECALL through add -> resplit without re-specification)
    mnt["carried_calibration_target"] = split.calibration_target
    if split is not grown:
        grown.shards_df.unpersist()
        split.shards_df = split.shards_df.localCheckpoint()
        _jvm_gc(spark)
    print(json.dumps({"maintenance_resplit": {
        k: mnt[k] for k in ("resplit_sec", "resplit_fired",
                            "shards_after_resplit",
                            "resplit_recalibrated_nprobe")
    }}), flush=True)

    # --- serve the maintained index at its carried defaults
    full = emb.unionByName(app).cache()
    n_full = full.count()
    allq = full.where(F.col("vec_id") % NQ_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    nq = allq.count()
    sample = allq.where(F.col("query_id") % GT_MOD == 0)
    t0 = time.perf_counter()
    truth = exact.exact_knn_batch(full, sample, k=10).cache()
    truth.count()
    mnt["exact_gt_full_sec"] = round(time.perf_counter() - t0, 2)

    def serve(tag, ix):
        npr = ix.default_nprobe
        ix.search(allq.limit(8), k=10, nprobe=npr).count()
        ix.search(allq, k=10, nprobe=npr).count()  # full-load warm (r11)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            ix.search(allq, k=10, nprobe=npr).count()
            best = min(best, time.perf_counter() - t0)
        mnt[f"{tag}_nprobe"] = npr
        mnt[f"{tag}_qps"] = round(nq / best, 1)
        mnt[f"{tag}_recall_at_10"] = round(
            quality.avg_recall(ix.search(sample, k=10, nprobe=npr), truth, k=10),
            4,
        )
        print(json.dumps({tag: {
            "nprobe": npr, "qps": mnt[f"{tag}_qps"],
            "recall": mnt[f"{tag}_recall_at_10"],
        }}), flush=True)

    serve("maintained", split)
    split.unpersist_packed()  # the fresh build needs the disk
    _jvm_gc(spark)

    if os.environ.get("SKIP_FRESH"):
        # r12: the fresh-build comparison is target-invariant kernel
        # work (~340 s + ~80 GB of shuffle on this box's disk) already
        # on record for the default target — TARGET_RECALL sweeps only
        # need the maintained row
        out["maintenance"] = mnt
        return

    # --- fresh-build comparison point on the same 11M corpus
    pparams = VamanaParams(dim=DIM, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    t0 = time.perf_counter()
    fresh = PartitionedVamanaIndex.build(
        spark, full, pparams,
        num_shards=int(out["num_shards"]), overlap=int(out["shard_overlap"]),
        graph=bool(out["graph"]),  # same mode as the caller's build
    )
    fresh.shards_df = fresh.shards_df.localCheckpoint()
    fresh.shards_df.count()
    mnt["fresh_build_sec"] = round(time.perf_counter() - t0, 2)
    _jvm_gc(spark)
    t0 = time.perf_counter()
    # r12 (VERDICT r11 #1): the comparison point calibrates at the SAME
    # explicit operating point the maintained index carries — a
    # default-target fresh row against a 0.95-target maintained row
    # would compare different contracts
    fresh_kw = {}
    if os.environ.get("TARGET_RECALL"):
        fresh_kw["target_recall"] = float(os.environ["TARGET_RECALL"])
    mnt["fresh_calibrated_nprobe"] = fresh.calibrate_nprobe(**fresh_kw)
    mnt["fresh_calibration_target"] = fresh.calibration_target
    mnt["fresh_calibrate_sec"] = round(time.perf_counter() - t0, 2)
    serve("fresh", fresh)
    mnt["recall_drift_maintained_minus_fresh"] = round(
        mnt["maintained_recall_at_10"] - mnt["fresh_recall_at_10"], 4
    )
    out["maintenance"] = mnt


if __name__ == "__main__":
    main()
