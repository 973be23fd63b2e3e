#!/usr/bin/env python
"""10M anisotropic-residual OPQ rescue rung (r12; VERDICT r11 #5).

The r11 10M OPQ row used the isotropic blob fixture, where the learned
rotation is a designed wash — it proved OPQ costs nothing at serving
time but never exercised the regime OPQ EXISTS for: plain-PQ ADC
agreement missing the 0.95 profile bar while the rotation clears it
(Ge et al. 2013), previously gated only by the 24k unit fixture
(tests/test_partitioned.py::test_opq_profile_and_serving).

This rung scales that fixture's recipe (clustered blobs + within-blob
noise with a geometric per-direction spectrum mixed by a fixed random
rotation — the correlated, non-axis-aligned covariance real embedding
matrices have) to 10M x 64 and drives the FULL CLI path end-to-end:

    python -m vamana_spark pbuild --calibrate --pack pq:16:256 ...

i.e. the profile decision, the pack rewrite (_profile_packs) and the
persisted serving default all come from the shipping code path, not a
hand-called pq_profile(). Then the saved index is loaded and served
both ways — profile-following (opq pack) vs forced plain PQ at the
SAME m/ksub/nprobe/rerank — to record what the rotation buys at 10M.

    python tools/scale_smoke_10m_opq.py                 # full rung
    N_VECS=1000000 NUM_SHARDS=256 python tools/...      # pilot

Env: N_VECS (10M), NUM_SHARDS (2560), OVERLAP (2), NB blobs (256),
SIGMA (0.05), RATIO (6.0), NQ_MOD (1000), GT_MOD (40000), PQ_M (16).
Prints one JSON object per phase plus a final summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N_VECS", str(10_000_000)))
DIM = 64
NB = int(os.environ.get("NB", "256"))
SIGMA = float(os.environ.get("SIGMA", "0.05"))
RATIO = float(os.environ.get("RATIO", "6.0"))
NQ_MOD = int(os.environ.get("NQ_MOD", "1000"))
GT_MOD = int(os.environ.get("GT_MOD", "40000"))
PQ_M = int(os.environ.get("PQ_M", "16"))


def _gen(path: str) -> float:
    """Chunked anisotropic-blob generator — the unit fixture's recipe
    (test_partitioned.py::_aniso_blob_corpus) at rung scale: blob
    centers uniform in [-1,1]^64; within-blob noise has a geometric
    per-direction spectrum (decay RATIO) mixed by ONE fixed random
    rotation, total variance matched to an isotropic SIGMA."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(3)
    C = rng.uniform(-1, 1, (NB, DIM))
    s = np.geomspace(1.0, 1.0 / RATIO, DIM)
    s *= SIGMA * np.sqrt(DIM) / np.linalg.norm(s)
    Qmix, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    mix = (np.diag(s) @ Qmix).astype(np.float64)
    schema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    chunk = 100_000
    t0 = time.perf_counter()
    with pq.ParquetWriter(path, schema) as w:
        for lo in range(0, N, chunk):
            ids = np.arange(lo, lo + chunk, dtype=np.int64)
            which = ids % NB
            crng = np.random.default_rng(7_000_000 + lo)
            X = (C[which] + crng.standard_normal((chunk, DIM)) @ mix).astype(
                np.float32
            )
            w.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(ids),
                        "embedding": pa.array(
                            list(X), type=pa.list_(pa.float32())
                        ),
                    },
                    schema=schema,
                )
            )
    return round(time.perf_counter() - t0, 1)


def main() -> None:
    base = f"/tmp/sf10m_aniso_{N}"
    emb_path = os.path.join(base, "embeddings.parquet")
    idx_path = os.path.join(base, "idx")
    out: dict = {
        "n": N, "dim": DIM, "blobs": NB, "sigma": SIGMA, "ratio": RATIO,
        "pq_m_requested": PQ_M,
    }
    if not os.path.exists(emb_path):
        out["gen_sec"] = _gen(emb_path)
        print(json.dumps({"gen_sec": out["gen_sec"]}), flush=True)

    n_shards = int(os.environ.get("NUM_SHARDS", "2560"))
    overlap = int(os.environ.get("OVERLAP", "2"))
    out["num_shards"], out["overlap"] = n_shards, overlap

    # ---- the CLI path, verbatim (pbuild --calibrate rewrites the pq
    # pack spec to the profile's measured choice and persists it)
    env = {
        **os.environ,
        "SPARK_GRAFT_DRIVER_MEM": os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "56g"
        ),
    }
    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable, "-m", "vamana_spark", "pbuild",
            "--input", emb_path, "--output", idx_path,
            "--shards", str(n_shards), "--overlap", str(overlap),
            "--no-graph", "--calibrate",
            "--pack", f"pq:{PQ_M}:256",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True,
    )
    out["pbuild_sec"] = round(time.perf_counter() - t0, 1)
    if proc.returncode != 0:
        print(json.dumps({"pbuild_failed": proc.stderr[-2000:]}), flush=True)
        sys.exit(1)
    cli = json.loads(proc.stdout.strip().splitlines()[-1])
    out["pbuild"] = {
        k: cli.get(k)
        for k in ("recommended_nprobe", "pq_profile", "packs", "shards")
    }
    prof = cli["pq_profile"]
    out["profile_chose_opq"] = bool(prof.get("opq"))
    out["profile_pq_m"] = int(prof.get("pq_m", 0))
    print(json.dumps({"pbuild": out["pbuild"],
                      "pbuild_sec": out["pbuild_sec"]}), flush=True)

    # ---- load + serve: profile-following default vs forced plain PQ
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark import exact, quality
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

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

    emb = spark.read.parquet(emb_path)
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

    idx = PartitionedVamanaIndex.load(spark, idx_path)
    out["loaded_nprobe"] = idx.default_nprobe
    m = out["profile_pq_m"] or PQ_M

    def measure(key, **kw):
        # full-batch warm + min-of-2 (the r11 serving protocol)
        idx.search_pq(allq.limit(8), k=10, **kw).count()
        idx.search_pq(allq, k=10, **kw).count()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            idx.search_pq(allq, k=10, **kw).count()
            best = min(best, time.perf_counter() - t0)
        out[f"{key}_qps"] = round(nq / best, 1)
        out[f"{key}_recall_at_10"] = round(
            quality.avg_recall(idx.search_pq(sample, k=10, **kw), truth, k=10),
            4,
        )
        print(json.dumps({key: {
            "qps": out[f"{key}_qps"],
            "recall": out[f"{key}_recall_at_10"],
        }}), flush=True)

    # profile-following default: serves the persisted (opq when the
    # profile chose it) pack — THE pack pbuild rewrote the spec to
    measure("served_auto")
    # forced plain PQ at the same m/ksub (trains+packs plain pq)
    measure("served_plain_pq", pq_m=m, opq=False)
    out["opq_recall_delta"] = round(
        out["served_auto_recall_at_10"] - out["served_plain_pq_recall_at_10"], 4
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
