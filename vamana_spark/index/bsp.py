"""Bulk-synchronous Vamana build (SURVEY.md §7 M3's designed approach).

The reference builds by mutating ONE graph under an OpenMP lock, node by
node (vamana.h:221-332). That doesn't distribute. This module re-expresses
the build as synchronous rounds over immutable graph snapshots:

  per pass (α = 1.0, then α):
    1. broadcast the current graph snapshot (CSR) + points matrix
    2. DISTRIBUTED: every node batch-beam-searches from the medoid
       against the snapshot (lockstep kernel, partition-parallel) and
       robust-prunes its candidate set → proposed out-edges
    3. driver-side reverse fix-up: add reverse edges, re-prune nodes
       pushed over degree R (O(n·R) memory — the size of the graph itself)

Order-free bulk-synchronous semantics instead of the reference's
mutate-as-you-go: recall-equivalent (the reference's own bar is recall,
not graph equality), and the expensive part — n beam searches per pass —
scales out across executors while the points matrix stays broadcast.

Where it sits in the tiering: single-kernel build (driver, n ≤ 20k
dense / ~200k beam), THIS (build compute ≫ one machine but points fit
broadcast, n up to ~10^6), sharded/partitioned builds (beyond broadcast).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vamana_spark.index import kernels
from vamana_spark.params import VamanaParams


def build_bsp(
    spark: SparkSession,
    df: DataFrame,
    params: VamanaParams,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Distributed two-pass Vamana build; returns a VamanaIndex."""
    from vamana_spark.index.vamana import VamanaIndex, _metric_transform

    params.validate()
    pts = df.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("embedding")
    ).where(F.size(vec_col) == params.dim)
    w = Window.orderBy("vec_id")
    pts = pts.withColumn("ordinal", F.row_number().over(w) - 1).cache()

    pdf = pts.orderBy("ordinal").toPandas()
    if pdf.empty:
        raise ValueError("build_bsp: no input rows after dimension filter")
    P = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    P = _metric_transform(P, params.metric)
    n = P.shape[0]
    R, L, alpha, seed = params.R, params.L, float(params.alpha), params.seed

    bP = spark.sparkContext.broadcast(P)
    rng = np.random.default_rng(seed)
    graph: List[np.ndarray] = kernels.init_random_graph(n, min(R, n - 1), rng)
    medoid = kernels.medoid_of(P)

    nodes = pts.select("ordinal").repartition(
        spark.sparkContext.defaultParallelism
    )

    for pass_alpha in (1.0, alpha):
        indptr, nbrs = kernels._to_csr(graph, n)
        bG = spark.sparkContext.broadcast((indptr, nbrs))
        a = float(pass_alpha)

        def propose(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Pv = bP.value
            ip, nb = bG.value
            nbr_mat = kernels.pad_adjacency(ip, nb, Pv.shape[0])
            for b in batches:
                if b.empty:
                    continue
                ords = b["ordinal"].to_numpy(dtype=np.int64)
                # candidates: the L nearest visited nodes per node (batch
                # beam search against the frozen snapshot)
                rq, rid, _, _, _ = kernels.search_topk_batch(
                    Pv, nbr_mat, 0, Pv[ords], L, L,
                    starts=np.full(ords.size, medoid, dtype=np.int64),
                )
                src_out, dst_out = [], []
                for pos, i in enumerate(ords):
                    cand = rid[rq == pos]
                    old = nb[ip[i] : ip[i + 1]]
                    cand = np.concatenate([cand, old])
                    pruned = kernels.robust_prune(Pv, int(i), cand, None, a, R)
                    src_out.extend([int(i)] * pruned.size)
                    dst_out.extend(int(x) for x in pruned)
                yield pd.DataFrame({"src": src_out, "dst": dst_out})

        edges = nodes.mapInPandas(propose, schema="src long, dst long").toPandas()

        # driver-side reverse fix-up over the full proposed edge set
        out: List[List[int]] = [[] for _ in range(n)]
        for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
            out[s].append(int(d))
        rev: List[List[int]] = [[] for _ in range(n)]
        for s in range(n):
            for d in out[s]:
                rev[d].append(s)
        new_graph: List[np.ndarray] = []
        for j in range(n):
            merged = np.unique(np.asarray(out[j] + rev[j], dtype=np.int64))
            merged = merged[merged != j]
            if merged.size <= R:
                new_graph.append(merged)
            else:
                new_graph.append(
                    kernels.robust_prune(P, j, merged, None, a, R)
                )
        graph = new_graph
        bG.destroy()

    params.n = n
    params.medoid = int(medoid)
    graph_rows = [(i, [int(x) for x in graph[i]]) for i in range(n)]
    graph_df = spark.createDataFrame(graph_rows, "ordinal long, neighbors array<long>")
    points_df = pts.select("vec_id", "ordinal", "embedding")
    return VamanaIndex(spark, params, points_df, graph_df)
