"""Exact (brute-force) kNN, 1-NN resolution, and medoid — the oracle path.

In the reference, exact kNN is the *definition of correctness*: both test
drivers compute ground truth by scanning every point, sorting ascending by
distance and taking k (main.cpp:104-118, main.go:76-92). Medoid is the
global argmin of summed distances (FindMedoid, vamana.h:656-692).

Two physical strategies, same semantics:

- ``exact_knn``        — declarative: broadcast cross join + window top-k.
  Catalyst plan: BroadcastNestedLoopJoin(queries) → per-query rank. The
  |Q|x|P| intermediate is shuffled once on query_id. DuckDB-oracle-able.
- ``exact_knn_batch``  — scale path: two-stage top-k. Stage 1 computes a
  *local* top-k per query against each points-partition inside an Arrow
  batch (NumPy matrix math), so only |Q|*k rows per partition reach the
  shuffle; stage 2 merges local winners per query. This is how a 1000-
  executor cluster does brute force over 10^9 points without moving the
  full cross product.

Determinism (FIXTURES.md §C): double math, ties broken by vec_id,
distances rounded only at the presentation edge.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vamana_spark.functions.vector import canonical_zero, pairwise_distance


def _dist_matrix(Q: np.ndarray, P: np.ndarray, metric: str) -> np.ndarray:
    """(|Q|, |P|) distance matrix in float64; smaller = closer."""
    Q = Q.astype(np.float64, copy=False)
    P = P.astype(np.float64, copy=False)
    if metric in ("l2sq", "l2"):
        # (q-p)^2 = |q|^2 + |p|^2 - 2 q.p  — BLAS-backed, no |Q|x|P|xdim temp
        d = (
            (Q * Q).sum(axis=1)[:, None]
            + (P * P).sum(axis=1)[None, :]
            - 2.0 * (Q @ P.T)
        )
        np.maximum(d, 0.0, out=d)
        return np.sqrt(d) if metric == "l2" else d
    if metric == "ip":
        return -(Q @ P.T)
    if metric == "cosine":
        qn = np.linalg.norm(Q, axis=1)[:, None]
        pn = np.linalg.norm(P, axis=1)[None, :]
        den = qn * pn
        with np.errstate(divide="ignore", invalid="ignore"):
            return 1.0 - (Q @ P.T) / den
    raise ValueError(f"unknown metric {metric!r}")


def exact_knn(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: Optional[int] = None,
    exclude_self: bool = False,
    dim: Optional[int] = None,
) -> DataFrame:
    """Exact top-k neighbors for every query (declarative plan).

    Returns ``(query_id, vec_id, dist, rank)`` with rank 1..k ascending by
    distance, ties broken by vec_id. ``round_digits`` rounds the *output*
    distance only — ranking always uses full precision. ``dim`` (when
    the fixed dimension is known/enforced) switches the distance to its
    unrolled form — bit-identical, ~2x cheaper per row.
    """
    from vamana_spark.functions.util import ensure_parallelism

    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
    )
    # the |P|x|Q| distance projection is the CPU-bound stage: floor the
    # points-side parallelism (no-op on healthy multi-split layouts)
    p = ensure_parallelism(
        points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_pv"))
    )
    # queries side is the small one by construction — broadcast it so the
    # join itself never shuffles the points (the floor above may have
    # round-robined a single-split input once; multi-split inputs move
    # zero times).
    joined = p.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("vec_id") != F.col("query_id"))
    d = joined.select(
        "query_id",
        "vec_id",
        pairwise_distance("_qv", "_pv", metric, dim=dim).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    out = d.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if round_digits is not None:
        out = out.withColumn("dist", canonical_zero(F.round("dist", round_digits)))
    return out.select("query_id", "vec_id", "dist", "rank")


def exact_knn_batch(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: Optional[int] = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact top-k, two-stage partial top-k plan (the 100-TB shape).

    Stage 1 (map-side, zero shuffle): each points-partition computes its
    local top-k per query with one BLAS call; emits |Q|*k rows/partition.
    Stage 2: window-merge the partials per query. The full |Q|x|P| cross
    product never exists as a distributed dataset. No parallelism
    floor here (unlike exact_knn): the per-partition GEMM amortizes
    best over LARGE point blocks — measured 2x slower when a
    single-split local input was round-robined into 32 slivers.
    """
    spark = points.sparkSession
    qrows = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        )
        .toPandas()
    )
    qids = np.asarray(qrows["query_id"], dtype=np.int64)
    Q = np.stack(qrows["qv"].to_numpy()).astype(np.float64)
    bq = spark.sparkContext.broadcast((qids, Q))

    out_schema = "query_id long, vec_id long, dist double"

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_l, Q_l = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            P = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pids = pdf[id_col].to_numpy(dtype=np.int64)
            D = _dist_matrix(Q_l, P, metric)
            if exclude_self:
                D[qids_l[:, None] == pids[None, :]] = np.inf
            kk = min(k, P.shape[0])
            # argpartition: O(|P|) per query instead of a full sort
            idx = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            rows = {
                "query_id": np.repeat(qids_l, kk),
                "vec_id": pids[idx].ravel(),
                "dist": np.take_along_axis(D, idx, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    partial = points.select(id_col, vec_col).mapInPandas(local_topk, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    out = partial.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if round_digits is not None:
        out = out.withColumn("dist", canonical_zero(F.round("dist", round_digits)))
    return out.select("query_id", "vec_id", "dist", "rank")


def range_search(
    points: DataFrame,
    queries: DataFrame,
    radius: float,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_digits: Optional[int] = None,
    exclude_self: bool = False,
) -> DataFrame:
    """All points within ``radius`` of each query (exact).

    Returns ``(query_id, vec_id, dist)`` unranked. Better scale shape
    than top-k: broadcast queries + map-side threshold filter means ZERO
    shuffles — each points-partition emits only its in-radius rows, and
    there is no window merge at all.
    """
    spark = points.sparkSession
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    ).toPandas()
    qids = np.asarray(qrows["query_id"], dtype=np.int64)
    Q = np.stack(qrows["qv"].to_numpy()).astype(np.float64)
    bq = spark.sparkContext.broadcast((qids, Q))
    r = float(radius)

    def local_range(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_l, Q_l = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            P = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pids = pdf[id_col].to_numpy(dtype=np.int64)
            D = _dist_matrix(Q_l, P, metric)
            if exclude_self:
                D[qids_l[:, None] == pids[None, :]] = np.inf
            qi, pi = np.nonzero(D <= r)
            yield pd.DataFrame(
                {
                    "query_id": qids_l[qi],
                    "vec_id": pids[pi],
                    "dist": D[qi, pi],
                }
            )

    out = points.select(id_col, vec_col).mapInPandas(
        local_range, schema="query_id long, vec_id long, dist double"
    )
    if round_digits is not None:
        out = out.withColumn("dist", canonical_zero(F.round("dist", round_digits)))
    return out


def exact_knn_filtered(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    want_col: str = "want_label",
    round_digits: Optional[int] = None,
) -> DataFrame:
    """Exact top-k restricted to base rows whose ``label_col`` equals the
    query's ``want_col`` — the predicate+vector ("filtered ANN") oracle.

    Same two-stage partial-top-k shape as :func:`exact_knn_batch`; the
    label constraint is applied inside the distance kernel (mask to inf),
    so the scan still reads each partition once for ALL queries and no
    per-label scan multiplication happens.
    """
    spark = points.sparkSession
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        F.col(want_col).alias("want"),
    ).toPandas()
    qids = np.asarray(qrows["query_id"], dtype=np.int64)
    Q = np.stack(qrows["qv"].to_numpy()).astype(np.float64)
    want = np.asarray(qrows["want"], dtype=np.int64)
    bq = spark.sparkContext.broadcast((qids, Q, want))

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_l, Q_l, want_l = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            P = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            pids = pdf[id_col].to_numpy(dtype=np.int64)
            lbl = pdf[label_col].to_numpy(dtype=np.int64)
            D = _dist_matrix(Q_l, P, metric)
            D[want_l[:, None] != lbl[None, :]] = np.inf
            kk = min(k, P.shape[0])
            idx = np.argpartition(D, kk - 1, axis=1)[:, :kk]
            dv = np.take_along_axis(D, idx, axis=1).ravel()
            keep = np.isfinite(dv)  # drop masked-out partials
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids_l, kk)[keep],
                    "vec_id": pids[idx].ravel()[keep],
                    "dist": dv[keep],
                }
            )

    partial = points.select(id_col, vec_col, label_col).mapInPandas(
        local_topk, schema="query_id long, vec_id long, dist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    out = partial.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    if round_digits is not None:
        out = out.withColumn("dist", canonical_zero(F.round("dist", round_digits)))
    return out.select("query_id", "vec_id", "dist", "rank")


def nearest_point(
    points: DataFrame,
    queries: DataFrame,
    metric: str = "l2sq",
    exclude_self: bool = True,
    round_digits: Optional[int] = None,
    **kw,
) -> DataFrame:
    """Exact 1-NN — the reference's start-point resolution scan
    (SearchWithStartPoint's linear scan, vamana.h:441-449)."""
    out = exact_knn(
        points, queries, k=1, metric=metric, exclude_self=exclude_self,
        round_digits=round_digits, **kw,
    )
    return out.select("query_id", "vec_id", "dist")


def medoid_exact(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "l2sq",
) -> DataFrame:
    """Exact medoid: argmin_i Σ_j dist(i, j)  (FindMedoid, vamana.h:656-692).

    O(n^2) distance evaluations as a self cross join + sum — only for
    modest n / oracle parity. The scale path is ``medoid_approx``.
    Returns one row ``(vec_id, total_dist)``; ties broken by vec_id.
    """
    a = points.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_a"))
    b = points.select(F.col(id_col).alias("_bid"), F.col(vec_col).alias("_b"))
    sums = (
        a.crossJoin(F.broadcast(b))
        .select("vec_id", pairwise_distance("_a", "_b", metric).alias("d"))
        .groupBy("vec_id")
        .agg(F.sum("d").alias("total_dist"))
    )
    return sums.orderBy(F.col("total_dist").asc(), F.col("vec_id").asc()).limit(1)


def medoid_approx(
    points: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """O(n) medoid: the point nearest the coordinate-wise centroid — the
    standard DiskANN-style approximation. One pass to average (map-side
    partial aggregation), one broadcast-1NN pass to resolve.
    """
    dim_row = points.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    centroid = (
        points.select(F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .orderBy("pos")
        .collect()
    )
    cvec = [float(r["m"]) for r in centroid]
    assert len(cvec) == dim
    spark = points.sparkSession
    qdf = spark.createDataFrame([(0, cvec)], "query_id long, query_vec array<double>")
    hit = nearest_point(points, qdf, exclude_self=False).first()
    return int(hit["vec_id"])
