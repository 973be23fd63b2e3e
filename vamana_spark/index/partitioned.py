"""PartitionedVamanaIndex — the beyond-broadcast scale path (SURVEY.md §7).

``VamanaIndex`` broadcasts (points matrix, graph) to every executor: ideal
up to ~10^6 x 128 f32 (~512 MB). Past that, this index keeps the data
partitioned: S shards, each with its OWN Vamana subgraph, co-located in
one DataFrame. Search never moves the index — queries (small) are
broadcast, each shard's task beam-searches its local subindex inside
``applyInPandas``, and a final window merge picks the global top-k from
S*k candidate rows per query.

Routing: shards are center-based (seeded sample centers, nearest-center
assignment), so a query can probe only its ``nprobe`` nearest shards —
the IVF trade: nprobe=S is exhaustive-across-shards (recall ≈ single
index), nprobe<S trades recall for a 1/nprobe scan cost.

This is the DiskANN sharded-serving recipe re-expressed as a Spark
dataflow: no driver-side index state, no lock, no cross-task mutation.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vamana_spark import exact
from vamana_spark.index import kernels
from vamana_spark.params import VamanaParams


class PartitionedVamanaIndex:
    """S per-shard Vamana subindexes in one co-located DataFrame.

    ``shards_df`` schema: shard int, vec_id long, local_ord int,
    embedding array<float>, neighbors array<int> (local ordinals).
    """

    def __init__(
        self,
        spark: SparkSession,
        params: VamanaParams,
        shards_df: DataFrame,
        centers: np.ndarray,
    ):
        self.spark = spark
        self.params = params
        self.shards_df = shards_df
        self.centers = centers

    # ------------------------------------------------------------------ build

    @staticmethod
    def build(
        spark: SparkSession,
        df: DataFrame,
        params: VamanaParams,
        num_shards: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "PartitionedVamanaIndex":
        params.validate()
        pts = df.select(
            F.col(id_col).cast("long").alias("vec_id"),
            F.col(vec_col).alias("embedding"),
        ).where(F.size(vec_col) == params.dim)

        # seeded sample centers (deterministic, single tiny collect)
        centers_pdf = (
            pts.orderBy(F.xxhash64(F.col("vec_id") + F.lit(params.seed)))
            .limit(num_shards)
            .toPandas()
        )
        C = np.stack(centers_pdf["embedding"].to_numpy()).astype(np.float32)
        bc = spark.sparkContext.broadcast(C)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            Cv = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                d = exact._dist_matrix(X, Cv.astype(np.float64), "l2sq")
                pdf = pdf[["vec_id", "embedding"]].copy()
                pdf["shard"] = d.argmin(axis=1).astype(np.int32)
                yield pdf

        assigned = pts.mapInPandas(
            assign, schema="vec_id long, embedding array<float>, shard int"
        )

        R, L, alpha, seed = params.R, params.L, params.alpha, params.seed
        out_schema = (
            "shard int, vec_id long, local_ord int, "
            "embedding array<float>, neighbors array<int>"
        )

        def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            from vamana_spark.index.vamana import DENSE_BUILD_MAX

            shard = int(key[0])
            pdf = pdf.sort_values("vec_id").reset_index(drop=True)
            P = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            if P.shape[0] <= DENSE_BUILD_MAX:
                graph, _ = kernels.build_vamana_dense(P, R, alpha, seed + shard)
            else:
                graph, _ = kernels.build_vamana(P, R, L, alpha, seed + shard)
            return pd.DataFrame(
                {
                    "shard": shard,
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "local_ord": np.arange(len(pdf), dtype=np.int32),
                    "embedding": pdf["embedding"],
                    "neighbors": [[int(x) for x in g] for g in graph],
                }
            )

        shards_df = assigned.groupBy("shard").applyInPandas(
            build_shard, schema=out_schema
        )
        params.n = pts.count()
        params.num_shards = num_shards
        return PartitionedVamanaIndex(spark, params, shards_df, C)

    # ----------------------------------------------------------------- search

    def search(
        self,
        queries: DataFrame,
        k: int,
        ef_search: Optional[int] = None,
        nprobe: Optional[int] = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
    ) -> DataFrame:
        """Fan-out top-k: probe ``nprobe`` nearest shards per query
        (default: all), merge per-query winners globally.

        The only shuffles are (a) the existing shard partitioning of the
        index and (b) S*k candidate rows per query into the merge window
        — query count scales out, index never moves.
        """
        S = int(self.params.num_shards)
        nprobe = S if nprobe is None else min(nprobe, S)
        ef = int(ef_search or self.params.ef_search)
        metric_k = k

        qpdf = queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        ).toPandas()
        Q = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
        qd = exact._dist_matrix(Q, self.centers.astype(np.float64), "l2sq")
        probe = np.argsort(qd, axis=1)[:, :nprobe]  # (|Q|, nprobe)

        # shard -> (query_ids, query_matrix) routing table, broadcast once
        routing: dict = {}
        qids = qpdf["query_id"].to_numpy(dtype=np.int64)
        for s in range(S):
            mask = (probe == s).any(axis=1)
            if mask.any():
                routing[s] = (qids[mask], Q[mask].astype(np.float32))
        bq = self.spark.sparkContext.broadcast(routing)

        out_schema = "query_id long, vec_id long, dist double"

        def search_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            route = bq.value.get(shard)
            if route is None or pdf.empty:
                return pd.DataFrame({"query_id": [], "vec_id": [], "dist": []}).astype(
                    {"query_id": "int64", "vec_id": "int64", "dist": "float64"}
                )
            q_ids, Qm = route
            pdf = pdf.sort_values("local_ord").reset_index(drop=True)
            P = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            graph = [np.asarray(g, dtype=np.int64) for g in pdf["neighbors"]]
            indptr, nbrs = kernels._to_csr(graph, len(graph))
            medoid = kernels.medoid_of(P)
            out_q, out_v, out_d = [], [], []
            for qid, qv in zip(q_ids, Qm):
                rid, rd, _, _ = kernels.search_topk(
                    P, indptr, nbrs, medoid, qv, metric_k, ef
                )
                out_q.extend([int(qid)] * rid.size)
                out_v.extend(ids[rid].tolist())
                out_d.extend(rd.tolist())
            return pd.DataFrame({"query_id": out_q, "vec_id": out_v, "dist": out_d})

        partial = self.shards_df.groupBy("shard").applyInPandas(
            search_shard, schema=out_schema
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("dist").asc(), F.col("vec_id").asc()
        )
        return (
            partial.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "dist", "rank")
        )

    # ------------------------------------------------------------- persist

    def save(self, path: str) -> None:
        self.shards_df.write.mode("overwrite").partitionBy("shard").parquet(
            os.path.join(path, "shards")
        )
        meta = json.loads(self.params.to_json())
        meta["centers"] = [[float(x) for x in c] for c in self.centers]
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump(meta, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PartitionedVamanaIndex":
        with open(os.path.join(path, "_meta.json")) as f:
            meta = json.load(f)
        centers = np.asarray(meta.pop("centers"), dtype=np.float32)
        params = VamanaParams(
            **{k: v for k, v in meta.items() if k in VamanaParams.__dataclass_fields__}
        )
        shards_df = spark.read.parquet(os.path.join(path, "shards"))
        return cls(spark, params, shards_df, centers)

    def degree_stats(self) -> DataFrame:
        return self.shards_df.select(
            "shard", F.size("neighbors").alias("out_degree")
        )

    def health_check(self) -> dict:
        row = (
            self.degree_stats()
            .agg(F.max("out_degree").alias("mx"), F.count("*").alias("n"))
            .first()
        )
        return {
            "ok": row["mx"] is None or row["mx"] <= self.params.R,
            "max_degree": row["mx"],
            "n": row["n"],
            "R": self.params.R,
        }


def add_points(
    index: PartitionedVamanaIndex,
    new_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> PartitionedVamanaIndex:
    """Incremental maintenance: append new vectors by rebuilding ONLY the
    shards they route to.

    The reference's AddPoint after BuildIndex leaves new nodes unwired
    (SURVEY.md §1.4 — capacity check is the only guard); here the
    center-routed layout localizes the damage: untouched shards keep
    their subgraphs byte-for-byte, touched shards re-run the (dense)
    build kernel over old+new points. At 100 TB this is the difference
    between re-indexing a petabyte and re-indexing the few shards a
    daily delta lands in.
    """
    import pandas as pd

    from vamana_spark import exact as _exact
    from vamana_spark.index import kernels as _k
    from vamana_spark.index.vamana import DENSE_BUILD_MAX

    spark = index.spark
    params = index.params
    C = index.centers
    bc = spark.sparkContext.broadcast(C)

    pts = new_df.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("embedding")
    ).where(F.size(vec_col) == params.dim)

    def assign(batches):
        Cv = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = _exact._dist_matrix(X, Cv.astype(np.float64), "l2sq")
            pdf = pdf[["vec_id", "embedding"]].copy()
            pdf["shard"] = d.argmin(axis=1).astype(np.int32)
            yield pdf

    assigned = pts.mapInPandas(
        assign, schema="vec_id long, embedding array<float>, shard int"
    )
    touched = [r["shard"] for r in assigned.select("shard").distinct().collect()]
    if not touched:
        return index

    old_touched = index.shards_df.where(F.col("shard").isin(touched)).select(
        "shard", "vec_id", "embedding"
    )
    rebuild_input = old_touched.unionByName(assigned.select("shard", "vec_id", "embedding"))

    R, L, alpha, seed = params.R, params.L, params.alpha, params.seed
    out_schema = (
        "shard int, vec_id long, local_ord int, "
        "embedding array<float>, neighbors array<int>"
    )

    def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        P = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
        if P.shape[0] <= DENSE_BUILD_MAX:
            graph, _ = _k.build_vamana_dense(P, R, alpha, seed + shard)
        else:
            graph, _ = _k.build_vamana(P, R, L, alpha, seed + shard)
        return pd.DataFrame(
            {
                "shard": shard,
                "vec_id": pdf["vec_id"].astype("int64"),
                "local_ord": np.arange(len(pdf), dtype=np.int32),
                "embedding": pdf["embedding"],
                "neighbors": [[int(x) for x in g] for g in graph],
            }
        )

    rebuilt = rebuild_input.groupBy("shard").applyInPandas(build_shard, schema=out_schema)
    untouched = index.shards_df.where(~F.col("shard").isin(touched))
    new_shards = untouched.unionByName(rebuilt)

    import dataclasses

    new_params = dataclasses.replace(params)
    new_params.n = params.n + pts.count()
    return PartitionedVamanaIndex(spark, new_params, new_shards, C)


def delete_points(
    index: PartitionedVamanaIndex,
    ids: DataFrame,
    id_col: str = "vec_id",
) -> PartitionedVamanaIndex:
    """Incremental maintenance, delete side: drop vectors by rebuilding
    ONLY the shards that held them (the partitioned-tier counterpart of
    ``VamanaIndex.delete_points``'s consolidate).

    Each point routes to exactly one shard, so the damage is local by
    construction: untouched shards keep their subgraphs byte-for-byte;
    a touched shard re-runs the (dense) build kernel over its survivors.
    A shard deleted down to zero points simply disappears from the
    layout. Centers are unchanged — routing geometry does not depend on
    membership.
    """
    import pandas as pd

    from vamana_spark.index import kernels as _k
    from vamana_spark.index.vamana import DENSE_BUILD_MAX

    spark = index.spark
    params = index.params
    doomed = ids.select(F.col(id_col).cast("long").alias("vec_id")).distinct()
    present = index.shards_df.join(F.broadcast(doomed), "vec_id").select(
        "shard", "vec_id"
    )
    n_gone = present.count()
    if n_gone == 0:
        return index
    touched = [r["shard"] for r in present.select("shard").distinct().collect()]

    survivors = (
        index.shards_df.where(F.col("shard").isin(touched))
        .join(F.broadcast(doomed), "vec_id", "left_anti")
        .select("shard", "vec_id", "embedding")
    )

    R, L, alpha, seed = params.R, params.L, params.alpha, params.seed
    out_schema = (
        "shard int, vec_id long, local_ord int, "
        "embedding array<float>, neighbors array<int>"
    )

    def build_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        P = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
        if P.shape[0] <= DENSE_BUILD_MAX:
            graph, _ = _k.build_vamana_dense(P, R, alpha, seed + shard)
        else:
            graph, _ = _k.build_vamana(P, R, L, alpha, seed + shard)
        return pd.DataFrame(
            {
                "shard": shard,
                "vec_id": pdf["vec_id"].astype("int64"),
                "local_ord": np.arange(len(pdf), dtype=np.int32),
                "embedding": pdf["embedding"],
                "neighbors": [[int(x) for x in g] for g in graph],
            }
        )

    rebuilt = survivors.groupBy("shard").applyInPandas(build_shard, schema=out_schema)
    untouched = index.shards_df.where(~F.col("shard").isin(touched))
    new_shards = untouched.unionByName(rebuilt)

    import dataclasses

    new_params = dataclasses.replace(params)
    new_params.n = (params.n or index.shards_df.count()) - n_gone
    return PartitionedVamanaIndex(spark, new_params, new_shards, index.centers)
