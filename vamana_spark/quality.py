"""Recall@k — the reference's quality metric (main.cpp:135-145,
main.go:107-121; pass bar avg ≥ 0.8 at main.go:125-130)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(approx: DataFrame, truth: DataFrame, k: int) -> DataFrame:
    """Per-query recall: |approx ∩ truth| / k over (query_id, vec_id) pairs.

    Both inputs use the search result schema (query_id, vec_id, ...).
    Rows beyond rank k are ignored on both sides.
    """
    a = approx.where(F.col("rank") <= k).select("query_id", "vec_id")
    t = truth.where(F.col("rank") <= k).select("query_id", "vec_id")
    hits = a.join(t, ["query_id", "vec_id"], "inner").groupBy("query_id").agg(
        F.count("*").alias("n_hits")
    )
    per_q = (
        t.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k)).alias("recall"),
        )
    )
    return per_q


def recall_with_ok(
    approx: DataFrame, truth: DataFrame, k: int, threshold: float = 0.8
) -> DataFrame:
    """Per-query recall plus a hard ``ok`` assertion column: every row
    carries ``avg(recall over ALL queries) >= threshold``, so a rows-only
    correctness check still records a pass/fail signal instead of a bare
    row count. The global window collapses to one partition — fine here
    because the query set is a bounded gate sample (tens of rows), never
    dataset-sized."""
    from pyspark.sql import Window

    per_q = recall_at_k(approx, truth, k)
    w = Window.partitionBy()
    return per_q.withColumn(
        "ok", F.avg("recall").over(w) >= F.lit(float(threshold))
    )


def avg_recall(approx: DataFrame, truth: DataFrame, k: int) -> float:
    row = recall_at_k(approx, truth, k).agg(F.avg("recall").alias("r")).first()
    return float(row["r"]) if row["r"] is not None else 0.0


def ranking_metrics(
    approx: DataFrame, truth: DataFrame, k: int, round_digits: int | None = None
) -> DataFrame:
    """Per-query IR quality of an approximate top-k against an exact
    truth ranking: recall@k, MRR (reciprocal rank of the first true
    neighbor found), and binary NDCG@k — the evaluation harness run
    before shipping a quantized/ANN searcher. Both inputs use the
    search result schema (query_id, vec_id, rank); relevance is binary
    membership in the truth top-k, IDCG is computed from the truth
    ranks so NDCG is 1.0 iff the approx list is a permutation-free
    match of the ideal prefix order.

    Declarative: one (query_id, vec_id) equi-join + two per-query
    aggregations, all metric math in DOUBLE (ln-based log2, the
    engine-portable form the sampling oracles already rely on) — the
    whole thing is reproducible by an external SQL engine.
    Scale shape: the join is k rows per query on both sides; map-side
    partial aggs; no metric ever funnels more than k·|Q| rows.
    """
    log2 = lambda c: F.log(c) / F.log(F.lit(2.0))  # noqa: E731
    a = approx.where(F.col("rank") <= k).select(
        "query_id", "vec_id", F.col("rank").cast("double").alias("_ar")
    )
    t = truth.where(F.col("rank") <= k).select(
        "query_id", "vec_id", F.col("rank").cast("double").alias("_tr")
    )
    j = a.join(t, ["query_id", "vec_id"], "left")
    rel = F.col("_tr").isNotNull()
    per = j.groupBy("query_id").agg(
        (F.sum(F.when(rel, 1.0).otherwise(0.0)) / F.lit(float(k))).alias(
            "recall_at_k"
        ),
        F.coalesce(
            F.lit(1.0) / F.min(F.when(rel, F.col("_ar"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(
            F.when(rel, F.lit(1.0) / log2(F.col("_ar") + F.lit(1.0))).otherwise(0.0)
        ).alias("_dcg"),
    )
    idcg = t.groupBy("query_id").agg(
        F.sum(F.lit(1.0) / log2(F.col("_tr") + F.lit(1.0))).alias("_idcg")
    )
    out = (
        idcg.join(per, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("recall_at_k", F.lit(0.0)).alias("recall_at_k"),
            F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
            (F.coalesce("_dcg", F.lit(0.0)) / F.col("_idcg")).alias("ndcg"),
        )
    )
    if round_digits is not None:
        out = out.select(
            "query_id",
            *[F.round(c, round_digits).alias(c) for c in ("recall_at_k", "mrr", "ndcg")],
        )
    return out
