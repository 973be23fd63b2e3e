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
