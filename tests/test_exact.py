"""Exact kNN / medoid vs NumPy ground truth (the reference's oracle pattern:
randomized input + brute force + assert, main.cpp:104-145)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vamana_spark import exact


@pytest.fixture(scope="module")
def np_points(embeddings):
    rows = embeddings.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    P = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, P


def _np_knn(ids, P, qids, Q, k, exclude_self=False):
    """Sequential-fold brute force, ties by vec_id — the spec."""
    out = {}
    for qi, q in zip(qids, Q):
        d = ((P - q) ** 2).sum(axis=1)
        if exclude_self:
            d[ids == qi] = np.inf
        order = np.lexsort((ids, d))[:k]
        out[int(qi)] = [(int(ids[j]), float(d[j])) for j in order]
    return out


@pytest.mark.parametrize("impl", [exact.exact_knn, exact.exact_knn_batch])
def test_knn_matches_numpy(impl, embeddings, np_points):
    ids, P = np_points
    qids = ids[ids % 100 == 0]
    Q = P[np.isin(ids, qids)]
    truth = _np_knn(ids, P, qids, Q, k=5)

    queries = embeddings.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = impl(embeddings, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.dist))
    assert set(by_q) == {int(q) for q in qids}
    for q, rows in by_q.items():
        rows.sort()
        assert [v for _, v, _ in rows] == [v for v, _ in truth[q]]
        for (_, _, dist), (_, td) in zip(rows, truth[q]):
            assert dist == pytest.approx(td, abs=1e-6)
        # ascending distances, exactly k results
        ds = [d for _, _, d in rows]
        assert ds == sorted(ds) and len(rows) == 5


def test_knn_self_is_nearest(embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = exact.exact_knn(embeddings, queries, k=1).collect()
    for r in top1:
        assert r.vec_id == r.query_id and r.dist == 0.0


def test_nearest_point_excludes_self(embeddings):
    queries = embeddings.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = exact.nearest_point(embeddings, queries).collect()
    for r in got:
        assert r.vec_id != r.query_id and r.dist > 0.0


def test_medoid_exact_matches_numpy(embeddings, np_points):
    ids, P = np_points
    n = min(200, len(ids))
    ids_s, P_s = ids[:n], P[:n]
    totals = ((P_s[:, None, :] - P_s[None, :, :]) ** 2).sum(axis=2).sum(axis=1)
    want = int(ids_s[np.argmin(totals)])
    sub = embeddings.where(F.col("vec_id").isin([int(i) for i in ids_s]))
    got = exact.medoid_exact(sub).first()
    assert got.vec_id == want


def test_medoid_approx_is_reasonable(embeddings, np_points):
    ids, P = np_points
    centroid = P.mean(axis=0)
    d = ((P - centroid) ** 2).sum(axis=1)
    want = int(ids[np.argmin(d)])
    assert exact.medoid_approx(embeddings) == want


def test_ranking_metrics_hand_case(spark):
    """recall/MRR/NDCG against hand-computed values, including the
    all-miss query (every metric 0, no division blowup)."""
    import math

    from vamana_spark.quality import ranking_metrics

    truth = spark.createDataFrame(
        [(q, v, r) for q in (1, 2) for r, v in enumerate((1, 2, 3), 1)],
        "query_id long, vec_id long, rank int",
    )
    approx = spark.createDataFrame(
        [(1, 2, 1), (1, 9, 2), (1, 1, 3),   # hits at ranks 1 and 3
         (2, 9, 1), (2, 8, 2), (2, 7, 3)],  # all misses
        "query_id long, vec_id long, rank int",
    )
    rows = {r.query_id: r for r in ranking_metrics(approx, truth, k=3).collect()}
    idcg = sum(1 / math.log2(i + 1) for i in (1, 2, 3))
    dcg = 1 / math.log2(2) + 1 / math.log2(4)
    assert abs(rows[1].recall_at_k - 2 / 3) < 1e-12
    assert rows[1].mrr == 1.0
    assert abs(rows[1].ndcg - dcg / idcg) < 1e-12
    assert (rows[2].recall_at_k, rows[2].mrr, rows[2].ndcg) == (0.0, 0.0, 0.0)


def test_ranking_metrics_perfect_list_is_one(spark, embeddings):
    """An exact list evaluated against itself scores 1.0 across the
    board — the metric's fixed point."""
    from vamana_spark import exact
    from vamana_spark.quality import ranking_metrics

    q = embeddings.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t = exact.exact_knn(embeddings, q, k=5)
    rows = ranking_metrics(t, t, k=5).collect()
    assert len(rows) > 0
    assert all(r.recall_at_k == 1.0 and r.mrr == 1.0 and abs(r.ndcg - 1.0) < 1e-12
               for r in rows)
