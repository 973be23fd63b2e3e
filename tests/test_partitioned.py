"""PartitionedVamanaIndex: beyond-broadcast sharded build + fan-out search."""

import pytest
from pyspark.sql import functions as F

from vamana_spark import VamanaParams, exact, quality
from vamana_spark.index.partitioned import PartitionedVamanaIndex


@pytest.fixture(scope="module")
def pidx(spark, embeddings):
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    return PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.where(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_build_covers_all_points(pidx, embeddings):
    assert pidx.shards_df.count() == embeddings.count()
    hc = pidx.health_check()
    assert hc["ok"], hc


def test_exhaustive_probe_recall(pidx, embeddings, queries):
    truth = exact.exact_knn(embeddings, queries, k=10)
    approx = pidx.search(queries, k=10)  # nprobe=all shards
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.8, f"partitioned recall@10 = {r}"


def test_graph_free_build_serves_identically(spark, embeddings, queries):
    """graph=False (IVF-flat) must return byte-identical search results
    to the forced-graph build at shard sizes under the brute crossover
    — the searchers take the same exact kernel, the graph is dead
    weight — for both the flat and the PQ path, at partial and
    exhaustive nprobe, and even when brute_threshold=0 tries to force
    the graph walk (a graph-free shard must override it)."""
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    gidx = PartitionedVamanaIndex.build(
        spark, embeddings, params, num_shards=4, graph=True
    )
    flat_idx = PartitionedVamanaIndex.build(
        spark, embeddings, params, num_shards=4, graph=False
    )
    assert flat_idx.shards_df.where(F.size("neighbors") > 0).count() == 0
    assert gidx.shards_df.where(F.size("neighbors") > 0).count() > 0

    def rows(df):
        return sorted(
            (r.query_id, r.vec_id, round(r.dist, 6), r.rank) for r in df.collect()
        )

    for kw in ({}, {"nprobe": 2}):
        assert rows(flat_idx.search(queries, k=5, **kw)) == rows(
            gidx.search(queries, k=5, **kw)
        ), kw
    # brute_threshold=0 forces the graph walk on a graph index; the
    # graph-free index must override it back to brute and still match
    # the auto-path (= brute at these shard sizes) exactly
    assert rows(flat_idx.search(queries, k=5, brute_threshold=0)) == rows(
        gidx.search(queries, k=5)
    )
    assert rows(flat_idx.search_pq(queries, k=5)) == rows(
        gidx.search_pq(queries, k=5)
    )
    for ix in (gidx, flat_idx):
        ix.unpersist_packed()
        ix.shards_df.unpersist()


def test_graph_auto_decides_per_shard(spark, embeddings):
    """Default graph=None builds a shard's graph only when its row
    count exceeds the 4·ef·R flat crossover: with a tiny cap every
    shard gets a graph, with a huge cap none do."""
    def per_shard(idx):
        return idx.shards_df.groupBy("shard").agg(
            F.count("*").alias("n"), F.max(F.size("neighbors")).alias("mx")
        ).collect()

    small_cap = VamanaParams(dim=64, alpha=1.2, R=2, L=8, ef_search=4, seed=42)
    idx = PartitionedVamanaIndex.build(spark, embeddings, small_cap, num_shards=4)
    for r in per_shard(idx):  # crossover = 4*4*2 = 32 rows
        assert (r.mx > 0) == (r.n > 32), (r.shard, r.n, r.mx)
    idx.shards_df.unpersist()
    big_cap = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=100, seed=42)
    idx2 = PartitionedVamanaIndex.build(spark, embeddings, big_cap, num_shards=4)
    for r in per_shard(idx2):  # crossover = 12800 rows >> any shard here
        assert r.mx == 0, (r.shard, r.n, r.mx)
    idx2.shards_df.unpersist()


def test_nprobe_tradeoff_runs(pidx, queries):
    res = pidx.search(queries, k=5, nprobe=2).collect()
    per_q = {}
    for r in res:
        per_q.setdefault(r.query_id, []).append(r.dist)
    assert len(per_q) == queries.count()
    for ds in per_q.values():
        assert sorted(ds) == ds or ds == sorted(ds)
        assert len(ds) == 5


def test_save_load_roundtrip(tmp_path, spark, pidx, queries):
    path = str(tmp_path / "pidx")
    pidx.save(path)
    loaded = PartitionedVamanaIndex.load(spark, path)
    assert loaded.params.num_shards == pidx.params.num_shards
    a = sorted(
        (r.query_id, r.rank, r.vec_id) for r in pidx.search(queries, k=5).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.vec_id) for r in loaded.search(queries, k=5).collect()
    )
    assert a == b


def test_add_points_rebuilds_only_touched_shards(spark, embeddings):
    from pyspark.sql import functions as F

    from vamana_spark.index.partitioned import add_points

    base = embeddings.where(F.col("vec_id") < 400)
    delta = embeddings.where(F.col("vec_id") >= 400)
    params = VamanaParams(dim=64, alpha=1.2, R=16, L=32, ef_search=64, seed=42)
    idx = PartitionedVamanaIndex.build(spark, base, params, num_shards=4)
    idx.shards_df = idx.shards_df.cache()
    before = {
        (r.shard, r.vec_id): tuple(r.neighbors)
        for r in idx.shards_df.select("shard", "vec_id", "neighbors").collect()
    }

    grown = add_points(idx, delta)
    assert grown.shards_df.count() == embeddings.count()
    hc = grown.health_check()
    assert hc["ok"], hc

    after = {
        (r.shard, r.vec_id): tuple(r.neighbors)
        for r in grown.shards_df.select("shard", "vec_id", "neighbors").collect()
    }
    touched = {s for (s, v) in after if v >= 400}
    untouched = set(r.shard for r in idx.shards_df.select("shard").distinct().collect()) - touched
    # untouched shards preserved exactly
    for key, nb in before.items():
        if key[0] in untouched:
            assert after[key] == nb
    # new points searchable
    q = delta.limit(5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = grown.search(q, k=1).collect()
    assert all(r.vec_id == r.query_id and r.dist == 0.0 for r in res)


def test_recall_after_append(spark, embeddings, queries):
    """q_index_append's invariant: build on 80%, append 20%, recall@10
    over the FULL set stays >= 0.8 (appended points must be findable)."""
    from pyspark.sql import functions as F

    from vamana_spark import exact, quality
    from vamana_spark.index.partitioned import add_points

    params = VamanaParams(dim=64, alpha=1.2, R=32, L=64, ef_search=96, seed=42)
    base = PartitionedVamanaIndex.build(
        spark, embeddings.where(F.col("vec_id") % 5 != 0), params, num_shards=4
    )
    grown = add_points(base, embeddings.where(F.col("vec_id") % 5 == 0))
    truth = exact.exact_knn(embeddings, queries, k=10)
    r = quality.avg_recall(grown.search(queries, k=10), truth, k=10)
    assert r >= 0.8, f"recall after append = {r}"


def test_delete_points_rebuilds_only_touched_shards(spark, embeddings, queries):
    from vamana_spark.index.partitioned import (
        PartitionedVamanaIndex,
        delete_points,
    )

    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=80, seed=5)
    idx = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    doomed = embeddings.where(F.col("vec_id") % 7 == 2).select("vec_id")
    doomed_ids = {r.vec_id for r in doomed.collect()}
    idx2 = delete_points(idx, doomed)
    assert idx2.params.n == idx.params.n - len(doomed_ids)
    # deleted ids gone from the layout and from search results
    assert idx2.shards_df.where(F.col("vec_id").isin(doomed_ids)).count() == 0
    res = idx2.search(queries, k=10).collect()
    assert not ({r.vec_id for r in res} & doomed_ids)
    # untouched shards byte-identical: every surviving (shard, vec_id)
    # from an untouched shard keeps its neighbor list
    touched = {
        r.shard
        for r in idx.shards_df.join(doomed, "vec_id").select("shard").distinct().collect()
    }
    before = {
        (r.shard, r.vec_id): list(r.neighbors)
        for r in idx.shards_df.where(~F.col("shard").isin(touched)).collect()
    }
    after = {
        (r.shard, r.vec_id): list(r.neighbors)
        for r in idx2.shards_df.where(~F.col("shard").isin(touched)).collect()
    }
    assert before == after
    # recall over survivors
    remaining = embeddings.join(doomed, "vec_id", "left_anti")
    truth = exact.exact_knn_batch(remaining, queries, k=10)
    r = quality.avg_recall(idx2.search(queries, k=10), truth, k=10)
    assert r >= 0.8, f"post-delete partitioned recall {r}"


def test_pq_search_recall(pidx, embeddings, queries):
    """ADC graph walk + exact re-rank: recall@10 >= 0.8 vs exact kNN
    (the q_partitioned_pq invariant)."""
    truth = exact.exact_knn(embeddings, queries, k=10)
    approx = pidx.search_pq(queries, k=10, pq_m=8)
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.8, f"partitioned PQ recall@10 = {r}"


def test_pq_default_operating_point_recall(pidx, embeddings, queries):
    """The DEFAULTS (m=16, rerank=10k) must clear the gate with margin
    — the r6 finding was a default operating point (m=8, rerank=4k)
    measuring 0.60-0.68 while the tests pinned better explicit params.
    Measured at 25k: m=16/rerank=100 holds 0.91 (sweep tool)."""
    truth = exact.exact_knn(embeddings, queries, k=10)
    r = quality.avg_recall(pidx.search_pq(queries, k=10), truth, k=10)
    assert r >= 0.85, f"default-params PQ recall@10 = {r}"


def test_default_nprobe_rule(pidx):
    """max(3, ceil(S/4)) capped at S — the measured-curve serving
    default (sweep: nprobe=2 -> 0.803 on the gate's edge; 3 -> 0.914)."""
    from vamana_spark.index.partitioned import PartitionedVamanaIndex

    assert pidx.default_nprobe == min(int(pidx.params.num_shards), 3)
    for S, want in ((1, 1), (2, 2), (4, 3), (8, 3), (16, 4), (32, 8), (256, 64)):
        fake = object.__new__(PartitionedVamanaIndex)
        fake.params = type("P", (), {"num_shards": S})()
        fake.recommended_nprobe = None
        assert PartitionedVamanaIndex.default_nprobe.fget(fake) == want, S
        # a calibrated value overrides the S/4 fallback, capped at S
        fake.recommended_nprobe = 5
        assert PartitionedVamanaIndex.default_nprobe.fget(fake) == min(S, 5), S


def test_oversized_cells_split_on_skewed_corpus(spark):
    """r8 skew guard: on a blobby corpus where one k-means cell swallows
    most of the data (measured at the 1M k-blob rung: straggler cells
    crossed the graph crossover and their dense kernels dominated the
    build), cells past max_shard_factor x the fair share hash-split
    into sub-shards repeating the parent center. Asserts the split
    actually fires, the realized max shard stays bounded, every point
    is indexed, and exhaustive search stays above the recall gate."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    centers = rng.uniform(-1, 1, (4, 16)).astype(np.float32)
    # 70% of points in blob 0 -> its cell must split; 10% in each other
    which = np.concatenate(
        [np.zeros(3500, np.int64)] + [np.full(500, b, np.int64) for b in (1, 2, 3)]
    )
    X = centers[which] + rng.normal(0, 0.05, (5000, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(5000, dtype=np.int64), "embedding": list(X.astype(np.float32))}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=4, overlap=2
    )
    S = int(idx.params.num_shards)
    assert S > 4, "the 70% cell must have split"
    assert idx.centers.shape[0] == S
    sizes = {r["shard"]: r["count"] for r in idx.shards_df.groupBy("shard").count().collect()}
    assert idx.shards_df.select("vec_id").distinct().count() == 5000
    # fair share with overlap 2; sample-estimated splitting + hash
    # leveling must keep the realized max within ~the factor (slack for
    # sample noise)
    fair = 2 * 5000 / S
    assert max(sizes.values()) <= 2.6 * fair, (S, sizes)
    q = df.limit(20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = exact.exact_knn(df, q, k=5)
    r = quality.avg_recall(idx.search(q, k=5), truth, k=5)
    assert r >= 0.9, f"post-split recall@5 = {r}"
    # disabled guard: max_shard_factor=None restores one cell per center
    idx0 = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=4, overlap=2, max_shard_factor=None
    )
    assert int(idx0.params.num_shards) == 4


def test_add_delete_on_split_index(spark):
    """Incremental maintenance must stay correct on an index whose
    centers carry duplicate rows from the r8 skew split: added points
    route against the expanded center matrix (ties may land copies in
    sub-shards of one cell — dedupe owns that) and stay findable;
    deletes rebuild only touched sub-shards."""
    import numpy as np
    import pandas as pd

    from vamana_spark.index.partitioned import add_points, delete_points

    rng = np.random.default_rng(11)
    centers = rng.uniform(-1, 1, (3, 16)).astype(np.float32)
    which = np.concatenate(
        [np.zeros(2400, np.int64), np.full(300, 1, np.int64), np.full(300, 2, np.int64)]
    )
    X = centers[which] + rng.normal(0, 0.05, (3000, 16)).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(3000, dtype=np.int64), "embedding": list(X.astype(np.float32))}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, df.where(F.col("vec_id") < 2900), params, num_shards=3, overlap=2
    )
    assert int(idx.params.num_shards) > 3  # split fired on the 80% blob
    idx2 = add_points(idx, df.where(F.col("vec_id") >= 2900))
    assert int(idx2.params.n) == 3000
    q = df.where(F.col("vec_id") >= 2990).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top1 = {
        r.query_id: r.vec_id
        for r in idx2.search(q, k=1).where(F.col("rank") == 1).collect()
    }
    assert all(top1[qid] == qid for qid in top1), top1  # self-findable
    idx3 = delete_points(idx2, df.where(F.col("vec_id") % 100 == 0))
    assert idx3.shards_df.where(F.col("vec_id") % 100 == 0).count() == 0
    hits = idx3.search(q, k=3)
    assert hits.join(
        df.where(F.col("vec_id") % 100 == 0).select(F.col("vec_id")), "vec_id"
    ).count() == 0  # deleted points never surface


def test_routing_concentration_separates_clustered_from_uniform(spark, pidx, embeddings, queries):
    """r8 diagnostic: true-NN primary-shard concentration reads ~1 on a
    blobby corpus (routing does the work) and spreads out on uniform
    data — the number that picks the serving nprobe from the data
    (measured 1.12 clustered vs 8.64 uniform at the 1M rung)."""
    import numpy as np
    import pandas as pd

    from vamana_spark.index.diagnostics import routing_concentration

    # clustered: 4 tight blobs, 4 shards -> every query's true 5-NN in 1 shard
    rng = np.random.default_rng(3)
    centers = rng.uniform(-1, 1, (4, 16)).astype(np.float32)
    X = (
        centers[np.arange(2000) % 4]
        + rng.normal(0, 0.03, (2000, 16)).astype(np.float32)
    ).astype(np.float32)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(2000, dtype=np.int64), "embedding": list(X)}),
        "vec_id long, embedding array<float>",
    )
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    cidx = PartitionedVamanaIndex.build(spark, df, params, num_shards=4, overlap=2)
    q = df.limit(25).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    conc = routing_concentration(cidx, exact.exact_knn(df, q, k=5))
    avg_c = conc.agg(F.avg("n_primary_shards")).first()[0]
    assert conc.count() == 25
    assert avg_c <= 1.5, avg_c
    # uniform testdata embeddings on the module pidx: neighbors scatter
    conc_u = routing_concentration(
        pidx, exact.exact_knn(embeddings, queries, k=10)
    )
    avg_u = conc_u.agg(F.avg("n_primary_shards")).first()[0]
    assert avg_u > 1.8, avg_u  # 4 shards: uniform 10-NN span most of them


def test_pq_pack_codebook_strategies(pidx, embeddings, queries):
    """r8: PQ packs encode against ONE sample-trained global codebook
    by default (the per-shard k-means was 842 s of the 10M rung's pack
    for no measured recall benefit); per_shard_codebooks=True restores
    shard-local fits. Both must search above the recall gate; the
    global pack must carry the identical codebook in every blob."""
    import io

    import numpy as np

    g = [
        np.load(io.BytesIO(r.blob))
        for r in pidx._packed_df("pq", 8, 16).collect()
    ]
    for z in g[1:]:
        assert np.array_equal(z["cents"], g[0]["cents"])
    ps = [
        np.load(io.BytesIO(r.blob))
        for r in pidx._packed_df("pq", 8, 16, per_shard_codebooks=True).collect()
    ]
    assert any(not np.array_equal(z["cents"], ps[0]["cents"]) for z in ps[1:])
    truth = exact.exact_knn(embeddings, queries, k=10)
    r = quality.avg_recall(
        pidx.search_pq(queries, k=10, per_shard_codebooks=True), truth, k=10
    )
    assert r >= 0.8, f"per-shard-codebook PQ recall@10 = {r}"


def test_pq_pack_excludes_float_matrix(pidx):
    """The beyond-RAM pack must hold codes, not the float32 points: the
    pq blob for a shard is smaller than the flat blob. (ksub=16 here —
    at test scale n ≈ ksub so a full 256-entry codebook would rival the
    point matrix it replaces; at real shard sizes codes dominate.)"""
    flat = {r.shard: len(r.blob) for r in pidx._packed_df("flat").collect()}
    pq = {r.shard: len(r.blob) for r in pidx._packed_df("pq", 8, 16).collect()}
    for s, fb in flat.items():
        assert pq[s] < fb, (s, pq[s], fb)


def test_search_plan_no_driver_collect_no_cross_product(pidx, queries):
    """r4 verdict items 1-2: routing is an executor-side mapInPandas +
    cogroup on the shard key — the plan has the CoGroup pandas operator
    and no cartesian/nested-loop join anywhere."""
    res = pidx.search(queries, k=5)
    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    p = buf.getvalue()
    assert "FlatMapCoGroupsInPandas" in p, p
    assert "CartesianProduct" not in p, p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_overlap_build_and_nprobe_recall(spark, embeddings, queries):
    """DiskANN ell-closest-center overlap: 2x storage, each point in 2
    shards; results stay duplicate-free and nprobe<S recall strictly
    improves over the non-overlap layout (both seeded/deterministic)."""
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    flat = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    ov = PartitionedVamanaIndex.build(
        spark, embeddings, params, num_shards=4, overlap=2
    )
    n = embeddings.count()
    assert ov.shards_df.count() == 2 * n
    assert ov.params.shard_overlap == 2
    truth = exact.exact_knn(embeddings, queries, k=10)
    res = ov.search(queries, k=10)
    # no (query, point) duplicates despite two copies per point
    assert (
        res.groupBy("query_id", "vec_id").count().where(F.col("count") > 1).count()
        == 0
    )
    assert quality.avg_recall(res, truth, k=10) >= 0.8
    r_flat = quality.avg_recall(flat.search(queries, k=10, nprobe=2), truth, k=10)
    r_ov = quality.avg_recall(ov.search(queries, k=10, nprobe=2), truth, k=10)
    assert r_ov > r_flat, (r_ov, r_flat)
    # PQ serving path dedupes the re-rank join too
    rpq = ov.search_pq(queries, k=10)
    assert (
        rpq.groupBy("query_id", "vec_id").count().where(F.col("count") > 1).count()
        == 0
    )
    assert quality.avg_recall(rpq, truth, k=10) >= 0.8


def test_save_load_roundtrip_preserves_overlap(tmp_path, spark, embeddings, queries):
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    ov = PartitionedVamanaIndex.build(
        spark, embeddings, params, num_shards=4, overlap=2
    )
    path = str(tmp_path / "pidx_ov")
    ov.save(path)
    loaded = PartitionedVamanaIndex.load(spark, path)
    assert loaded.params.shard_overlap == 2
    a = sorted(
        (r.query_id, r.rank, r.vec_id) for r in ov.search(queries, k=5).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in loaded.search(queries, k=5).collect()
    )
    assert a == b and a


def test_save_with_packs_serves_without_repacking(tmp_path, spark, pidx, queries):
    path = str(tmp_path / "pidx_packed")
    pidx.save(path, packs=("flat", ("pq", 8, 32)))
    loaded = PartitionedVamanaIndex.load(spark, path)
    # the saved packs are discovered and used instead of re-packing
    assert ("flat", 8, 256, False) in loaded._packed_paths
    assert ("pq", 8, 32, False) in loaded._packed_paths
    a = sorted(
        (r.query_id, r.rank, r.vec_id) for r in pidx.search(queries, k=5).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in loaded.search(queries, k=5).collect()
    )
    assert a == b
    # PQ serving from the saved pack agrees with the fresh-pack path
    ap = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in pidx.search_pq(queries, k=5, pq_m=8, pq_ksub=32).collect()
    )
    bp = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in loaded.search_pq(queries, k=5, pq_m=8, pq_ksub=32).collect()
    )
    assert ap == bp
    loaded.unpersist_packed()


def test_cosine_metric_recall(spark, embeddings, queries):
    params = VamanaParams(
        dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42, metric="cosine"
    )
    pidx = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    truth = exact.exact_knn(embeddings, queries, k=10, metric="cosine")
    approx = pidx.search(queries, k=10)
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.8, f"partitioned cosine recall@10 = {r}"
    # PQ serving walks the normalized space and re-ranks with exact cosine
    approx_pq = pidx.search_pq(queries, k=10, pq_m=8, pq_ksub=32)
    rp = quality.avg_recall(approx_pq, truth, k=10)
    assert rp >= 0.7, f"partitioned cosine PQ recall@10 = {rp}"
    pidx.unpersist_packed()


def test_ip_metric_matches_exact_top1(spark, embeddings, queries):
    params = VamanaParams(
        dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42, metric="ip"
    )
    pidx = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    assert pidx.params.mips_m is not None and pidx.params.mips_m > 0
    truth = exact.exact_knn(embeddings, queries, k=10, metric="ip")
    approx = pidx.search(queries, k=10)
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.8, f"partitioned ip recall@10 = {r}"
    # reported dist is -<q,x>, identical convention to the exact oracle
    a = {(x.query_id, x.vec_id): x.dist for x in approx.collect()}
    t = {(x.query_id, x.vec_id): x.dist for x in truth.collect()}
    common = set(a) & set(t)
    assert common
    for key in list(common)[:50]:
        assert abs(a[key] - t[key]) < 1e-2, (key, a[key], t[key])
    pidx.unpersist_packed()


def test_ip_pq_serving_recall(spark, embeddings, queries):
    """PQ serving under metric='ip' (r10; the reference's declared TODO,
    vamana.h:695 / readme.md:76): residuals quantized in the
    MIPS-augmented space the flat pack already uses, zero-padded to the
    subspace alignment, exact -dot re-rank. Gates: recall@10 >= 0.9 vs
    exact ip kNN, pq_profile accepts ip, and the re-ranked distances
    match the exact oracle's -<q,x> convention."""
    params = VamanaParams(
        dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42, metric="ip"
    )
    pidx = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    prof = pidx.pq_profile()  # must not raise; augmented width is padded
    assert 64 % int(prof["pq_m"]) == 0
    assert 0.0 < float(prof["adc_agreement"]) <= 1.0
    truth = exact.exact_knn(embeddings, queries, k=10, metric="ip")
    approx = pidx.search_pq(queries, k=10)
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.9, f"ip PQ recall@10 = {r}"
    a = {(x.query_id, x.vec_id): x.dist for x in approx.collect()}
    t = {(x.query_id, x.vec_id): x.dist for x in truth.collect()}
    common = set(a) & set(t)
    assert common
    for key in list(common)[:50]:
        assert abs(a[key] - t[key]) < 1e-2, (key, a[key], t[key])
    # the per-shard-codebook strategy pads identically (dsub derives
    # from the padded width inside the pack kernel)
    r_ps = quality.avg_recall(
        pidx.search_pq(queries, k=10, per_shard_codebooks=True), truth, k=10
    )
    assert r_ps >= 0.9, f"ip PQ per-shard recall@10 = {r_ps}"
    pidx.unpersist_packed()


def test_overlap_dedupe_single_exchange(spark, embeddings, queries):
    """The overlap dedupe window and the merge window share ONE exchange:
    pre-partitioning on query_id satisfies both clusterings."""
    import contextlib
    import io as _io

    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    pidx = PartitionedVamanaIndex.build(
        spark, embeddings, params, num_shards=4, overlap=2
    )
    res = pidx.search(queries, k=5)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the merge segment is everything above the cogroup: it must hold
    # both Window ops fed by exactly ONE exchange (the query_id
    # repartition) — no second shuffle between dedupe and rank
    top = plan.split("FlatMapCoGroupsInPandas")[0]
    assert top.count("Window [") == 2, top
    assert top.count("Exchange") == 1, top
    assert "hashpartitioning(query_id" in top, top
    pidx.unpersist_packed()


def test_metric_index_save_load_roundtrip(tmp_path, spark, embeddings, queries):
    """A cosine/ip partitioned index round-trips with its metric state:
    params carry metric/mips_m, centers keep the transformed dimension
    (dim+1 for ip), and the loaded index searches identically."""
    for metric in ("cosine", "ip"):
        params = VamanaParams(
            dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42, metric=metric
        )
        pidx = PartitionedVamanaIndex.build(
            spark, embeddings, params, num_shards=4
        )
        path = str(tmp_path / f"pidx_{metric}")
        pidx.save(path)
        loaded = PartitionedVamanaIndex.load(spark, path)
        assert loaded.params.metric == metric
        if metric == "ip":
            assert loaded.params.mips_m == pidx.params.mips_m
            assert loaded.centers.shape[1] == 65  # augmented dimension
        a = sorted(
            (r.query_id, r.rank, r.vec_id)
            for r in pidx.search(queries, k=5).collect()
        )
        b = sorted(
            (r.query_id, r.rank, r.vec_id)
            for r in loaded.search(queries, k=5).collect()
        )
        assert a == b
        pidx.unpersist_packed(); loaded.unpersist_packed()


def test_partitioned_get_point_and_describe(pidx, embeddings):
    row = pidx.get_point(50).collect()
    assert len(row) == 1 and row[0].vec_id == 50
    want = [
        float(x)
        for x in embeddings.where(F.col("vec_id") == 50).first()["embedding"]
    ]
    assert [float(x) for x in row[0].embedding] == want
    d = pidx.describe()
    assert d["num_shards"] == 4 and d["num_centers"] == 4
    assert pidx.data_size == embeddings.count()


def test_partitioned_filtered_search(pidx, embeddings):
    q = embeddings.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        (F.col("vec_id") % 7).alias("want_label"),
    )
    truth = exact.exact_knn_filtered(embeddings, q, k=5)
    approx = pidx.search_filtered(
        q, k=5, labels=embeddings.select("vec_id", "label"), overfetch=16
    )
    lbl = {r.vec_id: r.label for r in embeddings.select("vec_id", "label").collect()}
    ap = {}
    for r in approx.collect():
        assert lbl[r.vec_id] == r.query_id % 7  # predicate honored
        ap.setdefault(r.query_id, set()).add(r.vec_id)
    tr = {}
    for r in truth.collect():
        tr.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(ap.get(k, set()) & v) for k, v in tr.items())
    total = sum(len(v) for v in tr.values())
    assert hits / total >= 0.85, f"partitioned filtered recall {hits/total}"


def test_partitioned_range_search_agrees_with_exact(pidx, embeddings, queries):
    # ball of ~30 points/query at sf0.01 — comfortably inside the beam
    radius = 1.6
    truth = {}
    for r in exact.range_search(embeddings, queries, radius=radius).collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in pidx.range_search(queries, radius=radius, ef_search=128).collect():
        assert r.dist <= radius
        got.setdefault(r.query_id, set()).add(r.vec_id)
    hits = sum(len(got.get(k, set()) & v) for k, v in truth.items())
    total = sum(len(v) for v in truth.values())
    assert total > 0 and hits / total >= 0.85, f"range recall {hits/total}"


def test_brute_path_exhaustive_equals_exact(pidx, embeddings, queries):
    """Small shards + exhaustive probes: the per-shard BLAS scan makes
    the fan-out search EXACT — the merged top-k must equal exact kNN's
    ids rank-for-rank (every shard's exact top-k includes every global
    winner stored there)."""
    truth = {
        (r.query_id, r.rank): r.vec_id
        for r in exact.exact_knn(embeddings, queries, k=10).collect()
    }
    got = {
        (r.query_id, r.rank): r.vec_id
        for r in pidx.search(queries, k=10).collect()  # default: brute
    }
    assert got == truth


def test_beam_path_still_green(pidx, embeddings, queries):
    """brute_threshold=0 forces the graph kernel on every shard — the
    beam path must stay recall-green so the auto-switch never hides a
    graph regression."""
    truth = exact.exact_knn(embeddings, queries, k=10)
    approx = pidx.search(queries, k=10, brute_threshold=0)
    r = quality.avg_recall(approx, truth, k=10)
    assert r >= 0.8, f"beam-path recall@10 = {r}"


def test_pq_brute_and_beam_paths_agree(pidx, embeddings, queries):
    """Both ADC paths (exhaustive scan vs graph walk) feed the same
    exact re-rank; each must clear the PQ recall gate."""
    truth = exact.exact_knn(embeddings, queries, k=10)
    for thr in (None, 0):  # None -> brute at this shard size, 0 -> beam
        approx = pidx.search_pq(queries, k=10, brute_threshold=thr)
        r = quality.avg_recall(approx, truth, k=10)
        assert r >= 0.7, f"pq path thr={thr}: recall@10 = {r}"


def test_brute_kernels_match_reference():
    """NumPy-level: the BLAS scan equals a naive exact reference, and
    the exhaustive ADC scan equals a naive LUT sum."""
    import numpy as np

    from vamana_spark.index import kernels

    rng = np.random.default_rng(3)
    P = rng.standard_normal((37, 16)).astype(np.float32)
    Q = rng.standard_normal((11, 16)).astype(np.float32)
    rq, rid, rd = kernels.brute_topk_batch(P, Q, k=5)
    D = ((Q[:, None, :].astype(np.float64) - P[None, :, :]) ** 2).sum(-1)
    for qi in range(11):
        ids = rid[rq == qi]
        want = np.lexsort((np.arange(37), D[qi]))[:5]
        assert list(ids) == list(want), qi
        assert np.allclose(rd[rq == qi], D[qi][want], atol=1e-5)

    m, ksub, dsub = 4, 8, 4
    cents = rng.standard_normal((m, ksub, dsub)).astype(np.float32)
    codes = rng.integers(0, ksub, size=(37, m)).astype(np.uint8)
    rq, rid, rd = kernels.brute_topk_batch_adc(codes, cents, Q, k=5)
    lut = (
        (Q.reshape(11, m, 1, dsub).astype(np.float64) - cents[None]) ** 2
    ).sum(-1)
    Dadc = np.zeros((11, 37))
    for j in range(m):
        Dadc[:, :] += lut[:, j, codes[:, j]]
    for qi in range(11):
        ids = rid[rq == qi]
        want = np.lexsort((np.arange(37), Dadc[qi]))[:5]
        assert list(ids) == list(want), qi
        # kernel accumulates the ADC sums in float32 (dists are
        # approximate by contract); reference here is float64
        assert np.allclose(rd[rq == qi], Dadc[qi][want], atol=1e-3)


# ----------------------------------------------------------- r9 calibration


def _blob_corpus(spark, n_blobs, n_pts, sigma, dim=64, seed=7, which=None):
    """Gaussian-blob fixture in the shape LLM-pipeline corpora have
    (clusters, not uniform spread) — the corpus class where data-blind
    PQ defaults measurably collapse (SCALE.md clustered rungs).
    ``which`` optionally pins each point's blob (skewed mixes)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    C = rng.uniform(-1, 1, (n_blobs, dim)).astype(np.float32)
    if which is None:
        which = np.arange(n_pts) % n_blobs
    X = (
        C[np.asarray(which, dtype=np.int64)]
        + rng.normal(0, sigma, (n_pts, dim)).astype(np.float32)
    ).astype(np.float32)
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n_pts, dtype=np.int64), "embedding": list(X)}
        ),
        "vec_id long, embedding array<float>",
    )


def _skewed_blob_corpus(spark, dim=16, seed=11, sigma=0.05):
    """80% of the mass in one blob — the shape that fires the r8
    oversized-cell split (same mix as test_add_delete_on_split_index)."""
    import numpy as np

    which = np.concatenate(
        [
            np.zeros(2400, np.int64),
            np.full(300, 1, np.int64),
            np.full(300, 2, np.int64),
        ]
    )
    return _blob_corpus(
        spark, n_blobs=3, n_pts=3000, sigma=sigma, dim=dim, seed=seed,
        which=which,
    )


def test_pq_profile_auto_switch_on_blob_fixture(spark, pidx):
    """r9 (VERDICT r8 what's-wrong #1): the PQ serving default must be
    DATA-aware. On a dense blobby corpus the m=16 global-residual
    codebook's ADC shortlist agreement measurably collapses below the
    safety bar (the 1M clustered rung served 0.60 recall@10 with it),
    so pq_profile must auto-raise m; on uniform data m=16 agrees ~1.0
    and must be kept (code size matters — the uniform rung numbers must
    not silently double)."""
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    df = _blob_corpus(spark, n_blobs=8, n_pts=24000, sigma=0.05)
    cidx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=4, graph=False
    )
    # consider_opq=False: the isotropic-blob fixture gains ~nothing
    # from a rotation (measured 0.8602 -> 0.8844, still under the bar)
    # and the fit costs ~1 min driver-side — the OPQ ladder rung has
    # its own anisotropic-fixture test (test_opq_profile_and_serving)
    prof = cidx.pq_profile(pq_ksub=256, consider_opq=False)
    assert prof["candidates"]["16"] < 0.9, prof  # the collapse is real here
    assert prof["pq_m"] == 32, prof            # ... and the switch fires
    assert prof["per_shard_codebooks"] is False, prof
    assert prof["adc_agreement"] >= 0.9, prof
    # profile drives serving: the auto default packs m=32 blobs
    import io

    import numpy as np

    blob = np.load(
        io.BytesIO(cidx._packed_df("pq", prof["pq_m"], 256).first()["blob"])
    )
    assert blob["codes"].shape[1] == 32
    cidx.unpersist_packed()
    cidx.shards_df.unpersist()
    # uniform corpus keeps the compact default
    uprof = pidx.pq_profile(pq_ksub=256)
    assert uprof["pq_m"] == 16, uprof
    assert uprof["per_shard_codebooks"] is False, uprof
    assert uprof["adc_agreement"] >= 0.9, uprof


def test_calibrate_nprobe_clustered_vs_uniform(spark, pidx, embeddings, queries):
    """r9 (VERDICT r8 next-round #2): the serving nprobe is measured
    from the data — reachability of exact ground truth under the
    index's own probe order — instead of assumed at S/4. A clustered
    corpus calibrates to low single digits (routing does the work); the
    uniform fixture stays at-or-above the old S/4-with-floor default.
    Both must clear 0.9 recall when served at the calibrated value."""
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    df = _blob_corpus(spark, n_blobs=8, n_pts=4000, sigma=0.02)
    cidx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=8, overlap=2
    )
    S = int(cidx.params.num_shards)
    rec = cidx.calibrate_nprobe()
    assert 1 <= rec <= max(4, S // 2), (rec, S)  # not the S-ish floor
    assert cidx.default_nprobe == rec
    q = df.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    truth = exact.exact_knn(df, q, k=10)
    r = quality.avg_recall(cidx.search(q, k=10, nprobe=rec), truth, k=10)
    assert r >= 0.9, (rec, r)
    cidx.unpersist_packed()
    cidx.shards_df.unpersist()
    # uniform: calibration keeps a substantial probe fraction AND recall
    urec = pidx.calibrate_nprobe()
    uS = int(pidx.params.num_shards)
    assert urec >= max(1, uS // 4), (urec, uS)
    ur = quality.avg_recall(
        pidx.search(queries, k=10, nprobe=urec),
        exact.exact_knn(embeddings, queries, k=10),
        k=10,
    )
    assert ur >= 0.9, (urec, ur)
    pidx.recommended_nprobe = None  # module fixture: don't leak state


def test_calibration_persists_through_save_load(tmp_path, spark, pidx, queries):
    """pq_profile and recommended_nprobe ride _meta.json so a serving
    restart skips both calibration passes; pack directories encode the
    codebook strategy so a per-shard request never silently serves a
    global pack (ADVICE r8)."""
    import io

    import numpy as np

    prof = pidx.pq_profile(pq_ksub=256)
    pidx.recommended_nprobe = 3
    path = str(tmp_path / "pidx_cal")
    pidx.save(path, packs=(("pq", 8, 16), ("pq", 8, 16, True)))
    loaded = PartitionedVamanaIndex.load(spark, path)
    assert loaded._pq_profile == prof
    assert loaded.recommended_nprobe == 3
    assert loaded.default_nprobe == 3
    assert ("pq", 8, 16, False) in loaded._packed_paths
    assert ("pq", 8, 16, True) in loaded._packed_paths
    # the two strategies resolve to DIFFERENT packs after load
    g = [
        np.load(io.BytesIO(r.blob))
        for r in loaded._packed_df("pq", 8, 16).collect()
    ]
    for z in g[1:]:
        assert np.array_equal(z["cents"], g[0]["cents"])
    ps = [
        np.load(io.BytesIO(r.blob))
        for r in loaded._packed_df("pq", 8, 16, per_shard_codebooks=True).collect()
    ]
    assert any(not np.array_equal(z["cents"], ps[0]["cents"]) for z in ps[1:])
    loaded.unpersist_packed()
    pidx.recommended_nprobe = None  # module fixture: don't leak state


def test_add_points_spreads_across_subshards(spark):
    """r9 (ADVICE r8): appended points must route on the UNIQUE cell
    centers and hash into sub-shards — routing on the duplicated center
    matrix tie-broke every append into a split cell's lowest-index
    sub-shard, silently regrowing the exact skew the split guard
    removed."""
    import numpy as np

    from vamana_spark.index.partitioned import _cell_layout, add_points

    skew = _skewed_blob_corpus(spark)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(spark, skew, params, num_shards=3)
    base, nsplit, _ = _cell_layout(idx.centers)
    assert nsplit.max() > 1  # the split fired
    # append 300 fresh points into the dominant blob (blob 0 of the
    # same generator: n_blobs=1 reuses its first center)
    app = _blob_corpus(
        spark, n_blobs=1, n_pts=300, sigma=0.05, dim=16, seed=11
    ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    idx2 = add_points(idx, app)
    placed = (
        idx2.shards_df.where(F.col("vec_id") >= 1_000_000)
        .groupBy("shard")
        .count()
        .collect()
    )
    counts = {r["shard"]: r["count"] for r in placed}
    # the appended mass lands across MULTIPLE sub-shards of the split
    # cell (the bug concentrated it all in one), roughly evenly
    split_cell = int(np.argmax(nsplit))
    subs = set(range(int(base[split_cell]), int(base[split_cell] + nsplit[split_cell])))
    hit_subs = subs & set(counts)
    assert len(hit_subs) == len(subs), (counts, subs)
    in_split = sum(counts[s] for s in hit_subs)
    assert max(counts[s] for s in hit_subs) <= 0.7 * in_split, counts
    idx2.shards_df.unpersist()
    idx.shards_df.unpersist()


def test_routing_concentration_in_subshard_units(spark):
    """r9 (ADVICE r8): on a skew-split index the diagnostic must count
    in the units nprobe spends — a split cell's near-tie sub-shards all
    get probed, so a query whose true k-NN live in one split cell costs
    nsplit probes, not 1."""
    import numpy as np

    from vamana_spark.index.diagnostics import routing_concentration
    from vamana_spark.index.partitioned import _cell_layout

    skew = _skewed_blob_corpus(spark)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(spark, skew, params, num_shards=3)
    base, nsplit, _ = _cell_layout(idx.centers)
    split_cell = int(np.argmax(nsplit))
    assert nsplit[split_cell] > 1
    # queries from the dominant blob: their true neighbors live in the
    # split cell, so the sub-shard span must be ~nsplit, never 1
    q = skew.where(F.col("vec_id") % 40 == 0).where(F.col("vec_id") < 2400).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    conc = routing_concentration(idx, exact.exact_knn(skew, q, k=10))
    avg = conc.agg(F.avg("n_primary_shards")).first()[0]
    assert avg >= 0.8 * float(nsplit[split_cell]), (avg, nsplit)
    idx.shards_df.unpersist()


def test_cell_layout_roundtrip():
    """_cell_layout recovers (base, nsplit, cell_of_shard) from the
    duplicated-center matrix exactly as build() laid it out."""
    import numpy as np

    from vamana_spark.index.partitioned import _cell_layout

    rng = np.random.default_rng(5)
    C0 = rng.standard_normal((5, 8)).astype(np.float32)
    nsplit = np.array([1, 3, 1, 2, 1], dtype=np.int64)
    C = np.repeat(C0, nsplit, axis=0)
    base, ns, cell = _cell_layout(C)
    assert list(ns) == list(nsplit)
    assert list(base) == list(np.concatenate(([0], np.cumsum(nsplit)[:-1])))
    assert list(cell) == [0, 1, 1, 1, 2, 3, 3, 4]
    # pre-split index: identity layout
    b2, n2, c2 = _cell_layout(C0)
    assert list(n2) == [1] * 5 and list(c2) == list(range(5))


def test_maintenance_honors_graph_crossover(spark, embeddings):
    """r9: add_points/delete_points follow build()'s per-shard graph
    auto rule — a graph-free IVF-flat index must stay graph-free
    through maintenance (below the 4·ef·R crossover a graph is dead
    weight, and the dense rebuild kernel would cost more than the
    original build skipped), while graph=True still forces one."""
    from vamana_spark.index.partitioned import add_points, delete_points

    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark,
        embeddings.where(F.col("vec_id") < 400),
        params,
        num_shards=4,
    )
    assert idx.shards_df.where(F.size("neighbors") > 0).count() == 0
    grown = add_points(idx, embeddings.where(F.col("vec_id") >= 400))
    assert grown.shards_df.where(F.size("neighbors") > 0).count() == 0
    shrunk = delete_points(grown, embeddings.where(F.col("vec_id") % 3 == 0))
    assert shrunk.shards_df.where(F.size("neighbors") > 0).count() == 0
    # results still exact-equivalent: the brute kernel serves these sizes
    q = embeddings.where(F.col("vec_id") % 50 == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    kept = embeddings.where(F.col("vec_id") % 3 != 0)
    truth = exact.exact_knn(kept, q, k=5)
    got = shrunk.search(q, k=5)
    r = quality.avg_recall(got, truth, k=5)
    assert r == 1.0, r
    # forcing graphs through maintenance still works
    forced = add_points(idx, embeddings.where(F.col("vec_id") >= 400), graph=True)
    assert forced.shards_df.where(F.size("neighbors") > 0).count() > 0
    for ix in (idx, grown, shrunk, forced):
        ix.shards_df.unpersist()


def test_resplit_oversized_after_heavy_append(spark):
    """r9: the build-time skew guard fixes the split layout once;
    add_points preserves it, so a cell that keeps receiving appends
    outgrows its split count — resplit_oversized re-fires the guard on
    MEASURED populations, rebuilding only the re-split cells' rows
    while every other shard keeps its subgraph byte-for-byte (just
    renumbered). Serving stays exact-equivalent."""
    import numpy as np

    from vamana_spark.index.partitioned import (
        _cell_layout,
        add_points,
        resplit_oversized,
    )

    # balanced 3-blob corpus -> no split at build time
    df = _blob_corpus(spark, n_blobs=3, n_pts=1500, sigma=0.05, dim=16, seed=11)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(spark, df, params, num_shards=3)
    idx.shards_df = idx.shards_df.cache()
    base0, nsplit0, _ = _cell_layout(idx.centers)
    assert nsplit0.max() == 1  # balanced: guard did not fire

    # heavy append into blob 0 only: 4x the cell's original mass
    app = _blob_corpus(
        spark, n_blobs=1, n_pts=2000, sigma=0.05, dim=16, seed=11
    ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    grown = add_points(idx, app)
    grown.shards_df = grown.shards_df.cache()
    sizes = {r["shard"]: r["count"] for r in grown.shards_df.groupBy("shard").count().collect()}
    n_total = int(grown.params.n)
    assert max(sizes.values()) > 2.0 * n_total / 3  # skew regrew

    before = {
        (r.shard, r.vec_id): tuple(r.neighbors)
        for r in grown.shards_df.select("shard", "vec_id", "neighbors").collect()
    }
    split = resplit_oversized(grown, max_shard_factor=2.0)
    assert split is not grown
    S_new = int(split.params.num_shards)
    assert S_new > 3
    # r10: the re-split cell gets DISTINCT k-means sub-centers (trained
    # on its members — routing regains geometry inside the hot region),
    # so the old center row disappears and the new rows are unique
    # unless the over-cap hash backstop fired. The hot cell's parent
    # center must be gone; the untouched cells' centers must survive
    # byte-for-byte.
    new_center_bytes = {
        split.centers[s].tobytes(): s for s in range(S_new)
    }
    hot_cell = int(
        np.argmax([sizes.get(int(base0[c]), 0) for c in range(len(nsplit0))])
    )
    assert grown.centers[int(base0[hot_cell])].tobytes() not in new_center_bytes
    # bound holds on measured sizes
    new_sizes = {r["shard"]: r["count"] for r in split.shards_df.groupBy("shard").count().collect()}
    assert max(new_sizes.values()) <= 2.0 * n_total / S_new * 1.6, new_sizes
    # coverage: every point exactly once (overlap=1)
    assert split.shards_df.count() == n_total
    assert split.shards_df.select("vec_id").distinct().count() == n_total
    # untouched cells: subgraphs byte-for-byte, only renumbered (find
    # them by their surviving center bytes — positional ids changed)
    unchanged = [
        (int(base0[c]), new_center_bytes[grown.centers[int(base0[c])].tobytes()])
        for c in range(len(nsplit0))
        if c != hot_cell
        and grown.centers[int(base0[c])].tobytes() in new_center_bytes
    ]
    assert len(unchanged) == len(nsplit0) - 1  # every non-hot cell kept
    after = {
        (r.shard, r.vec_id): tuple(r.neighbors)
        for r in split.shards_df.select("shard", "vec_id", "neighbors").collect()
    }
    for old_shard, new_shard in unchanged:
        old_rows = {v: nb for (s, v), nb in before.items() if s == old_shard}
        new_rows = {v: nb for (s, v), nb in after.items() if s == new_shard}
        assert old_rows == new_rows, (old_shard, new_shard)
    # serving equivalence: exhaustive search matches exact kNN
    full = df.unionByName(app)
    q = full.where(F.col("vec_id") % 200 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = quality.avg_recall(
        split.search(q, k=10), exact.exact_knn(full, q, k=10), k=10
    )
    assert r == 1.0, r
    # idempotent: nothing oversized now -> no-op
    again = resplit_oversized(split, max_shard_factor=2.0)
    assert again is split
    for ix in (idx, grown, split):
        ix.shards_df.unpersist()


def test_resplit_preserves_overlap_layout(spark):
    """resplit under overlap=2: a point's copy in a NON-resplit cell
    stays where it was (renumbered only); its copy in the re-split cell
    re-hashes into a sub-shard. Coverage stays exactly overlap copies
    per point and exhaustive search stays exact."""
    from vamana_spark.index.partitioned import add_points, resplit_oversized

    df = _blob_corpus(spark, n_blobs=3, n_pts=1500, sigma=0.05, dim=16, seed=11)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=3, overlap=2
    )
    app = _blob_corpus(
        spark, n_blobs=1, n_pts=2000, sigma=0.05, dim=16, seed=11
    ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding")
    grown = add_points(idx, app)
    # overlap copies dilute the per-cell share (each point counts in 2
    # cells), so the trigger factor is lower than the overlap-1 test's
    split = resplit_oversized(grown, max_shard_factor=1.3)
    assert int(split.params.num_shards) > int(grown.params.num_shards)
    n = int(split.params.n)
    # every point appears exactly `overlap` times (one row per cell copy)
    assert split.shards_df.count() == 2 * n
    assert split.shards_df.select("vec_id").distinct().count() == n
    per_point = split.shards_df.groupBy("vec_id").count()
    assert per_point.where(F.col("count") != 2).count() == 0
    full = df.unionByName(app)
    q = full.where(F.col("vec_id") % 200 == 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = quality.avg_recall(
        split.search(q, k=10), exact.exact_knn(full, q, k=10), k=10
    )
    assert r == 1.0, r
    for ix in (idx, grown, split):
        ix.shards_df.unpersist()


# ------------------------------------------------------ r10 maintenance+cal


def test_maintenance_carries_calibration(spark):
    """r10 (VERDICT r9 missing #2): a maintained index must serve at a
    CALIBRATED operating point without manual steps when the input was
    calibrated — add/delete/resplit auto-recalibrate (policy: input
    calibrated -> re-measure; uncalibrated -> stay uncalibrated;
    recalibrate=True/False force)."""
    from vamana_spark.index.partitioned import (
        add_points,
        delete_points,
        resplit_oversized,
    )

    df = _blob_corpus(spark, n_blobs=8, n_pts=4000, sigma=0.02)
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    idx = PartitionedVamanaIndex.build(spark, df, params, num_shards=8, overlap=2)
    idx.shards_df = idx.shards_df.cache()
    S = int(idx.params.num_shards)

    # uncalibrated input -> maintenance stays uncalibrated (auto policy)
    app = _blob_corpus(spark, n_blobs=8, n_pts=400, sigma=0.02, seed=9).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    plain = add_points(idx, app)
    assert plain.recommended_nprobe is None

    rec0 = idx.calibrate_nprobe()
    assert rec0 < S  # clustered: routing does the work

    # calibrated input -> append auto-recalibrates; serving at the
    # carried default clears recall with zero manual steps
    grown = add_points(idx, app)
    assert grown.recommended_nprobe is not None
    assert grown.default_nprobe < S  # not the exhaustive/S-floor shape
    full = df.unionByName(app)
    q = full.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    r = quality.avg_recall(
        grown.search(q, k=10, nprobe=grown.default_nprobe),
        exact.exact_knn(full, q, k=10),
        k=10,
    )
    assert r >= 0.9, (grown.default_nprobe, r)

    # delete side carries too; recalibrate=False opts out
    shrunk = delete_points(grown, full.where(F.col("vec_id") % 10 == 0))
    assert shrunk.recommended_nprobe is not None
    opt_out = delete_points(grown, full.where(F.col("vec_id") % 10 == 0),
                            recalibrate=False)
    assert opt_out.recommended_nprobe is None

    # resplit: no-op on balanced data returns the SAME object with its
    # calibration intact; recalibrate=True forces a fresh measurement
    # even on an uncalibrated input
    same = resplit_oversized(grown, max_shard_factor=4.0)
    assert same is grown and same.recommended_nprobe is not None
    forced = add_points(plain, app.select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding"
    ), recalibrate=True)
    assert forced.recommended_nprobe is not None
    for ix in (idx, grown, shrunk, plain):
        ix.shards_df.unpersist()


def test_maintenance_carries_calibration_target(tmp_path, spark):
    """r11 (VERDICT r10 next-round #6): the calibration TARGET is part
    of the operating point — an operator who calibrated at 0.99 must
    stay at 0.99 through maintenance (the 11M rung served 0.899 only
    because the maintained index silently fell back to the default
    target), and the target must survive save/load. An explicit
    ``target_recall=`` on the maintenance call overrides per-pass."""
    from vamana_spark.index.partitioned import add_points

    df = _blob_corpus(spark, n_blobs=8, n_pts=4000, sigma=0.02)
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    idx = PartitionedVamanaIndex.build(spark, df, params, num_shards=8, overlap=2)
    idx.shards_df = idx.shards_df.cache()

    rec_default = idx.calibrate_nprobe()  # default 0.95 target
    rec_hi = idx.calibrate_nprobe(target_recall=0.999, safety=2.0)
    assert idx.calibration_target == 0.999 and idx.calibration_safety == 2.0
    assert rec_hi >= rec_default  # a stricter target never probes less

    # save/load round-trips the operating point
    path = str(tmp_path / "cal_idx")
    idx.save(path)
    loaded = PartitionedVamanaIndex.load(spark, path)
    assert loaded.calibration_target == 0.999
    assert loaded.calibration_safety == 2.0
    assert loaded.recommended_nprobe == idx.recommended_nprobe

    # maintenance re-measures at the CARRIED 0.999 target...
    app = _blob_corpus(spark, n_blobs=8, n_pts=400, sigma=0.02, seed=9).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    grown = add_points(idx, app)
    assert grown.calibration_target == 0.999, grown.calibration_target
    assert grown.recommended_nprobe >= rec_default
    # ...and an explicit per-pass override wins
    relaxed = add_points(idx, app, target_recall=0.9)
    assert relaxed.calibration_target == 0.9
    assert relaxed.recommended_nprobe <= grown.recommended_nprobe
    for ix in (idx, grown, relaxed):
        ix.shards_df.unpersist()
    loaded.shards_df.unpersist()


def test_resplit_fixed_point_idempotent(spark):
    """r10 (ADVICE r9): the resplit cap iterates to the fixed point of
    its own growth, so a second resplit on UNCHANGED data is a no-op —
    the old S_old-normalized rule re-fired after its own growth
    (pops [940,20,20,20] split 1->2 then 2->3 with no data change) and
    periodic maintenance kept rewriting the hot cell."""
    from vamana_spark.index.partitioned import resplit_oversized

    # ~94% of the mass in blob 0 — the advice's shape
    import numpy as np

    which = np.concatenate(
        [np.zeros(940, np.int64), np.full(20, 1, np.int64),
         np.full(20, 2, np.int64), np.full(20, 3, np.int64)]
    )
    df = _blob_corpus(spark, n_blobs=4, n_pts=1000, sigma=0.03, dim=16,
                      seed=11, which=which)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=4, max_shard_factor=None
    )
    idx.shards_df = idx.shards_df.cache()
    split = resplit_oversized(idx, max_shard_factor=2.0)
    assert split is not idx
    split.shards_df = split.shards_df.cache()
    again = resplit_oversized(split, max_shard_factor=2.0)
    assert again is split, (
        int(split.params.num_shards),
        int(again.params.num_shards),
    )
    for ix in (idx, split):
        ix.shards_df.unpersist()


def test_resplit_index_save_load_serves_identically(tmp_path, spark):
    """A geometric-resplit index (r10: trained sub-center rows in the
    center matrix) must roundtrip through save/load and serve
    bit-identical results — the C_new assembly is novel layout code."""
    from vamana_spark.index.partitioned import resplit_oversized

    df = _skewed_blob_corpus(spark)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=3, max_shard_factor=None
    )
    idx.shards_df = idx.shards_df.cache()
    split = resplit_oversized(idx, max_shard_factor=2.0)
    assert split is not idx
    path = str(tmp_path / "resplit_idx")
    split.save(path)
    loaded = PartitionedVamanaIndex.load(spark, path)
    import numpy as np

    assert np.array_equal(loaded.centers, split.centers)
    q = df.where(F.col("vec_id") % 300 == 7).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in split.search(q, k=5, nprobe=2).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in loaded.search(q, k=5, nprobe=2).collect()
    )
    assert a == b
    idx.shards_df.unpersist()
    split.unpersist_packed()
    loaded.unpersist_packed()


def test_dedupe_centers_and_tie_stable_routing(spark):
    """r10 (ADVICE r9): (a) _dedupe_centers makes distinct-cell k-means
    duplicates unambiguous before the split repeat, so _cell_layout
    can't misread two cells as one split cell; (b) when split-cell
    duplicate centers DO exist, _route orders exact ties identically to
    calibrate_nprobe's stable argsort, so a calibrated nprobe cutting
    inside a tie run serves exactly the measured probe prefix."""
    import numpy as np

    from vamana_spark.index.partitioned import (
        _cell_layout,
        _dedupe_centers,
    )

    # (a) unit: duplicate rows become pairwise distinct; layout = identity
    C = np.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    D = _dedupe_centers(C)
    assert np.unique(D, axis=0).shape[0] == 3
    assert np.allclose(D, C, atol=1e-3)
    base, nsplit, _ = _cell_layout(D)
    assert list(nsplit) == [1, 1, 1]

    # (b) behavioral: a split index (duplicated centers) routed at an
    # nprobe cutting inside the tie run must probe the stable-argsort
    # prefix — sub-shards of the split cell in ascending shard order
    from vamana_spark import exact as _exact
    from vamana_spark.index.vamana import _metric_transform

    df = _skewed_blob_corpus(spark)
    params = VamanaParams(dim=16, alpha=1.2, R=16, L=32, ef_search=48, seed=42)
    idx = PartitionedVamanaIndex.build(spark, df, params, num_shards=3)
    _, nsplit2, _ = _cell_layout(idx.centers)
    assert nsplit2.max() > 1  # the skew guard fired: duplicate centers live
    q = df.limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    take = 2
    routed = (
        idx._route(q, take, "query_id", "query_vec")
        .groupBy("query_id")
        .agg(F.sort_array(F.collect_list("shard")).alias("probes"))
        .toPandas()
        .set_index("query_id")["probes"]
    )
    qpdf = q.toPandas()
    Qt = _metric_transform(
        np.stack(qpdf["query_vec"].to_numpy()).astype(np.float32),
        params.metric, params.mips_m, query=True,
    ).astype(np.float64)
    d = _exact._dist_matrix(Qt, idx.centers.astype(np.float64), "l2sq")
    want = np.argsort(d, axis=1, kind="stable")[:, :take]
    for i, qid in enumerate(qpdf["query_id"]):
        assert sorted(routed[qid]) == sorted(int(x) for x in want[i]), qid
    idx.shards_df.unpersist()


def _aniso_blob_corpus(spark, n, sigma=0.05, ratio=6.0, dim=64, nb=8, seed=3):
    """Clustered + ANISOTROPIC fixture — within-blob noise with a
    geometric per-direction spectrum (decay ``ratio``) mixed by a fixed
    random rotation, total variance matched to an isotropic ``sigma``.
    The shape real embedding matrices have (correlated, non-axis-
    aligned), and the regime where OPQ's learned rotation buys back
    ADC agreement plain PQ loses (Ge et al. 2013)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    C = rng.uniform(-1, 1, (nb, dim))
    s = np.geomspace(1.0, 1.0 / ratio, dim)
    s *= sigma * np.sqrt(dim) / np.linalg.norm(s)
    Qmix, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    which = np.arange(n) % nb
    X = (C[which] + (rng.standard_normal((n, dim)) * s) @ Qmix).astype(
        np.float32
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(n, dtype=np.int64),
                "embedding": [[float(v) for v in r] for r in X],
            }
        ),
        "vec_id long, embedding array<float>",
    )


def test_opq_profile_and_serving(spark):
    """r11 (VERDICT r10 missing #3 / next-round #5): OPQ wired into the
    partitioned PQ tier. On the clustered+anisotropic fixture the plain
    m=16 global-residual codebook misses the 0.95 agreement bar while
    the SAME m with the learned rotation clears it (measured 0.9398 vs
    0.9531), so pq_profile must pick (m=16, opq) — half the code bytes
    of the m=32 escape — and the auto serving path must serve from the
    opq pack at >= plain-PQ recall."""
    import io

    import numpy as np

    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    df = _aniso_blob_corpus(spark, n=24000)
    idx = PartitionedVamanaIndex.build(
        spark, df, params, num_shards=4, graph=False
    )
    prof = idx.pq_profile(pq_ksub=256)
    assert prof["candidates"]["16"] < 0.95, prof   # plain misses
    assert prof["candidates"]["16-opq"] >= 0.95, prof  # rotation clears
    assert prof["pq_m"] == 16 and prof["opq"] is True, prof
    assert prof["per_shard_codebooks"] is False, prof
    # r13 (VERDICT r12 #8): the OPQ-regime decision variable rides in
    # the memo — per-cell row density next to the plain-vs-rotated
    # agreements (24k rows over 4 cells ≈ 6k p50, ± k-means imbalance)
    assert 1000 <= prof["rows_per_cell_p50"] <= 24000, prof
    assert prof["rows_per_cell_p90"] >= prof["rows_per_cell_p50"], prof

    # the auto pack really is the opq pack: blob carries the rotation
    blob = np.load(
        io.BytesIO(idx._packed_df("opq", 16, 256).first()["blob"])
    )
    assert "rot" in blob.files and blob["rot"].shape == (64, 64)
    assert blob["codes"].shape[1] == 16

    # end-to-end: equal m, shallow rerank (exposes ADC shortlist
    # quality); the rotation must not lose to plain PQ
    q = df.limit(200).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    ).cache()
    q.count()
    truth = exact.exact_knn(df, q, k=10).cache()
    truth.count()
    r_pq = quality.avg_recall(
        idx.search_pq(q, k=10, rerank=30, pq_m=16), truth, k=10
    )
    r_opq = quality.avg_recall(
        idx.search_pq(q, k=10, rerank=30, pq_m=16, opq=True), truth, k=10
    )
    assert r_opq >= r_pq - 0.005, (r_opq, r_pq)
    # profile-following default serves the opq pack at >= plain-PQ
    # recall at the SAME default settings (sample agreement
    # overestimates serving recall at corpus density — the documented
    # pq_profile caveat — so the gate is relative, not absolute;
    # measured 0.8755 auto/opq vs 0.8575 plain here)
    r_auto = quality.avg_recall(idx.search_pq(q, k=10), truth, k=10)
    r_pq100 = quality.avg_recall(idx.search_pq(q, k=10, pq_m=16), truth, k=10)
    assert r_auto >= r_pq100 - 0.005, (r_auto, r_pq100)
    assert r_auto >= 0.85, r_auto
    # guard combination: opq excludes per-shard codebooks
    with pytest.raises(ValueError):
        idx.search_pq(q, k=10, pq_m=16, opq=True, per_shard_codebooks=True)
    truth.unpersist()
    q.unpersist()
    idx.unpersist_packed()
    idx.shards_df.unpersist()


def test_opq_pack_save_load_roundtrip(tmp_path, spark, embeddings, queries):
    """An ('opq', m, ksub) pack persists and a loaded index serves from
    it bit-identically (no re-train, no silent fallback to plain pq)."""
    params = VamanaParams(dim=64, alpha=1.2, R=24, L=48, ef_search=64, seed=42)
    idx = PartitionedVamanaIndex.build(spark, embeddings, params, num_shards=4)
    before = idx.search_pq(queries, k=5, pq_m=16, opq=True).toPandas()
    path = str(tmp_path / "opq_idx")
    idx.save(path, packs=(("opq", 16, 256),))
    idx.unpersist_packed()
    idx.shards_df.unpersist()

    loaded = PartitionedVamanaIndex.load(spark, path)
    assert ("opq", 16, 256, False) in loaded._packed_paths
    after = loaded.search_pq(queries, k=5, pq_m=16, opq=True).toPandas()
    pd = __import__("pandas")
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        before.sort_values(key).reset_index(drop=True),
        after.sort_values(key).reset_index(drop=True),
    )
    loaded.unpersist_packed()
    loaded.shards_df.unpersist()
