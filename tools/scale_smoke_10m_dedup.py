#!/usr/bin/env python
"""10M-document near-dup / semantic-dedup scale rung (r11; VERDICT r10
next-round #3): the dedup family's first measured step past 1M, on a
ZIPF-SKEWED corpus — the duplicate-cluster size distribution real web
crawls have, and exactly the shape the family's skew backstops
(minhash `max_bucket_size` star-capping, incremental
`max_bucket_witnesses`, semantic `max_cluster_rows` splitting) exist
for but had never met at scale. The ANN ladder caught a real
scale-killer at every new rung (AQE broadcast fallback at 10M, resplit
tie collapse at 2.8k shards); this rung gives the dedup constants the
same treatment.

    python tools/scale_smoke_10m_dedup.py            # full rung (~1 h)
    N_DOCS=1000000 python tools/scale_smoke_10m_dedup.py   # pilot

Corpus (deterministic, generated once under /tmp):
  * N_DOCS docs (default 10M), 24 space-separated tokens each.
  * ~30% of the mass lives in Zipf-sized duplicate GROUPS
    (size_r = floor(S1 / r^1.1), S1=300k by default): one ~300k-member
    group (the boilerplate page), a handful of 10k-100k groups, a long
    tail of pairs/triples. Even members are verbatim copies of the
    group base text; odd members mutate ONE token (3-gram Jaccard vs
    base = 20/26 ~ 0.77, above the 0.7 near-dup threshold).
  * The rest are singleton docs in disjoint token spaces (no
    cross-group shingle collisions by construction).
  * embeddings mirror the group structure: group members share a unit
    center plus sigma=0.2 noise (pairwise cos ~ 0.96, above SemDeDup's
    0.9), singletons are uniform in [-1,1]^64 (pairwise cos ~ 0).

Measures wall time, shuffle/spill bytes (UI REST, SPILL_METRICS=1),
bucket-cap hit rates, cluster-split fire counts, and CORRECTNESS
(coverage of planted duplicates) for:
  1. minhash_near_dups over the full corpus (star-capped buckets);
  2. save_signatures (10M store) + scan_against_store of a 1M batch
     with 200k planted corpus copies (witness-capped buckets);
  3. semantic_dedup at num_clusters sized to ~40k rows/cluster
     (split backstop fires on the Zipf-hot clusters).

Prints one JSON object per phase plus a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("N_DOCS", str(10_000_000)))
S1 = int(os.environ.get("S1", "300000"))       # largest dup-group size
DUP_MASS_FRAC = 0.3                            # ~fraction of docs in groups
TOKENS = 24                                    # per doc (23 3-gram shingles)
DIM = 64
BATCH = max(N_DOCS // 10, 1000)                # incremental-scan batch
PLANTED = max(BATCH // 5, 200)                 # corpus copies in the batch


def _group_sizes(n_dup_mass: int) -> "list[int]":
    """Zipf ladder: floor(S1 / r^1.1), truncated at total mass."""
    sizes, r, total = [], 1, 0
    while total < n_dup_mass:
        s = max(int(S1 / (r ** 1.1)), 2)
        if total + s > n_dup_mass:
            s = n_dup_mass - total
            if s < 2:
                break
        sizes.append(s)
        total += s
        r += 1
    return sizes


def _gen(doc_path: str, emb_path: str) -> dict:
    """Chunked deterministic generator for text + embeddings parquet.

    Doc layout: ids [0, n_dup) are group members laid out group-by-
    group; ids [n_dup, N_DOCS) are singletons. Token vocabularies are
    disjoint across groups and singletons, so every true near-dup pair
    is planted and known."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    sizes = _group_sizes(int(N_DOCS * DUP_MASS_FRAC))
    n_dup = sum(sizes)
    n_groups = len(sizes)
    # per-doc group id / member index, group-contiguous
    gid_of = np.repeat(np.arange(n_groups, dtype=np.int64), sizes)
    midx_of = np.concatenate([np.arange(s, dtype=np.int64) for s in sizes])

    rng = np.random.default_rng(42)
    centers = rng.standard_normal((n_groups, DIM)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    os.makedirs(os.path.dirname(doc_path), exist_ok=True)
    dschema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    eschema = pa.schema(
        [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
    )
    chunk = 100_000
    t0 = time.perf_counter()
    with pq.ParquetWriter(doc_path, dschema) as dw, pq.ParquetWriter(
        emb_path, eschema
    ) as ew:
        for lo in range(0, N_DOCS, chunk):
            hi = min(lo + chunk, N_DOCS)
            ids = np.arange(lo, hi, dtype=np.int64)
            is_dup = ids < n_dup
            g = np.where(is_dup, gid_of[np.minimum(ids, n_dup - 1)], -1)
            m = np.where(is_dup, midx_of[np.minimum(ids, n_dup - 1)], 0)
            # ---- text: 24 token columns, vectorized string builds
            cols = []
            g_s = pd.Series(g).astype(str)
            id_s = pd.Series(ids).astype(str)
            m_s = pd.Series(m).astype(str)
            mut_pos = m % TOKENS
            mutate = is_dup & (m % 2 == 1)
            for t in range(TOKENS):
                base = np.where(
                    is_dup, ("g" + g_s + "x" + str(t)), ("u" + id_s + "x" + str(t))
                )
                mut_here = mutate & (mut_pos == t)
                tok = np.where(mut_here, ("m" + g_s + "y" + m_s), base)
                cols.append(pd.Series(tok))
            text = cols[0].str.cat(cols[1:], sep=" ")
            dw.write_table(
                pa.table({"doc_id": pa.array(ids), "text": pa.array(text)},
                         schema=dschema)
            )
            # ---- embeddings
            crng = np.random.default_rng(1_000_000 + lo)
            X = crng.uniform(-1, 1, (hi - lo, DIM)).astype(np.float32)
            if is_dup.any():
                gd = g[is_dup]
                noise = crng.normal(0.0, 0.2 / np.sqrt(DIM),
                                    (int(is_dup.sum()), DIM)).astype(np.float32)
                X[is_dup] = centers[gd] + noise
            ew.write_table(
                pa.table(
                    {"vec_id": pa.array(ids),
                     "embedding": pa.array(list(X), type=pa.list_(pa.float32()))},
                    schema=eschema,
                )
            )
    return {
        "gen_sec": round(time.perf_counter() - t0, 1),
        "n_docs": N_DOCS,
        "n_dup_docs": int(n_dup),
        "n_groups": int(n_groups),
        "largest_group": int(sizes[0]),
        "groups_over_512": int(sum(1 for s in sizes if s > 512)),
    }


def borderline_batch(spark, docs, sizes, n_dup):
    """The borderline arm's planted batch (module-level so the cap
    sweep tool reuses the EXACT construction): PLANTED paraphrase-grade
    docs — odd group members with one more token mutated 10 positions
    away (J to the one true mate 19/25 = 0.76, to everything else
    < 0.6) — plus fresh singleton filler up to BATCH rows. Returns
    (src, batch); src carries (doc_id, text, _src true-mate id) and is
    FROZEN with an eager localCheckpoint (limit() may pick different
    rows on re-evaluation — the vamana.py build guard documents the
    same hazard — and cache eviction re-evaluates, which would desync
    the recall/attribution joins)."""
    from pyspark.sql import functions as F

    starts, acc = [], 0
    for sz in sizes:
        starts.append(acc)
        acc += sz
    sdf = spark.createDataFrame(
        [(int(st), int(st + sz)) for st, sz in zip(starts, sizes)],
        "gmin long, gend long",
    )
    members = (
        docs.where(F.col("doc_id") < n_dup)
        .join(
            F.broadcast(sdf),
            (F.col("doc_id") >= F.col("gmin"))
            & (F.col("doc_id") < F.col("gend")),
        )
        .withColumn("_m", F.col("doc_id") - F.col("gmin"))
    )
    mut_pos = F.col("_m") % TOKENS
    # odd members only (they carry the group's first mutation) with
    # an INTERIOR mutation position so each flip is exactly 3
    # shingles — keeps the Jaccard grades above exact
    eligible = members.where(
        (F.col("_m") % 2 == 1)
        & (mut_pos >= 2)
        & (mut_pos <= TOKENS - 3)
    )
    pos2 = F.when(mut_pos <= 11, mut_pos + 10).otherwise(mut_pos - 10)
    toks = F.split(F.col("text"), " ")
    b_text = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                i == pos2,
                F.concat(F.lit("bz"), F.col("doc_id").cast("string")),
            ).otherwise(t),
        ),
        " ",
    )
    # hash-spread across the Zipf ladder (eligible ~= n_dup * 0.5 *
    # 20/24 ~= 1.25M at 10M docs; modulus 6 -> ~208k, limited to
    # PLANTED)
    src = (
        eligible.where(F.xxhash64("doc_id") % 6 == 0)
        .limit(PLANTED)
        .select(
            (F.col("doc_id") + 4 * N_DOCS).alias("doc_id"),
            b_text.alias("text"),
            F.col("doc_id").alias("_src"),
        )
        .localCheckpoint(eager=True)
    )
    n_planted = src.count()
    fresh = spark.range(BATCH - n_planted).select(
        (F.col("id") + 5 * N_DOCS).alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit("h"), F.col("id").cast("string"),
                       F.lit(f"x{t}")) for t in range(TOKENS)],
        ).alias("text"),
        F.lit(None).cast("long").alias("_src"),
    )
    batch = src.unionByName(fresh).cache()
    batch.count()
    return src, batch, n_planted


def _metrics_probe(spark):
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        app_id = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("diskBytesSpilled", 0) for s in stages),
            sum(s.get("memoryBytesSpilled", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (0, 0, 0)


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from vamana_spark.operators import dedup

    base_dir = f"/tmp/sf10m_dedup_{N_DOCS}"
    doc_path = os.path.join(base_dir, "documents.parquet")
    emb_path = os.path.join(base_dir, "embeddings.parquet")
    out: dict = {"n_docs": N_DOCS}
    if not (os.path.exists(doc_path) and os.path.exists(emb_path)):
        info = _gen(doc_path, emb_path)
        out.update(info)
        print(json.dumps({"gen": info}), flush=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "56g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPILL_METRICS") else "false",
        )
        .config("spark.ui.retainedStages", "5000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(doc_path)
    sizes = _group_sizes(int(N_DOCS * DUP_MASS_FRAC))
    n_dup = sum(sizes)
    n_groups = len(sizes)
    out.update(
        n_dup_docs=n_dup, n_groups=n_groups, largest_group=sizes[0],
        groups_over_512=sum(1 for s in sizes if s > 512),
    )

    def timed(tag, fn):
        m0 = _metrics_probe(spark)
        t0 = time.perf_counter()
        res = fn()
        wall = round(time.perf_counter() - t0, 1)
        m1 = _metrics_probe(spark)
        out[f"{tag}_sec"] = wall
        out[f"{tag}_spill_disk_gb"] = round((m1[0] - m0[0]) / 2**30, 2)
        out[f"{tag}_shuffle_write_gb"] = round((m1[2] - m0[2]) / 2**30, 2)
        print(json.dumps({tag: {
            "sec": wall,
            "spill_disk_gb": out[f"{tag}_spill_disk_gb"],
            "shuffle_write_gb": out[f"{tag}_shuffle_write_gb"],
        }}), flush=True)
        return res

    # ---------- 1. full-corpus minhash near-dup pass (star-capped).
    # MAX_BUCKET tunes the star-cap (r11 finding: observed pairs scale
    # with sum(min(bucket, cap)^2); cluster consumers want a low cap)
    if not os.environ.get("SKIP_MINHASH"):
        cap = int(os.environ.get("MAX_BUCKET", "512"))
        out["minhash_max_bucket"] = cap
        pairs = dedup.minhash_near_dups(
            docs, threshold=0.7, max_bucket_size=cap
        )
        timed("minhash_pairs_materialize",
              lambda: pairs.write.mode("overwrite").parquet(
                  os.path.join(base_dir, "pairs.parquet")))
        pairs = spark.read.parquet(os.path.join(base_dir, "pairs.parquet"))
        out["minhash_pair_rows"] = pairs.count()
        # planted-coverage: every dup-group member should appear in >=1
        # verified pair (star topology links members through the rep)
        covered = (
            pairs.select(F.col("a_id").alias("doc_id"))
            .union(pairs.select(F.col("b_id").alias("doc_id")))
            .where(F.col("doc_id") < n_dup)
            .distinct()
            .count()
        )
        out["minhash_dup_coverage"] = round(covered / max(n_dup, 1), 4)
        print(json.dumps({"minhash": {
            "pair_rows": out["minhash_pair_rows"],
            "dup_coverage": out["minhash_dup_coverage"],
        }}), flush=True)
        # cluster recovery: connected components over the capped pairs
        # must reassemble each planted group into ONE cluster (the
        # 100-TB consumption shape: clusters/survivors, not pair lists)
        cc = timed("dup_clusters", lambda: (
            dedup.connected_components(pairs, "a_id", "b_id").cache()
        ))
        # group id of a dup doc is recoverable from the layout: ids are
        # group-contiguous, so min-id per component should equal the
        # group's first id for fully-recovered groups
        starts = []
        acc = 0
        for s in sizes:
            starts.append(acc)
            acc += s
        import bisect

        comp = cc.where(F.col("node") < n_dup).select("node", "component")
        # fraction of dup docs whose component == their group's min id
        sdf = spark.createDataFrame(
            [(int(st), int(st + sz)) for st, sz in zip(starts, sizes)],
            "gmin long, gend long",
        )
        joined = comp.join(
            F.broadcast(sdf),
            (F.col("node") >= F.col("gmin")) & (F.col("node") < F.col("gend")),
        )
        ok_rows = joined.where(F.col("component") == F.col("gmin")).count()
        out["cluster_recovery_frac"] = round(ok_rows / max(n_dup, 1), 4)
        print(json.dumps({"dup_clusters": {
            "recovery_frac": out["cluster_recovery_frac"],
        }}), flush=True)
        cc.unpersist()

    # ---------- 2. signature store + 1M incremental batch (witness caps)
    if not os.environ.get("SKIP_INCREMENTAL"):
        store = os.path.join(base_dir, "sig_store")
        timed("signature_store_build",
              lambda: dedup.save_signatures(docs, store))
        # bucket-size census over the STORED band table — the exact
        # banding the scan will join against (instrumentation for the
        # max_bucket_witnesses=512 cap)
        sigs, meta = dedup.load_signatures(spark, store)
        banded = sigs.select(
            "doc_id",
            F.posexplode(
                dedup.band_hash_array(
                    "minhash", meta["num_hashes"], meta["bands"]
                )
            ).alias("band_id", "band_hash"),
        )
        census = timed("bucket_census", lambda: (
            banded.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("bsz"))
            .agg(
                F.count(F.lit(1)).alias("buckets"),
                F.sum(F.when(F.col("bsz") > 512, 1).otherwise(0)).alias("overfull"),
                F.sum(F.when(F.col("bsz") > 512, F.col("bsz")).otherwise(0)).alias("rows_in_overfull"),
                F.max("bsz").alias("max_bucket"),
            ).first()
        ))
        out["buckets"] = int(census["buckets"])
        out["overfull_buckets"] = int(census["overfull"])
        out["rows_in_overfull_buckets"] = int(census["rows_in_overfull"] or 0)
        out["max_bucket_rows"] = int(census["max_bucket"])
        out["overfull_row_frac"] = round(
            out["rows_in_overfull_buckets"] / max(n_dup + (N_DOCS - n_dup), 1)
            / meta["bands"], 6
        )
        print(json.dumps({"bucket_census": {
            k: out[k] for k in ("buckets", "overfull_buckets",
                                "rows_in_overfull_buckets", "max_bucket_rows")
        }}), flush=True)

        # batch: PLANTED verbatim copies of corpus docs spread across the
        # Zipf ladder (hash-spread picks giants, mid groups, singletons
        # alike) + fresh singleton docs
        src = (
            docs.where(F.xxhash64("doc_id") % (N_DOCS // PLANTED) == 0)
            .limit(PLANTED)
            .select(
                (F.col("doc_id") + 2 * N_DOCS).alias("doc_id"),
                "text",
                F.col("doc_id").alias("_copied_from"),
            )
            # frozen, not cached: limit() re-evaluation under cache
            # eviction could desync the recall join (same fix as the
            # borderline arm)
        ).localCheckpoint(eager=True)
        n_planted = src.count()
        fresh = spark.range(BATCH - n_planted).select(
            (F.col("id") + 3 * N_DOCS).alias("doc_id"),
            F.concat_ws(
                " ",
                *[F.concat(F.lit("f"), F.col("id").cast("string"),
                           F.lit(f"x{t}")) for t in range(TOKENS)],
            ).alias("text"),
            F.lit(None).cast("long").alias("_copied_from"),
        )
        batch = src.unionByName(fresh).cache()
        batch.count()
        found = timed("incremental_scan", lambda: (
            dedup.scan_against_store(
                batch.select("doc_id", "text"), docs, store
            ).cache()
        ))
        out["incremental_pairs"] = found.count()
        hit = (
            src.join(
                found.select(F.col("batch_id").alias("doc_id")).distinct(),
                "doc_id",
            ).count()
        )
        out["incremental_planted"] = int(n_planted)
        out["incremental_planted_recall"] = round(hit / max(n_planted, 1), 4)
        print(json.dumps({"incremental": {
            "pairs": out["incremental_pairs"],
            "planted": n_planted,
            "planted_recall": out["incremental_planted_recall"],
        }}), flush=True)
        # ---- 2b. decision_only arm (r13; VERDICT r12 #2): the preset's
        # 10M price tag, measured instead of extrapolated. Records the
        # decision pass's wall/shuffle next to the audit pass above,
        # the candidate-join row counts at both witness caps (the
        # claimed ~17x cut), the staged-verify split (stage-1 top-1
        # rows vs stage-2 fallback rows), and flag-set equality vs the
        # audit pass (caps differ — 512 vs 8 — so equality here is a
        # MEASURED property of the corpus, not a contract; the
        # equal-caps contract is unit-tested).
        if os.environ.get("DECISION_ONLY"):
            from pyspark.sql import Window

            dec = timed("incremental_scan_decision", lambda: (
                dedup.scan_against_store(
                    batch.select("doc_id", "text"), docs, store,
                    decision_only=True,
                ).cache()
            ))
            out["decision_rows"] = dec.count()
            aud_flags = found.select("batch_id").distinct().cache()
            dec_flags = dec.select("batch_id").distinct().cache()
            out["audit_flagged"] = aud_flags.count()
            out["decision_flagged"] = dec_flags.count()
            out["flags_only_in_audit"] = aud_flags.join(
                dec_flags, "batch_id", "left_anti").count()
            out["flags_only_in_decision"] = dec_flags.join(
                aud_flags, "batch_id", "left_anti").count()
            hit_d = src.join(
                dec_flags.withColumnRenamed("batch_id", "doc_id"), "doc_id"
            ).count()
            out["decision_planted_recall"] = round(hit_d / max(n_planted, 1), 4)

            # candidate-join census at each cap: replays the operator's
            # witness recipe (same min-id star cap, same banded join)
            # to count the rows each verify pass would shingle-join
            sig_b = dedup.minhash_signatures(
                batch.select("doc_id", "text"), "text", "doc_id",
                meta["num_hashes"], meta["shingle_n"],
            )
            banded_b = F.broadcast(sig_b.select(
                F.col("doc_id").alias("batch_id"),
                F.posexplode(dedup.band_hash_array(
                    "minhash", meta["num_hashes"], meta["bands"]
                )).alias("band_id", "band_hash"),
            ))
            keys = ["band_id", "band_hash"]

            def _cands(cap):
                overfull = F.broadcast(
                    banded.groupBy(*keys)
                    .agg(F.count(F.lit(1)).alias("_bsz"))
                    .where(F.col("_bsz") > cap)
                )
                ann = banded.join(overfull, keys, "left")
                small = ann.where(F.col("_bsz").isNull()).select("doc_id", *keys)
                wov = Window.partitionBy(*keys).orderBy(F.col("doc_id").asc())
                capped = (
                    ann.where(F.col("_bsz").isNotNull())
                    .withColumn("_wrn", F.row_number().over(wov))
                    .where(F.col("_wrn") <= cap)
                    .select("doc_id", *keys)
                )
                wit = small.unionByName(capped).withColumnRenamed(
                    "doc_id", "seen_id")
                return (
                    wit.join(banded_b, keys)
                    .groupBy("batch_id", "seen_id")
                    .agg(F.count(F.lit(1)).alias("_nb"))
                )

            out["cand_pairs_audit_cap512"] = _cands(512).count()
            c8 = _cands(8).cache()
            out["cand_pairs_cap8"] = c8.count()
            # staged split: stage 1 verifies exactly one pair per doc
            # with candidates; docs whose top-1 FAILS exact Jaccard
            # fall through and verify their remaining candidates
            top1 = c8.withColumn(
                "_crk",
                F.row_number().over(
                    Window.partitionBy("batch_id").orderBy(
                        F.col("_nb").desc(), F.col("seen_id").asc())
                ),
            ).where(F.col("_crk") == 1).select("batch_id", "seen_id")
            sh_b = dedup.shingle_sets(
                batch.select("doc_id", "text"), "text", "doc_id")
            cand_seen = top1.select(
                F.col("seen_id").alias("doc_id")).distinct()
            sh_s = dedup.shingle_sets(
                docs.join(F.broadcast(cand_seen), "doc_id", "left_semi"),
                "text", "doc_id")
            inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
            union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
            t1v = (
                top1.join(sh_b.select(F.col("doc_id").alias("batch_id"),
                                      F.col("_sh").alias("a_sh")), "batch_id")
                .join(sh_s.select(F.col("doc_id").alias("seen_id"),
                                  F.col("_sh").alias("b_sh")), "seen_id")
                .select("batch_id",
                        (inter / F.greatest(union, F.lit(1.0))).alias("_j"))
            )
            docs_with_cands = c8.select("batch_id").distinct().count()
            stage1_pass = t1v.where(F.col("_j") >= 0.7).count()
            out["decision_docs_with_candidates"] = docs_with_cands
            out["decision_stage1_resolved"] = stage1_pass
            out["decision_stage2_docs"] = docs_with_cands - stage1_pass
            out["decision_stage2_rate"] = round(
                (docs_with_cands - stage1_pass) / max(docs_with_cands, 1), 4)
            # verify-join rows actually paid by the decision path:
            # one per doc in stage 1 + the unresolved docs' leftovers
            leftovers = (
                c8.join(t1v.where(F.col("_j") >= 0.7).select("batch_id"),
                        "batch_id", "left_anti").count() - out["decision_stage2_docs"]
            )
            out["decision_verify_rows"] = docs_with_cands + max(leftovers, 0)
            out["decision_candidate_cut_vs_audit"] = round(
                out["cand_pairs_audit_cap512"]
                / max(out["decision_verify_rows"], 1), 1)
            print(json.dumps({"decision_only": {
                k: out[k] for k in (
                    "incremental_scan_decision_sec", "decision_rows",
                    "audit_flagged", "decision_flagged",
                    "flags_only_in_audit", "flags_only_in_decision",
                    "decision_planted_recall", "cand_pairs_audit_cap512",
                    "cand_pairs_cap8", "decision_docs_with_candidates",
                    "decision_stage1_resolved", "decision_stage2_docs",
                    "decision_stage2_rate", "decision_verify_rows",
                    "decision_candidate_cut_vs_audit",
                ) if k in out
            }}), flush=True)
            c8.unpersist(); aud_flags.unpersist(); dec_flags.unpersist()
            dec.unpersist()

        found.unpersist()
        batch.unpersist()
        src.unpersist()

    # ---------- 2c. BORDERLINE stress arm (r14; VERDICT r13 #4): the
    # decision_only preset where stage-2 actually ENGAGES. The r13
    # measurement covered verbatim copies (Jaccard 1.0 vs every group
    # member — stage-1's top-1 always verifies, stage-2 fired on 18 of
    # 200k). This arm plants PARAPHRASE-GRADE mates just above the 0.7
    # threshold with exactly ONE true mate each:
    #   batch doc b = odd group member X (base + 1 mutated token) with
    #   ONE MORE token mutated 10 positions away. Shingle math (24
    #   tokens, 3-gram => 22 shingles; each interior mutation flips 3):
    #     J(b, X)          = 19/25 = 0.76  >= 0.7  (the only true mate)
    #     J(b, group base) = 16/28 = 0.571 <  0.7
    #     J(b, other odd)  = 13/31 = 0.419 <  0.7
    #   so stage-1 resolves b ONLY if banding ranks X top-1; whenever a
    #   base-bucket witness outranks X (b still shares ~1.7 expected
    #   bands with the base text), stage-1's verify FAILS and stage-2
    #   must exhaust the remaining witnesses to find X. Records stage-2
    #   rate, both walls, flag-set equality, and true-mate precision.
    if os.environ.get("BORDERLINE"):
        from pyspark.sql import Window

        store = os.path.join(base_dir, "sig_store")
        if not os.path.exists(os.path.join(store, "_meta.json")):
            timed("signature_store_build",
                  lambda: dedup.save_signatures(docs, store))
        sigs, meta = dedup.load_signatures(spark, store)

        src, batch, n_planted = borderline_batch(spark, docs, sizes, n_dup)
        out["borderline_planted"] = int(n_planted)


        found_a = timed("borderline_audit_scan", lambda: (
            dedup.scan_against_store(
                batch.select("doc_id", "text"), docs, store
            ).cache()
        ))
        out["borderline_audit_pairs"] = found_a.count()
        dec = timed("borderline_decision_scan", lambda: (
            dedup.scan_against_store(
                batch.select("doc_id", "text"), docs, store,
                decision_only=True,
            ).cache()
        ))
        out["borderline_decision_rows"] = dec.count()

        aud_flags = found_a.select("batch_id").distinct().cache()
        dec_flags = dec.select("batch_id").distinct().cache()
        out["borderline_audit_flagged"] = aud_flags.count()
        out["borderline_decision_flagged"] = dec_flags.count()
        out["borderline_flags_only_in_audit"] = aud_flags.join(
            dec_flags, "batch_id", "left_anti").count()
        out["borderline_flags_only_in_decision"] = dec_flags.join(
            aud_flags, "batch_id", "left_anti").count()
        planted_ids = src.select("doc_id", "_src")
        out["borderline_audit_planted_recall"] = round(
            planted_ids.join(
                aud_flags.withColumnRenamed("batch_id", "doc_id"), "doc_id"
            ).count() / max(n_planted, 1), 4)
        out["borderline_decision_planted_recall"] = round(
            planted_ids.join(
                dec_flags.withColumnRenamed("batch_id", "doc_id"), "doc_id"
            ).count() / max(n_planted, 1), 4)
        # true-mate precision: the decision row's verified hit should be
        # the ONE planted mate (the only stored doc above threshold)
        out["borderline_decision_true_mate"] = (
            dec.join(
                planted_ids.withColumnRenamed("doc_id", "batch_id"),
                "batch_id",
            ).where(F.col("seen_id") == F.col("_src")).count()
        )

        # stage split replay at the decision cap (same recipe as the 2b
        # arm): rank candidates by shared-band count, verify top-1,
        # count the docs whose top-1 FAILED exact Jaccard (= stage-2)
        banded = sigs.select(
            "doc_id",
            F.posexplode(dedup.band_hash_array(
                "minhash", meta["num_hashes"], meta["bands"]
            )).alias("band_id", "band_hash"),
        )
        sig_b = dedup.minhash_signatures(
            batch.select("doc_id", "text"), "text", "doc_id",
            meta["num_hashes"], meta["shingle_n"],
        )
        banded_b = F.broadcast(sig_b.select(
            F.col("doc_id").alias("batch_id"),
            F.posexplode(dedup.band_hash_array(
                "minhash", meta["num_hashes"], meta["bands"]
            )).alias("band_id", "band_hash"),
        ))
        keys = ["band_id", "band_hash"]

        def _wit(cap):
            """Capped witness table (seen_id, band_id, band_hash): every
            bucket keeps its `cap` lowest-id corpus members — exactly
            the scan's witness semantics, replayed."""
            overfull = F.broadcast(
                banded.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("_bsz"))
                .where(F.col("_bsz") > cap)
            )
            ann = banded.join(overfull, keys, "left")
            small = ann.where(F.col("_bsz").isNull()).select("doc_id", *keys)
            wov = Window.partitionBy(*keys).orderBy(F.col("doc_id").asc())
            capped = (
                ann.where(F.col("_bsz").isNotNull())
                .withColumn("_wrn", F.row_number().over(wov))
                .where(F.col("_wrn") <= cap)
                .select("doc_id", *keys)
            )
            return small.unionByName(capped).withColumnRenamed(
                "doc_id", "seen_id")

        def _cands(cap):
            return (
                _wit(cap).join(banded_b, keys)
                .groupBy("batch_id", "seen_id")
                .agg(F.count(F.lit(1)).alias("_nb"))
            )

        out["borderline_cand_pairs_audit_cap512"] = _cands(512).count()
        c8 = _cands(8).cache()
        out["borderline_cand_pairs_cap8"] = c8.count()
        top1 = c8.withColumn(
            "_crk",
            F.row_number().over(
                Window.partitionBy("batch_id").orderBy(
                    F.col("_nb").desc(), F.col("seen_id").asc())
            ),
        ).where(F.col("_crk") == 1).select("batch_id", "seen_id")
        sh_b = dedup.shingle_sets(
            batch.select("doc_id", "text"), "text", "doc_id")
        cand_seen = top1.select(
            F.col("seen_id").alias("doc_id")).distinct()
        sh_s = dedup.shingle_sets(
            docs.join(F.broadcast(cand_seen), "doc_id", "left_semi"),
            "text", "doc_id")
        inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
        t1v = (
            top1.join(sh_b.select(F.col("doc_id").alias("batch_id"),
                                  F.col("_sh").alias("a_sh")), "batch_id")
            .join(sh_s.select(F.col("doc_id").alias("seen_id"),
                              F.col("_sh").alias("b_sh")), "seen_id")
            .select("batch_id",
                    (inter / F.greatest(union, F.lit(1.0))).alias("_j"))
        )
        docs_with_cands = c8.select("batch_id").distinct().count()
        stage1_pass = t1v.where(F.col("_j") >= 0.7).count()
        out["borderline_docs_with_candidates"] = docs_with_cands
        out["borderline_stage1_resolved"] = stage1_pass
        out["borderline_stage2_docs"] = docs_with_cands - stage1_pass
        out["borderline_stage2_rate"] = round(
            (docs_with_cands - stage1_pass) / max(docs_with_cands, 1), 4)
        leftovers = (
            c8.join(t1v.where(F.col("_j") >= 0.7).select("batch_id"),
                    "batch_id", "left_anti").count()
            - out["borderline_stage2_docs"]
        )
        out["borderline_verify_rows"] = docs_with_cands + max(leftovers, 0)
        out["borderline_candidate_cut_vs_audit"] = round(
            out["borderline_cand_pairs_audit_cap512"]
            / max(out["borderline_verify_rows"], 1), 1)

        # ---- miss ATTRIBUTION (r14): is each planted miss a BANDING
        # miss (b and its one true mate X share NO band value) or a
        # WITNESS-CAP miss (they share a band, but the bucket kept only
        # its cap lowest-id members and X wasn't among them)? Exact,
        # scan-free replay: a plant is flagged at cap c iff X sits in
        # the capped witness list of >=1 shared band — so the predicted
        # flag counts must EQUAL the measured audit/decision flag
        # counts (cross-check emitted alongside).
        mates = F.broadcast(planted_ids.select(
            F.col("_src").alias("doc_id")).distinct())
        mate_bands = (
            banded.join(mates, "doc_id", "left_semi")
            .withColumnRenamed("doc_id", "_src")
        )
        pair_map = F.broadcast(planted_ids.select(
            F.col("doc_id").alias("batch_id"), "_src"))
        shared = (
            banded_b.join(pair_map, "batch_id")
            .join(mate_bands, keys + ["_src"], "left_semi")
            .select("batch_id", "_src", *keys)
            .cache()
        )
        a_docs = shared.select("batch_id").distinct().cache()
        out["borderline_attr_share_any_band"] = a_docs.count()
        out["borderline_attr_banding_missed"] = (
            int(n_planted) - out["borderline_attr_share_any_band"]
        )
        for cap, tag in ((512, "audit"), (8, "decision")):
            wit_m = (
                _wit(cap)
                .join(mates.withColumnRenamed("doc_id", "seen_id"),
                      "seen_id", "left_semi")
                .withColumnRenamed("seen_id", "_src")
            )
            b_docs = (
                shared.join(wit_m, keys + ["_src"], "left_semi")
                .select("batch_id").distinct()
            )
            nb = b_docs.count()
            out[f"borderline_attr_predicted_{tag}_flags"] = nb
            out[f"borderline_attr_{tag}_cap_missed"] = (
                out["borderline_attr_share_any_band"] - nb
            )
        shared.unpersist(); a_docs.unpersist()

        print(json.dumps({"borderline": {
            k.replace("borderline_", ""): out[k]
            for k in out if k.startswith("borderline_")
        } | {"audit_sec": out.get("borderline_audit_scan_sec"),
             "decision_sec": out.get("borderline_decision_scan_sec")}},
            default=str), flush=True)
        c8.unpersist(); aud_flags.unpersist(); dec_flags.unpersist()
        dec.unpersist(); found_a.unpersist(); batch.unpersist()
        src.unpersist()

    # ---------- 3. semantic dedup over the mirrored embeddings
    if not os.environ.get("SKIP_SEMANTIC"):
        emb = spark.read.parquet(emb_path)
        ncl = int(os.environ.get("SEM_CLUSTERS", str(max(N_DOCS // 40_000, 16))))
        sem_probes = int(os.environ.get("SEM_PROBES", "1"))
        out["sem_num_clusters"] = ncl
        out["sem_probes"] = sem_probes
        # cache() is lazy — time through the count() so the row reports
        # the materialization wall, not just plan definition + the
        # driver-side k-means fit (the r11 first run's 109 s row was
        # the latter; the scan itself was ~20 min)
        sem = dedup.semantic_dedup(
            emb, threshold=0.9, num_clusters=ncl, expose_subcluster=True,
            probes=sem_probes,
        ).cache()
        n_rows = timed("semantic_dedup", sem.count)
        out["sem_rows"] = n_rows
        # STRUCTURAL split test (ADVICE r11): a fired backstop split is
        # visible as a '.' in the refined scan key; count-vs-num_clusters
        # tests are blind to empty k-means cells (which deflate the
        # distinct count) and miscount multi-way splits
        out["sem_split_subclusters"] = (
            sem.where(F.col("subcluster_id").contains("."))
            .select("subcluster_id").distinct().count()
        )
        out["sem_split_fired"] = out["sem_split_subclusters"] > 0
        out["sem_clusters_after_split"] = (
            sem.select("subcluster_id").distinct().count()
        )
        drops = sem.where(~F.col("keep"))
        out["sem_dropped"] = drops.count()
        # recall on planted semantic dups: a dup-group member (id<n_dup,
        # member>0 exists) whose group has >=2 members should be dropped
        # unless it's the group's keeper; expected drops ~= n_dup - n_groups
        expected = n_dup - n_groups
        out["sem_planted_drop_recall"] = round(
            drops.where(F.col("vec_id") < n_dup).count() / max(expected, 1), 4
        )
        print(json.dumps({"semantic": {
            "rows": n_rows,
            "probes": sem_probes,
            "split_subclusters": out["sem_split_subclusters"],
            "clusters_after_split": out["sem_clusters_after_split"],
            "split_fired": out["sem_split_fired"],
            "dropped": out["sem_dropped"],
            "planted_drop_recall": out["sem_planted_drop_recall"],
        }}), flush=True)
        sem.unpersist()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
