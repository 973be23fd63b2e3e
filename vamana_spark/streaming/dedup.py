"""Streaming deduplication — bounded-state exact dedup on a stream.

``streaming_exact_dedup`` drops rows whose content key was already seen
within the watermark horizon (`dropDuplicatesWithinWatermark`): the
state store holds one entry per distinct key per horizon, which is what
makes dedup feasible on an unbounded stream — the batch operator's
"seen set" would grow forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    events: DataFrame,
    key_cols=("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence per key within the watermark horizon."""
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )


def streaming_content_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Content-hash dedup on a document stream (normalized sha256 key)."""
    from vamana_spark.operators.dedup import _content_norm

    keyed = docs.withColumn("_ck", F.sha2(_content_norm(text_col), 256))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_ck"])
        .drop("_ck")
    )


def streaming_minhash_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    window: str = "10 minutes",
) -> DataFrame:
    """NEAR-dup dedup on a document stream — banded MinHash with
    first-writer-wins LSH buckets (r4 verdict #7).

    Stages:
    1. stateless — per-row MinHash signature (the same Arrow UDFs the
       batch operator uses, operators/dedup.py) exploded into ``bands``
       LSH bucket keys per doc;
    2. stateful — ``dropDuplicatesWithinWatermark`` on (band_id,
       band_hash): the first doc to write an LSH bucket within the
       watermark horizon owns it; state is one entry per distinct
       bucket per horizon (bounded, like the exact dedup above);
    3. stateful — a doc SURVIVES iff it won ALL its bands: losing any
       band means an in-horizon predecessor collided there — an LSH
       near-dup candidate — so the doc is dropped. Candidate==dup is
       the streaming trade: the batch operator re-verifies candidates
       with exact Jaccard (a join), which an unbounded stream can't
       afford; band/hash counts tune the false-positive rate instead.

    Chained stateful operators run in append mode (Spark >= 3.5); the
    survivors aggregate is keyed by (event-time window, doc), so rows
    emit once the watermark passes their window.

    Returns (doc_id, window_start, bands_won) for surviving docs.
    """
    from vamana_spark.operators.dedup import (
        _shingle_udf,
        _signature_udf,
        band_hash_array,
    )

    sigs = docs.select(
        F.col(id_col),
        F.col(ts_col),
        _signature_udf(num_hashes)(
            _shingle_udf(shingle_n)(F.col(text_col))
        ).alias("minhash"),
    )
    banded = sigs.select(
        id_col,
        ts_col,
        F.posexplode(band_hash_array("minhash", num_hashes, bands)).alias(
            "band_id", "band_hash"
        ),
    )
    winners = banded.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["band_id", "band_hash"]
    )
    return (
        winners.groupBy(F.window(ts_col, window).alias("w"), F.col(id_col))
        .agg(F.count("*").cast("int").alias("bands_won"))
        .where(F.col("bands_won") == bands)
        .select(
            F.col(id_col),
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "bands_won",
        )
    )


def streaming_incremental_dedup(
    docs: DataFrame,
    seen_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    expected_seen=None,
    fpp: float = 0.01,
    verify: bool = True,
    max_build_tasks: int = 256,
) -> DataFrame:
    """Incremental-INGEST dedup on a stream — the streaming mirror of
    ``operators.dedup.incremental_dedup``: drop rows whose content
    already exists in a static, already-ingested corpus, and keep only
    the first occurrence of each content key within the stream's
    watermark horizon.

    The corpus Bloom filter builds ONCE at stream definition (a batch
    job over ``seen_df`` — the corpus never shuffles on content, see
    ``operators.dedup.build_bloom``) and broadcasts; every micro-batch
    probes it with a stateless mapInPandas. ``verify=True`` re-checks
    the 'maybe seen' rows with a stream-static LEFT ANTI join against
    the corpus content keys — only candidate rows (~fpp of the stream +
    true dups) enter that join each micro-batch, but the static side is
    re-scanned per batch: pass a persisted/stored hash table as
    ``seen_df`` for long-running streams. ``verify=False`` drops maybes
    outright (lossy by ~fpp, zero per-batch corpus cost). Bloom
    membership has no false negatives — true duplicates always drop.
    """
    from vamana_spark.operators.dedup import (
        _bloom_geometry,
        _content_norm,
        build_bloom,
        flag_bloom_membership,
    )

    if expected_seen is None:
        expected_seen = seen_df.count()
    m_bits, k = _bloom_geometry(expected_seen, fpp)
    seen_norm = seen_df.select(_content_norm(text_col).alias("_n"))
    b_bloom = build_bloom(seen_norm, m_bits, k, max_build_tasks)

    keyed = docs.withColumn("_n", _content_norm(text_col))
    flagged = flag_bloom_membership(keyed, b_bloom, m_bits, k)
    clean = flagged.where(~F.col("_maybe"))
    if verify:
        survivors_c = flagged.where(F.col("_maybe")).join(
            seen_norm, "_n", "left_anti"
        )
        out = clean.unionByName(survivors_c)
    else:
        out = clean
    return (
        out.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_n"])
        .drop("_n", "_maybe")
    )


def streaming_incremental_near_dups(
    docs: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    seen_signatures=None,
    max_bucket_witnesses: int = 512,
) -> DataFrame:
    """Streaming mirror of ``operators.dedup.incremental_near_dups``:
    emit verified near-dup pairs (batch_id, seen_id, jaccard) of each
    streamed document against a STATIC already-ingested corpus.

    Stateless-by-construction pipeline — no stream-stream join, no
    aggregation: one projection computes shingles + MinHash per
    streamed row (pandas-UDF column expressions), the banded keys
    equi-join the corpus band table (stream-static), the exact-Jaccard
    verify joins the corpus SHINGLE table (stream-static) and filters
    on array_intersect/array_union sizes — identical set semantics to
    the batch verify. The only state is the within-watermark pair
    dedup (a band match can fire in several bands).

    The corpus band and shingle tables are computed ONCE at stream
    definition; pass ``seen_signatures`` (a persisted
    ``minhash_signatures`` table — see ``operators.dedup
    .save_signatures``) to skip the corpus signature pass (its
    minhash width is validated against ``num_hashes`` — a mismatched
    store would band wrongly and silently MISS pairs). A corpus band
    bucket holding more than ``max_bucket_witnesses`` docs (a giant
    duplicate cluster) keeps only its min-id witnesses, the same cap
    and semantics as the batch scan — without it one hot cluster
    would explode the candidate join on EVERY micro-batch. For
    long-running streams persist both static frames: the static side
    of a stream-static join is re-scanned every micro-batch.
    """
    from pyspark.sql import Window

    from vamana_spark.operators.dedup import (
        _shingle_udf,
        _signature_udf,
        band_hash_array,
        minhash_signatures,
        shingle_sets,
    )

    sh_s = shingle_sets(seen, text_col, id_col, shingle_n).select(
        F.col(id_col).alias("seen_id"), F.col("_sh").alias("_sh_seen")
    ).localCheckpoint()
    if seen_signatures is not None:
        probe = seen_signatures.select(
            F.size("minhash").alias("_w")
        ).limit(1).collect()
        if probe and probe[0]["_w"] != num_hashes:
            raise ValueError(
                f"seen_signatures has minhash width {probe[0]['_w']} but "
                f"num_hashes={num_hashes}; recompute the signature table "
                "with matching (num_hashes, bands, shingle_n) parameters"
            )
        sig_s = seen_signatures
    else:
        sig_s = minhash_signatures(seen, text_col, id_col, num_hashes, shingle_n)
    wb = Window.partitionBy("band_id", "band_hash").orderBy(
        F.col("seen_id").asc()
    )
    banded_s = (
        sig_s.select(
            F.col(id_col).alias("seen_id"),
            F.posexplode(band_hash_array("minhash", num_hashes, bands)).alias(
                "band_id", "band_hash"
            ),
        )
        # static side, computed once at definition — a plain rank cap is
        # fine here (the batch path's overfull-only optimization matters
        # when banding runs per call; this table is built exactly once)
        .withColumn("_r", F.row_number().over(wb))
        .where(F.col("_r") <= int(max_bucket_witnesses))
        .drop("_r")
        .localCheckpoint()
    )

    enriched = docs.select(
        F.col(id_col).alias("batch_id"),
        F.col(ts_col),
        _shingle_udf(shingle_n)(text_col).alias("_sh"),
    ).withColumn("minhash", _signature_udf(num_hashes)("_sh"))
    banded_b = enriched.select(
        "batch_id", ts_col, "_sh",
        F.posexplode(band_hash_array("minhash", num_hashes, bands)).alias(
            "band_id", "band_hash"
        ),
    )
    cand = banded_b.join(banded_s, ["band_id", "band_hash"]).select(
        "batch_id", ts_col, "_sh", "seen_id"
    )
    inter = F.size(F.array_intersect("_sh", "_sh_seen")).cast("double")
    union = F.size(F.array_union("_sh", "_sh_seen")).cast("double")
    pairs = (
        cand.join(sh_s, "seen_id")
        .withColumn("jaccard", F.round(inter / F.greatest(union, F.lit(1.0)), 4))
        .where(F.col("jaccard") >= F.lit(float(threshold)))
        .select("batch_id", "seen_id", "jaccard", ts_col)
    )
    return (
        pairs.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["batch_id", "seen_id"])
        .drop(ts_col)
    )
