"""Deterministic sampling — seeded, reproducible, oracle-able.

Training-data pipelines need samples that are (a) reproducible across
runs and engines, (b) stratified (per-language / per-source quotas),
and (c) cheap at 100 TB. `df.sample()` is none of these: it depends on
partition layout and Spark's RNG stream.

The trick here: rank rows by ``md5(seed || id)`` — a uniform,
engine-portable pseudo-random order (DuckDB computes the identical hex
string, so every sample below is hash-checkable against a SQL oracle).

Scale shapes:
- ``stratified_sample`` — one shuffle on the stratum key, window rank.
  Skewed strata cost what any per-key window costs; quotas are usually
  small, so AQE handles stragglers.
- ``deterministic_sample`` (global top-n by hash) — TakeOrderedAndProject:
  k rows per partition to the driver-side merge, never a global sort.
- ``train_test_split`` — a pure projection (hash-prefix threshold),
  zero shuffles; membership is a function of the row alone, so the
  split is stable under repartitioning, appends, and engine changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(id_col: str, seed: int) -> Column:
    """Engine-portable pseudo-random sort key: md5 hex of seed||id."""
    return F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string")))


def deterministic_sample(
    df: DataFrame, n: int, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Global n-row sample: the n smallest md5(seed||id) — physical plan
    is TakeOrderedAndProject (k rows per partition), not a global sort."""
    return (
        df.withColumn("_hk", _hash_order(id_col, seed))
        .orderBy("_hk", id_col)
        .limit(n)
        .drop("_hk")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Up to n rows per stratum, chosen by hash rank — reproducible
    regardless of partitioning or row order."""
    w = Window.partitionBy(strata_col).orderBy(_hash_order(id_col, seed), F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame,
    n: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Weighted n-row sample without replacement (Efraimidis–Spirakis
    A-ES): each row gets key = u^(1/w) with u uniform; the n largest
    keys are a weight-proportional sample. Ordering by ln(u)/w is
    monotone-equivalent and avoids pow.

    u comes from the md5 hex prefix — (int(hex8) + 0.5) / 16^8 — so the
    draw is engine-portable and independent of partition layout. The
    integer and the division are exact IEEE doubles on any engine; only
    ln() is libm-dependent (last-ulp), far below the key gaps at any
    realistic n. Weights must be > 0.

    Scale shape: projection + TakeOrderedAndProject (n rows per
    partition into the driver merge) — no global sort, no shuffle.
    Classic use: length-proportional corpus sampling, where the sample
    approximates a token budget rather than a document count.
    """
    u_int = F.conv(
        F.substring(_hash_order(id_col, seed), 1, 8), 16, 10
    ).cast("double")
    u = (u_int + F.lit(0.5)) / F.lit(float(16**8))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.withColumn("_wk", key)
        .orderBy(F.col("_wk").desc(), F.col(id_col))
        .limit(n)
        .drop("_wk")
    )


def train_test_split(
    df: DataFrame,
    test_fraction: float = 0.1,
    id_col: str = "doc_id",
    seed: int = 42,
    label_col: str = "split",
) -> DataFrame:
    """Stable split label per row ('test' / 'train') from the md5 hex
    prefix: the first 8 hex chars are uniform in [0, 16^8), so comparing
    them lexicographically against the fraction's hex threshold buckets
    rows without any hex parsing (portable to any engine with md5).
    Pure projection — rows keep their split under any repartitioning."""
    threshold = format(int(test_fraction * 16**8), "08x")
    prefix = F.substring(_hash_order(id_col, seed), 1, 8)
    return df.withColumn(
        label_col,
        F.when(prefix < F.lit(threshold), F.lit("test")).otherwise(F.lit("train")),
    )


def mixture_sample(
    df: DataFrame,
    fractions: dict,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Source-reweighting mixture: keep a per-group Bernoulli fraction of
    rows — the "sample CommonCrawl at 30%, books at 100%" step that sets
    a training mix. ``fractions`` maps group value -> keep fraction in
    [0, 1]; unlisted groups keep ``default_fraction``.

    Membership is a pure function of (seed, id): the md5 hex prefix is
    uniform in [0, 16^8), compared lexicographically against each
    group's hex threshold — the same engine-portable draw as
    ``train_test_split``, so the mix is stable under repartitioning and
    appends, and a SQL oracle reproduces it bit-for-bit. Zero shuffles:
    the whole operator is a projection + filter (the fractions table
    enters as a CASE expression, not a join).
    """
    for g, frac in fractions.items():
        if not (0.0 <= float(frac) <= 1.0):
            raise ValueError(f"fraction for {g!r} must be in [0,1], got {frac}")
    prefix = F.substring(_hash_order(id_col, seed), 1, 8)

    def thr(frac: float) -> str:
        # 'g' sorts after every hex digit -> keep-all. Guard on the
        # SCALED int, not frac: 1-ulp-under-1.0 still rounds to 16^8,
        # and format(16^8) would be 9 chars ('100000000') — which sorts
        # BELOW most 8-char prefixes and would keep ~1/16 of rows.
        v = int(float(frac) * 16**8)
        return "g" if v >= 16**8 else format(v, "08x")

    expr = F.lit(thr(float(default_fraction)))
    for g, frac in sorted(fractions.items()):
        expr = F.when(F.col(group_col) == g, F.lit(thr(float(frac)))).otherwise(expr)
    return df.where(prefix < expr)


def shuffle_export(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic global training-order: assign every row to one of
    ``num_shards`` shards and an intra-shard position, both pure
    functions of (seed, id) — the export step that turns a curated
    corpus into training shards whose order is reproducible across
    runs, engines, and partition layouts (no ``orderBy(rand())``).

    Returns the input columns + ``shard`` (int) + ``pos`` (0-based
    long within the shard, ordered by the md5 draw).

    100 TB shape: one shuffle keyed by shard (uniform by construction —
    md5 buckets), then a per-shard window rank; no global sort ever.
    Feed the result to ``sinks.write_parquet_sized`` partitioned by
    ``shard`` to land one file set per shard.

    SCALING CONSTRAINT: the intra-shard ``pos`` is a row_number window
    partitioned by shard, so every shard's n/num_shards rows sort
    through ONE task. ``num_shards`` must therefore scale with the
    corpus — size shards to the training-file granularity you want
    (e.g. ~1M docs / a few GiB per shard), never a small constant over
    a huge corpus. At 100 TB that means thousands of shards, which is
    exactly the file count a training loader wants anyway.
    """
    S = int(num_shards)
    if S <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")
    hk = _hash_order(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(hk, 1, 8), 16, 10).cast("long"), F.lit(S)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(hk, F.col(id_col))
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
    )


def temperature_mixture(
    df: DataFrame,
    temperature: float,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-scaled source rebalancing — the multilingual-corpus
    recipe (sample group i with probability ∝ n_i^τ, mBERT/XLM-R/mT5
    style): per-group keep-rate ``f_i = n_i^(τ-1) / max_j n_j^(τ-1)``,
    so the most-upweighted (smallest) group keeps every row, ``τ=1``
    is the identity, and ``τ→0`` flattens the mix toward uniform over
    groups. Unlike :func:`mixture_sample` the fractions are derived
    from the observed group sizes, not supplied.

    Membership is the module's engine-portable md5 draw (hex-prefix
    threshold), so the selected set is stable under repartitioning /
    appends and reproducible by a SQL oracle. Thresholds are computed
    declaratively — no driver collect.

    100 TB shape: one count aggregation whose output cardinality is
    the number of sources (map-side partials, tiny shuffle) feeds a
    #groups-row threshold table that broadcasts onto a scan-filter;
    the corpus itself never shuffles. Group cardinality is assumed
    small (named sources) — the same assumption
    :func:`mixture_sample`'s CASE expression makes.
    """
    tau = float(temperature)
    if tau <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    rates = counts.select(
        group_col, F.pow(F.col("_n").cast("double"), F.lit(tau - 1.0)).alias("_r")
    )
    mx = rates.agg(F.max("_r").alias("_rmax"))
    scaled = F.floor(F.col("_r") / F.col("_rmax") * F.lit(float(16**8))).cast(
        "long"
    )
    thrs = (
        rates.crossJoin(F.broadcast(mx))
        .select(
            group_col,
            F.when(scaled >= 16**8, F.lit("g"))
            .otherwise(F.lpad(F.lower(F.hex(scaled)), 8, "0"))
            .alias("_thr"),
        )
    )
    prefix = F.substring(_hash_order(id_col, seed), 1, 8)
    # null-safe equality: a NULL group is a group like any other (its
    # count row exists — groupBy keeps NULL keys), so NULL-source rows
    # must match their threshold rather than be dropped by a plain
    # equi-join; without this, τ=1 would not be the identity
    thrs = thrs.withColumnRenamed(group_col, "_tm_g")
    return (
        df.join(
            F.broadcast(thrs), F.col(group_col).eqNullSafe(F.col("_tm_g"))
        )
        .where(prefix < F.col("_thr"))
        .drop("_thr", "_tm_g")
    )


def _hashed_ngram_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_buckets: int,
    carry: list = (),
) -> DataFrame:
    """(id, bucket[, *carry]) — one row per unigram/bigram OCCURRENCE,
    bucketed by an engine-portable hash (md5 hex prefix, the sampling
    module's convention — DuckDB computes the identical bucket, so
    anything built on these features is oracle-able). ``carry`` names
    narrow per-document columns to keep on each feature row — cheaper
    than joining them back onto the (much wider) feature stream later.

    Map-only: tokenize, build bigrams JVM-side (``zip_with`` against the
    1-shifted token array), explode. No Python, no shuffle."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda x: x.contains(" "),  # zip_with pads the tail with null -> concat_ws drops it
    )
    ng = F.explode(F.concat(toks, bigrams)).alias("_ng")
    return df.select(F.col(id_col).alias("_fid"), ng, *carry).select(
        "_fid",
        F.pmod(
            F.conv(F.substring(F.md5("_ng"), 1, 8), 16, 10).cast("long"),
            F.lit(int(num_buckets)),
        ).alias("_bucket"),
        *carry,
    )


def dsir_log_weights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR-style importance log-weights (Data Selection via Importance
    Resampling, Xie et al., NeurIPS 2023): score every document by how
    much more likely its hashed-ngram bag is under the TARGET
    distribution than under the RAW corpus distribution —
    ``log_weight = Σ_occurrences [log p_target(bucket) − log p_raw(bucket)]``
    with add-λ smoothed multinomials over ``num_buckets`` hashed
    unigram+bigram features. Selecting the top-weighted (optionally
    Gumbel-noised) documents tilts a huge raw corpus toward a small
    high-quality target domain — the published recipe this mirrors.

    ``target`` is a boolean Column over ``df``'s rows defining the
    target subset (e.g. ``F.col("lang") == "en"``).

    Returns one row per input document:
      (id, is_target, n_feats, log_weight) — log_weight 0.0 and
      n_feats 0 for empty/whitespace-only documents.

    100 TB shape: two map-only featurization passes feed (a) the model —
    ONE fused groupBy-bucket aggregate (raw count + conditional target
    sum in the same map-side partials; post-shuffle cardinality capped
    at ``num_buckets``) whose checkpointed result also yields the grand
    totals, becoming a ≤num_buckets-row log-ratio table that
    BROADCASTS — and (b) the per-document score, a broadcast-join + one
    map-side-combinable groupBy(id) sum. No shuffle ever carries the
    token stream keyed by anything wider than (bucket) or (id); the
    corpus text itself is read twice and moved zero times.

    Determinism: bucket hash, counts, and log-ratio arithmetic are all
    engine-portable (md5 buckets; double log arithmetic) — a DuckDB
    oracle reproduces log_weight to float-rounding exactness.
    """
    lam = float(smoothing)
    B = int(num_buckets)
    if B <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    if lam <= 0:
        raise ValueError(f"smoothing must be positive (add-λ), got {smoothing}")

    from vamana_spark.functions.util import ensure_parallelism

    # tokenize+md5 featurization is the CPU-bound stage (run twice):
    # floor the input parallelism (no-op on healthy multi-split layouts)
    base = ensure_parallelism(
        df.select(F.col(id_col).alias("_fid"), target.alias("_is_tgt"), text_col)
    )
    # the target flag rides on each feature row (one boolean wide), so
    # the model pass needs no doc-id join at all — a broadcast of
    # per-doc flags would cap the corpus at driver memory
    ff = _hashed_ngram_features(base, text_col, "_fid", B, carry=["_is_tgt"])
    feats = ff.select("_fid", "_bucket")

    # ONE corpus pass fits the whole model: per-bucket raw and target
    # counts land in the same map-side-combinable aggregate (target =
    # conditional sum), and the grand totals come from a whole-table
    # window over that ≤num_buckets-row result — one extra single-task
    # pass over ≤num_buckets rows, never a corpus replay. The whole
    # model stays a LAZY plan (no checkpoint): composing the DataFrame
    # costs nothing, and executor loss recomputes through normal
    # lineage. The corpus is featurized exactly twice total
    # (model + scoring), down from four evaluations (raw, target,
    # totals, scoring).
    bucket_counts = ff.groupBy("_bucket").agg(
        F.count("*").alias("_rc"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_tc"),
    )
    wtot = Window.partitionBy()
    model = (
        bucket_counts.select(
            "_bucket",
            "_rc",
            "_tc",
            F.sum("_rc").over(wtot).alias("_rt"),
            F.sum("_tc").over(wtot).alias("_tt"),
        )
        .select(
            "_bucket",
            (
                F.log((F.col("_tc") + lam) / (F.col("_tt") + lam * B))
                - F.log((F.col("_rc") + lam) / (F.col("_rt") + lam * B))
            ).alias("_lr"),
        )
    )
    scored = (
        feats.join(F.broadcast(model), "_bucket")
        .groupBy("_fid")
        .agg(F.count("*").alias("n_feats"), F.sum("_lr").alias("log_weight"))
    )
    return (
        base.select("_fid", "_is_tgt")
        .join(scored, "_fid", "left")
        .select(
            F.col("_fid").alias(id_col),
            F.col("_is_tgt").alias("is_target"),
            F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
        )
    )


def dsir_sample(
    df: DataFrame,
    target: Column,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 4096,
    smoothing: float = 1.0,
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-n importance resampling over :func:`dsir_log_weights`
    (the DSIR paper's sampling-without-replacement step): keep the n
    documents with the largest ``log_weight/temperature + Gumbel(seed, id)``.
    The Gumbel draw is the engine-portable md5 uniform
    (``u = (hex13 + 1) / (16^13 + 1)``, ``g = -log(-log(u))``), so the
    selected set is reproducible across runs, partitionings, and
    engines. ``temperature=0`` is disallowed — use top-n by weight
    directly (orderBy log_weight) when no noise is wanted.

    Physical plan: the weights job, then TakeOrderedAndProject (k rows
    per partition to the driver merge — never a global sort)."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0 (use a plain orderBy for argmax)")
    w = dsir_log_weights(df, target, text_col, id_col, num_buckets, smoothing)
    u = (
        F.conv(F.substring(_hash_order(id_col, seed), 1, 13), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**13 + 1))
    key = F.col("log_weight") / F.lit(float(temperature)) - F.log(-F.log(u))
    return (
        w.withColumn("_gk", key)
        .orderBy(F.col("_gk").desc(), F.col(id_col))
        .limit(int(n))
        .drop("_gk")
    )
