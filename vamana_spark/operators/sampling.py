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
