"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval (range) join — both expressed as shuffle-once
sort-based dataflows, never as cross products.

As-of join (each left row matched to the latest right row at or before
its timestamp, per key) is THE time-series primitive (trades→quotes,
events→model-version). Spark has no built-in; the classic scalable
encoding is union-tag-window:

    union(left tagged L, right tagged R)
      → window over (key ORDER BY ts, tag) carrying last-seen R payload
      → keep L rows

One shuffle on the key, partition-local sort — the same cost as a
sort-merge join. DuckDB's native ASOF JOIN serves as the oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row: the most recent right row with
    ``right_ts <= left_ts`` on the same key (optionally within
    ``tolerance_seconds``). Right payload columns are appended (null if
    no prior right row).
    """
    key_cols = list(key_cols)
    payload = list(right_payload)

    l_tag = left.select(
        *key_cols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right rows (0) sort before ties on ts
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast("timestamp").alias("_rts"),
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_ts).cast("timestamp").alias("_rts"),
    )
    unioned = l_tag.unionByName(r_tag)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_c_rts"),
    )
    out = carried.where(F.col("_side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("_c_rts").isNotNull()
            & (
                F.col("_ts").cast("double") - F.col("_c_rts").cast("double")
                <= tolerance_seconds
            )
        )
        out = out.select(
            "*",
            *[
                F.when(within, F.col(f"_c_{c}")).alias(f"_t_{c}")
                for c in payload
            ],
        )
        picked = {c: f"_t_{c}" for c in payload}
    else:
        picked = {c: f"_c_{c}" for c in payload}

    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(picked[c]).alias(f"asof_{c}") for c in payload],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Point-in-interval join, bucketized so it's an EQUI-join.

    Naive form is a non-equi join (cross product per key). Instead both
    sides map onto integer bucket ids of width ``bucket`` (any pandas-
    parseable offset: "1 hour", "30 minutes", "2 days"): an interval
    [s, e] explodes onto every bucket it overlaps; a point lands in
    one. The join key becomes (key, bucket_id) and the residual
    ``s <= ts <= e`` filter runs post-join — the standard scalable
    range join (Spark's own storage-partitioned range joins use the
    same idea). Bucket ids are ``floor(unix_ts / width)`` on BOTH
    sides, so any width stays aligned (the earlier date_trunc('hour')
    form silently dropped matches for non-hour widths).

    Cost: interval rows replicate ceil(len/width)+1 times — pick the
    bucket near the typical interval length; correctness never depends
    on the choice.
    """
    import pandas as pd

    key_cols = list(key_cols)
    secs = int(pd.Timedelta(bucket).total_seconds())
    if secs <= 0:
        raise ValueError(f"bucket must be a positive duration, got {bucket!r}")

    def _bid(c: str):
        return F.floor(F.unix_timestamp(F.col(c)) / F.lit(secs)).cast("long")

    pts = points.select("*", _bid(point_ts).alias("_bucket"))
    ivs = intervals.select(
        "*",
        F.explode(F.sequence(_bid(start_ts), _bid(end_ts))).alias("_bucket"),
    )
    joined = pts.join(ivs, key_cols + ["_bucket"])
    return joined.where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    ).drop("_bucket")
