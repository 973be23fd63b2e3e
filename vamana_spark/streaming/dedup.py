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
    keyed = docs.withColumn(
        "_ck", F.sha2(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")), 256)
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_ck"])
        .drop("_ck")
    )
