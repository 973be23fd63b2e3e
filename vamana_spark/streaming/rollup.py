"""Structured Streaming mirrors of the batch event operators (X7).

The reference is strictly batch (SURVEY.md §2: streaming N/A), so this is
extension surface: the same rollup/sessionization semantics expressed as
incremental streaming queries — watermarks bound state, windows handle
late data, ``session_window`` does gap-based sessions natively.

Batch/stream parity: ``streaming_hourly_rollup`` over a bounded input
(Trigger.AvailableNow) produces exactly ``operators.events.hourly_rollup``
minus rows newer than the watermark cut — tests assert equality on a
closed input where no rows are cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of event batches (one parquet file = one
    micro-batch input split). Expects µs timestamps — write batches with
    ``sources.load_table``-normalized data, not the raw ns files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .load(source_dir)
    )


def streaming_hourly_rollup(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Incremental hourly rollup with bounded state.

    The watermark drops state for windows older than max(event time) -
    watermark — at 100 TB/day of events this is what keeps the agg state
    finite; late rows beyond it are dropped, within it they update their
    window (standard Spark late-data semantics).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions via ``session_window`` — Spark's native stateful
    session operator (merges events closer than ``gap`` per key; state
    bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "sum_value",
        )
    )


def run_to_completion(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain a bounded stream into an in-memory table (AvailableNow) and
    return the result as a batch DataFrame. Test/utility path.
    ``output_mode="append"`` for stateless/append-only streams (complete
    mode requires an aggregation)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)
