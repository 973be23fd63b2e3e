"""Event-stream operators over the ``events`` table (SURVEY.md §2b X7):
time-window rollups and gap-based sessionization. Batch forms here;
the Structured Streaming mirrors live in ``vamana_spark.streaming``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_sec(c: Column) -> Column:
    """Fractional epoch seconds from a timestamp column, robust to the
    input being TIMESTAMP or TIMESTAMP_NTZ: NTZ→double is an illegal cast
    in Spark 4, but NTZ→TIMESTAMP is legal (session-tz interpretation,
    exact under the UTC session tz) and TIMESTAMP→TIMESTAMP is a no-op.
    """
    return c.cast("timestamp").cast("double")


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Per-hour x event_type rollup: count, sum/avg value, distinct users.

    ``date_trunc`` keeps the group key a plain timestamp (partition-prunable
    on a date-partitioned 100-TB event store); output hour is formatted as
    a string at the presentation edge for engine-portable comparison.
    """
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        events.groupBy(hour.alias("_h"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .select(
            F.date_format("_h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
            "n_users",
        )
    )


def tumbling_window_rollup(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Same rollup via ``F.window`` — the form that transfers 1:1 to
    Structured Streaming (watermark + window)."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n_events"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session ids per user: a new session starts when the gap
    from the previous event exceeds ``gap_minutes``.

    Classic lag + cumulative-sum over a per-user window — one shuffle on
    user_id; sessions never span partitions because user_id is the key.
    Returns events + (session_seq, session_id).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (_epoch_sec(F.col("ts")) - _epoch_sec(prev_ts) > gap_minutes * 60),
        1,
    ).otherwise(0)
    with_seq = events.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(w).cast("long")
    )
    return with_seq.drop("_new").withColumn(
        "session_id",
        F.concat_ws("-", F.col("user_id").cast("string"), F.col("session_seq").cast("string")),
    )


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session aggregates: span, event count, value sum."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(
                (F.max(_epoch_sec(F.col("ts"))) - F.min(_epoch_sec(F.col("ts")))),
                3,
            ).alias("duration_sec"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by total event value; dense ranking, deterministic ties."""
    totals = events.groupBy("user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value"),
        F.count("*").cast("long").alias("n_events"),
    )
    # global top-k via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge), NOT a single-partition window over all users
    top = totals.orderBy(F.col("total_value").desc(), F.col("user_id").asc()).limit(k)
    w = Window.orderBy(F.col("total_value").desc(), F.col("user_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def funnel(
    events: DataFrame,
    steps: list,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: for each user, the earliest time each
    ``steps[i]`` event occurred STRICTLY AFTER the user's step[i-1]
    completion (the classic conversion funnel — view → signup →
    purchase).

    Returns (user, t_step_1..t_step_N, steps_completed): ``t_step_i``
    is null once the chain breaks, ``steps_completed`` counts the
    prefix reached.

    Scale shape: one (filter → conditional-min groupBy → equi-join on
    user) round per step — N small shuffles keyed by the user id, each
    with map-side partial min; no per-user event collection, so whale
    users cost one partial row per map task like everyone else.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_etype"),
        F.col(ts_col).alias("_ts"),
    )
    cur = (
        ev.where(F.col("_etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_ts").alias("t_step_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("_etype") == step)
            .join(cur.select("user_id", F.col(f"t_step_{i-1}").alias("_prev")), "user_id")
            .where(F.col("_ts") > F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t_step_{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
    done = sum(
        F.when(F.col(f"t_step_{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("steps_completed", done.cast("long"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-activity week;
    for each (cohort_week, week_offset), how many of that cohort were
    active. The companion read-out to ``funnel`` for longitudinal
    engagement.

    Returns (cohort_week string, week_offset long, n_users long).
    Scale shape: first-activity = one user-keyed min groupBy (map-side
    partials); activity weeks = distinct projection; one equi-join on
    the user id; final count groupBy. Weeks come from date_trunc on the
    naive timestamp, so the bucketing is timezone-invariant.
    """
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    ev = events.select(
        F.col(user_col).alias("user_id"), wk(F.col(ts_col)).alias("_week")
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("_week").alias("_cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy("_cohort", "_week")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .select(
            F.col("_cohort").cast("date").cast("string").alias("cohort_week"),
            (
                (_epoch_sec(F.col("_week")) - _epoch_sec(F.col("_cohort")))
                / (7 * 86400)
            ).cast("long").alias("week_offset"),
            "n_users",
        )
    )
