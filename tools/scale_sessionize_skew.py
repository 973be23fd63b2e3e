#!/usr/bin/env python
"""Sessionize skew rung (r15, VERDICT r14 #9): is the per-user session
window a skew/straggler problem at a rung where the window shuffle is
visible, and does per-key range pre-bucketing pay?

Corpus: N events (default 10M), deterministic. HOT_FRAC of all events
belong to ONE user (the skewed key — a bot/firehose client); the rest
spread uniformly over ~N/100 users. Timestamps are seeded arithmetic
(no RNG). Measures, interleaved same-process, min-of-REPS:

  a. plain `session_stats` (the shipped operator: one window shuffle
     on user_id — the hot user's whole timeline lands in ONE task);
  b. a two-level pre-bucketed variant (inline here, not shipped):
     events of over-cap users are windowed per (user, time-bucket)
     locally, then a tiny per-user bucket-level pass stitches sessions
     that straddle bucket boundaries (exact: a session crosses a
     boundary iff the gap across it is <= the session gap), and the
     bucket offset re-joins broadcast. Under-cap users take the plain
     path. Outputs asserted hash-identical to (a).

    python tools/scale_sessionize_skew.py [n_events] [hot_frac] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
GAP_MIN = 30
BUCKET_SEC = 6 * 3600  # 12x the session gap: straddles are rare


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vamana_spark.session import get_session

    spark = get_session("sessionize_skew_rung")
    sc = spark.sparkContext

    n_hot = int(N * HOT_FRAC)
    n_users = max(N // 100, 1)
    # hot user: event every 45 s (sessions break every ~40 events via a
    # +2h jump); cold users: ~100 events each, every 20 min (gap breaks
    # sessions constantly). All arithmetic on the row id — deterministic.
    ev = spark.range(N).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.col("id") % n_users) + 1)
        .alias("user_id"),
        F.timestamp_seconds(
            F.when(
                F.col("id") < n_hot,
                F.col("id") * 45 + (F.col("id") / 40).cast("long") * 7200,
            ).otherwise(
                (F.col("id") % 97) * 1200
                + (F.col("id") / 9700).cast("long") * 86400
            )
        ).alias("ts"),
        (F.col("id") % 1000 / 10.0).alias("value"),
    )
    ev.write.mode("overwrite").parquet("/tmp/vsp_sess_skew")
    events = spark.read.parquet("/tmp/vsp_sess_skew")

    gap_sec = GAP_MIN * 60

    def plain():
        from vamana_spark.operators import events as EV

        return EV.session_stats(events, GAP_MIN)

    def prebucketed():
        # inline two-level variant (measurement only)
        b = (F.col("ts").cast("double") / BUCKET_SEC).cast("long")
        e = events.withColumn("_b", b)
        w = Window.partitionBy("user_id", "_b").orderBy(
            F.col("ts").asc(), F.col("event_id").asc()
        )
        prev = F.lag("ts").over(w)
        new = F.when(
            prev.isNull()
            | (F.col("ts").cast("double") - prev.cast("double") > gap_sec),
            1,
        ).otherwise(0)
        loc = (
            e.withColumn("_new", new)
            .withColumn("_lseq", F.sum("_new").over(w).cast("long"))
            .localCheckpoint()  # read by bucket summary AND the re-join
        )
        # bucket summaries: tiny relation (users x buckets-with-events)
        bs = loc.groupBy("user_id", "_b").agg(
            F.min(F.col("ts").cast("double")).alias("_first"),
            F.max(F.col("ts").cast("double")).alias("_last"),
            F.max("_lseq").alias("_nloc"),
        )
        wb = Window.partitionBy("user_id").orderBy("_b")
        stitched = bs.select(
            "user_id",
            "_b",
            "_nloc",
            F.when(
                (F.col("_first") - F.lag("_last").over(wb)) <= gap_sec, 1
            ).otherwise(0).alias("_merge"),
        )
        offs = stitched.select(
            "user_id",
            "_b",
            (
                F.sum("_nloc").over(wb)
                - F.col("_nloc")
                - F.sum("_merge").over(wb)
            ).alias("_off"),
            "_merge",
        )
        glob = loc.join(F.broadcast(offs), ["user_id", "_b"]).withColumn(
            "session_seq",
            # first local session of a merged bucket joins the previous
            # bucket's last session: offset already subtracts the merge
            (F.col("_lseq") + F.col("_off")).cast("long"),
        )
        return (
            glob.groupBy("user_id", "session_seq")
            .agg(
                F.count("*").cast("long").alias("n_events"),
                F.round(
                    F.max(F.col("ts").cast("double"))
                    - F.min(F.col("ts").cast("double")),
                    3,
                ).alias("duration_sec"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
        )

    def digest(df):
        return df.select(
            F.sum(
                F.xxhash64("user_id", "session_seq", "n_events", "duration_sec",
                           "sum_value").cast("decimal(38,0)")
            ).alias("h"),
            F.count(F.lit(1)).alias("n"),
        ).first()

    def run(fn, label):
        sc.setJobDescription(f"sessionize skew: {label}")
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        sc.setJobDescription(None)
        return dt, n

    da, db = digest(plain()), digest(prebucketed())
    assert (da["h"], da["n"]) == (db["h"], db["n"]), f"outputs differ: {da} vs {db}"
    print(f"outputs identical: {da['n']} sessions")

    ta, tb = [], []
    for i in range(REPS):
        ta.append(run(plain, f"plain r{i}")[0])
        tb.append(run(prebucketed, f"prebucket r{i}")[0])
        print(f"rep {i}: plain={ta[-1]:.2f}s prebucket={tb[-1]:.2f}s")
    print(
        f"min-of-{REPS}: plain={min(ta):.2f}s prebucket={min(tb):.2f}s "
        f"speedup={min(ta)/min(tb):.3f}x (n={N}, hot_frac={HOT_FRAC})"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
