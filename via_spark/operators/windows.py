"""Event-time window aggregations as batch operators (T5 extension).

The reference only has processing-time tumbling analysis (T2); this
module adds the full Spark window family over the tier1 view, each
oracle-checkable:

* tumbling  — covered by ``streaming.pipeline.windowed_hash_counts``
* sliding   — ``sliding_hash_counts`` (120 s window, 60 s slide: every
  event lands in exactly two windows)
* session   — ``session_hash_counts`` (gap-based ``session_window``;
  the SQL oracle reproduces it with the gaps-and-islands pattern:
  a new session starts when the gap from the previous event ≥ gap)

All windows align to the epoch (Spark default) and are emitted as
epoch-second longs, so no session timezone can shift a boundary.

Scale posture: windowed aggs shuffle once on (window, key); in
streaming form their state is bounded by watermark horizon × keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from via_spark.operators import rhythm

SLIDE_WINDOW = "120 seconds"
SLIDE_STEP = "60 seconds"
SESSION_GAP_SEC = 86_400  # 1 day — the fixture stream is sparse per hash


def sliding_hash_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hash counts in sliding event-time windows."""
    t1 = rhythm.tier1_from_events(spark, sf_dir)
    win = F.window(F.timestamp_seconds(F.col("ts")), SLIDE_WINDOW, SLIDE_STEP)
    return (
        t1.groupBy(win.alias("win"), F.col("rhythm_hash"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").cast("long").alias("window_start"),
            "rhythm_hash",
            "n",
        )
    )


def session_hash_counts(
    spark: SparkSession, sf_dir: str, gap_sec: int = SESSION_GAP_SEC
) -> DataFrame:
    """Per-hash session windows: events closer than ``gap_sec`` chain
    into one session; output start/end/size per session."""
    t1 = rhythm.tier1_from_events(spark, sf_dir)
    sw = F.session_window(F.timestamp_seconds(F.col("ts")), f"{gap_sec} seconds")
    return (
        t1.groupBy(sw.alias("sw"), F.col("rhythm_hash"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("rhythm_hash", "session_start", "session_end", "n")
    )
