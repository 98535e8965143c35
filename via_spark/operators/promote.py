"""Tier-1 → Tier-2 promotion: cluster rollup + date-partitioned store.

Capability parity (semantics, not code) with the reference:
* A3 cluster rollup — ``app/services/promotion_service.py:14-53``:
  group anomalous rows by ``rhythm_hash``; ``start_ts``/``end_ts`` =
  min/max ts, ``count`` = group size, representative
  ``body/service/severity/anomaly_*`` from the earliest-ts row,
  ``sample_logs`` = first 5 serialized logs by ts,
  ``entity_type`` = 'event_cluster'.
* S5 daily bucketing — ``app/services/qdrant_service.py:112-135``:
  one Qdrant collection per day becomes ``write.partitionBy("event_date")``
  on one Parquet/lakehouse table; "lazy collection creation" is free with
  dynamic partitions.
* S8 federated partition enumeration — ``app/services/qdrant_service.py:38-42``:
  replaced by Catalyst partition pruning on ``event_date``.

Deviation (documented, SURVEY.md §7.4): the reference's worker passes ONE
representative payload per anomalous hash into promotion, so its clusters
degenerate to count=1; this engine rolls up ALL recent-window rows of each
anomalous hash — a strict superset that preserves the rollup math
(min/max/count/sample ordering) the reference's code defines.

Determinism: the representative row and the sample ordering use the
pinned (ts asc, event_id asc) tiebreak; ``event_date`` is derived by pure
integer arithmetic (``ts // 86400`` days since epoch) so no session
timezone can shift a partition.

Scale posture (100 TB): the rollup is one hash-partitioned aggregation
over the (already small) anomalous subset; the tier2 table is
date-partitioned so retention is a partition drop and every forensic
query prunes to the queried days; ``sample_logs`` caps payload width at
5 rows/group so cluster rows stay O(1) regardless of incident size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from via_spark.operators import rhythm
from via_spark import store

SAMPLE_LOGS_MAX = 5
ENTITY_TYPE = "event_cluster"


def event_date(ts_sec: Column) -> Column:
    """Epoch-seconds → date via integer day arithmetic (timezone-proof)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), (ts_sec / 86400).cast("int"))


def _serialize_log(df: DataFrame) -> Column:
    """The engine's ``full_log_json`` analog for fixture rows (F9)."""
    return F.to_json(
        F.struct(
            df["event_id"], df["ts"], df["service"], df["severity"], df["body"]
        )
    )


def rollup_clusters(anomalies: DataFrame, logs: DataFrame) -> DataFrame:
    """A3: aggregate the logs of each anomalous hash into one cluster row.

    ``anomalies``: output of ``rhythm.find_rhythm_anomalies`` (one row per
    hash, representative fields + anomaly_type/context already attached —
    same earliest-(ts, event_id) representative the rollup needs).
    ``logs``: the rows to cluster (recent-window tier1 view).
    """
    member = logs.join(
        anomalies.select("rhythm_hash"), "rhythm_hash", "left_semi"
    )
    agg = member.groupBy("rhythm_hash").agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_logs"),
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            _serialize_log(member).alias("log_json"),
                        )
                    )
                ),
                1,
                SAMPLE_LOGS_MAX,
            ),
            lambda s: s["log_json"],
        ).alias("sample_logs"),
    )
    return (
        anomalies.select(
            "rhythm_hash", "service", "severity", "body", "anomaly_type", "anomaly_context"
        )
        .join(agg, "rhythm_hash")
        .select(
            F.lit(ENTITY_TYPE).alias("entity_type"),
            "rhythm_hash",
            "start_ts",
            "end_ts",
            F.col("n_logs").alias("count"),
            "service",
            "severity",
            "anomaly_type",
            "anomaly_context",
            "body",
            "sample_logs",
            event_date(F.col("start_ts")).alias("event_date"),
        )
    )


def promotion_rollup(spark: SparkSession, sf_dir: str, **variant) -> DataFrame:
    """End-to-end: detect anomalies (sensitive variant → non-empty on the
    anomaly-free fixture) and roll their member logs into tier2 clusters."""
    params = variant or dict(sample_size=2000, novelty_min_count=1)
    tier1 = store.tier1(spark, sf_dir)
    now = rhythm.current_now(tier1)
    anomalies = rhythm.find_rhythm_anomalies(spark, sf_dir, now=now, tier1=tier1, **params)
    recent = rhythm.recent_window(tier1, now, rhythm.DEFAULT_WINDOW_SEC)
    return rollup_clusters(anomalies, recent)


def promotion_rollup_flat(spark: SparkSession, sf_dir: str, **variant) -> DataFrame:
    """Driver-facing shape of :func:`promotion_rollup`: identical rows, but
    ``sample_logs`` serialized to one newline-joined string so harnesses that
    canonicalize via pandas (which cannot hash list cells) can compare it.
    Internal writers keep the array form (:func:`write_tier2`).

    Served from the session tier2 store when the requested variant IS
    the store's variant (the production read path — promotion writes
    tier2 once, consumers scan it; re-deriving the whole detection →
    rollup pipeline per call measured 2.5 s vs a 0.1 s store scan at
    sf0.1); any other variant computes inline."""
    from via_spark import store
    from via_spark.operators.forensic import TIER2_VARIANT

    params = variant or dict(sample_size=2000, novelty_min_count=1)
    if params == TIER2_VARIANT:
        rolled = store.tier2(spark, sf_dir, **params)
    else:
        rolled = promotion_rollup(spark, sf_dir, **params)
    return rolled.withColumn("sample_logs", F.array_join("sample_logs", "\n"))


def daily_rollup(anomalies: DataFrame, logs: DataFrame) -> DataFrame:
    """S5 stored layout: one cluster row per (rhythm_hash, day) over the
    full history of each anomalous hash.

    The reference keeps one tier2 collection PER DAY and each daily
    analysis run writes that day's clusters into it
    (``app/services/qdrant_service.py:112-135``); this produces the same
    multi-day store in a single pass — group member logs by
    (rhythm_hash, event_date) instead of re-running the rollup once per
    day. Representative fields come from the earliest (ts, event_id) row
    of the hash WITHIN each day; anomaly_type/context are per-hash
    detection metadata carried onto every day-row.

    Scale posture: one hash-partitioned aggregation + one
    WindowGroupLimit, both keyed on (rhythm_hash, event_date); written
    through :func:`write_tier2` the result is the date-partitioned table
    every windowed forensic query prunes (S8).
    """
    member = logs.join(
        anomalies.select("rhythm_hash").distinct(), "rhythm_hash", "left_semi"
    ).withColumn("event_date", event_date(F.col("ts")))
    w = Window.partitionBy("rhythm_hash", "event_date").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    rep = (
        member.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("rhythm_hash", "event_date", "service", "severity", "body")
    )
    agg = member.groupBy("rhythm_hash", "event_date").agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.count(F.lit(1)).alias("n_logs"),
        F.transform(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("ts"),
                            F.col("event_id"),
                            _serialize_log(member).alias("log_json"),
                        )
                    )
                ),
                1,
                SAMPLE_LOGS_MAX,
            ),
            lambda s: s["log_json"],
        ).alias("sample_logs"),
    )
    return (
        rep.join(agg, ["rhythm_hash", "event_date"])
        .join(
            anomalies.select(
                "rhythm_hash", "anomaly_type", "anomaly_context"
            ).distinct(),
            "rhythm_hash",
        )
        .select(
            F.lit(ENTITY_TYPE).alias("entity_type"),
            "rhythm_hash",
            "start_ts",
            "end_ts",
            F.col("n_logs").alias("count"),
            "service",
            "severity",
            "anomaly_type",
            "anomaly_context",
            "body",
            "sample_logs",
            "event_date",
        )
    )


def write_tier2(clusters: DataFrame, path: str, mode: str = "append") -> None:
    """S5 sink: dynamic daily partitions; sorted within partitions on
    ``start_ts`` so Parquet row-group min/max stats sharpen time-range
    skipping inside each day (the reference's payload index analog, O2)."""
    (
        clusters.repartition("event_date")
        .sortWithinPartitions("start_ts")
        .write.mode(mode)
        .partitionBy("event_date")
        .parquet(path)
    )


def read_tier2(
    spark: SparkSession,
    path: str,
    start_ts: int | None = None,
    end_ts: int | None = None,
) -> DataFrame:
    """S8/S9: read tier2; a time window prunes to its daily partitions
    (predicate on the partition column → Catalyst skips whole days),
    then the exact ``start_ts`` range filter applies within them.
    Either bound may be open (gte-only / lte-only, the reference's P1
    range semantics)."""
    df = spark.read.parquet(path)
    if start_ts is not None:
        df = df.where(
            F.col("event_date") >= event_date(F.lit(start_ts).cast("long"))
        ).where(F.col("start_ts") >= start_ts)
    if end_ts is not None:
        df = df.where(
            F.col("event_date") <= event_date(F.lit(end_ts).cast("long"))
        ).where(F.col("start_ts") <= end_ts)
    return df
