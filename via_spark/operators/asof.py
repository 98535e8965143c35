"""As-of (point-in-time) join — a composition of built-in operators.

Spark has no native ASOF JOIN; this implements the standard scalable
composition: tag both sides, union, then a per-key ``last(ignorenulls)``
running window ordered by time carries the most recent right-side
payload forward onto every left row. One shuffle on (key), no
per-row Python, no range-explosion — the plan is a union + window,
both whole-stage-codegen operators.

Semantics (pinned, matching DuckDB's ``ASOF LEFT JOIN`` inclusive
form): each left row gets the right row with the greatest
``ts_right <= ts_left`` for the same key; a right row AT the left
timestamp matches; left rows before any right row get NULLs.
Determinism: right rows are pre-deduplicated to one per (key, ts)
(greatest tiebreak id wins) and right sorts before left at equal ts.
The payload travels as ONE struct carried by a single
``last(ignorenulls)`` — so a legitimately-NULL field inside the matched
right row stays NULL instead of being back-filled from an older row
(per-column carries would mix columns of different right rows, which
would diverge from DuckDB's ASOF row semantics).

Scale posture (100 TB): the union-window form is how production Spark
does point-in-time joins (feature stores, trade/quote alignment): state
per window partition is one carried payload, the sort is per-key within
the single shuffle, and skewed keys split under AQE. The alternative
(range join + top-1) explodes candidate pairs; this never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join: latest right payload with right.ts <= left.ts.

    ``left`` keeps all its columns; ``payload_cols`` from ``right``
    arrive prefixed ``asof_`` (NULL when no prior right row exists).
    ``tiebreak`` is a right-side column deduplicating equal (key, ts).
    """
    w_dedup = Window.partitionBy(key, ts).orderBy(F.col(tiebreak).desc())
    r = (
        right.withColumn("_rn", F.row_number().over(w_dedup))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    left_cols = [c for c in left.columns]
    payload_type = StructType(
        [StructField(c, r.schema[c].dataType, True) for c in payload_cols]
    )
    r_tagged = r.select(
        F.col(key),
        F.col(ts),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (key, ts)],
    )
    l_tagged = left.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *[F.col(c) for c in left_cols if c not in (key, ts)],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # right rows sort before left rows at equal ts → inclusive match;
    # the whole payload struct is carried by ONE last(ignorenulls), so
    # all asof_* fields come from the SAME matched right row
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last(F.col("_payload"), ignorenulls=True).over(w).alias("_carr")
    )
    return carried.where(F.col("_is_right") == 0).select(
        *[F.col(c) for c in left_cols],
        *[F.col("_carr")[c].alias(f"asof_{c}") for c in payload_cols],
    )


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event: the user's most recent prior-or-same purchase
    (timestamp + value) — the time-since-last-conversion shape."""
    from via_spark.session import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("ts div 1000000000").alias("ts_sec"),
        "event_type",
        "value",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_sec", "event_id", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        ev.drop("value"),
        purchases,
        key="user_id",
        ts="ts_sec",
        payload_cols=["purchase_value", "event_id"],
        tiebreak="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_sec",
        "event_type",
        F.col("asof_event_id").alias("last_purchase_event"),
        F.col("asof_purchase_value").alias("last_purchase_value"),
    )
