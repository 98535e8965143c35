"""Control loop: suppression / patch rules over rhythm hashes.

Capability parity (semantics, not code) with the reference:
* rules registry    — ``app/db/registry.py:29-39`` (``patch_registry``
  SQLite table) + in-memory caches ``app/services/control_service.py:17-35``
* suppress (TTL)    — ``app/services/control_service.py:60-64``
* patch (permanent) — ``app/services/control_service.py:66-87``
* P5/J3 anti-filter — ``app/services/control_service.py:89-98``;
  applied in ``rhythm_analysis_service.py:86-87`` and
  ``forensic_analysis_service.py:63-65``
* P6 active-rules projection — ``app/services/control_service.py:100-118``
* S12 eval-case sink — ``app/services/control_service.py:37-58``

Engine model: ONE rules table ``(rhythm_hash, rule, reason, created_ts,
expires_at, is_active)`` replaces both the SQLite registry and the two
in-memory caches — a permanent patch is a row with ``expires_at`` NULL,
a TTL suppression has ``expires_at = now + ttl``. ``now`` is always an
explicit parameter (SURVEY.md §7.4 decision 2).

Scale posture (100 TB): the rules table is tiny (operator-curated), so
every application is a broadcast ``left_anti`` join — no shuffle of the
event side; upsert = anti-join + union, rewriting only the small table.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RULE_SUPPRESS = "SUPPRESS"
RULE_ALLOW_LIST = "ALLOW_LIST"

RULES_SCHEMA = StructType(
    [
        StructField("rhythm_hash", StringType()),
        StructField("rule", StringType()),
        StructField("reason", StringType()),
        StructField("created_ts", LongType()),
        StructField("expires_at", LongType()),  # NULL = permanent
        StructField("is_active", BooleanType()),
    ]
)


def empty_rules(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], RULES_SCHEMA)


def active_rules(rules: DataFrame, now: int) -> DataFrame:
    """P6: active patches + unexpired suppressions."""
    return rules.where(
        F.col("is_active")
        & (F.col("expires_at").isNull() | (F.col("expires_at") > F.lit(now)))
    )


def apply_rules(df: DataFrame, rules: DataFrame, now: int) -> DataFrame:
    """P5/J3: drop rows whose rhythm_hash has an active rule
    (broadcast left_anti — the event side never shuffles)."""
    return df.join(
        F.broadcast(active_rules(rules, now).select("rhythm_hash").distinct()),
        "rhythm_hash",
        "left_anti",
    )


def upsert_rule(
    rules: DataFrame,
    rhythm_hash: str,
    rule: str,
    reason: str,
    now: int,
    ttl_sec: int | None = None,
) -> DataFrame:
    """Upsert-on-hash (anti-join + union — Delta MERGE shape without
    requiring a lakehouse runtime)."""
    spark = rules.sparkSession
    new = spark.createDataFrame(
        [
            (
                rhythm_hash,
                rule,
                reason,
                int(now),
                int(now + ttl_sec) if ttl_sec is not None else None,
                True,
            )
        ],
        RULES_SCHEMA,
    )
    kept = rules.join(new.select("rhythm_hash"), "rhythm_hash", "left_anti")
    return kept.unionByName(new)


def suppress(rules: DataFrame, rhythm_hash: str, ttl_sec: int, now: int,
             reason: str = "operator suppression") -> DataFrame:
    return upsert_rule(rules, rhythm_hash, RULE_SUPPRESS, reason, now, ttl_sec)


def patch(rules: DataFrame, rhythm_hash: str, now: int,
          reason: str = "permanent allow-list") -> DataFrame:
    return upsert_rule(rules, rhythm_hash, RULE_ALLOW_LIST, reason, now)


def deactivate(rules: DataFrame, rhythm_hash: str) -> DataFrame:
    return rules.withColumn(
        "is_active",
        F.when(F.col("rhythm_hash") == rhythm_hash, F.lit(False)).otherwise(
            F.col("is_active")
        ),
    )


def write_eval_case(
    evals_dir: str, rhythm_hash: str, context_logs: Iterable[str], now: int
) -> str:
    """S12: one YAML regression case per patch, asserting the patched
    hash must no longer be flagged (reference format:
    ``control_service.py:37-58``)."""
    os.makedirs(evals_dir, exist_ok=True)
    path = os.path.join(evals_dir, f"eval_{rhythm_hash[:12].replace(':', '_')}_{now}.yml")
    lines = [
        f"rhythm_hash: {rhythm_hash!r}",
        "context_logs:",
        *[f"  - {log!r}" for log in context_logs],
        "expected_outcome:",
        "  is_anomaly: false",
        "",
    ]
    with open(path, "w") as fh:
        fh.write("\n".join(lines))
    return path


def read_eval_case(path: str) -> dict:
    """Parse one eval case file (the exact line-based shape
    ``write_eval_case`` emits — values are Python reprs, so no YAML
    runtime is needed in this container)."""
    import ast

    case: dict = {"context_logs": [], "expected_is_anomaly": False}
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith("rhythm_hash: "):
                case["rhythm_hash"] = ast.literal_eval(line.split(": ", 1)[1])
            elif line.startswith("  - "):
                case["context_logs"].append(ast.literal_eval(line[4:]))
            elif line.startswith("  is_anomaly: "):
                case["expected_is_anomaly"] = line.split(": ", 1)[1] == "true"
    return case


# --- fixture-derived rule queries (oracle-checkable) ------------------------

def _recent_counts(spark: SparkSession, sf_dir: str):
    from via_spark import store
    from via_spark.operators import rhythm

    tier1 = store.tier1(spark, sf_dir)
    now = rhythm.current_now(tier1)
    recent = rhythm.recent_window(tier1, now, rhythm.DEFAULT_WINDOW_SEC)
    counts = recent.groupBy("rhythm_hash").agg(F.count(F.lit(1)).alias("r_count"))
    return tier1, now, counts


def suppressed_anomalies(spark: SparkSession, sf_dir: str, n_rules: int = 2) -> DataFrame:
    """J3 end-to-end: the sensitive novelty detection with the top-N
    most frequent recent hashes suppressed — the reference's
    suppress-then-reanalyze control-loop invariant
    (``tests/test_api_flow.py:64-81``) as one declarative query."""
    from via_spark.operators import rhythm

    tier1, now, counts = _recent_counts(spark, sf_dir)
    rules = (
        counts.orderBy(F.col("r_count").desc(), F.col("rhythm_hash").asc())
        .limit(n_rules)
        .select("rhythm_hash")
    )
    return rhythm.find_rhythm_anomalies(
        spark, sf_dir, now=now, tier1=tier1, rules=rules,
        sample_size=2000, novelty_min_count=1,
    )


def active_rules_projection(spark: SparkSession, sf_dir: str, n_rules: int = 12) -> DataFrame:
    """P6 over a deterministic fixture-derived rules table: hashes
    ranked by recent count get alternating rule kinds, a mix of
    expired / live / permanent TTLs, and some inactive rows; only the
    active-and-unexpired survive."""
    _, now, counts = _recent_counts(spark, sf_dir)
    ranked = (
        counts.orderBy(F.col("r_count").desc(), F.col("rhythm_hash").asc())
        .limit(n_rules)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("r_count").desc(), F.col("rhythm_hash").asc())
            ),
        )
    )
    rules = ranked.select(
        "rhythm_hash",
        F.when(F.col("rn") % 2 == 0, F.lit(RULE_SUPPRESS))
        .otherwise(F.lit(RULE_ALLOW_LIST))
        .alias("rule"),
        F.when(F.col("rn") % 3 == 2, F.lit(None).cast("long"))
        .otherwise(F.lit(now) + (F.col("rn") % 3 * 2 - 1) * 1000)
        .alias("expires_at"),
        (F.col("rn") % 4 != 0).alias("is_active"),
    )
    return rules.where(
        F.col("is_active")
        & (F.col("expires_at").isNull() | (F.col("expires_at") > F.lit(now)))
    ).select("rhythm_hash", "rule", "expires_at")
