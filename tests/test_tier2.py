"""Tier-2 store behavior: partitioned write, partition-pruned read.

The rollup VALUES are covered by the DuckDB oracle
(test_oracle_parity::promotion_rollup); this file covers the storage
semantics the oracle can't see — daily partition layout, pruning, and
roundtrip fidelity of the array column.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from via_spark.operators import promote


def _clusters(spark, sf_smoke):
    # sf0.001 has only 1000 events; a 200-point baseline leaves enough
    # unseen hashes for novelty to fire (probed: 5 clusters)
    return promote.promotion_rollup(spark, sf_smoke, sample_size=200, novelty_min_count=1)


def test_tier2_roundtrip_and_pruning(spark, sf_smoke, tmp_path):
    clusters = _clusters(spark, sf_smoke)
    rows = clusters.collect()
    assert len(rows) > 0, "sensitive variant must produce clusters on the fixture"
    for r in rows:
        assert r["entity_type"] == "event_cluster"
        assert r["start_ts"] <= r["end_ts"]
        assert 1 <= len(r["sample_logs"]) <= promote.SAMPLE_LOGS_MAX
        assert r["count"] >= len(r["sample_logs"])

    path = str(tmp_path / "tier2")
    promote.write_tier2(clusters, path)

    # daily partition directories exist (S5's one-collection-per-day analog)
    parts = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert parts, "expected event_date=... partition dirs"

    back = promote.read_tier2(spark, path)
    assert back.count() == len(rows)
    # array column survives the roundtrip intact
    sample = back.orderBy("rhythm_hash").select("sample_logs").first()[0]
    assert isinstance(sample, list) and all(isinstance(s, str) for s in sample)

    # windowed read prunes partitions: filter on the partition column must
    # appear in the scan's PartitionFilters, not as a post-scan Filter
    lo = min(r["start_ts"] for r in rows)
    windowed = promote.read_tier2(spark, path, lo, lo)
    plan = windowed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert windowed.count() >= 1
    assert windowed.where(~F.col("start_ts").between(lo, lo)).count() == 0


def test_append_accumulates_partitions(spark, sf_smoke, tmp_path):
    clusters = _clusters(spark, sf_smoke)
    path = str(tmp_path / "tier2")
    n = clusters.count()
    promote.write_tier2(clusters, path)
    promote.write_tier2(clusters, path)  # append mode is the default
    assert promote.read_tier2(spark, path).count() == 2 * n
