"""Bucketed-table join: the Exchange-free co-located join path."""

from __future__ import annotations

from via_spark import storage
from via_spark.plans import executed_plan
from via_spark.session import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    lineitem = load_table(spark, sf_smoke, "lineitem")
    try:
        storage.write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        storage.write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = storage.bucketed_join(
                spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey"
            )
            plan = executed_plan(joined)
            assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:1500]}"
            assert "SortMergeJoin" in plan
            # values identical to the plain join
            plain = orders.join(
                lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
            )
            assert joined.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        storage.drop_table(spark, "b_orders")
        storage.drop_table(spark, "b_lineitem")


def test_retention_drops_old_partitions(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    from via_spark import storage

    days = ["2026-01-01", "2026-01-02", "2026-01-03"]
    df = spark.createDataFrame(
        [(i, datetime.date.fromisoformat(d)) for i, d in enumerate(days) for _ in range(4)],
        "cluster_id long, event_date date",
    )
    path = str(tmp_path / "t2")
    df.write.partitionBy("event_date").parquet(path)

    dropped = storage.drop_partitions_before(path, "2026-01-03")
    assert dropped == ["event_date=2026-01-01", "event_date=2026-01-02"]
    remaining = spark.read.parquet(path)
    assert remaining.count() == 4
    assert remaining.where(F.col("event_date") < "2026-01-03").count() == 0
