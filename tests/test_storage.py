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
