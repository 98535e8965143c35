"""As-of join row semantics the oracle parity test can't isolate:
NULL fields INSIDE the matched right row must stay NULL (DuckDB ASOF
row semantics) instead of being back-filled from an older right row.
The aggregate behavior is oracle-covered by ``asof_last_purchase``."""

from __future__ import annotations

from via_spark.operators import asof


def test_null_payload_field_not_backfilled(spark):
    left = spark.createDataFrame([(1, 10), (1, 20), (1, 3)], "k int, ts int")
    right = spark.createDataFrame(
        [(1, 5, 100, "a"), (1, 15, None, "b")], "k int, ts int, v int, tag string"
    )
    out = asof.asof_join(
        left, right, key="k", ts="ts", payload_cols=["v", "tag"], tiebreak="tag"
    )
    rows = {r["ts"]: r for r in out.collect()}
    # before any right row → all payload fields NULL
    assert rows[3]["asof_v"] is None and rows[3]["asof_tag"] is None
    # matches (ts=5): full row carried
    assert rows[10]["asof_v"] == 100 and rows[10]["asof_tag"] == "a"
    # matches (ts=15) whose v is legitimately NULL → v stays NULL, NOT
    # mixed with the older row's v=100
    assert rows[20]["asof_tag"] == "b" and rows[20]["asof_v"] is None


def test_inclusive_match_and_tiebreak(spark):
    left = spark.createDataFrame([(1, 10)], "k int, ts int")
    # two right rows AT the same (k, ts): greatest tiebreak wins
    right = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 2, "z")], "k int, ts int, v int, tag string"
    )
    out = asof.asof_join(
        left, right, key="k", ts="ts", payload_cols=["v", "tag"], tiebreak="tag"
    ).collect()
    assert out[0]["asof_tag"] == "z" and out[0]["asof_v"] == 2
