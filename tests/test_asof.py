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


def test_customer_rfm_segments_planted(spark, tmp_path):
    """4 customers, n=4 -> quartile == rank in each dimension. Planted
    so the three rankings DISAGREE: c1 newest but fewest/cheapest
    orders, c4 oldest but most/priciest — exact quartiles and the
    composed 3-digit segment code."""
    import datetime

    from pyspark.sql import functions as F

    from via_spark.operators.relational import customer_rfm_segments

    def o(oid, cust, day, price):
        return (oid, cust, "O", float(price),
                datetime.datetime(2024, 1, day), "1-URGENT", "c", 0, "x")

    rows = [
        # c1: 1 order, newest (day 20), total 10
        o(1, 1, 20, 10.0),
        # c2: 2 orders, day 15, total 200
        o(2, 2, 15, 100.0), o(3, 2, 10, 100.0),
        # c3: 3 orders, day 8, total 3000
        o(4, 3, 8, 1000.0), o(5, 3, 5, 1000.0), o(6, 3, 2, 1000.0),
        # c4: 4 orders, day 1, total 40000
        o(7, 4, 1, 10000.0), o(8, 4, 1, 10000.0),
        o(9, 4, 1, 10000.0), o(10, 4, 1, 10000.0),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    ).write.parquet(str(d / "orders.parquet"))

    got = {r["c_custkey"]: r for r in customer_rfm_segments(spark, str(d)).collect()}
    # recency ranks: c1,c2,c3,c4 ; frequency ranks: c4,c3,c2,c1 ; monetary same
    expect = {
        1: (1, 4, 4, 144),
        2: (2, 3, 3, 233),
        3: (3, 2, 2, 322),
        4: (4, 1, 1, 411),
    }
    for c, (r, f_, m, seg) in expect.items():
        row = got[c]
        assert (
            row["r_quartile"], row["f_quartile"], row["m_quartile"], row["rfm_segment"]
        ) == (r, f_, m, seg), (c, dict(row.asDict()))
    assert got[4]["frequency"] == 4 and got[4]["monetary_fix"] == 40000 * 1_000_000


def test_hour_of_week_profile_pinned_calendar(spark, tmp_path):
    """Epoch day 0 (1970-01-01) was a Thursday: dow must be 4 at ts=0,
    wrap to 0 (Sunday) three days later, and hour must fold UTC hours;
    the mean derives from the exact fixed-point sum."""
    from pyspark.sql import functions as F

    from via_spark.operators.timeseries import hour_of_week_profile

    ns = 1_000_000_000
    rows = [
        (0, 0 * ns, 1, "a", 1.5, "{}"),                     # Thu 00:00 → dow 4
        (1, (3 * 86400 + 3600) * ns, 1, "a", 2.5, "{}"),    # Sun 01:00 → dow 0
        (2, (3 * 86400 + 3600) * ns + 1, 1, "a", 0.25, "{}"),  # same cell
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    got = {
        (r["dow"], r["hour"]): (r["n_events"], r["sum_value_fix"], r["mean_value"])
        for r in hour_of_week_profile(spark, str(d)).collect()
    }
    assert got == {
        (4, 0): (1, 1_500_000, 1.5),
        (0, 1): (2, 2_750_000, 2750000 / 2e6),
    }


def test_user_activity_entropy_planted(spark, tmp_path):
    """A single-type hammerer scores 0 bits; a uniform 4-type user
    scores exactly 2 bits/event (whole-bit quantization is exact on
    powers of two)."""
    from via_spark.operators.timeseries import user_activity_entropy

    ns = 1_000_000_000
    rows = [(i, i * ns, 1, "spam", 0.0, "{}") for i in range(8)]
    rows += [
        (100 + i, i * ns, 2, t, 0.0, "{}")
        for i, t in enumerate(["a", "b", "c", "d"] * 2)
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r["user_id"]: (r["n_events"], r["distinct_types"], r["entropy_bits"],
                       r["mean_bits_per_event"])
        for r in user_activity_entropy(spark, str(d)).collect()
    }
    assert got == {1: (8, 1, 0, 0.0), 2: (8, 4, 16, 2.0)}


def test_user_state_intervals_planted(spark, tmp_path):
    """RLE islands pinned: a→a→b→a yields THREE runs (the state
    returning re-opens a new interval, never merges), with exact
    boundaries; a same-second tie orders by event_id."""
    from via_spark.operators.windows import user_state_intervals

    ns = 1_000_000_000
    rows = [
        (1, 10 * ns, 7, "a", 0.0, "{}"),
        (2, 20 * ns, 7, "a", 0.0, "{}"),
        (3, 30 * ns, 7, "b", 0.0, "{}"),
        (4, 40 * ns, 7, "a", 0.0, "{}"),
        # user 8: two states in the SAME second — event_id breaks the tie,
        # so x(id 5) precedes y(id 6): two runs, not an ordering accident
        (5, 50 * ns, 8, "x", 0.0, "{}"),
        (6, 50 * ns, 8, "y", 0.0, "{}"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    got = {
        (r["user_id"], r["run_id"]): (
            r["event_type"], r["from_sec"], r["to_sec"], r["n_events"]
        )
        for r in user_state_intervals(spark, str(d)).collect()
    }
    assert got == {
        (7, 1): ("a", 10, 20, 2),
        (7, 2): ("b", 30, 30, 1),
        (7, 3): ("a", 40, 40, 1),
        (8, 1): ("x", 50, 50, 1),
        (8, 2): ("y", 50, 50, 1),
    }
