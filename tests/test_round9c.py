"""Planted-fixture semantics + plan pins for the round-9c additions:
Theil–Sen robust trend, linear-interpolation gap-fill, Holt linear
forecast, l-diversity audit, interval-overlap join, distinct-n
diversity, bigram-LM surprisal, and the 2-D Pareto frontier.  Every
expected value is hand-computed or comes from an independent
pure-Python model of the same pinned integer recursion."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from via_spark.operators.curation import l_diversity_audit
from via_spark.operators.relational import pareto_frontier_parts
from via_spark.operators.textstats import (
    bigram_lm_perplexity,
    distinct_ngram_diversity,
)
from via_spark.operators.timeseries import (
    holt_linear_forecast,
    linear_interp_gapfill,
    theil_sen_trend,
)
from via_spark.operators.windows import interval_overlap_pairs
from via_spark.plans import executed_plan

NS_DAY = 86_400 * 1_000_000_000
NS_HOUR = 3_600 * 1_000_000_000
FIX = 1_000_000


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_ns, user_id, event_type, value)."""
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def _daily_series_events(series: dict[str, list[int]]):
    rows, eid = [], 0
    for etype, counts in series.items():
        for day, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append((eid, day * NS_DAY + 500, 1, etype, 1.0))
                eid += 1
    return rows


def _trunc_div(a: int, b: int) -> int:
    """Truncation-toward-zero integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


# --- Theil–Sen -------------------------------------------------------------


def _py_theil_sen(counts: list[int]):
    pts = list(enumerate(counts))
    slopes = sorted(
        _trunc_div((c2 - c1) * FIX, d2 - d1)
        for i, (d1, c1) in enumerate(pts)
        for d2, c2 in pts[i + 1:]
    )
    if not slopes:
        return 0, None
    return len(slopes), slopes[(len(slopes) + 1) // 2 - 1]


def test_theil_sen_outlier_robust(spark, tmp_path):
    """A single corrupted day must leave the median slope at the clean
    trend (the OLS estimator it complements would move); expected
    values from an independent pure-Python model."""
    series = {
        "clean": [10, 12, 14, 16, 18],        # slope exactly 2/day
        "spiked": [10, 12, 200, 16, 18],      # one bad day, trend intact
        "single": [7],                        # no pairs -> NULL slope
    }
    d = _write_events(spark, tmp_path, _daily_series_events(series))
    got = {
        r["event_type"]: (r["n_days"], r["n_pairs"], r["slope_fix"])
        for r in theil_sen_trend(spark, str(d)).collect()
    }
    for etype, counts in series.items():
        n_pairs, med = _py_theil_sen(counts)
        assert got[etype] == (len(counts), n_pairs, med), etype
    assert got["clean"][2] == 2 * FIX
    assert got["spiked"][2] == 2 * FIX  # robust: median ignores the spike
    assert got["single"] == (1, 0, None)


def test_theil_sen_plan_has_no_join(spark, sf_oracle):
    """The O(d^2) pair expansion must be array-local — a daily-table
    self-join in the plan means a second shuffle that the operator's
    scale posture forbids."""
    p = executed_plan(theil_sen_trend(spark, sf_oracle))
    assert not re.search(r"Join", p), p[:2000]


# --- linear interpolation gap-fill ------------------------------------------


def test_linear_interp_planted_values(spark, tmp_path):
    """Hand-computed interpolation: type A observed at hours 0 and 3
    (sums 1.0 and 7.0) must fill hours 1,2 with 3.0 and 5.0; type B
    observed only at hour 1 must stay NULL on both sides (no
    extrapolation)."""
    rows = [
        (0, 0 * NS_HOUR + 10**9, 1, "A", 1.0),
        (1, 3 * NS_HOUR + 10**9, 1, "A", 7.0),
        (2, 1 * NS_HOUR + 10**9, 1, "B", 2.5),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        (r["event_type"], r["hour_start"] // 3600): (r["n"], r["filled_fix"])
        for r in linear_interp_gapfill(spark, str(d)).collect()
    }
    assert got[("A", 0)] == (1, 1_000_000)
    assert got[("A", 1)] == (0, 3_000_000)   # 1 + (7-1)*1/3
    assert got[("A", 2)] == (0, 5_000_000)   # 1 + (7-1)*2/3
    assert got[("A", 3)] == (1, 7_000_000)
    assert got[("B", 0)] == (0, None)        # before first observation
    assert got[("B", 1)] == (1, 2_500_000)
    assert got[("B", 2)] == (0, None)        # after last observation
    assert got[("B", 3)] == (0, None)
    assert len(got) == 8  # full 2-series x 4-hour grid


def test_linear_interp_truncates_like_oracle(spark, tmp_path):
    """Non-integer interpolation must truncate (div), not round: 1.0
    and 2.0 observed 3 hours apart -> fill = 1.333333 exactly."""
    rows = [
        (0, 0, 1, "A", 1.0),
        (1, 3 * NS_HOUR, 1, "A", 2.0),
    ]
    d = _write_events(spark, tmp_path, rows)
    got = {
        r["hour_start"] // 3600: r["filled_fix"]
        for r in linear_interp_gapfill(spark, str(d)).collect()
    }
    assert got[1] == 1_333_333
    assert got[2] == 1_666_666


# --- Holt linear forecast ----------------------------------------------------


def _py_holt(counts: list[int]):
    level, b = counts[0] * FIX, 0
    for x in counts[1:]:
        new_level = _trunc_div(x * FIX + level + b, 2)
        b = _trunc_div(new_level - level, 4) + _trunc_div(3 * b, 4)
        level = new_level
    return level, b


def test_holt_tracks_ramp_ewma_cannot(spark, tmp_path):
    """On a pure ramp the trend term must converge positive and the
    forecast must exceed the last level (the lag EWMA can't close);
    exact values from the pure-Python model of the dyadic recursion —
    including a decaying series whose trend goes NEGATIVE (the
    truncation-sign case the dyadic div semantics pin)."""
    series = {
        "ramp": [10, 20, 30, 40, 50, 60, 70, 80],
        "decay": [80, 70, 60, 50, 40, 30, 20, 10],
        "flat": [25] * 6,
    }
    d = _write_events(spark, tmp_path, _daily_series_events(series))
    got = {
        r["event_type"]: (
            r["n_days"], r["level_fix"], r["trend_fix"], r["forecast_fix"]
        )
        for r in holt_linear_forecast(spark, str(d)).collect()
    }
    for etype, counts in series.items():
        level, b = _py_holt(counts)
        assert got[etype] == (len(counts), level, b, level + b), etype
    assert got["ramp"][2] > 0
    assert got["decay"][2] < 0
    assert got["flat"][2] == 0 and got["flat"][1] == 25 * FIX


# --- l-diversity -------------------------------------------------------------


def test_l_diversity_planted_groups(spark, tmp_path):
    """A group that is k-large yet single-valued on the sensitive
    bucket must violate l=2; a diverse group must not."""
    rows = [
        # (lang, source) = (en, s1): 3 docs, all in bucket 0 -> violates
        (1, "x" * 100, "en", "s1"),
        (2, "x" * 200, "en", "s1"),
        (3, "x" * 300, "en", "s1"),
        # (en, s2): 2 docs in buckets 0 and 2 -> diverse
        (4, "x" * 100, "en", "s2"),
        (5, "x" * 1100, "en", "s2"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        (r["lang"], r["source"]): (
            r["group_size"], r["distinct_sensitive"], r["violates_l"]
        )
        for r in l_diversity_audit(spark, str(d)).collect()
    }
    assert got[("en", "s1")] == (3, 1, True)
    assert got[("en", "s2")] == (2, 2, False)


# --- interval overlap join ----------------------------------------------------


def test_interval_overlap_planted(spark, tmp_path):
    """A session straddling midnight into a hot day must report the
    exact in-day overlap; a session wholly inside a cold day must not
    appear.  Day 0 is made hot (count > truncated-mean threshold) by
    planting traffic."""
    rows = []
    eid = 0
    # day 0: 50 background events from user 9 (all one session)
    for i in range(50):
        rows.append((eid, i * 10**9, 9, "view", 1.0))
        eid += 1
    # day 1 and 2: 2 events each -> cold (mean = (50+2+2)//3 = 18)
    for day in (1, 2):
        for i in range(2):
            rows.append((eid, day * NS_DAY + (40_000 + i * 7200) * 10**9, 20 + day, "view", 1.0))
            eid += 1
    # user 1: session from day0 23:00:00 to day1 00:30:00 (gap 5400s < 6h)
    s_start = 82_800
    s_end = 86_400 + 1_800
    rows.append((eid, s_start * 10**9, 1, "view", 1.0)); eid += 1
    rows.append((eid, s_end * 10**9, 1, "view", 1.0)); eid += 1
    d = _write_events(spark, tmp_path, rows)

    out = interval_overlap_pairs(spark, str(d)).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)

    # user 1 overlaps ONLY the hot day 0: [82800, 86400) = 3600s
    assert len(by_user[1]) == 1
    r = by_user[1][0]
    assert (r["day"], r["overlap_sec"]) == (0, 86_400 - s_start)
    # cold-day users never appear
    assert 21 not in by_user and 22 not in by_user
    # background user 9's day-0 session covers seconds [0, 49] -> 50s
    assert by_user[9][0]["overlap_sec"] == 50
    # day 0 carries the 50 background events + user 1's 23:00 event
    assert by_user[9][0]["day_events"] == 51


def test_interval_overlap_plan_broadcasts_hot_days(spark, sf_oracle):
    """The hot-day side must broadcast (it is calendar-bounded); a
    shuffle join on the day key would re-partition every exploded
    session row."""
    p = executed_plan(interval_overlap_pairs(spark, sf_oracle))
    assert "BroadcastHashJoin" in p, p[:2000]


# --- distinct-n diversity -----------------------------------------------------


def test_distinct_ngram_diversity_planted(spark, tmp_path):
    """Hand-computed distinct-1/2/3 on a two-doc source: n-grams never
    cross doc boundaries, uniqueness pools across the source."""
    rows = [
        (1, "a b a b", "en", "s1"),   # uni a,b,a,b; bi 'a b','b a','a b'; tri 'a b a','b a b'
        (2, "a b c", "en", "s1"),     # uni a,b,c; bi 'a b','b c'; tri 'a b c'
        (3, "z", "en", "s2"),         # single token: no bigrams/trigrams
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["source"]: r for r in distinct_ngram_diversity(spark, str(d)).collect()
    }
    s1 = got["s1"]
    assert (s1["n_tokens"], s1["uniq_1"]) == (7, 3)
    assert s1["distinct1_fix"] == 3 * FIX // 7
    assert s1["uniq_2"] == 3          # 'a b', 'b a', 'b c' over 5 bigrams
    assert s1["distinct2_fix"] == 3 * FIX // 5
    assert s1["uniq_3"] == 3          # 'a b a', 'b a b', 'a b c' over 3
    assert s1["distinct3_fix"] == FIX
    s2 = got["s2"]
    assert (s2["n_tokens"], s2["uniq_1"], s2["distinct1_fix"]) == (1, 1, FIX)
    assert s2["uniq_2"] == 0 and s2["distinct2_fix"] is None
    assert s2["uniq_3"] == 0 and s2["distinct3_fix"] is None


# --- bigram LM surprisal --------------------------------------------------------


def _py_bigram_bits(docs: list[str]):
    toks = {i: [t for t in s.lower().split() if t] for i, s in enumerate(docs)}
    bigrams = [
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    ]
    from collections import Counter

    c_bg = Counter(bigrams)
    c_ctx = Counter(b[0] for b in bigrams)
    v = len({t for ts in toks.values() for t in ts})
    out = {}
    for doc_id, ts in toks.items():
        bits = [
            ((c_ctx[ts[i]] + v) // (c_bg[(ts[i], ts[i + 1])] + 1)).bit_length() - 1
            for i in range(len(ts) - 1)
        ]
        if bits:
            out[doc_id] = (len(bits), sum(bits), sum(bits) * FIX // len(bits))
    return out


def test_bigram_lm_scores_garbled_text_higher(spark, tmp_path):
    """Shuffled word salad must out-score fluent repetition of corpus
    transitions (the unigram model cannot separate them: same token
    mix); exact values from the pure-Python add-one model."""
    docs = [
        "the cat sat on the mat",
        "the cat sat on the mat",
        "the cat sat on the mat",
        "mat the on sat cat the",   # same unigrams, alien transitions
        "lone",                     # no bigrams -> absent from output
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        [(i, s, "en", "s1") for i, s in enumerate(docs)],
        "doc_id long, text string, lang string, source string",
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    expected = _py_bigram_bits(docs)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_bits"], r["mean_bits_fix"])
        for r in bigram_lm_perplexity(spark, str(d)).collect()
    }
    assert got == expected
    assert 4 not in got  # bigram-less doc is absent, pinned
    assert got[3][2] > got[0][2]  # garbled > fluent


# --- Pareto frontier -------------------------------------------------------------


def test_pareto_frontier_planted(spark, tmp_path):
    """Dominance semantics pinned: strictly-cheaper-and-at-least-as-
    large dominates; same-price-strictly-larger dominates; exact
    (price, size) ties all survive."""
    rows = [
        (1, "B", "T", 10, 1.00),   # frontier
        (2, "B", "T", 10, 1.00),   # exact tie with 1 -> both stay
        (3, "B", "T", 5, 1.00),    # same price, smaller -> dominated
        (4, "B", "T", 10, 2.00),   # pricier, same size -> dominated
        (5, "B", "T", 12, 2.00),   # pricier but larger -> frontier
        (6, "B", "T", 1, 0.50),    # cheapest -> frontier
        (7, "B", "T", 1, 0.75),    # dominated by 6 (cheaper, same size)
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, p_size int, p_retailprice double"
    ).write.parquet(str(d / "part.parquet"))
    keys = sorted(
        r["p_partkey"] for r in pareto_frontier_parts(spark, str(d)).collect()
    )
    assert keys == [1, 2, 5, 6]


def test_pareto_plan_windows_price_grain_only(spark, sf_oracle):
    """The single-partition running max must run on the price-grain
    aggregate, never the part fact: the Window's child must contain
    the price-grain HashAggregate, and parts must join the threshold
    table via broadcast."""
    p = executed_plan(pareto_frontier_parts(spark, sf_oracle))
    assert "BroadcastHashJoin" in p, p[:2000]
    win = p.index("Window")
    agg_before_window = "HashAggregate" in p[win:]
    assert agg_before_window, p[:2000]
