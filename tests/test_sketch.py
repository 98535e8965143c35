"""Planted-structure tests for the deterministic sketch family
(operators/sketch.py) and the matryoshka recall report (vector.py).

The oracle parity sweep proves Spark == DuckDB; these tests prove the
sketches measure the RIGHT thing — known cardinalities, known members,
known prefix/tail signal splits — so a formula bug both engines share
identically cannot hide behind parity.
"""

from __future__ import annotations

import random

from via_spark.operators.sketch import (
    KMV_K,
    bloom_semi_join_fpr,
    kmv_distinct_report,
)
from via_spark.operators.vector import matryoshka_recall_report

NS_DAY = 86_400 * 1_000_000_000


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(path / "events.parquet"))


def test_kmv_exact_below_k_and_estimator_above(spark, tmp_path):
    """Day 0 has 10 distinct users (< k): the KMV set IS the distinct
    set — estimate exact, rel_error 0. Day 1 has 500 (> k): the
    estimator engages; k=64 gives σ ≈ n/√(k−2) ≈ 12.7 %, so a 50 %
    band is a > 3σ correctness check, not a tuning assertion."""
    rows = [(i, i, i % 10, "a", 0.0, "{}") for i in range(40)]
    rows += [(1000 + u, NS_DAY + u, 100 + u, "a", 0.0, "{}") for u in range(500)]
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    got = {r["day"]: r for r in kmv_distinct_report(spark, str(d)).collect()}
    assert got[0]["exact_distinct"] == 10
    assert got[0]["kmv_estimate"] == 10.0 and got[0]["rel_error"] == 0.0
    assert got[1]["exact_distinct"] == 500
    assert got[1]["kmv_estimate"] != 500.0  # estimator, not a disguised exact count
    assert got[1]["rel_error"] < 0.5
    assert got[0]["k"] == KMV_K == got[1]["k"]


def test_kmv_duplicate_insensitive(spark, tmp_path):
    """KMV sketches the distinct SET: the same 200 users seen 1× (day 0)
    and 5× (day 1) must produce bit-identical estimates."""
    rows = [(u, u, u, "a", 0.0, "{}") for u in range(200)]
    rows += [
        (10_000 + rep * 1000 + u, NS_DAY + rep * 7 + u, u, "a", 0.0, "{}")
        for rep in range(5)
        for u in range(200)
    ]
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    got = {r["day"]: r for r in kmv_distinct_report(spark, str(d)).collect()}
    assert got[0]["exact_distinct"] == got[1]["exact_distinct"] == 200
    assert got[0]["kmv_estimate"] == got[1]["kmv_estimate"]


def test_bloom_no_false_negatives_planted(spark, tmp_path):
    """Fundamental Bloom property: a member is NEVER negative. Planted:
    customer 1 has an URGENT order (member), customer 2 only a LOW
    order, customer 3 no orders — with 1 key in 16384 bits a false
    positive on 2 negatives is (3/16384)³-improbable, so the expected
    report is exact: 1 member, 1 positive, 0 false positives, fpr 0."""
    d = tmp_path / "sf"
    spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "c_custkey long, c_nationkey long"
    ).write.parquet(str(d / "customer.parquet"))
    spark.createDataFrame(
        [(0, "N0")], "n_nationkey long, n_name string"
    ).write.parquet(str(d / "nation.parquet"))
    rows = bloom_semi_join_fpr(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_customers"], r["n_members"]) == (3, 1)
    assert r["n_bloom_positive"] == 1 and r["n_false_positive"] == 0
    assert r["fpr"] == 0.0


def test_bloom_fixture_consistency(spark, sf_smoke):
    """On the real fixture: positives ⊇ members (no false negatives) and
    the false-positive count is exactly positives − members, per nation."""
    for r in bloom_semi_join_fpr(spark, sf_smoke).collect():
        assert r["n_bloom_positive"] >= r["n_members"]
        assert r["n_false_positive"] == r["n_bloom_positive"] - r["n_members"]
        assert 0.0 <= r["fpr"] <= 1.0


def _write_embeddings(spark, path, vecs):
    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(path / "embeddings.parquet"))


def test_matryoshka_recall_one_when_tail_is_noise_free(spark, tmp_path):
    """Vectors whose coordinates past d=16 are all zero: truncated
    ranking must equal full ranking — recall 1.0 for every query."""
    rng = random.Random(7)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(16)] + [0.0] * 48 for _ in range(30)
    ]
    d = tmp_path / "sf"
    _write_embeddings(spark, d, vecs)
    rows = matryoshka_recall_report(spark, str(d), n_queries=4, k=5).collect()
    assert len(rows) == 4
    assert all(r["recall_at_k"] == 1.0 for r in rows)


def test_matryoshka_recall_degrades_when_signal_is_in_tail(spark, tmp_path):
    """Adversarial inverse: every vector shares one prefix; all the
    ranking signal lives in the tail. The truncated side then ranks by
    tie-break alone and must NOT reproduce the full-dim top-k — mean
    recall well below 1 (the report's purpose is exposing exactly this)."""
    rng = random.Random(11)
    prefix = [1.0] * 16
    vecs = [prefix + [rng.uniform(-1, 1) for _ in range(48)] for _ in range(30)]
    d = tmp_path / "sf"
    _write_embeddings(spark, d, vecs)
    rows = matryoshka_recall_report(spark, str(d), n_queries=4, k=5).collect()
    mean_recall = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean_recall < 0.9


def test_zorder_rectangles_on_uniform_grid(spark, tmp_path):
    """Morton locality, exactly: on a full 32×32 (day × user-level)
    grid, every 16-z-value file is an aligned 4×4 rectangle (both
    spans exactly 3 levels), while every lexicographic file is a
    1-day × 16-user-level strip (day span 0, user span 15) — the
    balanced-vs-one-sided pruning trade-off as exact integers."""
    import hashlib

    from via_spark.operators.rank import zorder_layout_report

    # pick one uid per user-hash level (the operator's 48-bit
    # sha256-prefix hash mod 32), deterministically
    level_uid: dict[int, int] = {}
    uid = 0
    while len(level_uid) < 32:
        lvl = int(hashlib.sha256(str(uid).encode()).hexdigest()[:12], 16) % 32
        level_uid.setdefault(lvl, uid)
        uid += 1
    ns_day = 86_400 * 1_000_000_000
    rows = [
        (day * 1000 + lvl, day * ns_day, level_uid[lvl], "a", 0.0, "{}")
        for day in range(32)
        for lvl in range(32)
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    out = zorder_layout_report(spark, str(d)).collect()
    z = [r for r in out if r["layout"] == "zorder"]
    lex = [r for r in out if r["layout"] == "lexicographic"]
    assert len(z) == 64 and len(lex) == 64
    for r in z:
        assert r["n_rows"] == 16
        assert r["max_day_level"] - r["min_day_level"] == 3
        assert r["max_user_level"] - r["min_user_level"] == 3
    for r in lex:
        assert r["n_rows"] == 16
        assert r["max_day_level"] == r["min_day_level"]
        assert r["max_user_level"] - r["min_user_level"] == 15


def test_kmv_partial_states_merge_losslessly(spark, tmp_path):
    """The mergeability contract behind the 100 TB posture, proven:
    split one day's users into two disjoint halves, take each half's
    k-minimum hash set (the per-partition partial state), union the
    partials and re-cut to k — the merged kth-min (hence the whole
    estimate) must equal the single-pass KMV over the full day."""
    import hashlib

    from via_spark.operators.sketch import KMV_K, kmv_distinct_report

    users = list(range(1000, 1500))
    rows = [(u, u, u, "a", 0.0, "{}") for u in users]
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    [row] = kmv_distinct_report(spark, str(d)).collect()

    def h48(u):
        return int(hashlib.sha256(str(u).encode()).hexdigest()[:12], 16)

    half_a = sorted(h48(u) for u in users[:250])[:KMV_K]
    half_b = sorted(h48(u) for u in users[250:])[:KMV_K]
    merged = sorted(set(half_a) | set(half_b))[:KMV_K]
    assert len(merged) == KMV_K
    est = (KMV_K - 1) * float(2**48) / merged[-1]
    assert row["kmv_estimate"] == est


def test_kmv_retention_overlap_planted(spark, tmp_path):
    """Set-algebra pinned on three planted day pairs: a 50 %-shifted
    pair (exact jaccard 1/3, estimator within a >4σ band), a disjoint
    pair (sketch CANNOT invent intersection — exactly 0.0), and a
    small pair (union ≤ k ⇒ the union sample IS the union, so every
    sketched number equals the exact one)."""
    rows = [(u, u, u, "a", 0.0, "{}") for u in range(100)]  # day0: 0..99
    rows += [(1000 + u, NS_DAY + u, 50 + u, "a", 0.0, "{}") for u in range(100)]  # day1: 50..149
    rows += [(2000 + u, 2 * NS_DAY + u, 200 + u, "a", 0.0, "{}") for u in range(80)]  # day2
    rows += [(3000 + u, 3 * NS_DAY + u, 300 + u, "a", 0.0, "{}") for u in range(80)]  # day3: disjoint
    rows += [(4000 + u, 4 * NS_DAY + u, 400 + u, "a", 0.0, "{}") for u in range(20)]  # day4
    rows += [(5000 + u, 5 * NS_DAY + u, 410 + u, "a", 0.0, "{}") for u in range(20)]  # day5: ∩ = 10
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    from via_spark.operators.sketch import kmv_retention_overlap

    got = {r["day_a"]: r for r in kmv_retention_overlap(spark, str(d)).collect()}
    r01 = got[0]
    assert (r01["exact_union"], r01["exact_intersection"]) == (150, 50)
    assert abs(r01["exact_jaccard"] - 1 / 3) < 1e-12
    assert abs(r01["kmv_jaccard"] - 1 / 3) < 0.25  # >4σ at k=64
    r23 = got[2]
    assert r23["exact_intersection"] == 0
    assert r23["kmv_jaccard"] == 0.0 and r23["kmv_intersection"] == 0.0
    r45 = got[4]
    assert (r45["exact_union"], r45["exact_intersection"]) == (30, 10)
    assert r45["kmv_union"] == 30.0
    assert r45["kmv_jaccard"] == r45["exact_jaccard"]
    assert r45["kmv_intersection"] == 10.0


def test_hash_sample_quantiles_planted(spark, tmp_path):
    """Rank-quantile + sampling behavior pinned: a 1..1000 uniform type
    has exact p50=500/p95=950 by the discrete rank definition; the
    256-row hash sample lands within a >4σ rank band. A type with
    fewer rows than m samples ITSELF — zero error, exactly."""
    from via_spark.operators.sketch import hash_sample_quantile_report

    rows = [(i, i, 1, "big", float(i + 1), "{}") for i in range(1000)]
    rows += [(5000 + i, i, 2, "small", float(i + 1), "{}") for i in range(100)]
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    got = {r["event_type"]: r for r in hash_sample_quantile_report(spark, str(d)).collect()}
    big = got["big"]
    assert (big["n_rows"], big["sample_m"]) == (1000, 256)
    assert big["p50_exact"] == 500.0 and big["p95_exact"] == 950.0
    assert abs(big["p50_sample"] - 500.0) < 150  # σ≈31 values at m=256
    assert abs(big["p95_sample"] - 950.0) < 100
    small = got["small"]
    assert (small["n_rows"], small["sample_m"]) == (100, 100)
    assert small["p50_abs_err"] == 0.0 and small["p95_abs_err"] == 0.0


def test_value_drift_tvd_planted(spark, tmp_path):
    """TVD pinned at its exact landmarks on a 4-day chain: identical
    distributions → 0, fully disjoint bins → 1, half-shifted → 0.5 —
    all exact because the numerator is a cross-multiplied integer sum
    (no float accumulation)."""
    from via_spark.operators.stats import value_drift_tvd

    def day_rows(day, vals, base):
        return [
            (base + i, day * NS_DAY + i, i, "a", float(v), "{}")
            for i, v in enumerate(vals)
        ]

    rows = (
        day_rows(0, [0.0] * 100, 0)
        + day_rows(1, [0.0] * 100, 1000)
        + day_rows(2, [1000.0] * 100, 2000)
        + day_rows(3, [0.0] * 50 + [1000.0] * 50, 3000)
    )
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    got = {r["day"]: r["tvd"] for r in value_drift_tvd(spark, str(d)).collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 0.5}


def test_bloom_sizing_curve_monotone(spark, sf_smoke):
    """The sizing law on the real fixture: growing m must not increase
    fill or FPR (same keys, same hashes, only the modulus changes),
    members are never missed at any size, and the bookkeeping ties out
    (fp = positives − members; fill = set bits / m ≤ keys·k/m)."""
    from via_spark.operators.sketch import bloom_sizing_curve

    rows = sorted(bloom_sizing_curve(spark, sf_smoke).collect(), key=lambda r: r["m"])
    assert len(rows) == 3
    assert len({r["n_keys"] for r in rows}) == 1  # same build set at every m
    for r in rows:
        assert r["n_bloom_positive"] >= r["n_members"]  # no false negatives
        assert r["n_false_positive"] == r["n_bloom_positive"] - r["n_members"]
        assert 0.0 < r["fill_fraction"] <= min(1.0, r["n_keys"] * 3 / r["m"])
    for small, big in zip(rows, rows[1:]):
        assert big["fill_fraction"] < small["fill_fraction"]
        assert big["fpr"] <= small["fpr"]


def test_kmv_matches_python_model_property(spark, tmp_path):
    """Hypothesis: for arbitrary user-id multisets, the engine's KMV
    estimate per day equals a pure-Python replay of the estimator
    (sha256-prefix hashes, bottom-k, (k-1)·2^48/kth) — run over one
    Spark session with multiple generated days in one frame to keep
    the property affordable."""
    import hashlib

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from via_spark.operators.sketch import KMV_K, kmv_distinct_report

    day_sets = st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=120),
        min_size=1,
        max_size=4,
    )

    def h48(u):
        return int(hashlib.sha256(str(u).encode()).hexdigest()[:12], 16)

    counter = {"n": 0}

    @given(days=day_sets)
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(days):
        counter["n"] += 1
        d = tmp_path / f"sf{counter['n']}"
        rows = [
            (di * 100_000 + i, di * NS_DAY + i, u, "a", 0.0, "{}")
            for di, users in enumerate(days)
            for i, u in enumerate(users)
        ]
        _write_events(spark, d, rows)
        got = {r["day"]: r["kmv_estimate"] for r in kmv_distinct_report(spark, str(d)).collect()}
        for di, users in enumerate(days):
            hs = sorted({h48(u) for u in users})
            expect = (
                float(len(hs))
                if len(hs) < KMV_K
                else (KMV_K - 1) * float(2**48) / hs[KMV_K - 1]
            )
            assert got[di] == expect

    prop()


def test_cm_one_sided_and_exact_without_collisions(spark, tmp_path):
    """Count-Min's defining contracts, planted: estimates are NEVER
    below exact (one-sided error, every key), and with 3 keys in a
    256-wide matrix a collision across ALL 4 rows is
    (3/256)⁴-improbable — every estimate exact. A forced-collision
    case (width=1) degenerates every estimate to the total mass."""
    from via_spark.operators.sketch import cm_frequency_report

    rows = [(i, i, u, "a", 0.0, "{}") for i, u in enumerate([7] * 5 + [8] * 3 + [9] * 2)]
    d = tmp_path / "sf"
    _write_events(spark, d, rows)
    got = {r["user_id"]: r for r in cm_frequency_report(spark, str(d)).collect()}
    assert {u: r["exact_count"] for u, r in got.items()} == {7: 5, 8: 3, 9: 2}
    assert all(r["cm_estimate"] == r["exact_count"] for r in got.values())
    forced = {
        r["user_id"]: r["cm_estimate"]
        for r in cm_frequency_report(spark, str(d), width=1).collect()
    }
    assert forced == {7: 10, 8: 10, 9: 10}  # all mass in one counter


def test_cm_never_underestimates_fixture(spark, sf_smoke):
    """One-sided error on the real fixture: overestimate ≥ 0 for every
    key and the bookkeeping ties out."""
    from via_spark.operators.sketch import cm_frequency_report

    for r in cm_frequency_report(spark, sf_smoke).collect():
        assert r["overestimate"] >= 0
        assert r["cm_estimate"] == r["exact_count"] + r["overestimate"]


def test_join_output_planner_matches_executed_join(spark, sf_smoke):
    """The planner's exact output cardinality must equal the row count
    of ACTUALLY executing the planned join, and the top-20 rows must
    reproduce a pure-Python computation over the per-key counts
    (products, totals, skew ratio bit-for-bit)."""
    from via_spark.operators.stats import join_output_planner
    from via_spark.session import load_table

    got = join_output_planner(spark, sf_smoke).collect()
    assert 0 < len(got) <= 20

    orders = load_table(spark, sf_smoke, "orders")
    events = load_table(spark, sf_smoke, "events")
    executed = orders.join(
        events, orders["o_custkey"] == events["user_id"]
    ).count()
    assert got[0]["total_output"] == executed

    from collections import Counter

    lcnt = Counter(r["o_custkey"] for r in orders.select("o_custkey").collect())
    rcnt = Counter(r["user_id"] for r in events.select("user_id").collect())
    prod = {
        k: lcnt[k] * rcnt[k] for k in lcnt.keys() & rcnt.keys()
    }
    total = sum(prod.values())
    top = sorted(prod.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["join_key"], r["key_output"]) for r in got] == top
    for r in got:
        assert r["n_left"] == lcnt[r["join_key"]]
        assert r["n_right"] == rcnt[r["join_key"]]
        assert r["n_matched_keys"] == len(prod)
        assert r["skew_ratio"] == (
            float(r["key_output"]) * float(len(prod)) / float(total)
        )


def test_contingency_chi2_python_reference(spark, sf_smoke):
    """Every cell of the chi-square audit must reproduce a pure-Python
    integer computation of the margins and the cross-multiplied
    deviation exactly, and the float columns bit-for-bit (they are
    single expressions over exactly-cast integers, so Python's IEEE
    doubles replicate them). Structural identities: margins sum to n,
    and per-row deviations sum to zero whenever the row's hour
    coverage is complete."""
    from collections import Counter

    from via_spark.operators.stats import contingency_chi2
    from via_spark.session import load_table

    got = contingency_chi2(spark, sf_smoke).collect()
    ev = (
        load_table(spark, sf_smoke, "events")
        .selectExpr("event_type", "cast((ts div 1000000000 div 3600) % 24 as int) h")
        .collect()
    )
    cells = Counter((r["event_type"], r["h"]) for r in ev)
    rt = Counter(r["event_type"] for r in ev)
    ct = Counter(r["h"] for r in ev)
    n = len(ev)
    assert len(got) == len(cells)
    for r in got:
        obs = cells[(r["event_type"], r["hour"])]
        assert r["obs"] == obs
        assert r["row_total"] == rt[r["event_type"]]
        assert r["col_total"] == ct[r["hour"]]
        assert r["n_total"] == n
        dev = n * obs - rt[r["event_type"]] * ct[r["hour"]]
        assert r["dev"] == dev
        assert r["expected"] == (
            float(rt[r["event_type"]]) * float(ct[r["hour"]]) / float(n)
        )
        assert r["contribution"] == (
            float(dev)
            * float(dev)
            / (float(n) * float(rt[r["event_type"]]) * float(ct[r["hour"]]))
        )
    # complete-grid marginal identity
    hours = {h for _, h in cells}
    for t in rt:
        if all((t, h) in cells for h in hours) and len(hours) == 24:
            assert sum(n * cells[(t, h)] - rt[t] * ct[h] for h in hours) == 0


def test_winsorized_stats_planted_outlier(spark, tmp_path):
    """One fat-finger value (1e6 among ~100 unit-scale rows) must drag
    the raw mean far away while the winsorized mean stays put; clip
    bounds are the exact discrete p1/p99 ranks of the planted
    distribution; clip counts are exact. A clean uniform group clips
    nothing beyond its own rank-extremes and both means agree."""
    import datetime

    from pyspark.sql import functions as F

    from via_spark.operators.stats import winsorized_stats

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # dirty: 99 values 1.0..99.0 plus one 1e6 outlier
    for i in range(99):
        rows.append((i, base, 7, "dirty", float(i + 1), "{}"))
    rows.append((99, base, 7, "dirty", 1_000_000.0, "{}"))
    # clean: 100 values 1.0..100.0
    for i in range(100):
        rows.append((100 + i, base, 8, "clean", float(i + 1), "{}"))
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))

    got = {r["event_type"]: r for r in winsorized_stats(spark, str(d)).collect()}

    dirty = got["dirty"]
    # discrete ranks over 100 rows: p1 = 1st value, p99 = 99th value
    assert dirty["lo_clip"] == 1.0 and dirty["hi_clip"] == 99.0
    assert dirty["n"] == 100
    assert dirty["n_clipped_low"] == 0 and dirty["n_clipped_high"] == 1
    # raw mean poisoned (~10049.5), winsorized mean = mean(1..99, 99)
    assert dirty["mean_raw"] > 10_000
    assert dirty["mean_winsorized"] == (sum(range(1, 100)) + 99) / 100 / 1.0
    clean = got["clean"]
    # discrete ranks: p1 = 1st of 100, p99 = 99th of 100 -> value 100
    # winsorizes down to 99 by definition (exact-rank semantics)
    assert clean["lo_clip"] == 1.0 and clean["hi_clip"] == 99.0
    assert clean["n_clipped_low"] == 0 and clean["n_clipped_high"] == 1
    assert clean["mean_raw"] == 50.5
    assert clean["mean_winsorized"] == (sum(range(1, 100)) + 99) / 100


def test_cooccurrence_lift_planted_association(spark, tmp_path):
    """Planted association landmarks: types A and B always co-occur
    in the same user-days (lift = n_ud/(c·c) at its maximum), A and C
    never do (lift = 0 absent — pair row missing), and an
    independent-ish pair lands at its exact rational value. All
    counts exact integers against a pure-Python reference."""
    import datetime

    from via_spark.operators.timeseries import cooccurrence_lift

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, day, user, typ):
        return (eid, base + datetime.timedelta(days=day), user, typ, 1.0, "{}")

    rows = []
    eid = 0
    # 4 user-days where A and B co-occur; C occupies 4 OTHER user-days
    for d in range(4):
        rows.append(ev(eid, d, 1, "A")); eid += 1
        rows.append(ev(eid, d, 1, "B")); eid += 1
        rows.append(ev(eid, d, 2, "C")); eid += 1
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))

    got = {
        (r["type_a"], r["type_b"]): r
        for r in cooccurrence_lift(spark, str(d)).collect()
    }
    # n_ud = 8 (4 days for user1 + 4 days for user2)
    ab = got[("A", "B")]
    assert (ab["c_ab"], ab["c_a"], ab["c_b"], ab["n_user_days"]) == (4, 4, 4, 8)
    assert ab["lift"] == 8 * 4 / (4 * 4)  # 2.0: perfect co-occurrence
    assert ("A", "C") not in got and ("B", "C") not in got  # never together


def test_interarrival_profile_planted_cadence(spark, tmp_path):
    """Planted cadences: a strict 60 s heartbeat (all gaps 60 — p50 =
    p95 = mean = 60); a bursty type with gaps [1,1,1,1,1,1,1,1,1,991]
    (p50 = 1, p95 = 991, exact mean 100); cross-user independence
    (two users' heartbeat streams never produce a cross-user gap);
    same-second events yield a 0 gap via the event_id tiebreak."""
    import datetime

    from via_spark.operators.timeseries import interarrival_profile

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(day_s, user, typ):
        nonlocal eid
        rows.append(
            (eid, base + datetime.timedelta(seconds=day_s), user, typ, 1.0, "{}")
        )
        eid += 1

    for u in (1, 2):  # two users, identical heartbeats
        for i in range(11):
            ev(i * 60, u, "heartbeat")
    t = 0
    ev(t, 3, "bursty")
    for g in [1] * 9 + [991]:
        t += g
        ev(t, 3, "bursty")
    ev(5000, 4, "tied"); ev(5000, 4, "tied")  # same second

    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))

    got = {r["event_type"]: r for r in interarrival_profile(spark, str(d)).collect()}
    hb = got["heartbeat"]
    assert hb["n_gaps"] == 20  # 10 per user — never a cross-user gap
    assert hb["p50_gap_s"] == hb["p95_gap_s"] == 60
    assert hb["mean_gap_s"] == 60.0
    b = got["bursty"]
    assert b["n_gaps"] == 10
    assert (b["p50_gap_s"], b["p95_gap_s"]) == (1, 991)
    assert b["mean_gap_s"] == 100.0
    assert got["tied"]["n_gaps"] == 1 and got["tied"]["p50_gap_s"] == 0


def test_daily_trend_slopes_planted_lines(spark, tmp_path):
    """Planted exact lines: a perfectly linear ramp y = 5 + 2x over 10
    days must yield slope EXACTLY 2 (integer numerator/denominator
    ratio); a flat line slope 0 with zero numerator; a V-shape
    (symmetric) also 0 — least squares cancels symmetric deviations;
    and the reported double equals num/den bit-for-bit."""
    import datetime

    from via_spark.operators.timeseries import daily_trend_slopes

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def burst(day, typ, n):
        nonlocal eid
        for _ in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day), 1, typ, 1.0, "{}")
            )
            eid += 1

    for x in range(10):
        burst(x, "ramp", 5 + 2 * x)
        burst(x, "flat", 7)
        burst(x, "vee", abs(x - 4) + 1)  # symmetric around day 4... not quite
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(d / "events.parquet"))

    got = {r["event_type"]: r for r in daily_trend_slopes(spark, str(d)).collect()}
    ramp = got["ramp"]
    assert ramp["slope_num"] / ramp["slope_den"] == 2.0
    assert ramp["slope_per_day"] == 2.0
    flat = got["flat"]
    assert flat["slope_num"] == 0 and flat["slope_per_day"] == 0.0
    # |x-4|+1 over x=0..9 is NOT symmetric about the x-mean (4.5): the
    # exact rational slope is computable by hand
    import statistics

    ys = [abs(x - 4) + 1 for x in range(10)]
    n = 10
    sx, sy = sum(range(10)), sum(ys)
    sxy = sum(x * y for x, y in zip(range(10), ys))
    sxx = sum(x * x for x in range(10))
    vee = got["vee"]
    assert vee["slope_num"] == n * sxy - sx * sy
    assert vee["slope_den"] == n * sxx - sx * sx
    assert vee["slope_per_day"] == float(n * sxy - sx * sy) / float(n * sxx - sx * sx)


def test_kmv_rolling_merge_losslessness_live(spark, tmp_path):
    """Merged-daily-sketch estimates must be BIT-IDENTICAL to
    sketching each window's union directly (union-then-recut =
    recut-of-union, executed at query grain), including cross-day
    duplicate users hashing identically. Under k merged hashes the
    estimate must be EXACT."""
    import datetime

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from via_spark.operators.sketch import (
        KMV_K,
        _hash48,
        kmv_rolling_distinct,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 12 days; user u active on day d iff (u + d) % 3 == 0 — lots of
    # cross-day repetition; 90 users keeps some windows near/above k=64
    for d in range(12):
        for u in range(90):
            if (u + d) % 3 == 0:
                rows.append(
                    (eid, base + datetime.timedelta(days=d), u, "view", 1.0, "{}")
                )
                eid += 1
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(sf / "events.parquet"))

    got = {r["as_of_day"]: r for r in kmv_rolling_distinct(spark, str(sf)).collect()}

    # direct sketch of each window's union
    du = (
        spark.read.parquet(str(sf / "events.parquet"))
        .select(
            F.expr("unix_date(cast(ts as date))").cast("long").alias("day"),
            F.col("user_id").cast("string").alias("uid"),
        )
        .distinct()
    )
    pairs = du.select(
        F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("as_of_day"),
        _hash48(F.col("uid")).alias("uh"),
    ).distinct()
    max_day = du.agg(F.max("day")).collect()[0][0]
    w = Window.partitionBy("as_of_day").orderBy(F.col("uh").asc())
    direct = {
        r["as_of_day"]: r
        for r in pairs.where(F.col("as_of_day") <= max_day)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= KMV_K)
        .groupBy("as_of_day")
        .agg(F.count(F.lit(1)).alias("n_head"), F.max("uh").alias("kth_min"))
        .collect()
    }
    assert set(got) == set(direct)
    for day, r in got.items():
        d = direct[day]
        if d["n_head"] < KMV_K:
            assert r["kmv_estimate"] == float(d["n_head"])
            assert r["kmv_estimate"] == float(r["exact_rolling_distinct"])
            assert r["rel_error"] == 0.0
        else:
            assert r["kmv_estimate"] == float((KMV_K - 1) * 2**48) / float(
                d["kth_min"]
            )


def test_ship_lag_profile_planted_sla(spark, tmp_path):
    """Planted SLA shapes: a 'FAST' priority shipping every item in
    exactly 2 days (p50 = p95 = mean = 2); a 'TAIL' priority with 19
    one-day shipments and one 100-day straggler (p50 = 1, p95 = 100,
    mean = (19 + 100)/20 exact). Multi-lineitem orders inherit their
    order's date exactly once per lineitem."""
    import datetime

    from pyspark.sql import functions as F

    from via_spark.operators.stats import ship_lag_profile

    base = datetime.datetime(2024, 1, 1)
    orders, lineitems = [], []
    # FAST: 5 orders x 2 lineitems, ship at +2 days
    for i in range(5):
        orders.append((i, base, "FAST"))
        for j in range(2):
            lineitems.append((i, base + datetime.timedelta(days=2)))
    # TAIL: 20 orders x 1 lineitem: 18 at +1, two at +100 (19/20 sits
    # exactly ON the 0.95 rank boundary, so 19+1 would legitimately
    # give p95 = 1 under the discrete definition — 18+2 crosses it)
    for i in range(20):
        oid = 100 + i
        orders.append((oid, base, "TAIL"))
        lag = 100 if i >= 18 else 1
        lineitems.append((oid, base + datetime.timedelta(days=lag)))
    d = tmp_path / "sf"
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderdate timestamp, o_orderpriority string"
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        lineitems, "l_orderkey long, l_shipdate timestamp"
    ).write.parquet(str(d / "lineitem.parquet"))

    got = {r["priority"]: r for r in ship_lag_profile(spark, str(d)).collect()}
    fast = got["FAST"]
    assert fast["n_lineitems"] == 10
    assert fast["p50_lag_days"] == fast["p95_lag_days"] == 2
    assert fast["mean_lag_days"] == 2.0
    tail = got["TAIL"]
    assert tail["n_lineitems"] == 20
    assert (tail["p50_lag_days"], tail["p95_lag_days"]) == (1, 100)
    assert tail["mean_lag_days"] == (18 * 1 + 2 * 100) / 20


def test_seasonal_zscore_planted_cell_structure(spark, tmp_path):
    """The reason the cell baseline exists: a value of 50 is planted
    as NORMAL for (typ, hour A) — tight cluster around 50 — and
    ANOMALOUS for (typ, hour B) where the baseline clusters around 1.
    The global z-score would blur the two populations; the cell
    variant must flag the 50 at hour B (and the 500 spike at hour A)
    while flagging NONE of the in-cell-normal values."""
    rows = []
    eid = 0
    HOUR = 3600 * 1_000_000_000
    # hour A (ts in hour 0): values ~50; one 500 spike
    for i in range(30):
        rows.append((eid, i * 1_000_000_000, 1, "typ", 50.0 + (i % 3) * 0.5, "{}"))
        eid += 1
    rows.append((eid, 40 * 1_000_000_000, 1, "typ", 500.0, "{}")); eid += 1
    # hour B (ts in hour 1): values ~1; one 50 "normal elsewhere"
    for i in range(30):
        rows.append((eid, HOUR + i * 1_000_000_000, 1, "typ", 1.0 + (i % 3) * 0.05, "{}"))
        eid += 1
    rows.append((eid, HOUR + 40 * 1_000_000_000, 1, "typ", 50.0, "{}"))
    spike_a, spike_b = eid - 31, eid  # event ids of the two planted spikes
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(d / "events.parquet"))

    from via_spark.operators.timeseries import seasonal_zscore_outliers

    got = {r["event_id"]: r for r in seasonal_zscore_outliers(spark, str(d)).collect()}
    assert spike_b in got and got[spike_b]["value"] == 50.0
    assert got[spike_b]["how"] == 1 and got[spike_b]["zscore"] > 3
    spike_a_row = [r for r in got.values() if r["value"] == 500.0]
    assert len(spike_a_row) == 1 and spike_a_row[0]["how"] == 0
    # nothing in-cell-normal flagged
    assert all(r["value"] in (50.0, 500.0) for r in got.values())


def test_hll_python_reference_and_regime(spark, sf_oracle):
    """Every HLL column equals a pure-Python model over the same
    sha256-prefix hashes, bit-for-bit — the harmonic denominator is a
    sum of dyadics spanning < 53 mantissa bits, so BOTH engines' add
    order is provably irrelevant and floats compare with ==. Also pins
    the regime choice: fixture day-cardinalities must sit above the
    2.5·m linear-counting threshold, so rel_error is a real accuracy
    number (and stays under 3× the 1.04/sqrt(m) theory band)."""
    import duckdb
    import hashlib

    from via_spark.operators.sketch import HLL_P, hll_distinct_report

    m = 1 << HLL_P
    w_bits = 48 - HLL_P
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT CAST(epoch_us(ts) // 1000000 // 86400 AS BIGINT),"
        f" CAST(user_id AS VARCHAR)"
        f" FROM read_parquet('{sf_oracle}/events.parquet')"
    ).fetchall()
    regs: dict[int, dict[int, int]] = {}
    exact: dict[int, set] = {}
    for day, uid in rows:
        h = int(hashlib.sha256(uid.encode()).hexdigest()[:12], 16)
        reg, w = h & (m - 1), h >> HLL_P
        rank = (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length())
        d = regs.setdefault(day, {})
        d[reg] = max(d.get(reg, 0), rank)
        exact.setdefault(day, set()).add(uid)
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    expect = {}
    for day, d in regs.items():
        denom = sum(1.0 / (1 << r) for r in d.values()) + (float(m) - len(d))
        est = alpha * float(m) * float(m) / denom
        ex = len(exact[day])
        expect[day] = (ex, len(d), m - len(d), est, abs(est - ex) / ex)
    got = {
        r["day"]: (
            r["exact_distinct"], r["registers_hit"], r["zero_registers"],
            r["hll_estimate"], r["rel_error"],
        )
        for r in hll_distinct_report(spark, sf_oracle).collect()
    }
    assert got == expect
    # regime pins: raw estimator valid (n > 2.5m) and error in band
    for day, (ex, _, _, _, err) in expect.items():
        assert ex > 2.5 * m, f"day {day}: fixture left the raw-HLL regime"
        assert err < 3 * 1.04 / m ** 0.5, f"day {day}: error {err} out of band"


def test_span_dup_token_stats_planted_overlap(spark, tmp_path):
    """Hand-computed coverage: two docs share a 20-token span AND an
    overlapping 14-token span (same region shifted) — the doc's covered
    tokens must be the interval UNION, never the sum; a source whose
    docs share nothing reports 0; totals are exact token counts."""
    from pyspark.sql import functions as F

    from via_spark.operators.dedup import span_dup_token_stats

    span = " ".join(f"s{i}" for i in range(20))
    # doc 1: [a a a] S0..S19 [z z]            -> covered [4, 23]
    # doc 2: [b] S0..S19 [y y y]              -> covered [2, 21]
    # doc 3: [c c] S6..S19 [x x x x]          -> covered [3, 16] (14-span)
    rows = [
        (1, "a1 a2 a3 " + span + " z1 z2", "dup_src"),
        (2, "b1 " + span + " y1 y2 y3", "dup_src"),
        (3, "c1 c2 " + " ".join(f"s{i}" for i in range(6, 20)) + " x1 x2 x3 x4",
         "dup_src"),
        (4, " ".join(f"u{i}" for i in range(25)), "clean_src"),
        (5, " ".join(f"v{i}" for i in range(15)), "clean_src"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["dup_span_tokens"],
                      r["dup_token_ratio"])
        for r in span_dup_token_stats(spark, str(d)).collect()
    }
    # doc1: spans vs doc2 (20 tokens at [4,23]) and vs doc3 (14 at [10,23])
    #   union = [4,23] = 20;  doc2: [2,21] ∪ [8,21] = 20
    #   doc3: whole shared run with doc1/doc2 = 14 tokens at [3,16]
    assert got["dup_src"] == (3, 25 + 24 + 20, 20 + 20 + 14,
                              (20 + 20 + 14) / (25 + 24 + 20))
    assert got["clean_src"] == (2, 40, 0, 0.0)


def test_hll_union_merge_losslessness(spark, sf_oracle):
    """Sketch algebra: the __corpus__ union row's registers (max over
    per-source register maxima) must be IDENTICAL to hashing the whole
    corpus directly — associativity of max executed on real data — so
    the union estimate equals the direct estimate bit-for-bit. Also
    pins the dedup story: the union exact is strictly less than the
    per-source exact sum (sources share grams), and every scope sits
    above the 2.5·m raw-regime threshold."""
    from pyspark.sql import functions as F

    from via_spark.operators.sketch import (
        HLL_P,
        hll_register_rows,
        hll_union_report,
    )
    from via_spark.session import load_table

    rows = hll_union_report(spark, sf_oracle).collect()
    by_scope = {r["scope"]: r for r in rows}
    union = by_scope.pop("__corpus__")
    m = 1 << HLL_P
    assert union["exact_distinct"] < sum(
        r["exact_distinct"] for r in by_scope.values()
    ), "sources share no grams — union demo is vacuous"
    assert all(r["exact_distinct"] > 2.5 * m for r in rows)

    # direct corpus hashing -> registers must equal the merged union's
    from via_spark.functions.text import tokens

    t = (
        load_table(spark, sf_oracle, "documents")
        .select(tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") >= 3)
    )
    grams = t.select(
        F.lit("all").alias("k"),
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', slice(toks, i, 3)))"
            )
        ).alias("gram"),
    )
    direct = (
        hll_register_rows(grams, key="k", value="gram")
        .groupBy("reg")
        .agg(F.max("rank").alias("m_rank"))
        .collect()
    )
    alpha = 0.7213 / (1.0 + 1.079 / float(m))
    ranks = [r["m_rank"] for r in direct]
    denom = sum(1.0 / (1 << mr) for mr in ranks) + (float(m) - len(ranks))
    assert union["hll_estimate"] == alpha * float(m) * float(m) / denom
    assert union["registers_hit"] == len(ranks)


def test_incremental_span_consistency_with_self_join(spark, sf_oracle):
    """Every incremental (batch->corpus) span pair must appear in the
    full self-join's pair set with the SAME longest span, and the
    incremental output must contain exactly the self-join pairs that
    straddle the residue split — same consistency contract as
    test_incremental_pairs_consistent_with_self_join."""
    from via_spark.operators.dedup import (
        INCREMENTAL_BATCH_RESIDUE,
        INCREMENTAL_MOD,
        incremental_span_pairs,
        shared_span_pairs,
    )

    inc = {
        (r["new_doc"], r["corpus_doc"]): r["longest_span_tokens"]
        for r in incremental_span_pairs(spark, sf_oracle).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
        for r in shared_span_pairs(spark, sf_oracle).collect()
    }

    def is_batch(d):
        return d % INCREMENTAL_MOD == INCREMENTAL_BATCH_RESIDUE

    expect = {}
    for (a, b), span in full.items():
        if is_batch(a) != is_batch(b):
            new, corp = (a, b) if is_batch(a) else (b, a)
            expect[(new, corp)] = span
    assert inc == expect
    assert inc, "fixture must exercise the incremental split (vacuous otherwise)"
