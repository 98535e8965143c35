"""Planted-fixture semantics tests for the round-9b additions: the
adapted TPC-H Q21 blame report, the Gopher rule audit (vs an
independent pure-Python rule model), DSIR importance ordering, and the
exact dyadic EWMA (hand-computed expected fixed-point values,
including calendar-gap handling)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from via_spark.operators.curation import (
    dsir_importance_weights,
    gopher_rule_audit,
)
from via_spark.operators.relational import late_only_suppliers
from via_spark.operators.timeseries import ewma_daily_counts

NS_DAY = 86_400 * 1_000_000_000


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang)."""
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, lang string").withColumn(
        "source", F.lit("src0")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_late_only_suppliers_planted_blame(spark, tmp_path):
    """Only-late-supplier semantics: blamed iff the order is
    multi-supplier, finished, and the supplier is the UNIQUE late
    shipper on it."""
    d = tmp_path / "sf"
    base = dt.datetime(1995, 1, 1)
    late = base + dt.timedelta(days=120)
    ontime = base + dt.timedelta(days=10)
    orders = [
        (1, "F", base),  # A late, B on-time -> A blamed
        (2, "F", base),  # A and B both late -> nobody
        (3, "F", base),  # single-supplier, late -> not counted
        (4, "F", base),  # C late among A,B on-time -> C blamed
        (5, "O", base),  # open order: excluded entirely
    ]
    lines = [
        (1, 100, late), (1, 200, ontime),
        (2, 100, late), (2, 200, late),
        (3, 100, late),
        (4, 100, ontime), (4, 200, ontime), (4, 300, late),
        (5, 300, late), (5, 100, ontime),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_orderstatus string, o_orderdate timestamp"
    ).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        lines, "l_orderkey long, l_suppkey long, l_shipdate timestamp"
    ).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(
        [(100, "SUPP_A"), (200, "SUPP_B"), (300, "SUPP_C")],
        "s_suppkey long, s_name string",
    ).write.parquet(str(d / "supplier.parquet"))

    got = {
        r["s_name"]: r["numwait"]
        for r in late_only_suppliers(spark, str(d)).collect()
    }
    assert got == {"SUPP_A": 1, "SUPP_C": 1}


def _py_rules(text: str) -> dict[str, bool]:
    """Independent pure-Python model of the pinned rule bands."""
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    chars = sum(len(t) for t in toks)
    stop = sum(t in ("the", "a", "and", "of", "to", "in", "is", "for") for t in toks)
    uniq = len(set(toks))
    top = max(toks.count(u) for u in set(toks))
    return {
        "word_count": 30 <= n <= 60,
        "mean_word_len": 40 * n <= chars * 10 <= 46 * n,
        "stopword_hits": stop >= 2,
        "unique_ratio": uniq * 2 >= n,
        "top_token_share": top * 10 <= n,
    }


def test_gopher_rule_audit_matches_python_model(spark, tmp_path):
    """Each planted doc isolates one rule; the audit counts must match
    the pure-Python model summed over the same texts."""
    texts = [
        # passes everything: 40 distinct 4-char tokens + 2 stopwords
        " ".join(f"tk{i:02d}" for i in range(40)) + " the a",
        # word_count fail (10 tokens), others pass
        " ".join(f"tk{i:02d}" for i in range(8)) + " the a",
        # mean_word_len fail: long tokens
        " ".join(f"verylongtoken{i:02d}" for i in range(38)) + " the a",
        # stopword fail: no stopwords at all
        " ".join(f"tk{i:02d}" for i in range(40)),
        # unique_ratio fail: 48 tokens, only 12 distinct, top count 4
        " ".join(f"tk{i:02d}" for i in range(12) for _ in range(4)),
        # top_token_share fail: one token 10/44 times, still >50% uniq
        " ".join(["dup0"] * 10 + [f"tk{i:02d}" for i in range(32)]) + " the a",
    ]
    rows = [(i, t, "en") for i, t in enumerate(texts)]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["rule"]: (r["n_pass"], r["n_fail"])
        for r in gopher_rule_audit(spark, sf).collect()
    }
    models = [_py_rules(t) for t in texts]
    for rule in models[0]:
        n_pass = sum(m[rule] for m in models)
        assert got[rule] == (n_pass, len(texts) - n_pass), rule
    n_all = sum(all(m.values()) for m in models)
    assert got["all_rules"] == (n_all, len(texts) - n_all)
    # the plants did isolate: every rule has both outcomes
    assert all(0 < got[r][0] < len(texts) for r in models[0])


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """Docs written in the target domain's vocabulary must outscore
    docs in the raw-corpus vocabulary, and a raw doc that borrows the
    target vocabulary scores like the target docs (that's the point
    of importance resampling — it scores CONTENT, not the label)."""
    tvocab = " ".join(f"target{i}" for i in range(20))
    rvocab = " ".join(f"raw{i}" for i in range(20))
    rows = (
        [(i, tvocab, "en") for i in range(10)]
        + [(100 + i, rvocab, "de") for i in range(10)]
        + [(900, tvocab, "de")]  # raw-labeled, target-vocab
    )
    sf = _write_docs(spark, tmp_path, rows)
    w = {
        r["doc_id"]: r["weight_bits"] / r["n_tokens"]
        for r in dsir_importance_weights(spark, sf).collect()
    }
    assert w[0] > w[100], "target vocab must outscore raw vocab"
    assert w[900] > w[100], "content decides, not the domain label"
    assert abs(w[900] - w[0]) < 0.5, "same text, near-same mean score"


def test_ewma_daily_counts_exact_dyadic(spark, tmp_path):
    """Hand-computed dyadic EWMA with a calendar gap: counts 4, 2,
    (missing), 8 on days 0,1,3 give exactly 2.0, 2.0, 4.5 after
    halving weights per elapsed calendar day (gap days carry no
    mass but DO decay older days)."""
    d = tmp_path / "sf"
    rows = []
    eid = 0
    for day, cnt in ((0, 4), (1, 2), (3, 8)):
        for _ in range(cnt):
            rows.append((eid, day * NS_DAY + 1000, "click", 1.0))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double"
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r["day"]: (r["cnt"], r["ewma_fix"])
        for r in ewma_daily_counts(spark, str(d)).collect()
    }
    assert got == {
        0: (4, 2_000_000),           # 4/2
        1: (2, 2_000_000),           # 2/2 + 4/4
        3: (8, 4_500_000),           # 8/2 + 2/8 + 4/16
    }


def test_pagerank_planted_two_node_exact(spark, tmp_path):
    """Hand-computed exact ranks on the 2-node graph x→y (y dangling):
    after three damped (3/4) integer iterations x holds exactly the
    teleport mass S/8 and y gets S/8 + 3/4·S/8; total mass shrinks
    only by the documented dangling-drop."""
    d = tmp_path / "sf"
    rows = [
        (0, 1_000_000_000, 1, "x", 1.0),
        (1, 2_000_000_000, 1, "y", 1.0),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    ).write.parquet(str(d / "events.parquet"))

    from via_spark.operators.graph import pagerank_event_types

    got = {
        r["event_type"]: r["rank_fix"]
        for r in pagerank_event_types(spark, str(d)).collect()
    }
    assert got == {"x": 125_000_000_000, "y": 218_750_000_000}


def test_pagerank_fixture_mass_and_order(spark, sf_oracle):
    """On the real fixture: ranks are positive, total mass is within
    truncation+dangling slack of SCALE, and every node beats the bare
    teleport floor."""
    from via_spark.operators.graph import (
        PAGERANK_SCALE,
        pagerank_event_types,
    )

    rows = pagerank_event_types(spark, sf_oracle).collect()
    total = sum(r["rank_fix"] for r in rows)
    n = len(rows)
    assert n == 5
    assert total <= PAGERANK_SCALE
    assert total >= PAGERANK_SCALE * 95 // 100  # no dangling types here
    floor = PAGERANK_SCALE // (4 * n)
    assert all(r["rank_fix"] > floor for r in rows)


def test_motif_report_planted_graph(spark):
    """Hand-counted motifs: a triangle {1,2,3} plus a star center 10
    with leaves 11,12,13 → 4+3=7 nodes, 6 edges, wedges = 3 (triangle
    corners) + 3 (star C(3,2)) = 6, 1 triangle, clustering
    3·1/6 = 0.5."""
    from via_spark.operators.graph import motif_report_from_edges

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (10, 13)],
        "a long, b long",
    )
    row = motif_report_from_edges(edges).collect()[0]
    assert (
        row["n_nodes"], row["n_edges"], row["n_wedges"],
        row["n_triangles"], row["clustering_fix"],
    ) == (7, 6, 6, 1, 500_000)


def test_bpe_merge_table_planted_sennrich(spark, tmp_path):
    """Hand-computed first three merges on the classic low/lower/newest
    corpus: (l,o)x5 wins step 1 on the lexicographic tie with (o,w);
    (lo,w)x5 follows; step 3's tie at count 2 resolves (e,r) < (low,e)
    lexicographically."""
    from via_spark.operators.textstats import bpe_merge_table

    rows = [
        (0, "low low low", "en"),
        (1, "lower lower", "en"),
        (2, "newest", "en"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = [
        (r["step"], r["merge_left"], r["merge_right"], r["merged"], r["pair_count"])
        for r in bpe_merge_table(spark, sf).orderBy("step").collect()
    ]
    assert got == [
        (1, "l", "o", "lo", 5),
        (2, "lo", "w", "low", 5),
        (3, "e", "r", "er", 2),
    ]


def test_cusum_planted_level_shift(spark, tmp_path):
    """A planted level shift (10/day for 10 days, then 30/day) must
    alarm on the first shifted day; a flat series must not alarm.
    Expected values come from an independent pure-Python CUSUM over
    the same integer recursion."""
    from via_spark.operators.timeseries import (
        CUSUM_H_DIV,
        CUSUM_SLACK_DIV,
        cusum_changepoints,
    )

    series = {
        "shifted": [10] * 10 + [30] * 5,
        "flat": [12] * 15,
    }
    rows, eid = [], 0
    for etype, counts in series.items():
        for day, cnt in enumerate(counts):
            for _ in range(cnt):
                rows.append((eid, day * NS_DAY + 500, etype, 1.0))
                eid += 1
    d = tmp_path / "sf"
    spark.createDataFrame(
        rows, "event_id long, ts long, event_type string, value double"
    ).write.parquet(str(d / "events.parquet"))

    def model(counts):
        n = len(counts)
        mean_fix = sum(counts) * 1_000_000 // n
        s = mx = 0
        alarm = None
        for day, c in enumerate(counts):
            s = max(0, s + (c * 1_000_000 - mean_fix - mean_fix // CUSUM_SLACK_DIV))
            mx = max(mx, s)
            if alarm is None and s > mean_fix // CUSUM_H_DIV:
                alarm = day
        return mean_fix, mx, alarm

    got = {
        r["event_type"]: (r["mean_fix"], r["max_cusum"], r["alarm_day"])
        for r in cusum_changepoints(spark, str(d)).collect()
    }
    for etype, counts in series.items():
        assert got[etype] == model(counts), etype
    assert got["shifted"][2] == 10  # first shifted day
    assert got["flat"][2] is None
