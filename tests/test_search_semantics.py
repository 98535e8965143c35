"""Planted-relevance semantics for BM25 (beyond oracle parity).

Oracle parity proves Spark and DuckDB compute the SAME number; it
cannot catch a spec error written identically on both sides (wrong IDF
sign, inverted length normalization).  These tests plant corpora where
classic BM25 axioms (Robertson/Spärck Jones — public) dictate the
ranking and assert the implementation honors each axiom independently:
term-frequency monotonicity, IDF dominance of rare terms, document-
length normalization, and zero-score exclusion.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _score(spark, rows, terms):
    from via_spark.operators.search import bm25_scored

    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r["score_fix"]
        for r in bm25_scored(d, terms).select("doc_id", "score_fix").collect()
    }


FILLER = "alpha beta gamma delta epsilon eta theta iota kappa"  # 9 tokens


def test_bm25_tf_monotonic_at_equal_length(spark):
    """More occurrences of a query term (same doc length) → higher
    score; absent term → zero."""
    rows = [
        (0, f"zebra zebra zebra {FILLER}"),
        (1, f"zebra zebra quux {FILLER}"),
        (2, f"zebra quux quux {FILLER}"),
        (3, f"quux quux quux {FILLER}"),
    ]
    s = _score(spark, rows, ("zebra",))
    assert s[0] > s[1] > s[2] > 0
    assert s[3] == 0


def test_bm25_rare_term_dominates_common(spark):
    """One hit on a rare term outranks one hit on a corpus-wide common
    term (IDF): 'zebra' appears in 2 docs, 'common' in 52."""
    rows = [(0, f"zebra quux {FILLER}"), (1, f"zebra common {FILLER}")]
    rows += [(i, f"common quux {FILLER}") for i in range(2, 52)]
    rows += [(i, f"quux quux {FILLER}") for i in range(52, 100)]
    s = _score(spark, rows, ("zebra", "common"))
    only_rare = s[0]
    only_common = s[2]
    assert only_rare > only_common > 0
    assert s[1] > s[0]  # both terms beats either alone
    assert s[52] == 0


def test_bm25_length_normalization(spark):
    """Same tf, longer document → lower score (b=0.75 penalizes
    length above the corpus average)."""
    long_filler = " ".join(f"pad{j}" for j in range(40))
    rows = [
        (0, f"zebra {FILLER}"),
        (1, f"zebra {long_filler}"),
        (2, FILLER),
        (3, long_filler),
    ]
    s = _score(spark, rows, ("zebra",))
    assert s[0] > s[1] > 0


def test_bm25_topk_order_and_cut(spark, sf_oracle, tmp_path):
    """bm25_topk on a planted documents table: the heap cut returns
    exactly the positive-score docs in (score desc, doc_id asc) order."""
    from via_spark.operators.search import bm25_topk

    rows = [(i, f"zebra zebra {FILLER}" if i < 3 else f"quux {FILLER}")
            for i in range(20)]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))
    out = bm25_topk(spark, str(d), terms=("zebra",), k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2]  # ties → doc_id asc
    assert all(r["score_fix"] > 0 for r in out)


def test_hybrid_rrf_fusion_on_planted_modalities(spark, tmp_path):
    """End-to-end RRF wiring on a corpus where both modality rankings
    are known by construction: doc 5 is near-top dense (behind the
    query's self-match doc 0) and top sparse, so fusion must put it
    first — ahead of the dense-only self-match; a doc absent from a cut
    contributes 0 from that side. The full fused ordering is checked
    against an independent python computation of the RRF formula over
    the planted ranks (cosine gaps are orders of magnitude above the
    1e-9 fixed-point grid, so rankings — not floats — are compared)."""
    import math

    from via_spark.operators.search import hybrid_rrf

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],    # the query itself: cosine 1.0
        1: [1.0, 1.0, 0.0, 0.0],    # 0.7071
        2: [0.5, 1.0, 0.0, 0.0],    # 0.4472
        3: [0.0, 1.0, 0.0, 0.0],    # 0.0
        4: [0.0, 0.0, 1.0, 0.0],    # 0.0
        5: [10.0, 0.1, 0.0, 0.0],   # 0.99995 — planted hybrid winner
        6: [0.3, 1.0, 0.0, 0.0],    # 0.2873
        7: [0.2, 1.0, 0.0, 0.0],    # 0.1961
        8: [0.9, 1.0, 0.0, 0.0],    # 0.6690
        9: [0.0, 1.0, 2.0, 0.0],    # 0.0
    }
    texts = {
        i: ("zebra zebra zebra " + FILLER) if i == 5
        else (("zebra " + FILLER) if i == 1 else FILLER)
        for i in range(10)
    }
    d = tmp_path / "sf"
    spark.createDataFrame(
        [(i, texts[i], "en", "t", len(texts[i])) for i in range(10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))
    spark.createDataFrame(
        [(i, vecs[i], 0) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(str(d / "embeddings.parquet"))

    out = hybrid_rrf(spark, str(d), terms=("zebra",), query_id=0, k=10).collect()

    # independent model: rank each modality, fuse, order
    def cos(v):
        dot = sum(a * b for a, b in zip(v, vecs[0]))
        return dot / (math.sqrt(sum(a * a for a in v)) or 1.0)

    dense_order = sorted(range(10), key=lambda i: (-cos(vecs[i]), i))
    sparse_score = {i: (2 if i == 5 else (1 if i == 1 else 0)) for i in range(10)}
    sparse_order = sorted(range(10), key=lambda i: (-sparse_score[i], i))
    rd = {doc: r + 1 for r, doc in enumerate(dense_order)}
    rs = {doc: r + 1 for r, doc in enumerate(sparse_order)}
    rrf = {i: 1.0 / (60 + rd[i]) + 1.0 / (60 + rs[i]) for i in range(10)}
    expect = sorted(range(10), key=lambda i: (-rrf[i], i))

    assert [r["doc_id"] for r in out] == expect
    assert out[0]["doc_id"] == 5  # hybrid winner beats the dense self-match
    got5 = next(r for r in out if r["doc_id"] == 5)
    assert (got5["rank_dense"], got5["rank_sparse"]) == (rd[5], rs[5]) == (2, 1)
    for r in out:
        assert math.isclose(r["rrf"], rrf[r["doc_id"]], rel_tol=1e-12)


def test_dual_ranks_equal_naive_two_cut(spark):
    """_dual_ranks (single-pass tagged WindowGroupLimit) must produce
    exactly the ranks of the naive per-ordering global cuts, including
    the doc_id tie-breaks, cut truncation, and NULL missing sides —
    checked against a pure-Python model on a frame with score ties."""
    from via_spark.operators.search import _dual_ranks

    rows = [
        (i, (i * 37) % 11, float((i * 53) % 7))  # ties in both orderings
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, score_fix long, dense_score double")
    cut_n = 10
    got = {
        r["doc_id"]: (r["rank_dense"], r["rank_sparse"])
        for r in _dual_ranks(df, cut_n).collect()
    }

    dense = sorted(rows, key=lambda r: (-r[2], r[0]))[:cut_n]
    sparse = sorted(rows, key=lambda r: (-r[1], r[0]))[:cut_n]
    want = {}
    for rank, r in enumerate(dense, 1):
        want.setdefault(r[0], [None, None])[0] = rank
    for rank, r in enumerate(sparse, 1):
        want.setdefault(r[0], [None, None])[1] = rank
    assert got == {k: tuple(v) for k, v in want.items()}
