"""Correctness of the M6 training-data operators beyond oracle parity:
language ID on real multilingual text, dedup recall of planted pairs,
multimodal stub behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from via_spark.functions.text import tokens
from via_spark.operators import dedup, multimodal, textstats

REAL_SENTENCES = [
    ("en", "the cat sat on the mat and looked to the door for a while"),
    ("de", "der hund ist nicht mit der katze und das ist ein problem"),
    ("es", "el perro está en la casa y los gatos que viven allí"),
    ("fr", "le chien est pour les enfants et un chat est dans la maison"),
    ("zh", "这是一个中文句子 用于测试语言识别"),
]


def test_lang_id_on_real_text(spark):
    df = spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(REAL_SENTENCES)],
        "id long, lang string, text string",
    )
    out = df.select(
        "lang",
        textstats.lang_id_expr(F.col("text"), tokens(F.col("text"))).alias("pred"),
    ).collect()
    for r in out:
        assert r["pred"] == r["lang"], f"expected {r['lang']}, got {r['pred']}"


def test_minhash_finds_planted_neardups(spark, sf_oracle):
    """The sf0.01 documents fixture plants ~25 high-Jaccard pairs; the
    LSH path must recover the high-similarity ones (banding (8,4) has
    >99% capture probability at J≥0.9)."""
    pairs = dedup.dedup_minhash_pairs(spark, sf_oracle, threshold=0.9).collect()
    assert len(pairs) >= 15
    for p in pairs:
        assert p["jaccard"] >= 0.9
        assert p["doc_a"] < p["doc_b"]


def test_simhash_pairs_are_subset_of_low_hamming(spark, sf_oracle):
    pairs = dedup.dedup_simhash_pairs(spark, sf_oracle).collect()
    assert len(pairs) > 0
    assert all(p["hamming"] <= dedup.SIMHASH_MAX_HAMMING for p in pairs)


def test_multimodal_stub_and_features(spark, sf_oracle):
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")
    feats = multimodal.multimodal_features(spark, sf_oracle).orderBy("doc_id").first()
    assert feats["n_bytes"] > 0
    assert len(feats["content_sha256"]) == 64
    assert 1 <= feats["fake_width"] <= 640
    assert 1 <= feats["fake_height"] <= 480
    idx = multimodal.sample_frame_indices(1000, 4)
    assert idx == sorted(idx) and len(idx) == 4
    assert multimodal.sample_frame_indices(0, 4) == [0]


def test_approx_aggregates_within_tolerance(spark, sf_oracle):
    """The sketch-based scale paths stay within their error contracts
    against the exact computations."""
    from via_spark.operators import stats, rhythm
    from pyspark.sql import functions as F

    t1 = rhythm.tier1_from_events(spark, sf_oracle)
    exact = {
        r["severity"]: r["n"]
        for r in t1.groupBy("severity")
        .agg(F.countDistinct("rhythm_hash").alias("n"))
        .collect()
    }
    approx = {
        r["severity"]: r["approx_hashes"]
        for r in stats.approx_distinct_hashes(spark, sf_oracle).collect()
    }
    for sev, n in exact.items():
        assert abs(approx[sev] - n) / n < 0.05, (sev, approx[sev], n)

    exact_p = {
        r["event_type"]: [r["p25"], r["p50"], r["p75"], r["p95"]]
        for r in stats.value_percentiles(spark, sf_oracle).collect()
    }
    approx_p = {
        r["event_type"]: r["approx_pcts"]
        for r in stats.approx_value_quantiles(spark, sf_oracle).collect()
    }
    for et, ps in exact_p.items():
        for a, e in zip(approx_p[et], ps):
            assert abs(a - e) <= max(1.0, 0.05 * abs(e)), (et, a, e)


def test_repetition_scores_fire_on_planted_repeats(spark, sf_oracle):
    """doc_id % 3 == 0 rows get no planted repeat (dup fractions 0 on
    the IID fixture); doc_id % 3 > 0 rows have the first 8-token line
    re-appended and MUST show a nonzero duplicate-line fraction."""
    rows = textstats.repetition_scores(spark, sf_oracle).collect()
    assert len(rows) > 100
    for r in rows:
        if r["doc_id"] % 3 == 0:
            assert r["dup_line_frac_fix"] == 0, r
        else:
            assert r["dup_line_frac_fix"] > 0, r
            assert r["dup_5gram_frac_fix"] > 0, r
        assert 0 < r["top_2gram_char_frac_fix"] <= 1_000_000
        assert r["top_2gram"]


def test_chunk_documents_tiles_the_token_stream(spark, sf_smoke):
    """Chunk semantics: starts advance by exactly the stride, each chunk
    holds min(chunk_tokens, dl - start) tokens, and the stride-prefixes
    of consecutive chunks reconstruct the document's token stream."""
    from pyspark.sql import functions as F

    from via_spark.functions.text import tokens
    from via_spark.operators.textstats import chunk_documents
    from via_spark.session import load_table

    chunks = chunk_documents(spark, sf_smoke).orderBy("doc_id", "chunk_id").collect()
    toks = {
        r["doc_id"]: r["t"]
        for r in load_table(spark, sf_smoke, "documents")
        .select("doc_id", tokens(F.col("text")).alias("t"))
        .collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {d for d, t in toks.items() if t}
    for doc_id, rows in by_doc.items():
        dl = len(toks[doc_id])
        rebuilt = []
        for i, r in enumerate(rows):
            assert r["chunk_id"] == i and r["start_tok"] == i * 48
            assert r["n_chunk_tokens"] == min(64, dl - r["start_tok"])
            words = r["chunk_text"].split(" ")
            assert words == toks[doc_id][r["start_tok"]: r["start_tok"] + 64]
            rebuilt.extend(words[:48])
        # stride-prefixes tile the stream (last chunk contributes its tail)
        assert rebuilt[:dl] == toks[doc_id][: len(rebuilt)]


def test_token_budget_shards_are_contiguous_and_exact(spark, sf_smoke):
    """Shard semantics: start offsets are the exact running token sum in
    doc_id order and shard ids are nondecreasing with bounded jumps."""
    from via_spark.operators.rank import token_budget_shards

    rows = token_budget_shards(spark, sf_smoke).orderBy("doc_id").collect()
    acc = 0
    prev_shard = 0
    for r in rows:
        assert r["start_offset"] == acc
        assert r["shard_id"] == acc // 8192
        assert r["shard_id"] >= prev_shard
        prev_shard = r["shard_id"]
        acc += r["n_tokens"]


def test_readability_known_values(spark):
    """Flesch formula on a hand-computed sentence."""
    from via_spark.operators import textstats as ts
    import via_spark.session as sess

    # "the cat sat." → 3 words, 1 sentence, 3 vowel groups (e, a, a)
    df = spark.createDataFrame([(1, "the cat sat.")], "doc_id long, text string")
    out = (
        df.select(
            "doc_id",
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")).alias("w"),
            F.regexp_count(F.col("text"), F.lit(ts.SENTENCE_RE)).alias("s"),
            F.regexp_count(F.lower("text"), F.lit(ts.SYLLABLE_RE)).alias("sy"),
        ).first()
    )
    assert (out["w"], out["s"], out["sy"]) == (3, 1, 3)
    # full operator over the fixture: flesch present and finite
    rows = ts.readability_scores(spark, "/root/testdata/sf0.001").limit(5).collect()
    assert all(r["flesch"] is not None for r in rows)
    assert all(r["n_words"] > 0 for r in rows)


def test_length_filter_trims_at_most_5pct_each_side(spark, sf_oracle):
    """The central-90% cut: per language, ≥90% of docs survive and the
    dropped low/high halves are each ≤5% of the language's docs (ties
    kept together can only DECREASE what is dropped)."""
    from via_spark.operators.textstats import length_filtered_documents
    from via_spark.session import load_table

    d = load_table(spark, sf_oracle, "documents")
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept = length_filtered_documents(spark, sf_oracle)
    kept_counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    bounds = {
        r["lang"]: (r["lo"], r["hi"])
        for r in kept.groupBy("lang").agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")).collect()
    }
    for lang, n in totals.items():
        k = kept_counts.get(lang, 0)
        assert k * 10 >= n * 9, f"{lang}: kept {k}/{n} < 90%"
        lo, hi = bounds[lang]
        below = d.where((F.col("lang") == lang) & (F.col("n_chars") < lo)).count()
        above = d.where((F.col("lang") == lang) & (F.col("n_chars") > hi)).count()
        assert below * 20 <= n, f"{lang}: dropped {below}/{n} below"
        assert above * 20 <= n, f"{lang}: dropped {above}/{n} above"


def test_repeated_span_scrub_planted_boilerplate(spark, tmp_path):
    """Pin the span-scrub CONTRACT on planted structure (oracle parity
    alone cannot distinguish a spec error written twice): an 8-gram
    shared by >= 3 docs is removed wherever it appears; a 9-token
    shared run removes 9 tokens (overlapping hot grams union, not
    double-count); a 2-doc gram survives; docs shorter than the gram
    are untouched; a pure-boilerplate doc scrubs to ''; filler tokens
    derive from the doc id so nothing aliases by accident."""
    from pyspark.sql import functions as F

    from via_spark.operators.curation import repeated_span_scrub

    run9 = " ".join(f"b{j}" for j in range(9))  # 9-token shared run
    pair = " ".join(f"p{j}" for j in range(8))  # 8-gram in only 2 docs

    def filler(i, n):
        return " ".join(f"tok{i}x{j}" for j in range(n))

    rows = [
        # docs 0-2: filler + the 9-token run + filler (run at
        # different offsets)
        (0, f"{filler(0, 4)} {run9} {filler(0, 5)}"),
        (1, f"{filler(1, 7)} {run9}"),
        (2, f"{run9} {filler(2, 6)}"),
        # docs 3-4: the 2-doc 8-gram — must survive
        (3, f"{filler(3, 5)} {pair}"),
        (4, f"{pair} {filler(4, 5)}"),
        # doc 5: pure boilerplate (the 9-run and nothing else) → ''
        (5, run9),
        # doc 6: shorter than the gram width
        (6, "tiny doc here"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in repeated_span_scrub(spark, str(d)).collect()
    }
    assert len(got) == 7
    # the 9-run (union of two overlapping hot 8-grams) vanishes wherever
    # it sits; everything else survives verbatim
    assert got[0]["n_removed"] == 9
    assert got[0]["scrubbed_text"] == f"{filler(0, 4)} {filler(0, 5)}"
    assert got[1]["n_removed"] == 9
    assert got[1]["scrubbed_text"] == filler(1, 7)
    assert got[2]["n_removed"] == 9
    assert got[2]["scrubbed_text"] == filler(2, 6)
    # 2-doc gram survives untouched
    assert got[3]["n_removed"] == 0 and got[4]["n_removed"] == 0
    assert got[3]["scrubbed_text"] == f"{filler(3, 5)} {pair}"
    # pure boilerplate → empty string, full count removed
    assert got[5]["n_removed"] == 9 and got[5]["scrubbed_text"] == ""
    # short doc untouched
    assert got[6]["n_removed"] == 0 and got[6]["scrubbed_text"] == "tiny doc here"


def test_temperature_mixture_weights_planted_skew(spark, tmp_path):
    """Pin the tau=0.5 mixture arithmetic on a skewed corpus with exact
    square counts: n = {100, 25, 4, 1} → sqrt-weights 10:5:2:1, so
    every expected value is an exact integer — weights, shares, and the
    planned allocation of an 1800-doc budget (1000/500/200/100). Also
    the direction property that makes temperature sampling worth
    running: between proportional and uniform for every source."""
    from pyspark.sql import functions as F

    from via_spark.operators.curation import temperature_mixture_weights

    sizes = {"big": 100, "mid": 25, "small": 4, "tiny": 1}
    rows = [
        (i, f"tok{i}", src)
        for i, src in enumerate(
            s for src, n in sizes.items() for s in [src] * n
        )
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = {
        r["source"]: r
        for r in temperature_mixture_weights(spark, str(d), budget_docs=1800).collect()
    }
    assert {s: got[s]["n_docs"] for s in sizes} == sizes
    assert got["big"]["w_fix"] == 10_000_000_000
    assert got["tiny"]["w_fix"] == 1_000_000_000
    expect_planned = {"big": 1000, "mid": 500, "small": 200, "tiny": 100}
    assert {s: got[s]["planned_docs"] for s in sizes} == expect_planned
    total = sum(sizes.values())
    for s, n in sizes.items():
        share = n / total
        w = got[s]["temp_weight"]
        if n > total / len(sizes):  # over-represented source: damped
            assert w < share
        else:  # under-represented source: boosted, but below uniform+
            assert w > share
    # weights sum to 1 within one ulp-sum and order between extremes
    assert abs(sum(got[s]["temp_weight"] for s in sizes) - 1.0) < 1e-12


def test_multimodal_resize_plan_aspect_fit(spark, tmp_path):
    """Aspect-fit invariants + one exact planted case: the longest side
    lands exactly on the box, nothing collapses below 1, and both
    thumbnail sides stay within the box. Planted: a 63-byte payload
    fake-decodes to 64x34, so the plan must emit 64x34 (landscape
    passthrough of the longest side)."""
    from pyspark.sql import functions as F

    from via_spark.operators.multimodal import THUMB_BOX, multimodal_resize_plan

    d = tmp_path / "sf"
    rows = [(0, "x" * 63), (1, "y" * 639), (2, "z" * 100)]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))

    got = {r["doc_id"]: r for r in multimodal_resize_plan(spark, str(d)).collect()}
    # planted exact: n=63 -> w = 63%640+1 = 64, h = (63*31)%480+1 = 34
    assert (got[0]["fake_width"], got[0]["fake_height"]) == (64, 34)
    assert (got[0]["thumb_width"], got[0]["thumb_height"]) == (64, 34 * 64 // 64)
    for r in got.values():
        assert max(r["thumb_width"], r["thumb_height"]) == THUMB_BOX
        assert 1 <= r["thumb_width"] <= THUMB_BOX
        assert 1 <= r["thumb_height"] <= THUMB_BOX


def test_source_repeat_factors_planted_squares(spark, tmp_path):
    """Pin the data-constrained epoch arithmetic on exact-square token
    counts (sqrt weights 10:5:2:1): milli-shares, targets, the 4-epoch
    cap binding on the small sources, effective tokens, and that the
    deficit is exactly the mass the cap refuses — the planted numbers
    walk every floor point in the pinned evaluation order."""
    from pyspark.sql import functions as F

    from via_spark.operators.curation import source_repeat_factors

    sizes = {"big": 100, "mid": 25, "small": 4, "tiny": 1}
    rows = [
        (i, " ".join(f"tok{src}x{j}" for j in range(n)), src)
        for i, (src, n) in enumerate(sizes.items())
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = {r["source"]: r for r in source_repeat_factors(spark, str(d)).collect()}
    # denom = 18e9; budget = 2*130 = 260
    expect = {
        #        n_tok share target repeat  effective deficit
        "big":   (100, 555, 144, 1440, 144, 0),
        "mid":   (25,  277,  72, 2880,  72, 0),
        "small": (4,   111,  28, 4000,  16, 12),  # cap binds
        "tiny":  (1,    55,  14, 4000,   4, 10),  # cap binds
    }
    for s_, (nt, sh, tg, rp, ef, df) in expect.items():
        r = got[s_]
        assert (
            r["n_tokens"], r["share_milli"], r["target_tokens"],
            r["repeat_milli"], r["effective_tokens"], r["deficit_tokens"],
        ) == (nt, sh, tg, rp, ef, df), (s_, dict(r.asDict()))


def test_token_shard_spans_boundary_splitting(spark, tmp_path):
    """Planted lengths walk the split semantics token_budget_shards
    cannot express: a doc filling a shard exactly, one straddling two
    shards, one spanning three, a zero-token doc (no span), and the
    global invariants — per-doc spans concatenate to [0, n) and every
    non-final shard holds exactly B tokens."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from via_spark.operators.rank import token_shard_spans

    B = 10
    lens = {0: 4, 1: 6, 2: 13, 3: 0, 4: 8, 5: 21}  # starts 0,4,10,23,23,31
    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)), f"s{i}") for i, n in lens.items()
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = sorted(
        (r["doc_id"], r["shard_id"], r["tok_start"], r["tok_end"])
        for r in token_shard_spans(spark, str(d), budget_tokens=B).collect()
    )
    expect = [
        (0, 0, 0, 4),              # [0,4) inside shard 0
        (1, 0, 0, 6),              # [4,10) fills shard 0 exactly
        (2, 1, 0, 10), (2, 2, 10, 13),   # [10,23) straddles 1|2
        # doc 3: zero tokens -> no span
        (4, 2, 0, 7), (4, 3, 7, 8),      # [23,31) straddles 2|3
        (5, 3, 0, 9), (5, 4, 9, 19), (5, 5, 19, 21),  # [31,52) spans 3|4|5
    ]
    assert got == expect

    # invariants: per-doc concatenation covers [0, n); non-final shards full
    per_doc = defaultdict(list)
    shard_load = defaultdict(int)
    for doc, shard, a, b in got:
        per_doc[doc].append((a, b))
        shard_load[shard] += b - a
    for doc, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0 and spans[-1][1] == lens[doc]
        assert all(x[1] == y[0] for x, y in zip(spans, spans[1:]))
    last = max(shard_load)
    assert all(shard_load[s] == B for s in shard_load if s != last)


def test_neardup_quality_confound_planted(spark, tmp_path):
    """Plant the confound the report exists to expose: one family of 4
    identical high-quality docs (stopword-rich, alpha, long) in a sea
    of 8 distinct low-quality docs. The dup mass must land entirely in
    the TOP deciles, with exactly cluster_size - 1 would-drops, and
    every bottom decile must report zero dup mass."""
    from pyspark.sql import functions as F

    from via_spark.operators.curation import neardup_quality_confound

    good = " ".join(["the a and of to in is for quality text"] * 5)  # 50 toks
    rows = [(i, good, "boiler") for i in range(4)]
    rows += [(10 + j, f"zz{j}qq xx{j}ww", f"s{j}") for j in range(8)]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = {r["decile"]: r for r in neardup_quality_confound(spark, str(d)).collect()}
    assert sum(r["n_docs"] for r in got.values()) == 12
    assert sum(r["n_dup_members"] for r in got.values()) == 4
    assert sum(r["n_would_drop"] for r in got.values()) == 3  # keep one rep
    # the 4 identical docs hold the 4 best quality ranks -> deciles 1-3
    # (rank->decile over n=12: ranks 1,2 -> d1; 3 -> d2; 4 -> d3)
    assert got[1]["n_dup_members"] == 2 and got[1]["n_docs"] == 2
    assert got[2]["n_dup_members"] == 1 and got[3]["n_dup_members"] == 1
    # rep = min doc_id (0): it sits at one of the dup ranks; total drops 3
    for dec, r in got.items():
        if dec > 3:
            assert r["n_dup_members"] == 0 and r["n_would_drop"] == 0
            assert r["dup_share"] == 0.0 and r["drop_share"] == 0.0
        assert 0 <= r["n_would_drop"] <= r["n_dup_members"] <= r["n_docs"]


def test_shard_spans_cohere_with_budget_shards(spark, sf_smoke):
    """Cross-operator coherence at the same budget: a document's FIRST
    span shard must equal the shard token_budget_shards assigns it
    (start div B), its span count must be ceil-consistent with its
    length, and summing spans reproduces each doc's token count."""
    from collections import defaultdict

    from via_spark.operators.rank import token_budget_shards, token_shard_spans

    B = 256
    shards = {
        r["doc_id"]: (r["shard_id"], r["n_tokens"])
        for r in token_budget_shards(spark, sf_smoke, budget_tokens=B).collect()
    }
    spans = defaultdict(list)
    for r in token_shard_spans(spark, sf_smoke, budget_tokens=B).collect():
        spans[r["doc_id"]].append((r["shard_id"], r["tok_start"], r["tok_end"]))

    assert set(spans) == {d for d, (_, n) in shards.items() if n > 0}
    for doc, sp in spans.items():
        sp.sort()
        first_shard, n_tokens = shards[doc]
        assert sp[0][0] == first_shard
        assert sum(b - a for _, a, b in sp) == n_tokens
        # spans cover consecutive shards exactly once
        assert [s for s, _, _ in sp] == list(range(sp[0][0], sp[-1][0] + 1))


def test_doc_length_p95_by_source_planted(spark, tmp_path):
    """Known discrete p95s: lengths 1..20 in one source give exactly 19
    (min v with 100·cum ≥ 95·20); a singleton source reports its own
    length; an all-equal source reports that length."""
    from pyspark.sql import functions as F

    from via_spark.operators.textstats import doc_length_p95_by_source

    rows = [(i, " ".join(f"a{i}x{j}" for j in range(i + 1)), "ramp") for i in range(20)]
    rows += [(100, "one two three four five six seven", "solo")]
    rows += [(200 + k, "x y z", "flat") for k in range(5)]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = {
        r["source"]: (r["p95_tokens"], r["n"])
        for r in doc_length_p95_by_source(spark, str(d)).collect()
    }
    assert got == {"ramp": (19, 20), "solo": (7, 1), "flat": (3, 5)}


def test_weighted_sample_per_source_matches_reference(spark, tmp_path):
    """Per-source top-k by the same pure-Python priority as the global
    sample: each source contributes min(k, its doc count) rows, and the
    union equals the per-source k-smallest (priority, doc_id) sets."""
    import hashlib
    from collections import defaultdict

    from pyspark.sql import functions as F

    from via_spark.operators.curation import (
        _WSAMPLE_SCALE,
        weighted_sample_per_source,
    )

    docs = [(i, "x" * ((i * 53) % 170), f"s{i % 3}") for i in range(17)]
    d = tmp_path / "sf"
    spark.createDataFrame(docs, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    K = 3
    got = defaultdict(list)
    for r in weighted_sample_per_source(spark, str(d), k=K).collect():
        got[r["source"]].append((r["priority"], r["doc_id"]))

    expect = defaultdict(list)
    for i, t, src in docs:
        h = int(hashlib.sha256(str(i).encode()).hexdigest()[:10], 16)
        expect[src].append(((h * _WSAMPLE_SCALE) // max(len(t), 1), i))
    for src in expect:
        expect[src] = sorted(expect[src])[:K]
    assert {s: sorted(v) for s, v in got.items()} == dict(expect)


def test_lang_metadata_confusion_planted(spark, tmp_path):
    """Plant declared labels that half-agree with the heuristic: 2 'en'
    docs with English stopwords (diagonal), 1 'en' doc written in
    German (off-diagonal), 1 'de' doc in German (diagonal) — exact
    cells, shares, and agree flags."""
    from pyspark.sql import functions as F

    from via_spark.operators.textstats import lang_metadata_confusion

    en = "the cat and the dog of a house is for sale in town"
    de = "der hund und die katze ist nicht mit der maus ein freund"
    rows = [
        (0, en, "s"), (1, en, "s"),
        (2, de, "s"),           # declared en, reads German
        (3, de, "s"),           # declared de, reads German
    ]
    langs = {0: "en", 1: "en", 2: "en", 3: "de"}
    d = tmp_path / "sf"
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    lang_col = F.when(F.col("doc_id") == 3, "de").otherwise("en")
    df.withColumn("lang", lang_col).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        (r["lang"], r["predicted_lang"]): (r["n"], r["share"], r["agrees"])
        for r in lang_metadata_confusion(spark, str(d)).collect()
    }
    assert got == {
        ("en", "en"): (2, 2 / 3, True),
        ("en", "de"): (1, 1 / 3, False),
        ("de", "de"): (1, 1.0, True),
    }


def test_boilerplate_span_audit_coheres_with_scrub(spark, tmp_path):
    """The audit must list exactly the grams the scrub removes: plant
    one boilerplate 8-gram in 3 docs (>= SPAN_MIN_DOCS) and a 2-doc
    gram below the bar; the audit reports the hot gram with exact
    doc/occurrence counts and omits the sub-threshold one, and the
    scrub's per-doc removal counts agree."""
    from pyspark.sql import functions as F

    from via_spark.operators.curation import (
        boilerplate_span_audit,
        repeated_span_scrub,
    )

    hot = "one two three four five six seven eight"       # 8 tokens
    cold = "c1 c2 c3 c4 c5 c6 c7 c8"
    rows = [
        (0, f"{hot} u0a u0b u0c", "s"),
        (1, f"u1a {hot} u1b", "s"),
        (2, f"u2a u2b {hot}", "s"),
        (3, f"{cold} u3a u3b u3c", "s"),
        (4, f"u4a {cold} u4b", "s"),
        (5, "v1 v2 v3 v4 v5 v6 v7 v8 v9", "s"),
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    audit = {
        r["gram"]: (r["n_docs"], r["n_occurrences"])
        for r in boilerplate_span_audit(spark, str(d)).collect()
    }
    assert audit == {hot: (3, 3)}  # cold gram (2 docs < min_docs=3) omitted

    scrub = {
        r["doc_id"]: r["n_removed"]
        for r in repeated_span_scrub(spark, str(d)).collect()
    }
    # the 3 hot docs lose exactly the 8 planted tokens; others lose none
    assert scrub == {0: 8, 1: 8, 2: 8, 3: 0, 4: 0, 5: 0}


def test_oov_rate_planted_vocab(spark, tmp_path):
    """Tiny corpus with a pinned frequency table: vocab_size=2 must cut
    {a, b} — 'a' wins on count, 'b' beats the equal-count 'y' on the
    lexicographic tie-break — and per-doc OOV counts follow."""
    from pyspark.sql import functions as F

    from via_spark.operators.textstats import oov_rate_documents

    rows = [
        (0, "a a a b b y", "s0"),   # counts: a+3 b+2 y+1
        (1, "a a y b y", "s0"),     # counts: a+2 b+1 y+2  → a=5 b=3 y=3
        (2, "", "s0"),              # zero tokens → no row
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate_documents(spark, str(d), vocab_size=2).collect()
    }
    assert got == {0: (6, 1, 1 / 6), 1: (5, 2, 2 / 5)}


def test_char_entropy_known_values(spark, tmp_path):
    """Whole-bit order-0 code lengths on pinned strings: a uniform
    one-char doc compresses to 0 bits; 'abab' costs 1 bit per char;
    'aab' = 2·floor(log2(3÷2)) + floor(log2(3)) = 1 bit total."""
    from pyspark.sql import functions as F

    from via_spark.operators.textstats import char_entropy_bits

    rows = [(0, "aaaa", "s"), (1, "abab", "s"), (2, "aab", "s")]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["doc_id"]: (r["n_chars"], r["distinct_chars"], r["entropy_bits"])
        for r in char_entropy_bits(spark, str(d)).collect()
    }
    assert got == {0: (4, 1, 0), 1: (4, 2, 4), 2: (3, 2, 1)}


def _greedy_pack_reference(lens, budget, block):
    """Pure-Python blocked first-fit packing (the pinned recurrence)."""
    packs = []  # (block_id, pack_id, n_docs, pack_tokens)
    for b0 in range(0, len(lens), block):
        fill, pack_id = 0, -1
        for n in lens[b0 : b0 + block]:
            if pack_id < 0 or (fill > 0 and fill + n > budget):
                pack_id += 1
                fill = 0
                packs.append([b0 // block, pack_id, 0, 0])
            packs[-1][2] += 1
            packs[-1][3] += n
            fill += n
    return {
        (bl, p): (nd, tok, max(budget - tok, 0)) for bl, p, nd, tok in packs
    }


def test_greedy_pack_matches_pure_python_reference(spark, tmp_path):
    """Blocked greedy packing vs an independent pure-Python replay on
    adversarial lengths (exact fits, overflows, oversized docs, zero-
    token docs, a block boundary mid-stream) across two sources."""
    from pyspark.sql import functions as F

    from via_spark.operators.rank import greedy_pack_stats

    B, BLK = 10, 4
    lens = {
        "s0": [4, 6, 13, 0, 8, 2, 10, 1],   # exact fit, oversize, zero
        "s1": [9, 9, 9],                     # every doc overflows the last
    }
    rows = []
    i = 0
    for src, ls in lens.items():
        for n in ls:
            rows.append((i, " ".join(f"w{i}x{j}" for j in range(n)), src))
            i += 1
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )

    got = {
        (r["source"], r["block_id"], r["pack_id"]): (
            r["n_docs"], r["pack_tokens"], r["waste"]
        )
        for r in greedy_pack_stats(
            spark, str(d), budget_tokens=B, block_docs=BLK
        ).collect()
    }
    expect = {}
    for src, ls in lens.items():
        for (bl, p), v in _greedy_pack_reference(ls, B, BLK).items():
            expect[(src, bl, p)] = v
    assert got == expect

    # invariants: a pack only exceeds the budget when it is a single
    # oversized doc; doc counts reconcile
    for (src, bl, p), (nd, tok, waste) in got.items():
        assert tok <= B or nd == 1
        assert waste == max(B - tok, 0)
    assert sum(nd for nd, _, _ in got.values()) == len(rows)


def test_truncation_loss_planted(spark, tmp_path):
    """Pinned lengths: with max_tokens=5, a 3-token doc loses 0, a
    5-token doc loses 0 (exact fit), an 8-token doc loses 3."""
    from pyspark.sql import functions as F

    from via_spark.operators.rank import truncation_loss_by_source

    rows = [
        (0, "a b c", "s0"),
        (1, "a b c d e", "s0"),
        (2, "a b c d e f g h", "s0"),
        (3, "x " * 10, "s1"),  # 10 tokens, loses 5
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["docs_truncated"],
                      r["tokens_lost"])
        for r in truncation_loss_by_source(spark, str(d), max_tokens=5).collect()
    }
    assert got == {"s0": (3, 16, 1, 3), "s1": (1, 10, 1, 5)}


def test_prefix_dup_groups_planted(spark, tmp_path):
    """Docs sharing their first k tokens group together regardless of
    tails; a doc differing inside the prefix does not."""
    from pyspark.sql import functions as F

    from via_spark.operators.dedup import prefix_dup_groups

    head = "t0 t1 t2 t3"
    rows = [
        (0, head + " tail alpha beta", "s"),
        (1, head + " completely different continuation here", "s"),
        (2, "t0 t1 tX t3 tail alpha beta", "s"),
        (3, "", "s"),  # zero tokens → excluded
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    groups = prefix_dup_groups(spark, str(d), k=4).collect()
    assert len(groups) == 2
    by_size = {r["n_docs"]: r for r in groups}
    assert by_size[2]["canonical_doc_id"] == 0 and by_size[2]["is_dup_group"]
    assert by_size[1]["canonical_doc_id"] == 2 and not by_size[1]["is_dup_group"]


def test_length_quality_heatmap_reconciles(spark, sf_oracle):
    """The cross-tab must cover every document exactly once and use
    decile labels 1..10 on both axes."""
    from via_spark.operators.curation import length_quality_heatmap

    cells = length_quality_heatmap(spark, sf_oracle).collect()
    assert sum(r["n_docs"] for r in cells) == 500
    for r in cells:
        assert 1 <= r["length_decile"] <= 10
        assert 1 <= r["quality_decile"] <= 10
