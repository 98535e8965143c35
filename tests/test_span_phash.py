"""Planted + brute-force tests for the round-9 dedup additions:

* operators.dedup.shared_span_pairs — longest verbatim token run per
  pair (the Lee et al. 2022 exact-substring class at span grain)
* operators.multimodal.phash_dup_pairs — perceptual-hash (dHash) image
  dedup over the binary payload column, SimHash-block candidate join
"""

from __future__ import annotations

from pyspark.sql import functions as F

from via_spark.operators.dedup import shared_span_pairs, span_dup_token_stats
from via_spark.operators.multimodal import dhash64, image_dhash, phash_dup_pairs


def _write_docs(spark, tmp_path, rows):
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _tok(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_span_planted_exact_lengths(spark, tmp_path):
    """Span lengths are exact to the token: a 12-token shared run is
    reported as exactly 12; an 11-token run (min_span - 1) must not
    pair; a 20-token run embedded at DIFFERENT offsets in the two docs
    still measures 20 (diff-grouping, no chunk boundaries to straddle);
    a pair with two separate runs reports the longest."""
    span12 = _tok("s", 12)
    span11 = _tok("u", 11)
    span20 = _tok("v", 20)
    run15 = _tok("p", 15)
    run13 = _tok("q", 13)
    rows = [
        (1, f"{_tok('a', 3)} {span12} {_tok('z', 2)}", "s"),
        (2, f"{_tok('b', 1)} {span12} {_tok('y', 3)}", "s"),
        (3, f"{_tok('c', 2)} {span11} {_tok('x', 1)}", "s"),
        (4, f"{span11} {_tok('w', 4)}", "s"),
        (5, f"{span20} {_tok('m', 6)}", "s"),
        (6, f"{_tok('n', 9)} {span20}", "s"),
        (7, f"{run15} {_tok('e', 4)} {run13}", "s"),
        (8, f"{run13} {_tok('f', 7)} {run15}", "s"),
        (9, _tok("g", 30), "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
        for r in shared_span_pairs(spark, sf).collect()
    }
    assert got == {(1, 2): 12, (5, 6): 20, (7, 8): 15}


def test_shared_span_repeated_tokens_no_false_extension(spark, tmp_path):
    """A doc whose shared run sits inside internally-REPEATED text
    (the same gram at several positions) must still measure the true
    longest aligned run — multiple (pa, pb) alignments per gram land in
    different diff groups and never splice into a longer fake run."""
    blk = _tok("r", 10)
    rows = [
        (1, f"{blk} {_tok('k', 3)} {blk}", "s"),  # block appears twice
        (2, f"{_tok('j', 5)} {blk} {_tok('h', 5)}", "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
        for r in shared_span_pairs(spark, sf, min_span=10).collect()
    }
    # the true longest shared run is the 10-token block, never 10+3+10
    assert got == {(1, 2): 10}


def _longest_common_run(ta, tb):
    """Independent model: O(n·m) DP longest common token substring."""
    best = 0
    prev = [0] * (len(tb) + 1)
    for a in ta:
        cur = [0] * (len(tb) + 1)
        for j, b in enumerate(tb, 1):
            if a == b:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def test_shared_span_equals_dp_bruteforce_fixture(spark, sf_smoke):
    """On the real fixture, the run-length recovery equals a classic
    DP longest-common-substring over token lists for EVERY pair the
    inverted gram index makes a candidate (and no other pair can reach
    anchor_n, so the comparison is complete)."""
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    toks = {
        i: [t for t in txt.lower().split() if t]
        for i, txt in docs
    }
    anchor_n, min_span = 8, 12
    index: dict[tuple, set] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - anchor_n + 1):
            index.setdefault(tuple(ts[p : p + anchor_n]), set()).add(i)
    cands = set()
    for ds in index.values():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                cands.add((ds[x], ds[y]))
    expect = {}
    for a, b in cands:
        run = _longest_common_run(toks[a], toks[b])
        if run >= min_span:
            expect[(a, b)] = run
    got = {
        (r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
        for r in shared_span_pairs(spark, sf_smoke).collect()
    }
    assert got == expect
    assert expect, "fixture must exercise the operator (vacuous otherwise)"


def test_phash_planted_near_identical_image(spark, tmp_path):
    """A payload differing from its original by one byte (a re-encode /
    light-edit stand-in) hashes within Hamming <= 3 and pairs; an
    unrelated payload does not pair with either."""
    base = " ".join(f"pixel{i:03d}" for i in range(40))  # ~360 bytes
    edited = base.replace("pixel020", "pixel02b", 1)
    other = " ".join(f"zone{i * 7 % 91:03d}" for i in range(40))
    rows = [(1, base, "s"), (2, edited, "s"), (3, other, "s")]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(spark, sf).collect()
    }
    assert (1, 2) in got and got[(1, 2)] <= 3
    assert (1, 3) not in got and (2, 3) not in got


def test_phash_blocked_join_equals_bruteforce(spark, sf_smoke):
    """Pigeonhole completeness on real data: the 4×16-bit block join
    finds EXACTLY the pairs an all-pairs scan over the collected
    hashes finds at Hamming <= 3 — and the Arrow-stage hashes equal the
    driver-side dhash64 on the same bytes (one function, two hosts)."""
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()
    py = {i: dhash64(t.encode()) for i, t in docs}

    spark_hashes = {
        r["doc_id"]: r["dhash"] for r in image_dhash(spark, sf_smoke).collect()
    }
    assert spark_hashes == py

    mask = (1 << 64) - 1
    expect = {}
    ids = sorted(py)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            ham = bin((py[a] ^ py[b]) & mask).count("1")
            if ham <= 3:
                expect[(a, b)] = ham
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_dup_pairs(spark, sf_smoke).collect()
    }
    assert got == expect
    assert expect, "fixture must exercise the operator (vacuous otherwise)"


def test_dhash_short_payload_empty_cells(spark, tmp_path):
    """Payloads shorter than the 72-cell grid leave empty cells
    (sum 0) — the hash is still defined, deterministic, and matches
    between the Arrow stage and the driver-side function."""
    rows = [(1, "tiny doc", "s"), (2, "ab", "s")]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["doc_id"]: r["dhash"] for r in image_dhash(spark, sf).collect()}
    assert got == {1: dhash64(b"tiny doc"), 2: dhash64(b"ab")}


def test_span_scrub_plan_keep_lowest_and_merge(spark, tmp_path):
    """The scrub plan must cut from the HIGHER doc only (canonical copy
    survives in the lowest doc_id), merge overlapping cuts from
    different partners into one interval, and leave span-free docs
    uncut. Token positions are checked by hand."""
    span = " ".join(f"s{i}" for i in range(20))
    sub = " ".join(f"s{i}" for i in range(6, 20))  # inner 14-token slice
    rows = [
        (1, "a1 a2 a3 " + span + " z1 z2", "s"),     # lowest: keeps all
        (2, "b1 " + span + " y1 y2 y3", "s"),        # cut [2, 21] (vs 1)
        (3, "c1 c2 " + sub + " x1 x2 x3 x4", "s"),   # cut [3, 16] (vs 1 and 2)
        (4, " ".join(f"u{i}" for i in range(25)), "s"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    from via_spark.operators.dedup import span_scrub_plan

    got = {
        (r["doc_id"], r["cut_lo"], r["cut_hi"], r["cut_tokens"])
        for r in span_scrub_plan(spark, sf).collect()
    }
    assert got == {(2, 2, 21, 20), (3, 3, 16, 14)}


def test_span_scrub_plan_consistency_with_stats(spark, sf_smoke):
    """On the real fixture the scrub plan's cut tokens must be a strict
    subset of the measured dup-covered tokens (one copy of every span
    survives), and no cut interval may fall on the globally lowest doc
    of its content (spot-checked via shared_span_pairs: a doc that is
    doc_a in EVERY pair it appears in must receive no cuts)."""
    from via_spark.operators.dedup import (
        shared_span_pairs,
        span_dup_token_stats,
        span_scrub_plan,
    )

    cuts = span_scrub_plan(spark, sf_smoke).collect()
    cut_total = sum(r["cut_tokens"] for r in cuts)
    stats = span_dup_token_stats(spark, sf_smoke).collect()
    covered_total = sum(r["dup_span_tokens"] for r in stats)
    assert 0 < cut_total < covered_total

    pairs = shared_span_pairs(spark, sf_smoke).collect()
    only_low = {r["doc_a"] for r in pairs} - {r["doc_b"] for r in pairs}
    cut_docs = {r["doc_id"] for r in cuts}
    assert not (only_low & cut_docs), "a keep-side doc received a cut"


def test_retrieval_mrr_exact_rational(spark, sf_oracle):
    """MRR columns equal a pure-Python model over the collected top-k
    (floats compare with == because both sides are single divisions of
    exact integers); no-match queries score 0 with NULL rank."""
    from via_spark.operators.vector import knn_batch_topk, retrieval_mrr_report

    topk = knn_batch_topk(spark, sf_oracle, n_queries=16, k=10).collect()
    import duckdb

    con = duckdb.connect()
    labels = dict(con.sql(
        f"SELECT vec_id, label FROM read_parquet('{sf_oracle}/embeddings.parquet')"
        f" WHERE vec_id < 16"
    ).fetchall())
    firsts: dict[int, int] = {}
    for r in sorted(topk, key=lambda r: (r["query_id"], r["rank"])):
        q = r["query_id"]
        if q not in firsts and r["label"] == labels[q]:
            firsts[q] = r["rank"]
    scaled = {q: (2520 // firsts[q] if q in firsts else 0) for q in labels}
    mrr = float(sum(scaled.values())) / (2520.0 * float(len(labels)))
    expect = {
        (q, labels[q], firsts.get(q), scaled[q] / 2520.0, mrr) for q in labels
    }
    got = {
        (r["query_id"], r["query_label"], r["first_match_rank"],
         r["reciprocal_rank"], r["mrr"])
        for r in retrieval_mrr_report(spark, sf_oracle).collect()
    }
    assert got == expect
    assert any(r[2] is None for r in got), "fixture should exercise the no-match path"
    assert any(r[2] is not None for r in got)


def test_span_family_random_adversarial_corpus(spark, tmp_path):
    """Seeded adversarial corpus: a SMALL token alphabet (heavy gram
    collisions), internally repeated blocks, docs at and below the
    anchor width, and verbatim splices between docs. Both span
    operators must match independent Python models — shared_span_pairs
    vs the DP longest-common-substring, span_dup_token_stats vs an
    interval-union coverage model built from the same DP machinery's
    aligned runs."""
    import random

    rng = random.Random(0xC0FFEE)
    alphabet = [f"w{i}" for i in range(12)]  # tiny -> frequent collisions
    docs: list[list[str]] = []
    for i in range(48):
        n = rng.choice([5, 8, 9, 15, 30, 60])
        docs.append([rng.choice(alphabet) for _ in range(n)])
    # verbatim splices: copy a random window of one doc into another
    for _ in range(12):
        a, b = rng.randrange(len(docs)), rng.randrange(len(docs))
        if len(docs[a]) < 14:
            continue
        lo = rng.randrange(0, len(docs[a]) - 13)
        piece = docs[a][lo : lo + 14]
        at = rng.randrange(0, len(docs[b]) + 1)
        docs[b] = docs[b][:at] + piece + docs[b][at:]
    docs.append(list(docs[0]))  # one exact duplicate
    rows = [
        (i, " ".join(ts), f"s{i % 3}") for i, ts in enumerate(docs)
    ]
    sf = _write_docs(spark, tmp_path, rows)

    anchor_n, min_span = 8, 12
    got_pairs = {
        (r["doc_a"], r["doc_b"]): r["longest_span_tokens"]
        for r in shared_span_pairs(spark, sf).collect()
    }
    expect_pairs = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            run = _longest_common_run(docs[a], docs[b])
            if run >= min_span:
                expect_pairs[(a, b)] = run
    assert got_pairs == expect_pairs
    assert expect_pairs, "splices must create qualifying pairs"

    # coverage model: per doc, union of intervals of every aligned run
    # >= min_span against every OTHER doc (both directions)
    def runs_against(ta, tb):
        """All (start_in_ta, length) maximal aligned runs >= min_span."""
        out = []
        for diff in {pa - pb for pa in range(len(ta)) for pb in range(len(tb))}:
            run = 0
            for pa in range(len(ta)):
                pb = pa - diff
                if 0 <= pb < len(tb) and ta[pa] == tb[pb]:
                    run += 1
                else:
                    if run >= min_span:
                        out.append((pa - run, run))
                    run = 0
            if run >= min_span:
                out.append((len(ta) - run, run))
        return out

    covered = {}
    for i, ti in enumerate(docs):
        marks = [False] * len(ti)
        for j, tj in enumerate(docs):
            if i == j:
                continue
            for lo, ln in runs_against(ti, tj):
                for p in range(lo, lo + ln):
                    marks[p] = True
        covered[i] = sum(marks)
    expect_stats = {}
    for i, ts in enumerate(docs):
        src = f"s{i % 3}"
        nd, tt, cc = expect_stats.get(src, (0, 0, 0))
        expect_stats[src] = (nd + 1, tt + len(ts), cc + covered[i])
    got_stats = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["dup_span_tokens"])
        for r in span_dup_token_stats(spark, sf).collect()
    }
    assert got_stats == expect_stats


def test_audio_segment_plan_hand_computed_framing(spark, tmp_path):
    """Hop/window framing to the millisecond: a clip shorter than one
    window yields exactly one clamped segment; a clip ending exactly on
    a hop boundary yields no empty tail segment; every end_ms is
    min(start+400, dur)."""
    from via_spark.operators.multimodal import (
        AUDIO_HOP_MS,
        AUDIO_WIN_MS,
        audio_duration_ms,
        audio_segment_plan,
    )

    rows = [(1, "x" * 40, "s"), (2, "y" * 311, "s"), (3, "z" * 1000, "s")]
    sf = _write_docs(spark, tmp_path, rows)
    got = {}
    for r in audio_segment_plan(spark, sf).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["seg_index"], r["start_ms"], r["end_ms"], r["n_segments"])
        )
    for doc_id, text, _ in rows:
        dur = audio_duration_ms(len(text.encode()))
        n = (dur - 1) // AUDIO_HOP_MS + 1
        expect = [
            (j, j * AUDIO_HOP_MS, min(j * AUDIO_HOP_MS + AUDIO_WIN_MS, dur), n)
            for j in range(n)
        ]
        assert sorted(got[doc_id]) == expect, (doc_id, dur)
        # framing invariants
        assert all(e[2] <= dur and e[1] < dur for e in expect)
    # the short clip (40 bytes -> 780 ms) frames into 4 hops; a clip can
    # also land under one window — synthesize one to pin the 1-segment case
    assert audio_duration_ms(0) == 500  # < 400+200: 3 segments of a tiny clip


def test_tokenizer_fertility_hand_computed(spark, tmp_path):
    """Exact sums per (source, lang): a punctuation-heavy doc must push
    bpe_per_ws_ratio above the prose source's, and every column ties
    out against hand counts."""
    from pyspark.sql import functions as F

    from via_spark.operators.textstats import tokenizer_fertility_by_source

    rows = [
        (1, "plain words here now", "prose"),       # ws 4, bpe 4, bytes 20
        (2, "more plain words", "prose"),           # ws 3, bpe 3, bytes 16
        (3, "f(x)=y+1; g[2]!", "code"),             # ws 2, bpe 14, bytes 15
    ]
    d = tmp_path / "sf"
    spark.createDataFrame(rows, "doc_id long, text string, source string").withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(d / "documents.parquet")
    )
    got = {
        r["source"]: (
            r["n_docs"], r["total_bytes"], r["total_ws_tokens"],
            r["total_bpe_tokens"], r["bytes_per_bpe_token"], r["bpe_per_ws_ratio"],
        )
        for r in tokenizer_fertility_by_source(spark, str(d)).collect()
    }
    assert got["prose"] == (2, 36, 7, 7, 36 / 7, 1.0)
    assert got["code"] == (1, 15, 2, 14, 15 / 14, 14 / 2)
    assert got["code"][5] > got["prose"][5]


def test_phash_clusters_transitive_and_union_find(spark, tmp_path, sf_smoke):
    """Transitivity: A~B and B~C (but A far from C) must still land all
    three in one cluster with rep = min doc_id; an unrelated payload
    stays a singleton. Then on the real fixture the labels must equal a
    Python union-find over the (already brute-force-proven) pair set."""
    from via_spark.operators.graph import phash_dup_clusters

    base = " ".join(f"pixel{i:03d}" for i in range(40))
    step1 = base.replace("pixel020", "pixel02b", 1)
    step2 = step1.replace("pixel031", "pixel03c", 1)
    other = " ".join(f"zone{i * 7 % 91:03d}" for i in range(40))
    rows = [(1, base, "s"), (2, step1, "s"), (3, step2, "s"), (4, other, "s")]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in phash_dup_clusters(spark, sf).collect()
    }
    assert got[1] == (1, 3) and got[2] == (1, 3) and got[3] == (1, 3)
    assert got[4] == (4, 1)

    # fixture: labels == union-find over the collected pairs
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in phash_dup_pairs(spark, sf_smoke).collect()
    ]
    import duckdb

    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf_smoke}/documents.parquet')"
    ).fetchall()]
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    expect = {}
    for rep, members in comp.items():
        for m in members:
            expect[m] = (min(members), len(members))
    got_fx = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in phash_dup_clusters(spark, sf_smoke).collect()
    }
    assert got_fx == expect


def test_dedup_family_compare_ties_out(spark, sf_oracle):
    """The comparison table must tie out against the three label
    queries it summarizes — counts, duplicate rate (items − clusters)
    / items, and the degenerate-state guards it exists to catch (no
    family all-singleton with known planted dups, no family collapsed
    into one giant cluster on this fixture)."""
    from via_spark.operators.graph import (
        dedup_clusters,
        dedup_family_compare,
        embedding_neardup_clusters,
        phash_dup_clusters,
    )

    got = {r["family"]: r for r in dedup_family_compare(spark, sf_oracle).collect()}
    assert set(got) == {"lexical_minhash", "semantic_embedding", "perceptual_phash"}
    for family, q in [
        ("lexical_minhash", dedup_clusters),
        ("semantic_embedding", embedding_neardup_clusters),
        ("perceptual_phash", phash_dup_clusters),
    ]:
        labels = q(spark, sf_oracle).collect()
        n_items = len(labels)
        n_clusters = len({r["cluster_rep"] for r in labels})
        in_dup = sum(1 for r in labels if r["cluster_size"] > 1)
        largest = max(r["cluster_size"] for r in labels)
        row = got[family]
        assert (
            row["n_items"], row["n_clusters"], row["items_in_dup_clusters"],
            row["largest_cluster"],
        ) == (n_items, n_clusters, in_dup, largest), family
        assert row["duplicate_rate"] == (n_items - n_clusters) / n_items
        assert 0 < row["duplicate_rate"] < 0.5, (family, row["duplicate_rate"])
        assert row["largest_cluster"] < n_items // 10, family
