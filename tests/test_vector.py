"""Vector-layer properties the DuckDB oracle can't express:
simhash locality sensitivity and hamming distance behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from via_spark.functions.simhash import hamming_hex, simhash_hex


def _fingerprint(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    out = df.select("id", simhash_hex(toks).alias("sh")).orderBy("id").collect()
    return [r["sh"] for r in out]


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = base.replace("today", "tonight")  # 1-token change
    far = "completely unrelated text about spark shuffle partitions and parquet files"
    a, b, c = _fingerprint(spark, [base, near, far])
    df = spark.createDataFrame([(a, b), (a, c)], "x string, y string")
    d_near, d_far = [
        r[0] for r in df.select(hamming_hex(F.col("x"), F.col("y"))).collect()
    ]
    assert d_near < d_far, f"near dup {d_near} should beat unrelated {d_far}"
    assert d_near <= 16
    assert len(a) == 16


def test_simhash_deterministic_and_identical_inputs(spark):
    t = "alpha beta gamma delta"
    a, b = _fingerprint(spark, [t, t])
    assert a == b
    df = spark.createDataFrame([(a, b)], "x string, y string")
    assert df.select(hamming_hex(F.col("x"), F.col("y"))).first()[0] == 0


def test_dense_embed_shell_with_fake_encoder(spark, sf_oracle):
    """The production mapInPandas embedding shell, driven by an injected
    fake model: proves the plumbing (schema, Arrow batch shape, id
    alignment) so the ONNX swap-in is a one-line encoder change."""
    import pytest

    from via_spark.functions import embed
    from via_spark.session import load_table

    d = load_table(spark, sf_oracle, "documents").limit(50)

    def fake_encoder(texts):
        # deterministic pure function of the text, one vector per input
        return [[float(len(t) % 7)] * embed.EMBED_DIM for t in texts]

    out = embed.dense_embedded(d, "doc_id", "text", encoder=fake_encoder)
    assert out.schema["embedding"].dataType.simpleString() == "array<float>"
    rows = out.collect()
    assert len(rows) == 50
    assert all(len(r["embedding"]) == embed.EMBED_DIM for r in rows)
    # id ↔ vector alignment survives the batch boundary
    texts = {r["doc_id"]: r["text"] for r in d.collect()}
    for r in rows:
        assert r["embedding"][0] == float(len(texts[r["id"]]) % 7)

    # wrong-width encoder is rejected by the shell's contract check
    bad = embed.dense_embedded(d, "doc_id", "text", encoder=lambda ts: [[1.0]] * len(ts))
    with pytest.raises(Exception, match="non-384-dim"):
        bad.collect()

    # default path without the optional runtime: clear actionable error
    try:
        import fastembed  # noqa: F401
    except ImportError:
        with pytest.raises(Exception, match="runtime"):
            embed.dense_embedded(d, "doc_id", "text").collect()


def test_dense_embedded_production_model(spark, sf_oracle):
    """End-to-end production embedding path — runs only in containers
    that ship the optional fastembed/ONNX runtime (skipped otherwise);
    proves _load_model_encoder + the Arrow shell against the real
    bge-small-en-v1.5 model."""
    import pytest

    pytest.importorskip("fastembed")
    from via_spark.functions import embed
    from via_spark.session import load_table

    d = load_table(spark, sf_oracle, "documents").limit(8)
    rows = embed.dense_embedded(d, "doc_id", "text").collect()
    assert len(rows) == 8
    assert all(len(r["embedding"]) == embed.EMBED_DIM for r in rows)
    # embeddings are unit-ish and text-dependent, not constant
    assert len({tuple(r["embedding"][:4]) for r in rows}) > 1


def test_ann_variants_recall_vs_exact(spark, sf_oracle):
    """Measured approximation quality: every ANN variant's top-10 vs the
    exact brute-force top-10. IVF (4 of 16 cells probed) and INT8
    quantize+rescore recover the exact set on the fixture; multi-probe
    sign-LSH with a 5-table OR-construction holds recall ≥0.8 even on
    the fixture's near-random embeddings (the adversarial case — sign
    bits carry little cosine signal there)."""
    from via_spark.operators import dedup, vector

    exact = {r["vec_id"] for r in vector.knn_cosine_topk(spark, sf_oracle, k=10).collect()}

    def recall(df):
        got = {r["vec_id"] for r in df.collect()}
        return len(exact & got) / len(exact)

    assert recall(dedup.ann_ivf_topk(spark, sf_oracle, k=10)) >= 0.9
    assert recall(vector.ann_quantized_topk(spark, sf_oracle, k=10)) >= 0.9
    assert recall(dedup.ann_lsh_topk(spark, sf_oracle, k=10)) >= 0.8
