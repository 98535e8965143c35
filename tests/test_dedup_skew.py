"""Skew hardening for the MinHash band join (dedup.py hot-bucket cap).

The failure mode at corpus scale: one boilerplate template shared by a
fraction p of N docs puts (pN choose 2) candidate pairs into a single
(band, band_key) bucket — quadratic JOIN OUTPUT that no AQE skew-split
can fix (AQE rebalances input partitions; the blow-up is in the rows
the join emits). The standard public remedy (CCNet, BigQuery dedup
pipelines) is to drop band keys over a frequency ceiling and log them:
docs agreeing on a hot band are near-certain boilerplate, and identical
text is already collapsed by exact dedup upstream.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory) -> str:
    """A 300-doc corpus where 10% share one boilerplate template —
    the planted hot band."""
    boiler = "terms of service apply to all content on this mirror site"
    rows = []
    for i in range(300):
        if i % 10 == 0:  # 30 docs, identical boilerplate
            text = boiler
        else:  # unique-ish word salad, no shared trigrams by construction
            text = " ".join(f"tok{i}x{j}" for j in range(12))
        rows.append((i, text, "en", "web", len(text)))
    d = tmp_path_factory.mktemp("planted")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_hot_band_keys_surfaces_planted_bucket(spark, planted_dir):
    from via_spark.operators import dedup

    hot = dedup.hot_band_keys(spark, planted_dir, band_cap=10).collect()
    # every band of the 30 identical docs is hot (identical signature)
    assert len(hot) >= 1
    assert all(r["n_docs"] == 30 for r in hot)


def test_band_cap_bounds_candidate_volume(spark, planted_dir):
    """With the cap OFF the planted template alone yields C(30,2)=435
    verified pairs; with a cap of 10 those buckets are dropped and the
    join output collapses. Also pins that the drop is bucket-precise:
    the unique docs' pairs (none) are unaffected."""
    from via_spark.operators import dedup

    uncapped = dedup.dedup_minhash_pairs(spark, planted_dir, band_cap=None)
    capped = dedup.dedup_minhash_pairs(spark, planted_dir, band_cap=10)
    n_uncapped = uncapped.count()
    n_capped = capped.count()
    assert n_uncapped >= 435
    assert n_capped == 0
    # default cap (5000) is inert on the fixture-scale corpus
    assert (
        dedup.dedup_minhash_pairs(spark, planted_dir).count() == n_uncapped
    )


def test_capped_bands_is_bucket_precise(spark, planted_dir):
    """capped_bands drops ONLY oversize buckets — total band rows
    shrink by exactly the hot buckets' membership."""
    from via_spark.operators import dedup

    bands = dedup.minhash_bands(dedup.shingled_documents(spark, planted_dir))
    total = bands.count()
    kept = dedup.capped_bands(bands, band_cap=10).count()
    hot_members = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 10)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert kept == total - (hot_members or 0)
    assert hot_members == 30 * 4  # 30 docs hot in all 4 bands


def test_incremental_pairs_consistent_with_self_join(spark, sf_oracle):
    """Batch-vs-corpus lookup must agree with the full self-join: a
    (new, corpus) pair is found incrementally IFF the self-join finds
    the same unordered pair — i.e. incremental dedup misses nothing
    about the arriving batch and invents nothing."""
    from via_spark.operators import dedup

    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.dedup_minhash_pairs(spark, sf_oracle).collect()
    }
    m, res = dedup.INCREMENTAL_MOD, dedup.INCREMENTAL_BATCH_RESIDUE

    def is_batch(d):
        return d % m == res

    expect = {
        (a, b) for a, b in full if is_batch(a) != is_batch(b)
    }
    got = {
        tuple(sorted((r["new_doc"], r["corpus_doc"])))
        for r in dedup.incremental_minhash_pairs(spark, sf_oracle).collect()
    }
    assert got == expect
