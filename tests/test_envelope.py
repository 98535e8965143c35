"""BASELINE.md derived-envelope checks at sf0.1 (~100k events).

The reference's own operating numbers define the bar (BASELINE.md):
a full rhythm-anomaly pass must fit well inside its 60 s cadence;
cluster/triage queries inside the 30 s client timeout; streaming ingest
must sustain >= 100 events/s. These run the REAL plans at the bench
scale factor and assert the envelope with generous headroom — they are
regression tripwires, not microbenchmarks (bench.py measures).
"""

from __future__ import annotations

import time

from via_spark.operators import forensic, rhythm
from via_spark.streaming import pipeline

SF_BENCH = "/root/testdata/sf0.1"


def test_rhythm_pass_fits_cadence(spark):
    t0 = time.perf_counter()
    n = rhythm.find_rhythm_anomalies(
        spark, SF_BENCH, sample_size=2000, novelty_min_count=1
    ).count()
    dt = time.perf_counter() - t0
    assert n >= 0
    assert dt < 60, f"rhythm pass took {dt:.1f}s — breaches the 60s cadence"


def test_forensic_queries_fit_client_timeout(spark):
    t0 = time.perf_counter()
    forensic.cluster_search(spark, SF_BENCH).count()
    forensic.triage(spark, SF_BENCH).count()
    dt = time.perf_counter() - t0
    assert dt < 30, f"clusters+triage took {dt:.1f}s — breaches the 30s timeout"


def test_streaming_ingest_sustains_rate(spark, tmp_path):
    src = str(tmp_path / "otel")
    tier1 = str(tmp_path / "tier1")
    pipeline.write_otel_fixture_jsonl(spark, SF_BENCH, src, n_files=8)
    t0 = time.perf_counter()
    q = pipeline.start_tier1_ingest(
        pipeline.read_otel_stream(spark, src), tier1, str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    dt = time.perf_counter() - t0
    n = spark.read.parquet(tier1).count()
    rate = n / dt
    assert rate >= 100, f"ingest rate {rate:.0f} events/s below the 100/s envelope"
