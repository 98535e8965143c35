"""Model-based property tests (hypothesis): the Spark detection plan
must agree with an independent pure-Python reference model on random
inputs — beyond the reference's test strategy (SURVEY.md §5.4 notes it
has no property tests).

The model reimplements the flagship semantics from the spec (novelty:
absent from baseline AND count >= 2; frequency: count > mean + 2.5*std
with duration-normalized stats) with none of the Spark machinery, so a
shared bug would have to be written twice independently.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from via_spark.operators import rhythm

WINDOW = 100

# random event streams: (ts, hash_id) with ts in [0, 400); the recent
# window is [300, 400) given now=399
EVENTS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=399), st.integers(min_value=0, max_value=5)),
    min_size=1,
    max_size=60,
)


def _model(events, now, window_sec, sample_size=10_000,
           novelty_min=2, freq_min=3, std_factor=2.5):
    """Pure-Python re-implementation of the detection spec."""
    recent = [(ts, h) for ts, h in events if now - window_sec <= ts <= now]
    hist = sorted(
        [(ts, h, i) for i, (ts, h) in enumerate(events) if ts < now - window_sec],
        key=lambda x: (-x[0], -x[2]),
    )[:sample_size]
    stats = {}
    if len(hist) >= 2:
        newest, oldest = max(t for t, _, _ in hist), min(t for t, _, _ in hist)
        scale = window_sec / max(1, newest - oldest)
        counts = {}
        for _, h, _ in hist:
            counts[h] = counts.get(h, 0) + 1
        for h, c in counts.items():
            mean = c * scale
            stats[h] = (mean, max(1.5, math.sqrt(mean)))
    rcounts = {}
    for _, h in recent:
        rcounts[h] = rcounts.get(h, 0) + 1
    out = {}
    for h, c in rcounts.items():
        if h not in stats:
            if c >= novelty_min:
                out[h] = ("novelty", c)
        else:
            mean, std = stats[h]
            if c > mean + std * std_factor and c >= freq_min:
                out[h] = ("frequency", c)
    return out


@pytest.mark.usefixtures("spark")
@given(events=EVENTS)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_detection_matches_python_model(spark, events):
    now = 399
    rows = [(i, int(ts), f"svc_{h}", "INFO", f"body {h}") for i, (ts, h) in enumerate(events)]
    tier1 = spark.createDataFrame(
        rows, "event_id long, ts long, service string, severity string, body string"
    )
    from via_spark.functions.text import rhythm_hash, template
    from pyspark.sql import functions as F

    tier1 = tier1.withColumn("template", template(F.col("body"))).withColumn(
        "rhythm_hash", rhythm_hash("service", "severity", F.col("template"))
    )
    got = {
        r["rhythm_hash"]: (r["anomaly_type"], r["r_count"])
        for r in rhythm.find_rhythm_anomalies(
            spark, sf_dir="", tier1=tier1, now=now, window_sec=WINDOW
        ).collect()
    }
    # model keys are small hash ids; map through the real hash function
    hash_of = {
        int(row["service"].split("_")[1]): row["rhythm_hash"]
        for row in tier1.select("service", "rhythm_hash").distinct().collect()
    }
    expect = {hash_of[h]: v for h, v in _model(events, now, WINDOW).items()}
    assert got == expect
