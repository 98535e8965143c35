"""Control-loop invariants + schema inference/registry behavior
(the parts the DuckDB oracle can't express)."""

from __future__ import annotations

import os

from via_spark.operators import control, rhythm, schema_infer

VARIANT = dict(sample_size=200, novelty_min_count=1)


def test_suppress_then_reanalyze_drops_hash(spark, sf_smoke):
    """The reference's core control-loop invariant
    (tests/test_api_flow.py:64-81): after suppressing a flagged hash,
    re-running the analysis no longer returns it."""
    anomalies = rhythm.find_rhythm_anomalies(spark, sf_smoke, **VARIANT)
    first = anomalies.orderBy("rhythm_hash").first()
    assert first is not None
    target = first["rhythm_hash"]

    now = 1_000_000
    rules = control.suppress(control.empty_rules(spark), target, ttl_sec=600, now=now)
    again = rhythm.find_rhythm_anomalies(
        spark, sf_smoke, rules=control.active_rules(rules, now), **VARIANT
    )
    hashes = {r["rhythm_hash"] for r in again.collect()}
    assert target not in hashes
    assert len(hashes) == anomalies.count() - 1

    # expired suppression no longer filters
    later = now + 601
    again2 = rhythm.find_rhythm_anomalies(
        spark, sf_smoke, rules=control.active_rules(rules, later), **VARIANT
    )
    assert target in {r["rhythm_hash"] for r in again2.collect()}


def test_patch_upsert_and_deactivate(spark):
    now = 500
    rules = control.patch(control.empty_rules(spark), "h1", now=now)
    rules = control.suppress(rules, "h2", ttl_sec=100, now=now)
    rules = control.patch(rules, "h1", now=now + 1, reason="updated")  # upsert
    rows = {r["rhythm_hash"]: r for r in rules.collect()}
    assert len(rows) == 2
    assert rows["h1"]["reason"] == "updated"
    assert rows["h1"]["expires_at"] is None  # permanent
    assert rows["h2"]["expires_at"] == now + 100

    rules = control.deactivate(rules, "h1")
    active = {r["rhythm_hash"] for r in control.active_rules(rules, now).collect()}
    assert active == {"h2"}


def test_eval_case_writer(tmp_path):
    p = control.write_eval_case(
        str(tmp_path / "evals"), "abcd1234efgh5678:ffff", ["log a", "log b"], now=42
    )
    assert os.path.exists(p)
    text = open(p).read()
    assert "is_anomaly: false" in text
    assert "abcd1234efgh5678:ffff" in text
    assert "log a" in text


def test_schema_detection_and_registry(spark, tmp_path, sf_smoke):
    otel_line = (
        schema_infer.otel_envelope_from_events(spark, sf_smoke).first()["raw"]
    )
    bgl_line = schema_infer.bgl_lines_from_events(spark, sf_smoke).first()["line"]

    s_otel = schema_infer.detect_schema([otel_line])
    assert s_otel and s_otel["source_type"] == "otel"
    s_bgl = schema_infer.detect_schema([bgl_line])
    assert s_bgl and s_bgl["source_type"] == "bgl"
    assert {f["name"] for f in s_bgl["fields"]} == {"timestamp", "level", "service", "message"}
    assert schema_infer.detect_schema(["not a log", ""]) is None

    reg = str(tmp_path / "registry")
    schema_infer.save_schema(spark, reg, "otel_src", s_otel)
    schema_infer.save_schema(spark, reg, "bgl_src", s_bgl)
    schema_infer.save_schema(spark, reg, "bgl_src", s_bgl)  # idempotent upsert
    assert schema_infer.list_schemas(spark, reg) == ["bgl_src", "otel_src"]
    assert schema_infer.get_schema(spark, reg, "otel_src")["source_type"] == "otel"
    assert schema_infer.get_schema(spark, reg, "missing") is None
