"""Staging registry — fully-built queries awaiting driver head slots.

Workflow (the r9→r10 pattern, kept for future rounds): new operators
land here first — implementation, DuckDB oracle, and parity tests all
DONE (tests/test_staging.py runs the same compare harness as
test_oracle_parity at sf0.01) — then, at the START of the next round,
``scripts/splice_staging.py`` appends them to the TAIL of
``__spark_entry__.queries()`` / ``oracle_sql()``, bumps the parity
count pin, and DRAINS this registry (the module stays importable; the
staged parity tests become no-ops while the model/planted/plan tests
keep running against the cores). The head reorder is a separate,
rotation-driven step: ``python -m via_spark.rotation`` after committing
the new round's driver artifacts, then move the suggested 50 names up.

Round-10 batch (for the r11 splice):

* ``hybrid_tier2_search`` — the reference's multi-vector hybrid
  (QDRANT-FEATURES.md:45-47) end-to-end over tier2: text filter →
  dense (hashing-trick) + sparse (BM25-over-body) cuts → RRF.
* ``clusters_windowed_tolerant`` — U1's federated failure tolerance
  (forensic_analysis_service.py:55-60 gather(return_exceptions=True))
  as a documented query option via ignoreCorruptFiles.
* ``embedding_bucket_occupancy`` — occupancy histogram of the adaptive
  sign-LSH bucket space (the r10 ``bits`` dial's health diagnostic).
* ``neardup_lsh_recall_report`` — measured pair recall of the adaptive
  multi-probe LSH vs exact sample×corpus ground truth (linear cost).
* ``dedup_threshold_sweep`` — pair-count-vs-threshold curve over the
  verified MinHash candidates (one verify pass, 7 thresholds).
* ``simhash_bit_balance_report`` — per-bit 1-fraction of the corpus
  simhashes (stuck-bit health check for the Hamming dedup family).
* ``stopword_coverage_by_source`` — per-source stopword token share
  (corpus-level fluency signal beside the gopher per-doc rules).

Batch 4 (corpus statistics + fingerprinting):

* ``neardup_source_flow_matrix`` — source×source verified near-dup
  pair counts (which sources duplicate into which).
* ``simhash_graph_triangles`` — degree-ordered triangle census +
  global clustering coefficient of the simhash near-dup graph.
* ``term_burstiness_report`` — Church-Gale cf/df clumpiness, top-k.
* ``zipf_slope_by_source`` — grid-floored ln OLS rank-frequency slope.
* ``kneser_ney_bigram_report`` — KN-smoothed bigram LM probabilities
  (d=3/4 in exact quarters fixed-point).
* ``winnowing_fingerprint_stats`` — MOSS robust-winnowing fingerprint
  density per source (rightmost-min tie via packed BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from via_spark import oracles
from via_spark.operators import (  # noqa: F401  (kept for next batches)
    asof,
    dedup,
    forensic,
    graph,
    rank,
    textstats,
    timeseries,
    vector,
)


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Round-13 batch: the per-dial regression corpus (VERDICT r12 next
    #6) — the engine already measures LSH recall, SemDeDup containment
    and ANN recall; these three close the loop on the DIALS themselves:
    bits (adaptive vs pinned A/B), SemDeDup tau, density min_pts."""
    return {
        "lsh_bits_dial_report": dedup.lsh_bits_dial_report,
        "density_minpts_sweep": dedup.density_minpts_sweep,
        "semdedup_tau_sweep": vector.semdedup_tau_sweep,
    }


def staged_oracle_sql() -> dict[str, str]:
    """DuckDB mirrors for the round-13 staged batch."""
    return {
        "lsh_bits_dial_report": oracles.lsh_bits_dial_report_sql(),
        "density_minpts_sweep": oracles.density_minpts_sweep_sql(),
        "semdedup_tau_sweep": oracles.semdedup_tau_sweep_sql(),
    }
