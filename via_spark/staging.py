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
from via_spark.operators import asof, dedup, forensic, graph, rank, textstats, timeseries


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Contract mirror of ``__spark_entry__.queries()`` for the staged
    surface — spliced to the registered tail at the start of r11."""
    return {
        "asof_nearest_event": asof.asof_nearest_event,
        "clusters_windowed_tolerant": forensic.clusters_windowed_tolerant,
        "collocation_pmi_report": textstats.collocation_pmi_report,
        "decile_lift_table": rank.decile_lift_table,
        "dedup_threshold_sweep": dedup.dedup_threshold_sweep,
        "embedding_bucket_occupancy": dedup.embedding_bucket_occupancy,
        "growth_accounting_daily": timeseries.growth_accounting_daily,
        "hybrid_tier2_search": forensic.hybrid_tier2_search,
        "kneser_ney_bigram_report": textstats.kneser_ney_bigram_report,
        "neardup_lsh_recall_report": dedup.neardup_lsh_recall_report,
        "neardup_source_flow_matrix": dedup.neardup_source_flow_matrix,
        "positional_template_entropy": textstats.positional_template_entropy,
        "simhash_bit_balance_report": textstats.simhash_bit_balance_report,
        "simhash_graph_triangles": graph.simhash_graph_triangles,
        "stopword_coverage_by_source": textstats.stopword_coverage_by_source,
        "term_burstiness_report": textstats.term_burstiness_report,
        "type_hour_mutual_information": timeseries.type_hour_mutual_information,
        "winnowing_fingerprint_stats": textstats.winnowing_fingerprint_stats,
        "zipf_slope_by_source": textstats.zipf_slope_by_source,
    }


def staged_oracle_sql() -> dict[str, str]:
    """Contract mirror of ``__spark_entry__.oracle_sql()``."""
    return {
        "asof_nearest_event": oracles.asof_nearest_event_sql(),
        "clusters_windowed_tolerant": oracles.clusters_windowed_tolerant_sql(),
        "collocation_pmi_report": oracles.collocation_pmi_report_sql(),
        "decile_lift_table": oracles.decile_lift_table_sql(),
        "dedup_threshold_sweep": oracles.dedup_threshold_sweep_sql(),
        "embedding_bucket_occupancy": oracles.embedding_bucket_occupancy_sql(),
        "growth_accounting_daily": oracles.growth_accounting_daily_sql(),
        "hybrid_tier2_search": oracles.hybrid_tier2_search_sql(),
        "kneser_ney_bigram_report": oracles.kneser_ney_bigram_report_sql(),
        "neardup_lsh_recall_report": oracles.neardup_lsh_recall_report_sql(),
        "neardup_source_flow_matrix": oracles.neardup_source_flow_matrix_sql(),
        "positional_template_entropy": oracles.positional_template_entropy_sql(),
        "simhash_bit_balance_report": oracles.simhash_bit_balance_report_sql(),
        "simhash_graph_triangles": oracles.simhash_graph_triangles_sql(),
        "stopword_coverage_by_source": oracles.stopword_coverage_by_source_sql(),
        "term_burstiness_report": oracles.term_burstiness_report_sql(),
        "type_hour_mutual_information": oracles.type_hour_mutual_information_sql(),
        "winnowing_fingerprint_stats": oracles.winnowing_fingerprint_stats_sql(),
        "zipf_slope_by_source": oracles.zipf_slope_by_source_sql(),
    }
