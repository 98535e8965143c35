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
    """Round-11 batch (for the r12 splice):

    * ``incremental_embedding_pairs`` — batch-vs-corpus embedding
      near-dup pairs (the streaming embedding gate's decision, batch-
      queryable; adaptive-bits dial from the full count).
    * ``semdedup_cell_occupancy`` — cell-size histogram of the
      two-level SemDeDup split (the N^(1/3) dial's health readout).
    * ``exact_dup_family_stats`` — byte-identical embedding family
      census (how much the cluster builders' exact collapse removes).
    * ``semdedup_cell_purity`` — majority-label share per final cell
      (the split is balanced AND meaningful, not just balanced).
    * ``minhash_band_occupancy`` — uncapped band-bucket histogram
      (the view that shows hot buckets before capped_bands hides them).
    * ``ivf_cell_balance`` — vectors per IVF coarse cell (one overfull
      cell quietly turns nprobe into a corpus scan).
    """
    return {
        "incremental_embedding_pairs": dedup.incremental_embedding_pairs,
        "semdedup_cell_occupancy": vector.semdedup_cell_occupancy,
        "exact_dup_family_stats": dedup.exact_dup_family_stats,
        "semdedup_cell_purity": vector.semdedup_cell_purity,
        "minhash_band_occupancy": dedup.minhash_band_occupancy,
        "ivf_cell_balance": dedup.ivf_cell_balance,
    }


def staged_oracle_sql() -> dict[str, str]:
    return {
        "incremental_embedding_pairs": oracles.incremental_embedding_pairs_sql(),
        "semdedup_cell_occupancy": oracles.semdedup_cell_occupancy_sql(),
        "exact_dup_family_stats": oracles.exact_dup_family_stats_sql(),
        "semdedup_cell_purity": oracles.semdedup_cell_purity_sql(),
        "minhash_band_occupancy": oracles.minhash_band_occupancy_sql(),
        "ivf_cell_balance": oracles.ivf_cell_balance_sql(),
    }
