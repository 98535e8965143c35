"""Round-10 staging registry — fully-built queries awaiting head slots.

Round 9 reached the rotation program's convergence goal: the backlog of
queries needing a driver CORRECTNESS row is exactly 50 = the driver's
per-round head cap, so every registered query gets a fresh green row this
round. Registering MORE queries mid-round would evict the 16 genuinely
stale r5–r7 queries from the head and break that convergence — so new
operators land here instead: implementation, DuckDB oracle, and parity
tests are all DONE (tests/test_staging.py runs the same compare harness
as test_oracle_parity at sf0.01); only the driver registration waits.

FIRST COMMIT OF ROUND 10: splice these into ``__spark_entry__`` —

    queries()    head += staged_queries()   (alphabetical, before the
                                             changed/stale refill)
    oracle_sql()      += staged_oracle_sql()

then delete this module and move the tests' parametrization over to the
main parity suite (they assert dict-key equality, so a missed splice
fails loudly).

Also queued for r10 (post-splice, once the head re-verifies them):
expose the sign-LSH ``bits`` dial on the REGISTERED
neardup_embedding_pairs / embedding_neardup_clusters — the staged
density probe measured the fixed-8-bit occupancy blow-up and the dial
closing it (SCALEUP_STAGED_r9.json "bits_dial_ab"); changing those
green tail queries this round would push the rotation backlog past the
50-row head.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from via_spark import oracles
from via_spark.operators import (
    asof,
    curation,
    dedup,
    graph,
    search,
    stats,
    textstats,
    timeseries,
    vector,
    windows,
)


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Same contract as __spark_entry__.queries(): pure lazy plan
    builders (spark, sf_dir) -> DataFrame."""
    return {
        "benford_digit_audit": stats.benford_digit_audit,
        "iqr_outlier_report": stats.iqr_outlier_report,
        "fd_histogram": stats.fd_histogram,
        "ks_two_sample_drift": timeseries.ks_two_sample_drift,
        "acf_daily_counts": timeseries.acf_daily_counts,
        "stl_decompose_daily": timeseries.stl_decompose_daily,
        "fano_burstiness_by_type": timeseries.fano_burstiness_by_type,
        "retrieval_ndcg_report": vector.retrieval_ndcg_report,
        "ranker_overlap_report": search.ranker_overlap_report,
        "spearman_length_vocab": textstats.spearman_length_vocab,
        "rake_keyphrases": textstats.rake_keyphrases,
        "gini_token_concentration": textstats.gini_token_concentration,
        "poisson_bootstrap_ci": stats.poisson_bootstrap_ci,
        "attribution_last_touch": asof.attribution_last_touch,
        "conversion_lag_profile": asof.conversion_lag_profile,
        "markov_next_event_accuracy": timeseries.markov_next_event_accuracy,
        "quantization_error_report": vector.quantization_error_report,
        "lsh_density_outliers": dedup.lsh_density_outliers,
        "session_survival_curve": windows.session_survival_curve,
        "good_turing_unseen_mass": textstats.good_turing_unseen_mass,
        "sorted_neighborhood_pairs": curation.sorted_neighborhood_pairs,
        "mann_whitney_drift": timeseries.mann_whitney_drift,
        "t_closeness_audit": curation.t_closeness_audit,
        "surprisal_filter_yield": textstats.surprisal_filter_yield,
        "dup_cluster_size_histogram": graph.dup_cluster_size_histogram,
        "semantic_contamination": vector.semantic_contamination,
        "forecast_baseline_backtest": timeseries.forecast_baseline_backtest,
        "attribution_linear_window": asof.attribution_linear_window,
        "runs_test_randomness": timeseries.runs_test_randomness,
        "hhi_source_concentration": textstats.hhi_source_concentration,
    }


def staged_oracle_sql() -> dict[str, str]:
    """Same contract as __spark_entry__.oracle_sql()."""
    return {
        "benford_digit_audit": oracles.benford_digit_audit_sql(),
        "iqr_outlier_report": oracles.iqr_outlier_report_sql(),
        "fd_histogram": oracles.fd_histogram_sql(),
        "ks_two_sample_drift": oracles.ks_two_sample_drift_sql(),
        "acf_daily_counts": oracles.acf_daily_counts_sql(),
        "stl_decompose_daily": oracles.stl_decompose_daily_sql(),
        "fano_burstiness_by_type": oracles.fano_burstiness_by_type_sql(),
        "retrieval_ndcg_report": oracles.retrieval_ndcg_report_sql(),
        "ranker_overlap_report": oracles.ranker_overlap_report_sql(),
        "spearman_length_vocab": oracles.spearman_length_vocab_sql(),
        "rake_keyphrases": oracles.rake_keyphrases_sql(),
        "gini_token_concentration": oracles.gini_token_concentration_sql(),
        "poisson_bootstrap_ci": oracles.poisson_bootstrap_ci_sql(),
        "attribution_last_touch": oracles.attribution_last_touch_sql(),
        "conversion_lag_profile": oracles.conversion_lag_profile_sql(),
        "markov_next_event_accuracy": oracles.markov_next_event_accuracy_sql(),
        "quantization_error_report": oracles.quantization_error_report_sql(),
        "lsh_density_outliers": oracles.lsh_density_outliers_sql(),
        "session_survival_curve": oracles.session_survival_curve_sql(),
        "good_turing_unseen_mass": oracles.good_turing_unseen_mass_sql(),
        "sorted_neighborhood_pairs": oracles.sorted_neighborhood_pairs_sql(),
        "mann_whitney_drift": oracles.mann_whitney_drift_sql(),
        "t_closeness_audit": oracles.t_closeness_audit_sql(),
        "surprisal_filter_yield": oracles.surprisal_filter_yield_sql(),
        "dup_cluster_size_histogram": oracles.dup_cluster_size_histogram_sql(),
        "semantic_contamination": oracles.semantic_contamination_sql(),
        "forecast_baseline_backtest": oracles.forecast_baseline_backtest_sql(),
        "attribution_linear_window": oracles.attribution_linear_window_sql(),
        "runs_test_randomness": oracles.runs_test_randomness_sql(),
        "hhi_source_concentration": oracles.hhi_source_concentration_sql(),
    }
