"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``via_spark/``; this module only adapts it to
the driver's (spark, sf_dir) -> DataFrame calling convention.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from via_spark import oracles
from via_spark.operators import (
    asof,
    control,
    curation,
    dedup,
    forensic,
    graph,
    multimodal,
    promote,
    rank,
    relational,
    rhythm,
    schema_infer,
    search,
    sketch,
    stats,
    textstats,
    timeseries,
    vector,
    windows,
)
from via_spark import store
from via_spark.session import configure


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: tier-1 rhythm anomaly detection on sf0.001.

    Uses the sensitivity variant (small baseline sample, min-count 1)
    because the fixture stream is anomaly-free by construction — the
    reference-tuned thresholds correctly return zero rows there, which
    would make the smoke check vacuous. Same plan, non-empty output.
    """
    configure(spark)
    return rhythm.find_rhythm_anomalies(
        spark, "/root/testdata/sf0.001", sample_size=200, novelty_min_count=1
    )


def _tier1_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier1 log store view: events → template-masked body + rhythm hash
    (F1/F2/F4), served from the session store."""
    return store.tier1(spark, sf_dir).select(
        "event_id", "ts", "service", "severity", "body", "template", "rhythm_hash"
    )


def _rhythm_recent_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/S6: per-hash counts in the recent detection window (raw-ts
    pushdown scan + one hash agg)."""
    from pyspark.sql import functions as F

    tier1 = store.tier1(spark, sf_dir)
    now = rhythm.current_now(tier1)
    recent = rhythm.recent_window(tier1, now, rhythm.DEFAULT_WINDOW_SEC)
    return recent.groupBy("rhythm_hash").agg(F.count(F.lit(1)).alias("r_count"))


def _rhythm_baseline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/S7/K3: duration-normalized baseline mean/std over the
    newest-10k historical sample (1.5 σ floor, exact)."""
    tier1 = store.tier1(spark, sf_dir)
    now = rhythm.current_now(tier1)
    sample = rhythm.baseline_sample(tier1, now, rhythm.DEFAULT_WINDOW_SEC)
    return rhythm.baseline_stats(sample, rhythm.DEFAULT_WINDOW_SEC)


def _rhythm_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship detection (J1+J2+J4, reference thresholds): novelty and
    frequency anomalies with representative payloads."""
    return rhythm.find_rhythm_anomalies(spark, sf_dir)


def _rhythm_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection variant (small baseline, min-count 1) so the novelty
    anti-join J1 fires on the anomaly-free fixture."""
    return rhythm.find_rhythm_anomalies(spark, sf_dir, **_NOVELTY_VARIANT)


def _rhythm_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detection variant (low σ factor) so the frequency join J2 fires
    on the anomaly-free fixture."""
    return rhythm.find_rhythm_anomalies(spark, sf_dir, **_FREQ_VARIANT)


# Sensitivity variants: the fixture stream is anomaly-free by
# construction, so the reference-tuned flagship correctly returns empty;
# these parameterizations keep the J1/J2 join logic exercised on
# non-empty outputs (small baseline sample -> novelty fires; low std
# factor -> frequency fires).
_NOVELTY_VARIANT = dict(sample_size=2000, novelty_min_count=1)
_FREQ_VARIANT = dict(std_dev_factor=0.5, frequency_min_count=2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    ORDERING POLICY (change-aware since r7): head = the queries that
    need a driver row, stalest first — never driver-verified, then any
    query whose implementing modules (callable's module + its static
    via_spark import closure) changed since the commit that recorded
    its newest green CORRECTNESS row. Computed by
    ``via_spark.rotation.recommended_head`` (git-derived, uncommitted
    edits count); when more than 50 qualify, the overflow keeps its
    staleness priority for the next round, so the backlog drains and a
    changed query can never keep stale green credit indefinitely. The
    driver records CORRECTNESS rows for only the FIRST 50 entries;
    tests/test_properties.py::test_rotation_head_policy enforces the
    ordering against the committed CORRECTNESS_r*.json files + git.
    The tail is re-proven every round by tests/test_oracle_parity.py.

    Contract note: every entry is a pure lazy plan builder — building
    a DataFrame runs no Spark job (the former ``ann_lsh_topk``
    point-lookup exception was retired in r9; its probe keys now plan
    as a broadcast semi-join).
    """
    return {
        # --- head (first 50): change-aware rotation (r10) — the 30
        # spliced staged queries + the adaptive-bits dial queries
        # (changed-since-green) + stalest-green fill per
        # via_spark.rotation.suggested_full_head; enforced by
        # tests/test_properties.py ---
        "acf_daily_counts": timeseries.acf_daily_counts,
        "attribution_last_touch": asof.attribution_last_touch,
        "attribution_linear_window": asof.attribution_linear_window,
        "benford_digit_audit": stats.benford_digit_audit,
        "conversion_lag_profile": asof.conversion_lag_profile,
        "dup_cluster_size_histogram": graph.dup_cluster_size_histogram,
        "fano_burstiness_by_type": timeseries.fano_burstiness_by_type,
        "fd_histogram": stats.fd_histogram,
        "forecast_baseline_backtest": timeseries.forecast_baseline_backtest,
        "gini_token_concentration": textstats.gini_token_concentration,
        "good_turing_unseen_mass": textstats.good_turing_unseen_mass,
        "hhi_source_concentration": textstats.hhi_source_concentration,
        "iqr_outlier_report": stats.iqr_outlier_report,
        "ks_two_sample_drift": timeseries.ks_two_sample_drift,
        "lsh_density_outliers": dedup.lsh_density_outliers,
        "mann_whitney_drift": timeseries.mann_whitney_drift,
        "markov_next_event_accuracy": timeseries.markov_next_event_accuracy,
        "poisson_bootstrap_ci": stats.poisson_bootstrap_ci,
        "quantization_error_report": vector.quantization_error_report,
        "rake_keyphrases": textstats.rake_keyphrases,
        "ranker_overlap_report": search.ranker_overlap_report,
        "retrieval_ndcg_report": vector.retrieval_ndcg_report,
        "runs_test_randomness": timeseries.runs_test_randomness,
        "semantic_contamination": vector.semantic_contamination,
        "session_survival_curve": windows.session_survival_curve,
        "sorted_neighborhood_pairs": curation.sorted_neighborhood_pairs,
        "spearman_length_vocab": textstats.spearman_length_vocab,
        "stl_decompose_daily": timeseries.stl_decompose_daily,
        "surprisal_filter_yield": textstats.surprisal_filter_yield,
        "t_closeness_audit": curation.t_closeness_audit,
        "hybrid_rrf": search.hybrid_rrf,
        "neardup_embedding_pairs": dedup.neardup_embedding_pairs,
        "embedding_neardup_clusters": graph.embedding_neardup_clusters,
        "ann_lsh_topk": dedup.ann_lsh_topk,
        "dedup_family_compare": graph.dedup_family_compare,
        "neardup_motif_report": graph.neardup_motif_report,
        "rhythm_baseline_stats": _rhythm_baseline_stats,
        "rhythm_recent_counts": _rhythm_recent_counts,
        "semdedup_assignments": vector.semdedup_assignments,
        "tier1_view": _tier1_view,
        "cube_order_counts": timeseries.cube_order_counts,
        "customer_order_distribution": relational.customer_order_distribution,
        "distinctive_terms_by_source": textstats.distinctive_terms_by_source,
        "embedding_centroids_by_label": vector.embedding_centroids_by_label,
        "embedding_norm_stats": vector.embedding_norm_stats,
        "event_type_severity_pivot": relational.event_type_severity_pivot,
        "event_type_transition_matrix": timeseries.event_type_transition_matrix,
        "event_type_unpivot": relational.event_type_unpivot,
        "events_profile": relational.events_profile,
        "gapfill_locf": timeseries.gapfill_locf,
        # --- end head (position 50 boundary) --- tail: driver-green
        # with implementing units and oracles unchanged since their
        # newest green row (unit-granular, git-derived); all re-proven
        # every round by tests/test_oracle_parity.py ---
        "large_orders_having": relational.large_orders_having,
        "lineitem_rollup": relational.lineitem_rollup,
        "local_supplier_volume": relational.local_supplier_volume,
        "mad_outliers": stats.mad_outliers,
        "min_cost_supplier": relational.min_cost_supplier,
        "moving_avg_daily": timeseries.moving_avg_daily,
        "audio_segment_plan": multimodal.audio_segment_plan,
        "bigram_lm_perplexity": textstats.bigram_lm_perplexity,
        "bpe_merge_table": textstats.bpe_merge_table,
        "cusum_changepoints": timeseries.cusum_changepoints,
        "disjunctive_revenue": relational.disjunctive_revenue,
        "distinct_ngram_diversity": textstats.distinct_ngram_diversity,
        "dsir_importance_weights": curation.dsir_importance_weights,
        "embedding_separability_report": vector.embedding_separability_report,
        "ewma_daily_counts": timeseries.ewma_daily_counts,
        "excess_shippers": relational.excess_shippers,
        "gopher_rule_audit": curation.gopher_rule_audit,
        "hll_distinct_report": sketch.hll_distinct_report,
        "hll_union_report": sketch.hll_union_report,
        "holt_linear_forecast": timeseries.holt_linear_forecast,
        "incremental_span_pairs": dedup.incremental_span_pairs,
        "interval_overlap_pairs": windows.interval_overlap_pairs,
        "k_anonymity_audit": curation.k_anonymity_audit,
        "l_diversity_audit": curation.l_diversity_audit,
        "late_only_suppliers": relational.late_only_suppliers,
        "linear_interp_gapfill": timeseries.linear_interp_gapfill,
        "hypertable_rollup": windows.hypertable_rollup,
        "pagerank_event_types": graph.pagerank_event_types,
        "pareto_frontier_parts": relational.pareto_frontier_parts,
        "phash_dup_clusters": graph.phash_dup_clusters,
        "phash_dup_pairs": multimodal.phash_dup_pairs,
        "retrieval_mrr_report": vector.retrieval_mrr_report,
        "returnflag_priority_counts": relational.returnflag_priority_counts,
        "knn_batch_topk": vector.knn_batch_topk,
        "shared_span_pairs": dedup.shared_span_pairs,
        "span_dup_token_stats": dedup.span_dup_token_stats,
        "span_scrub_plan": dedup.span_scrub_plan,
        "theil_sen_trend": timeseries.theil_sen_trend,
        "tokenizer_fertility_by_source": textstats.tokenizer_fertility_by_source,
        "dedup_keep_best": graph.dedup_keep_best,
        "global_value_rank": rank.global_value_rank,
        "per_day_topk": relational.per_day_topk,
        "range_containment_join": windows.range_containment_join,
        "session_hash_counts": windows.session_hash_counts,
        "above_p95_events": stats.above_p95_events,
        "hourly_rate_of_change": timeseries.hourly_rate_of_change,
        "behavior_trigrams": timeseries.behavior_trigrams,
        "hourly_value_p95": timeseries.hourly_value_p95,
        "leakage_safe_split": curation.leakage_safe_split,
        "near_duplicate_rate_by_source": graph.near_duplicate_rate_by_source,
        "fuzzy_name_pairs": curation.fuzzy_name_pairs,
        "repetition_scores": textstats.repetition_scores,
        "newest_events": relational.newest_events,
        "order_priority_counts": relational.order_priority_counts,
        "pricing_summary": relational.pricing_summary,
        "promo_revenue": relational.promo_revenue,
        "props_json_stats": relational.props_json_stats,
        "purchase_intervals": timeseries.purchase_intervals,
        "referential_audit": relational.referential_audit,
        "repeat_buyers": relational.repeat_buyers,
        "rolling_7d_active_users": timeseries.rolling_7d_active_users,
        "salted_event_type_counts": relational.salted_event_type_counts,
        "severity_set_concat": relational.severity_set_concat,
        "shipping_priority": relational.shipping_priority,
        "sliding_hash_counts": windows.sliding_hash_counts,
        "source_mix_allocation": curation.source_mix_allocation,
        "tfidf_top_terms": search.tfidf_top_terms,
        "ann_recall_report": dedup.ann_recall_report,
        "bloom_semi_join_fpr": sketch.bloom_semi_join_fpr,
        "bloom_sizing_curve": sketch.bloom_sizing_curve,
        "boilerplate_span_audit": curation.boilerplate_span_audit,
        "char_entropy_bits": textstats.char_entropy_bits,
        "cm_frequency_report": sketch.cm_frequency_report,
        "containment_dedup_pairs": dedup.containment_dedup_pairs,
        "contingency_chi2": stats.contingency_chi2,
        "cooccurrence_lift": timeseries.cooccurrence_lift,
        "customer_rfm_segments": relational.customer_rfm_segments,
        "daily_trend_slopes": timeseries.daily_trend_slopes,
        "dedup_token_budget": graph.dedup_token_budget,
        "doc_length_p95_by_source": textstats.doc_length_p95_by_source,
        "gram_novelty_by_doc": dedup.gram_novelty_by_doc,
        "greedy_pack_stats": rank.greedy_pack_stats,
        "half_life_decay_counts": timeseries.half_life_decay_counts,
        "hash_sample_quantile_report": sketch.hash_sample_quantile_report,
        "hour_of_week_profile": timeseries.hour_of_week_profile,
        "ingest_reject_reasons": schema_infer.ingest_reject_reasons,
        "interarrival_profile": timeseries.interarrival_profile,
        "join_output_planner": stats.join_output_planner,
        "kmv_distinct_report": sketch.kmv_distinct_report,
        "kmv_retention_overlap": sketch.kmv_retention_overlap,
        "kmv_rolling_distinct": sketch.kmv_rolling_distinct,
        "lang_metadata_confusion": textstats.lang_metadata_confusion,
        "length_quality_heatmap": curation.length_quality_heatmap,
        "matryoshka_recall_report": vector.matryoshka_recall_report,
        "minhash_jaccard_calibration": dedup.minhash_jaccard_calibration,
        "multimodal_resize_plan": multimodal.multimodal_resize_plan,
        "neardup_quality_confound": curation.neardup_quality_confound,
        "oov_rate_documents": textstats.oov_rate_documents,
        "prefix_dup_groups": dedup.prefix_dup_groups,
        "repeated_span_scrub": curation.repeated_span_scrub,
        "seasonal_zscore_outliers": timeseries.seasonal_zscore_outliers,
        "ship_lag_profile": stats.ship_lag_profile,
        "source_marginal_utility": dedup.source_marginal_utility,
        "source_overlap_matrix": dedup.source_overlap_matrix,
        "source_repeat_factors": curation.source_repeat_factors,
        "temperature_mixture_weights": curation.temperature_mixture_weights,
        "token_shard_spans": rank.token_shard_spans,
        "truncation_loss_by_source": rank.truncation_loss_by_source,
        "user_activity_entropy": timeseries.user_activity_entropy,
        "user_state_intervals": windows.user_state_intervals,
        "value_drift_tvd": stats.value_drift_tvd,
        "vocab_growth_curve": dedup.vocab_growth_curve,
        "weighted_doc_sample": curation.weighted_doc_sample,
        "weighted_sample_per_source": curation.weighted_sample_per_source,
        "winsorized_stats": stats.winsorized_stats,
        "zorder_layout_report": rank.zorder_layout_report,
        "user_sessions": windows.user_sessions,
        "value_histogram": timeseries.value_histogram,
        "value_percentiles": stats.value_percentiles,
        "weekly_active_users": timeseries.weekly_active_users,
        "ann_ivf_topk": dedup.ann_ivf_topk,
        "active_rules_projection": control.active_rules_projection,
        "benchmark_contamination": curation.benchmark_contamination,
        "bgl_roundtrip": schema_infer.bgl_roundtrip,
        "bm25_topk": search.bm25_topk,
        "curation_funnel": curation.curation_funnel,
        "dedup_clusters": graph.dedup_clusters,
        "dedup_minhash_pairs": dedup.dedup_minhash_pairs,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "dedup_simhash_pairs": dedup.dedup_simhash_pairs,
        "doc_fingerprint": textstats.doc_fingerprint,
        "doc_quality_scores": textstats.doc_quality_scores,
        "forensic_clusters_text": forensic.cluster_search,
        "forensic_clusters_zero_vector": forensic.cluster_search_zero_vector,
        "forensic_triage": forensic.triage,
        "fulltext_match_documents": relational.fulltext_match_documents,
        "grouped_knn_top1": vector.grouped_knn_top1,
        "json_payload_shaping": relational.json_payload_shaping,
        "keyword_filter_customers": relational.keyword_filter_customers,
        "knn_cosine_topk": vector.knn_cosine_topk,
        "lang_id_documents": textstats.lang_id_documents,
        "live_tail_documents": relational.live_tail_documents,
        "malformed_filter_events": relational.malformed_filter_events,
        "multimodal_features": multimodal.multimodal_features,
        "normalize_documents": textstats.normalize_documents,
        "otel_roundtrip": schema_infer.otel_roundtrip,
        "pii_scrub_documents": curation.pii_scrub_documents,
        "promotion_rollup": promote.promotion_rollup_flat,
        "quality_deciles": curation.quality_deciles,
        "rhythm_anomalies": _rhythm_anomalies,
        "rhythm_frequency_sensitive": _rhythm_frequency,
        "rhythm_novelty_small_baseline": _rhythm_novelty,
        "severity_histogram": relational.severity_histogram,
        "simhash_documents": vector.simhash_documents,
        "stratified_sample": curation.stratified_sample,
        "suppressed_anomalies": control.suppressed_anomalies,
        "time_range_orders": relational.time_range_orders,
        "token_count_documents": textstats.token_count_documents,
        "video_frame_sample": multimodal.video_frame_sample,
        "asof_last_purchase": asof.asof_last_purchase,
        "bigram_top_terms": textstats.bigram_top_terms,
        "brand_supplier_counts": relational.brand_supplier_counts,
        "char_trigram_profile": textstats.char_trigram_profile,
        "cohort_retention": timeseries.cohort_retention,
        "conversion_funnel": timeseries.conversion_funnel,
        "retrieval_label_precision": vector.retrieval_label_precision,
        "revenue_concentration": relational.revenue_concentration,
        "token_budget_shards": rank.token_budget_shards,
        "chunk_documents": textstats.chunk_documents,
        "value_quantile_normalized": rank.value_quantile_normalized,
        "label_drift_report": timeseries.label_drift_report,
        "chunk_bm25_topk": search.chunk_bm25_topk,
        "source_rebalanced_sample": curation.source_rebalanced_sample,
        "volume_shipping": relational.volume_shipping,
        "returned_item_report": relational.returned_item_report,
        "nation_market_share": relational.nation_market_share,
        "forensic_clusters_windowed": forensic.clusters_windowed,
        "dup_ngram_stats": textstats.dup_ngram_stats,
        "incremental_minhash_pairs": dedup.incremental_minhash_pairs,
        "unigram_surprisal_scores": textstats.unigram_surprisal_scores,
        "large_volume_customers": relational.large_volume_customers,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "top_supplier_revenue": relational.top_supplier_revenue,
        "dormant_high_balance_customers": relational.dormant_high_balance_customers,
        "profit_by_nation_year": relational.profit_by_nation_year,
        "readability_scores": textstats.readability_scores,
        "length_filtered_documents": textstats.length_filtered_documents,
        "centroid_similarity_matrix": vector.centroid_similarity_matrix,
        "corpus_shuffle_positions": rank.corpus_shuffle_positions,
        "mixture_interleave_positions": rank.mixture_interleave_positions,
        "column_correlation_matrix": stats.column_correlation_matrix,
        "per_source_cap_sample": curation.per_source_cap_sample,
        "value_zscore_by_type": stats.value_zscore_by_type,
        "join_key_skew_report": stats.join_key_skew_report,
        "daily_revenue_share": relational.daily_revenue_share,
        "rollup_region_nation_revenue": relational.rollup_region_nation_revenue,
        "orders_grouping_sets": relational.orders_grouping_sets,
        "timed_conversion_funnel": timeseries.timed_conversion_funnel,
        "daily_priority_percent_rank": stats.daily_priority_percent_rank,
        "event_type_share_drift_daily": timeseries.event_type_share_drift_daily,
        "embedding_drift_by_label": vector.embedding_drift_by_label,
        "hard_negatives": vector.hard_negatives,
        "length_bucketed_batches": rank.length_bucketed_batches,
        "curriculum_positions": rank.curriculum_positions,
        "recommend_average_vector": vector.recommend_average_vector,
        "lapsed_buyers": relational.lapsed_buyers,
        "ann_quantized_topk": vector.ann_quantized_topk,
        "dedup_exact": dedup.dedup_exact,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (tables pre-registered)."""
    return {
        "tier1_view": oracles.tier1_view_sql(),
        "rhythm_recent_counts": oracles.rhythm_recent_counts_sql(),
        "rhythm_baseline_stats": oracles.rhythm_baseline_stats_sql(),
        "rhythm_anomalies": oracles.rhythm_anomalies_sql(),
        "rhythm_novelty_small_baseline": oracles.rhythm_anomalies_sql(**_NOVELTY_VARIANT),
        "rhythm_frequency_sensitive": oracles.rhythm_anomalies_sql(**_FREQ_VARIANT),
        "promotion_rollup": oracles.promotion_rollup_sql(),
        "forensic_clusters_text": oracles.forensic_clusters_text_sql(),
        "forensic_clusters_zero_vector": oracles.forensic_clusters_zero_vector_sql(),
        "forensic_triage": oracles.forensic_triage_sql(),
        "knn_cosine_topk": oracles.knn_cosine_topk_sql(),
        "grouped_knn_top1": oracles.grouped_knn_top1_sql(),
        "recommend_average_vector": oracles.recommend_average_vector_sql(),
        "simhash_documents": oracles.simhash_documents_sql(),
        "bm25_topk": oracles.bm25_topk_sql(),
        "hybrid_rrf": oracles.hybrid_rrf_sql(),
        "dedup_exact": oracles.dedup_exact_sql(),
        "dedup_minhash_pairs": oracles.dedup_minhash_pairs_sql(),
        "dedup_ngram_jaccard": oracles.dedup_ngram_jaccard_sql(),
        "dedup_simhash_pairs": oracles.dedup_simhash_pairs_sql(),
        "neardup_embedding_pairs": oracles.neardup_embedding_pairs_sql(),
        "ann_lsh_topk": oracles.ann_lsh_topk_sql(),
        "ann_ivf_topk": oracles.ann_ivf_topk_sql(),
        "ann_quantized_topk": oracles.ann_quantized_topk_sql(),
        "dedup_clusters": oracles.dedup_clusters_sql(),
        "stratified_sample": oracles.stratified_sample_sql(),
        "quality_deciles": oracles.quality_deciles_sql(),
        "benchmark_contamination": oracles.benchmark_contamination_sql(),
        "pii_scrub_documents": oracles.pii_scrub_documents_sql(),
        "fuzzy_name_pairs": oracles.fuzzy_name_pairs_sql(),
        "curation_funnel": oracles.curation_funnel_sql(),
        "token_count_documents": oracles.token_count_documents_sql(),
        "doc_quality_scores": oracles.doc_quality_scores_sql(),
        "lang_id_documents": oracles.lang_id_documents_sql(),
        "doc_fingerprint": oracles.doc_fingerprint_sql(),
        "normalize_documents": oracles.normalize_documents_sql(),
        "repetition_scores": oracles.repetition_scores_sql(),
        "multimodal_features": oracles.multimodal_features_sql(),
        "video_frame_sample": oracles.video_frame_sample_sql(),
        "suppressed_anomalies": oracles.suppressed_anomalies_sql(),
        "active_rules_projection": oracles.active_rules_projection_sql(),
        "otel_roundtrip": oracles.otel_roundtrip_sql(),
        "bgl_roundtrip": oracles.bgl_roundtrip_sql(),
        "time_range_orders": oracles.time_range_orders_sql(),
        "keyword_filter_customers": oracles.keyword_filter_customers_sql(),
        "fulltext_match_documents": oracles.fulltext_match_documents_sql(),
        "live_tail_documents": oracles.live_tail_documents_sql(),
        "malformed_filter_events": oracles.malformed_filter_events_sql(),
        "severity_histogram": oracles.severity_histogram_sql(),
        "json_payload_shaping": oracles.json_payload_shaping_sql(),
        "newest_events": oracles.newest_events_sql(),
        "pricing_summary": oracles.pricing_summary_sql(),
        "shipping_priority": oracles.shipping_priority_sql(),
        "local_supplier_volume": oracles.local_supplier_volume_sql(),
        "order_priority_counts": oracles.order_priority_counts_sql(),
        "promo_revenue": oracles.promo_revenue_sql(),
        "salted_event_type_counts": oracles.salted_event_type_counts_sql(),
        "asof_last_purchase": oracles.asof_last_purchase_sql(),
        "event_type_severity_pivot": oracles.event_type_severity_pivot_sql(),
        "lineitem_rollup": oracles.lineitem_rollup_sql(),
        "per_day_topk": oracles.per_day_topk_sql(),
        "customer_order_distribution": oracles.customer_order_distribution_sql(),
        "min_cost_supplier": oracles.min_cost_supplier_sql(),
        "large_orders_having": oracles.large_orders_having_sql(),
        "brand_supplier_counts": oracles.brand_supplier_counts_sql(),
        "value_percentiles": oracles.value_percentiles_sql(),
        "mad_outliers": oracles.mad_outliers_sql(),
        "global_value_rank": oracles.global_value_rank_sql(),
        "sliding_hash_counts": oracles.sliding_hash_counts_sql(),
        "session_hash_counts": oracles.session_hash_counts_sql(),
        "hypertable_rollup": oracles.hypertable_rollup_sql(),
        "range_containment_join": oracles.range_containment_join_sql(),
        "hourly_rate_of_change": oracles.hourly_rate_of_change_sql(),
        "gapfill_locf": oracles.gapfill_locf_sql(),
        "moving_avg_daily": oracles.moving_avg_daily_sql(),
        "cube_order_counts": oracles.cube_order_counts_sql(),
        "value_histogram": oracles.value_histogram_sql(),
        "tfidf_top_terms": oracles.tfidf_top_terms_sql(),
        "repeat_buyers": oracles.repeat_buyers_sql(),
        "lapsed_buyers": oracles.lapsed_buyers_sql(),
        "event_type_unpivot": oracles.event_type_unpivot_sql(),
        "severity_set_concat": oracles.severity_set_concat_sql(),
        "referential_audit": oracles.referential_audit_sql(),
        "purchase_intervals": oracles.purchase_intervals_sql(),
        "conversion_funnel": oracles.conversion_funnel_sql(),
        "cohort_retention": oracles.cohort_retention_sql(),
        "weekly_active_users": oracles.weekly_active_users_sql(),
        "bigram_top_terms": oracles.bigram_top_terms_sql(),
        "char_trigram_profile": oracles.char_trigram_profile_sql(),
        "embedding_centroids_by_label": oracles.embedding_centroids_by_label_sql(),
        "knn_batch_topk": oracles.knn_batch_topk_sql(),
        "props_json_stats": oracles.props_json_stats_sql(),
        "dedup_keep_best": oracles.dedup_keep_best_sql(),
        "source_mix_allocation": oracles.source_mix_allocation_sql(),
        "embedding_norm_stats": oracles.embedding_norm_stats_sql(),
        "user_sessions": oracles.user_sessions_sql(),
        "rolling_7d_active_users": oracles.rolling_7d_active_users_sql(),
        "event_type_transition_matrix": oracles.event_type_transition_matrix_sql(),
        "events_profile": oracles.events_profile_sql(),
        "distinctive_terms_by_source": oracles.distinctive_terms_by_source_sql(),
        "near_duplicate_rate_by_source": oracles.near_duplicate_rate_by_source_sql(),
        "retrieval_label_precision": oracles.retrieval_label_precision_sql(),
        "revenue_concentration": oracles.revenue_concentration_sql(),
        "token_budget_shards": oracles.token_budget_shards_sql(),
        "chunk_documents": oracles.chunk_documents_sql(),
        "value_quantile_normalized": oracles.value_quantile_normalized_sql(),
        "label_drift_report": oracles.label_drift_report_sql(),
        "chunk_bm25_topk": oracles.chunk_bm25_topk_sql(),
        "source_rebalanced_sample": oracles.source_rebalanced_sample_sql(),
        "volume_shipping": oracles.volume_shipping_sql(),
        "returned_item_report": oracles.returned_item_report_sql(),
        "nation_market_share": oracles.nation_market_share_sql(),
        "forensic_clusters_windowed": oracles.forensic_clusters_windowed_sql(),
        "dup_ngram_stats": oracles.dup_ngram_stats_sql(),
        "incremental_minhash_pairs": oracles.incremental_minhash_pairs_sql(),
        "unigram_surprisal_scores": oracles.unigram_surprisal_scores_sql(),
        "large_volume_customers": oracles.large_volume_customers_sql(),
        "small_quantity_revenue": oracles.small_quantity_revenue_sql(),
        "top_supplier_revenue": oracles.top_supplier_revenue_sql(),
        "dormant_high_balance_customers": oracles.dormant_high_balance_customers_sql(),
        "profit_by_nation_year": oracles.profit_by_nation_year_sql(),
        "readability_scores": oracles.readability_scores_sql(),
        "length_filtered_documents": oracles.length_filtered_documents_sql(),
        "centroid_similarity_matrix": oracles.centroid_similarity_matrix_sql(),
        "corpus_shuffle_positions": oracles.corpus_shuffle_positions_sql(),
        "mixture_interleave_positions": oracles.mixture_interleave_positions_sql(),
        "column_correlation_matrix": oracles.column_correlation_matrix_sql(),
        "per_source_cap_sample": oracles.per_source_cap_sample_sql(),
        "value_zscore_by_type": oracles.value_zscore_by_type_sql(),
        "join_key_skew_report": oracles.join_key_skew_report_sql(),
        "daily_revenue_share": oracles.daily_revenue_share_sql(),
        "rollup_region_nation_revenue": oracles.rollup_region_nation_revenue_sql(),
        "orders_grouping_sets": oracles.orders_grouping_sets_sql(),
        "behavior_trigrams": oracles.behavior_trigrams_sql(),
        "timed_conversion_funnel": oracles.timed_conversion_funnel_sql(),
        "above_p95_events": oracles.above_p95_events_sql(),
        "daily_priority_percent_rank": oracles.daily_priority_percent_rank_sql(),
        "event_type_share_drift_daily": oracles.event_type_share_drift_daily_sql(),
        "hourly_value_p95": oracles.hourly_value_p95_sql(),
        "embedding_drift_by_label": oracles.embedding_drift_by_label_sql(),
        "hard_negatives": oracles.hard_negatives_sql(),
        "leakage_safe_split": oracles.leakage_safe_split_sql(),
        "length_bucketed_batches": oracles.length_bucketed_batches_sql(),
        "curriculum_positions": oracles.curriculum_positions_sql(),
        "repeated_span_scrub": oracles.repeated_span_scrub_sql(),
        "temperature_mixture_weights": oracles.temperature_mixture_weights_sql(),
        "multimodal_resize_plan": oracles.multimodal_resize_plan_sql(),
        "half_life_decay_counts": oracles.half_life_decay_counts_sql(),
        "weighted_doc_sample": oracles.weighted_doc_sample_sql(),
        "source_repeat_factors": oracles.source_repeat_factors_sql(),
        "token_shard_spans": oracles.token_shard_spans_sql(),
        "neardup_quality_confound": oracles.neardup_quality_confound_sql(),
        "doc_length_p95_by_source": oracles.doc_length_p95_by_source_sql(),
        "source_overlap_matrix": oracles.source_overlap_matrix_sql(),
        "weighted_sample_per_source": oracles.weighted_sample_per_source_sql(),
        "minhash_jaccard_calibration": oracles.minhash_jaccard_calibration_sql(),
        "lang_metadata_confusion": oracles.lang_metadata_confusion_sql(),
        "boilerplate_span_audit": oracles.boilerplate_span_audit_sql(),
        "customer_rfm_segments": oracles.customer_rfm_segments_sql(),
        "embedding_neardup_clusters": oracles.embedding_neardup_clusters_sql(),
        "ingest_reject_reasons": oracles.ingest_reject_reasons_sql(),
        "oov_rate_documents": oracles.oov_rate_documents_sql(),
        "char_entropy_bits": oracles.char_entropy_bits_sql(),
        "greedy_pack_stats": oracles.greedy_pack_stats_sql(),
        "truncation_loss_by_source": oracles.truncation_loss_by_source_sql(),
        "prefix_dup_groups": oracles.prefix_dup_groups_sql(),
        "length_quality_heatmap": oracles.length_quality_heatmap_sql(),
        "ann_recall_report": oracles.ann_recall_report_sql(),
        "hour_of_week_profile": oracles.hour_of_week_profile_sql(),
        "user_activity_entropy": oracles.user_activity_entropy_sql(),
        "kmv_distinct_report": oracles.kmv_distinct_report_sql(),
        "bloom_semi_join_fpr": oracles.bloom_semi_join_fpr_sql(),
        "matryoshka_recall_report": oracles.matryoshka_recall_report_sql(),
        "user_state_intervals": oracles.user_state_intervals_sql(),
        "zorder_layout_report": oracles.zorder_layout_report_sql(),
        "kmv_retention_overlap": oracles.kmv_retention_overlap_sql(),
        "hash_sample_quantile_report": oracles.hash_sample_quantile_report_sql(),
        "value_drift_tvd": oracles.value_drift_tvd_sql(),
        "bloom_sizing_curve": oracles.bloom_sizing_curve_sql(),
        "cm_frequency_report": oracles.cm_frequency_report_sql(),
        "join_output_planner": oracles.join_output_planner_sql(),
        "contingency_chi2": oracles.contingency_chi2_sql(),
        "gram_novelty_by_doc": oracles.gram_novelty_by_doc_sql(),
        "source_marginal_utility": oracles.source_marginal_utility_sql(),
        "containment_dedup_pairs": oracles.containment_dedup_pairs_sql(),
        "winsorized_stats": oracles.winsorized_stats_sql(),
        "vocab_growth_curve": oracles.vocab_growth_curve_sql(),
        "cooccurrence_lift": oracles.cooccurrence_lift_sql(),
        "interarrival_profile": oracles.interarrival_profile_sql(),
        "dedup_token_budget": oracles.dedup_token_budget_sql(),
        "daily_trend_slopes": oracles.daily_trend_slopes_sql(),
        "kmv_rolling_distinct": oracles.kmv_rolling_distinct_sql(),
        "ship_lag_profile": oracles.ship_lag_profile_sql(),
        "seasonal_zscore_outliers": oracles.seasonal_zscore_outliers_sql(),
        "shared_span_pairs": oracles.shared_span_pairs_sql(),
        "phash_dup_pairs": oracles.phash_dup_pairs_sql(),
        "hll_distinct_report": oracles.hll_distinct_report_sql(),
        "span_dup_token_stats": oracles.span_dup_token_stats_sql(),
        "span_scrub_plan": oracles.span_scrub_plan_sql(),
        "retrieval_mrr_report": oracles.retrieval_mrr_report_sql(),
        "incremental_span_pairs": oracles.incremental_span_pairs_sql(),
        "hll_union_report": oracles.hll_union_report_sql(),
        "audio_segment_plan": oracles.audio_segment_plan_sql(),
        "disjunctive_revenue": oracles.disjunctive_revenue_sql(),
        "dsir_importance_weights": oracles.dsir_importance_weights_sql(),
        "ewma_daily_counts": oracles.ewma_daily_counts_sql(),
        "gopher_rule_audit": oracles.gopher_rule_audit_sql(),
        "excess_shippers": oracles.excess_shippers_sql(),
        "late_only_suppliers": oracles.late_only_suppliers_sql(),
        "returnflag_priority_counts": oracles.returnflag_priority_counts_sql(),
        "pagerank_event_types": oracles.pagerank_event_types_sql(),
        "k_anonymity_audit": oracles.k_anonymity_audit_sql(),
        "neardup_motif_report": oracles.neardup_motif_report_sql(),
        "bpe_merge_table": oracles.bpe_merge_table_sql(),
        "cusum_changepoints": oracles.cusum_changepoints_sql(),
        "semdedup_assignments": oracles.semdedup_assignments_sql(),
        "tokenizer_fertility_by_source": oracles.tokenizer_fertility_by_source_sql(),
        "phash_dup_clusters": oracles.phash_dup_clusters_sql(),
        "embedding_separability_report": oracles.embedding_separability_report_sql(),
        "dedup_family_compare": oracles.dedup_family_compare_sql(),
        "bigram_lm_perplexity": oracles.bigram_lm_perplexity_sql(),
        "distinct_ngram_diversity": oracles.distinct_ngram_diversity_sql(),
        "holt_linear_forecast": oracles.holt_linear_forecast_sql(),
        "interval_overlap_pairs": oracles.interval_overlap_pairs_sql(),
        "l_diversity_audit": oracles.l_diversity_audit_sql(),
        "linear_interp_gapfill": oracles.linear_interp_gapfill_sql(),
        "pareto_frontier_parts": oracles.pareto_frontier_parts_sql(),
        "theil_sen_trend": oracles.theil_sen_trend_sql(),
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
