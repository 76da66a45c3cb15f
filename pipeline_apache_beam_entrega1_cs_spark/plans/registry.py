"""Unified query registry: every operator from SURVEY.md §2 with its
Spark plan and (where SQL-expressible) DuckDB oracle. Consumed by
/root/repo/__spark_entry__.py (driver contract), tests/test_oracle.py,
and bench.py.

ORDER MATTERS: the driver's per-round correctness gate checks the FIRST
50 registry entries, so entries lacking a driver CORRECTNESS row are
listed first (DRIVER_PRIORITY). Local tests always run ALL entries
regardless of order. Per-round window history lives in
/root/repo/ROTATION.md; the real source of truth is DRIVER_PRIORITY
plus the CORRECTNESS_r{N}.json files — and since round 11 the window
composition is MECHANIZED: tests/test_rotation.py derives the
never-driver-checked set from CORRECTNESS_r*.json and fails if any
front slot is spent on an already-checked entry while a never-checked
one waits (the round-7/round-9 undercount failure mode, now CI-caught).

CURRENT WINDOW (round 11; r10 had zero failures): 50 of the 58
never-driver-checked round-10 late additions, execution-heaviest /
highest-risk first (the streaming twins, the 9 container parsers, the
statistical-inference entries, the graph family, and every entry whose
code changed this round: dq_key_gap_audit [gap aggs coalesce to 0],
graph_degree_assortativity / graph_clustering_coefficient /
analytics_apriori_pairs [shared _copurchase_* helpers],
multimodal_bmp_meta [strengthened rejection check]).

ROUND 12 CHORE: promote (a) any r11 failures; (b) the EIGHT deferred
round-10 entries (analytics_yoy_growth, analytics_pareto_share,
dq_outlier_iqr_fences, dq_reconciliation_totals,
interval_gap_extraction, dq_candidate_keys,
timeseries_interpolate_linear, dq_value_set_drift); (c) the TWENTY
round-11 additions, named in full (dq_error_burst_detector,
dedup_lsh_bucket_stats, text_gopher_quality_filters,
text_zipf_tail_fit, text_token_coverage_curve,
eval_brier_decomposition, agg_theil_sen_slope,
timeseries_changepoint_binary, analytics_interval_proration,
streaming_topk_state, eval_expected_calibration_error,
text_tokenizer_fertility, dedup_cosine_threshold_sweep,
multimodal_riff_chunk_index, pack_efficiency_report,
analytics_peak_concurrency, window_hampel_filter,
streaming_token_freq_state, timeseries_spectral_peak,
streaming_error_burst_state); (d) the
NINE bench-covered r04-only names (q3_shipping_priority,
q5_region_revenue, join_sort_merge, join_asof_events,
join_range_nonequi, agg_rollup, window_running_frames, topk_per_group,
ann_cosine_topk), closing the r04 back-fill; (e) back-fill with
r05-only entries, stalest/execution-heaviest first. 8 + 20 + 9 = 37
named entries, so (e) gets ~13 slots. tests/test_rotation.py enforces
(b)+(c) mechanically.
"""

from __future__ import annotations

from . import (
    analytics,
    curation,
    pipeline_ops,
    llm_data,
    relational,
    relational2,
    sql_modern,
    tpch,
    udf_surface,
    windows_batch,
)
from .spec import QuerySpec

DRIVER_PRIORITY: list[str] = [
    # --- streaming twins (foreachBatch state machinery — heaviest) ---
    "streaming_bottom_k_state",
    "streaming_markov_state",
    "streaming_countmin_state",
    # --- the 9 round-10 container parsers (byte-walk expression trees;
    # multimodal_bmp_meta's rejection check changed this round) ---
    "multimodal_tiff_meta",
    "multimodal_tar_index",
    "multimodal_jpeg_meta",
    "multimodal_zip_index",
    "multimodal_gif_meta",
    "multimodal_bmp_meta",
    "multimodal_webp_meta",
    "multimodal_mp4_box_index",
    "multimodal_png_chunk_index",
    # --- statistical inference (17-digit float strictness) ---
    "stat_welch_ttest",
    "stat_anova_f",
    "agg_spearman_corr",
    "agg_moments_skew_kurtosis",
    # --- graph family (code refactored this round: shared
    # _copurchase_* helpers) ---
    "graph_degree_assortativity",
    "graph_clustering_coefficient",
    "analytics_apriori_pairs",
    # --- embedding / eval ---
    "embedding_pca_power",
    "embedding_label_outliers",
    "eval_average_precision",
    "eval_model_gains_deciles",
    # --- heavy analytics ---
    "analytics_funnel_windowed",
    "analytics_rfm_segmentation",
    "analytics_cohort_ltv",
    "analytics_fifo_allocation",
    "analytics_markov_transitions",
    "analytics_dau_mau_stickiness",
    "geo_path_stats",
    # --- dedup / text ---
    "dedup_prefix_filter_join",
    "dedup_phonetic_soundex",
    "dedup_sentence_ccnet",
    "text_vocab_growth",
    "text_keyword_rake",
    # --- timeseries ---
    "timeseries_acf_lags",
    "timeseries_m4_downsample",
    "timeseries_rolling_regression",
    "join_bitemporal_asof",
    # --- DQ (dq_key_gap_audit's gap aggs coalesce to 0 this round) ---
    "dq_k_anonymity",
    "dq_l_diversity",
    "dq_chi2_categorical_drift",
    "dq_functional_dependency",
    "dq_key_gap_audit",
    # --- maintenance / dataset mechanics / sketch ---
    "maintenance_orphan_files",
    "maintenance_file_skipping_stats",
    "maintenance_clustering_depth",
    "dataset_split_group_aware",
    "sample_bottom_k_sketch",
    "agg_bloom_filter_stats",
]


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (
        relational,
        relational2,
        tpch,
        windows_batch,
        llm_data,
        udf_surface,
        curation,
        sql_modern,
        pipeline_ops,
        analytics,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)

    missing = [n for n in DRIVER_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY names not in registry: {missing}")

    ordered: dict[str, QuerySpec] = {n: merged[n] for n in DRIVER_PRIORITY}
    for name, spec in merged.items():  # already-driver-green entries
        if name not in ordered:
            ordered[name] = spec
    return ordered
