"""Unified query registry: every operator from SURVEY.md §2 with its
Spark plan and (where SQL-expressible) DuckDB oracle. Consumed by
/root/repo/__spark_entry__.py (driver contract), tests/test_oracle.py,
and bench.py.

ORDER MATTERS: the driver's per-round correctness gate checks the FIRST
50 registry entries, so entries lacking a driver CORRECTNESS row are
listed first (DRIVER_PRIORITY). Local tests always run ALL entries
regardless of order. Per-round window history lives in
/root/repo/ROTATION.md; the real source of truth is DRIVER_PRIORITY
plus the CORRECTNESS_r{N}.json files.

CURRENT WINDOW (round 10; r09 had zero failures): (a) the SEVEN
never-driver-checked round-9 late additions, named in full
(streaming_freshness_state, timeseries_lttb_downsample,
agg_winsorized_mean, pandas_udf_grouped_agg, window_session_capped,
sample_systematic_interval, dq_null_run_detector); (b) the TWO
round-10 additions (streaming_scd2_state, eval_dedup_quality); (c) 41
of the 50 r04-only entries, execution-heaviest first. The NINE r04
names left out are exactly the ones bench.py executes every round
(q3_shipping_priority, q5_region_revenue, join_sort_merge,
join_asof_events, join_range_nonequi, agg_rollup,
window_running_frames, topk_per_group, ann_cosine_topk) — after r10
they are the only entries with driver evidence older than r10.

ROUND 11 CHORE: promote (a) any r10 failures; (b) the FIFTY-EIGHT
round-10 late additions past slot 50, named in full
(multimodal_tiff_meta, dq_k_anonymity, geo_path_stats,
analytics_funnel_windowed, text_vocab_growth,
maintenance_orphan_files, dataset_split_group_aware,
analytics_rfm_segmentation, analytics_cohort_ltv,
multimodal_tar_index, eval_average_precision, sample_bottom_k_sketch,
streaming_bottom_k_state, timeseries_acf_lags,
timeseries_m4_downsample, dq_chi2_categorical_drift,
analytics_pareto_share, analytics_dau_mau_stickiness,
analytics_fifo_allocation, dedup_prefix_filter_join,
multimodal_jpeg_meta, agg_moments_skew_kurtosis,
multimodal_zip_index, dq_functional_dependency,
analytics_markov_transitions, embedding_label_outliers,
streaming_markov_state, dq_l_diversity, dq_reconciliation_totals,
dq_outlier_iqr_fences, stat_welch_ttest, stat_anova_f,
agg_spearman_corr, graph_degree_assortativity, multimodal_gif_meta,
multimodal_bmp_meta, multimodal_webp_meta, multimodal_mp4_box_index,
interval_gap_extraction, dq_candidate_keys,
maintenance_file_skipping_stats, streaming_countmin_state,
analytics_yoy_growth, dq_key_gap_audit,
graph_clustering_coefficient, text_keyword_rake,
multimodal_png_chunk_index, embedding_pca_power,
maintenance_clustering_depth, analytics_apriori_pairs,
timeseries_rolling_regression, join_bitemporal_asof,
eval_model_gains_deciles, dedup_phonetic_soundex,
dedup_sentence_ccnet, agg_bloom_filter_stats,
timeseries_interpolate_linear, dq_value_set_drift
— FIFTY-EIGHT entries (more than one full future window — rotate
over rounds 11 AND 12 if needed, never undercount), all locally
oracle-green; the round-7/round-9
undercount lesson: list every
never-checked entry explicitly); (c) round-11 additions,
also named in full; (d) the NINE bench-covered r04-only names above,
closing the r04 back-fill completely; (e) back-fill with r05-only
entries, stalest/execution-heaviest first (50 entries sit at r05 —
see the latest-round histogram check in ROTATION.md round-10).
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
    # --- (a) the 7 round-9 late additions, never driver-checked; all
    # locally oracle-green (r9 review's 307-entry sweep + this round's
    # full suite) ---
    "streaming_freshness_state",
    "timeseries_lttb_downsample",
    "agg_winsorized_mean",
    "pandas_udf_grouped_agg",
    "window_session_capped",
    "sample_systematic_interval",
    "dq_null_run_detector",
    # --- (b) round-10 additions ---
    "streaming_scd2_state",
    "eval_dedup_quality",
    # --- (c) 41 of the 50 r04-only entries, execution-heaviest first
    # (streaming sinks/joins, the composed dataset build, file-format
    # roundtrips, packing, skew profile, the join family, windows,
    # deciles, text corpus stats, the agg family, SQL-frontend forms,
    # then the cheap scans/filters). The 9 left out are bench-covered
    # every round; they lead the round-11 back-fill. ---
    "streaming_stream_left_join",
    "streaming_foreach_batch_sink",
    "streaming_rollup_upsert",
    "dataset_build_pipeline",
    "sink_parquet_roundtrip",
    "sink_orc_roundtrip",
    "pack_token_budget",
    "key_skew_profile",
    "join_broadcast_dim",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "skew_salted_agg",
    "window_rank",
    "window_lag_lead",
    "window_distribution",
    "ntile_decile_stats",
    "decile_stats_bucketed",
    "text_tfidf_top_terms",
    "text_unigram_logprob",
    "text_bigram_pmi",
    "agg_grouping_sets",
    "agg_cube",
    "agg_approx_distinct",
    "agg_approx_percentile",
    "agg_percentiles",
    "agg_min_max_by",
    "agg_basic_stats",
    "agg_collect_sorted",
    "agg_distinct",
    "agg_having",
    "cte_above_avg_nations",
    "scalar_subquery_parts",
    "pivot_flag_status",
    "unpivot_order_metrics",
    "filter_project_nullsafe",
    "sort_limit_global",
    "sample_seeded",
    "try_functions",
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
