#!/usr/bin/env python
"""Physical-plan audit: prints the scale-relevant plan properties of the
headline queries (pushdown, pruning, join strategies, exchange counts) as
a compact report. Regenerate EXPLAIN.md with:

    python explain_audit.py > EXPLAIN.md
"""

from __future__ import annotations

import contextlib
import io
import os
import re

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "filter_project_nullsafe",
    "join_broadcast_dim",
    "join_sort_merge",
    "join_shuffle_hash",
    "join_asof_events",
    "join_asof_forward",
    "window_running_frames",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine_lsh",
    "ann_cosine_topk",
    "string_similarity",
    "embedding_quantize_int8",
    "curation_pipeline",
    "text_decontaminate",
    "text_scrub_blocklist",
    "text_chunk_sliding",
    "text_repetition_stats",
    "recursive_month_spine",
    "lateral_topk_customers",
    "split_train_val_test",
    "pack_token_budget",
    "upsert_changeset",
    "rollup_time_hierarchy",
    "decile_stats_bucketed",
    "text_unigram_logprob",
    "text_bigram_pmi",
    "try_functions",
    "key_skew_profile",
    "q15_top_supplier",
    "multimodal_format_detect",
    "multimodal_byte_entropy",
    "embedding_kmeans_lloyd",
    "agg_approx_top_k",
    "dedup_minhash_banded",
    "multimodal_png_meta",
    "multimodal_byte_chisq",
    "dedup_span_ngram",
    "join_bucketed",
    "embedding_pq_codes",
    "multimodal_wav_meta",
    "graph_label_propagation",
    "maintenance_compact_small_files",
    "ann_pq_adc_topk",
    "ann_pq_ivf_adc_topk",
    "text_bm25_topk",
    "join_interval_overlap",
    "timeseries_ewma",
    "text_feature_hashing",
    "text_bpe_apply",
    "text_bpe_fit",
    "text_quality_model",
    "maintenance_zorder_layout",
    "ann_mmr_rerank",
    "join_asof_nearest",
    "source_schema_evolution",
    "ann_retrieval_pipeline",
    "dq_distribution_drift",
    "dedup_binary_payload",
    "agg_quantile_partial_merge",
    "join_asof_tolerance",
    "dedup_keep_best",
    "dedup_containment",
    "sample_weighted_priority",
    "ann_truncated_rescore",
    "join_pointintime_scd2",
    "pattern_match_sequence",
    "pattern_match_runs",
    "window_reset_cumsum",
    "embedding_norm_profile",
    "dataset_shuffle_shards",
    "join_bloom_prefilter",
    "join_dynamic_partition_pruning",
    "agg_bitmap_distinct",
    "join_null_skew_split",
    "graph_bfs_levels",
    "window_interval_coalesce",
    "timeseries_anomaly_mad",
    "agg_countmin_heavy_hitters",
    "eval_retrieval_metrics",
    "dedup_cross_source_overlap",
    "sample_neyman_allocation",
    "window_max_drawdown",
    "graph_sssp_weighted",
    "timeseries_forecast_backtest",
    "dq_ks_bucketed",
    "multimodal_resize_plumbing",
    "eval_langid_confusion",
    "text_perplexity_backoff",
    "dedup_url_canonicalize",
    "dedup_semantic_clusters",
    "text_pii_redact",
    "multimodal_pcm_frame_energy",
    "maintenance_incremental_manifest",
    "agg_variance_partial_merge",
    "graph_kcore_prune",
    "eval_score_calibration",
    "multimodal_ahash_dedup",
    "embedding_standardize",
    "graph_modularity_eval",
    "timeseries_cusum_drift",
    "dq_benford_check",
    "text_code_detect",
    "agg_covariance_matrix",
    "sample_poisson_bootstrap",
    "eval_ab_proportions",
    "agg_group_entropy",
    "text_readability",
    "multimodal_cdc_chunking",
    "multimodal_audio_trim_bounds",
    "attribution_linear_touch",
    "dq_referential_integrity",
    "timeseries_seasonal_residual",
    "agg_gini_concentration",
    # round-9 additions
    "cdc_apply_changelog",
    "maintenance_snapshot_diff",
    "scd2_build_from_changes",
    "dedup_typo_neighborhood",
    "eval_quality_agreement",
    "agg_mode_per_group",
    "dq_column_profile",
    "text_sentence_stats",
    "timeseries_survival_km",
    "dataset_curriculum_interleave",
    "eval_model_auc",
    "text_html_strip",
    "multimodal_base64_roundtrip",
    "dataset_kfold_splits",
    "dq_event_freshness",
    "agg_weighted_percentile",
    "text_ngram_novelty",
    "eval_pr_curve_thresholds",
    "multimodal_npy_meta",
    "geo_bucket_join",
    "text_mojibake_fix",
    "analytics_dau_cumulative",
    "timeseries_lttb_downsample",
    "agg_winsorized_mean",
    "eval_dedup_quality",
    "multimodal_tar_index",
    "analytics_rfm_segmentation",
    "text_vocab_growth",
    "geo_path_stats",
    # round-10 fifth-session additions (batch entries only — streaming
    # twins execute their stream on call, so their plan audit lives in
    # the batch sibling's row)
    "stat_welch_ttest",
    "stat_anova_f",
    "agg_spearman_corr",
    "graph_degree_assortativity",
    "multimodal_gif_meta",
    "multimodal_bmp_meta",
    "multimodal_webp_meta",
    "multimodal_mp4_box_index",
    "interval_gap_extraction",
    "dq_candidate_keys",
    "maintenance_file_skipping_stats",
    "analytics_yoy_growth",
    "dq_key_gap_audit",
    "graph_clustering_coefficient",
    "text_keyword_rake",
    "multimodal_png_chunk_index",
    "embedding_pca_power",
    "maintenance_clustering_depth",
    "analytics_apriori_pairs",
    "timeseries_rolling_regression",
    "join_bitemporal_asof",
    "eval_model_gains_deciles",
    "dedup_phonetic_soundex",
    "dedup_sentence_ccnet",
    "timeseries_interpolate_linear",
    "dq_value_set_drift",
    "agg_bloom_filter_stats",
    # round-10 families the round-10 VERDICT asked to add (item 6):
    # the container-parse folds (repartition barrier + bounded explode
    # must survive optimizer changes), the statistical one-agg
    # entries, and heavy round-10 analytics
    "multimodal_tiff_meta",
    "multimodal_tar_index",
    "multimodal_jpeg_meta",
    "multimodal_zip_index",
    "multimodal_gif_meta",
    "multimodal_bmp_meta",
    "multimodal_webp_meta",
    "multimodal_mp4_box_index",
    "multimodal_png_chunk_index",
    "multimodal_cdc_chunking",
    "stat_welch_ttest",
    "stat_anova_f",
    "agg_spearman_corr",
    "agg_moments_skew_kurtosis",
    "graph_degree_assortativity",
    "graph_clustering_coefficient",
    "analytics_apriori_pairs",
    "embedding_pca_power",
    "embedding_label_outliers",
    "dq_key_gap_audit",
    "eval_dedup_quality",
    "timeseries_rolling_regression",
    "join_bitemporal_asof",
    "eval_model_gains_deciles",
    # round-11 additions
    "dq_error_burst_detector",
    "dedup_lsh_bucket_stats",
    "text_gopher_quality_filters",
    "text_zipf_tail_fit",
    "text_token_coverage_curve",
    "eval_brier_decomposition",
    "agg_theil_sen_slope",
    "timeseries_changepoint_binary",
    "analytics_interval_proration",
    "timeseries_spectral_peak",
    "analytics_peak_concurrency",
    "window_hampel_filter",
    "dedup_cosine_threshold_sweep",
    "multimodal_riff_chunk_index",
    # round-12 extension (VERDICT r11 item 6): the remaining round-11
    # governance reports, the deferred round-10 entries now in the
    # driver window, the two grouped-pandas bench canaries, and the
    # three streaming read-offs (their fn() executes the stream, then
    # the audited plan is the bounded state read-off).
    "eval_expected_calibration_error",
    "text_tokenizer_fertility",
    "pack_efficiency_report",
    "analytics_yoy_growth",
    "analytics_pareto_share",
    "dq_outlier_iqr_fences",
    "dq_reconciliation_totals",
    "interval_gap_extraction",
    "dq_candidate_keys",
    "timeseries_interpolate_linear",
    "dq_value_set_drift",
    "applyinpandas_trimmed_mean",
    "cogroup_order_gaps",
    # round-12 additions
    "stat_mann_whitney_u",
    "stat_kruskal_wallis",
    "analytics_abc_xyz_matrix",
    "dq_out_of_order_audit",
    "dataset_content_fingerprint",
    "maintenance_analyze_column_stats",
    "text_kneser_ney_bigram",
    "curation_filter_ablation",
    "embedding_matryoshka_eval",
    "dedup_incremental_new_vs_base",
    "pandas_udf_scalar_iter",
    "eval_kendall_tau_rankers",
    "streaming_topk_state",
    "streaming_out_of_order_state",
    "streaming_token_freq_state",
    "streaming_error_burst_state",
]


# Caveats printed under an entry — for plans whose EXPLAIN text
# over-counts: a cached relation's subtree is re-printed at every
# reference, so entries that materialize a bounded frame (the MMR
# candidate/pair cache) show far more Exchanges in TEXT than execute.
NOTES = {
    "analytics_abc_xyz_matrix": (
        "exchange count is inflated by the two 1-row scalar attaches "
        "(month-count/total and max-revenue, the waived BNLJs) re-printed "
        "per reference; executed work is two rollups, the 256-bucket "
        "two-level prefix, and one final hash-agg (2.3 s at sf0.1, "
        "2.4x over 100x rows — SCALING.md round 12)"
    ),
    "embedding_matryoshka_eval": (
        "plan-TEXT inflation: the topk subtree is re-printed at each of "
        "its two consumers (per-dim lists and the dim-64 baseline) and "
        "the waived BNLJ is the broadcast query-panel attach re-printed "
        "per reference; an eager cache+release was tried and measured "
        "1.6x SLOWER than the double execution (docstring A/B)"
    ),
    "eval_kendall_tau_rankers": (
        "same double-reference shape as embedding_matryoshka_eval: the "
        "top-20 item list feeds both sides of the k^2-bounded pair "
        "self-join; BNLJ = the broadcast query-panel attach"
    ),
    "graph_sssp_weighted": (
        "cached-subtree inflation (see graph_bfs_levels): each "
        "Bellman-Ford round's dist frame is a cached materialization "
        "point — the round feeds the next twice (keep-min + relax), so "
        "an uncached lineage doubles per round"
    ),
    "graph_bfs_levels": (
        "cached-subtree inflation (see ann_mmr_rerank): each hop's "
        "frontier and the cumulative visited frame are cached Pregel "
        "materialization points (measured 2.1x at sf0.1 — SCALING.md); "
        "the plan text re-prints every cached lineage at each anti-join "
        "reference"
    ),
    "dedup_cross_source_overlap": (
        "cached-subtree inflation: the (fp, source) frame feeds three "
        "consumers from ONE cached evaluation (released after the "
        "190-row result materializes); the fingerprint aggregate "
        "combines map-side so the shuffle carries ~one row per document"
    ),
    "ann_mmr_rerank": (
        "counts above are inflated by cached-subtree re-prints; the "
        "retrieval stage executes ONCE into the k/m-bounded candidate/"
        "pair cache and the unrolled rounds reuse it (measured: cold "
        "7.6s->5.8s, warm 2.4s->1.5s at sf0.1 vs uncached — SCALING.md)"
    ),
    "ann_retrieval_pipeline": (
        "same cached-candidate inflation as ann_mmr_rerank; at runtime "
        "the IVF-PQ stage materializes once per query set and the MMR "
        "rounds run on the bounded cache. Since round 8 both MMR entries "
        "materialize their pick_rank*|queries|-row result eagerly and "
        "RELEASE the candidate/pair caches (ADVICE r7: no cache "
        "accumulation across invocations); the plan shown is the cached "
        "final frame over the full lineage"
    ),
    "eval_model_auc": (
        "plan-TEXT inflation: the quality-model scoring subtree is "
        "re-printed at each reference (per-score collapse + the 1-row "
        "bounds and 256-row bucket-base attaches — the waived BNLJs); "
        "executed work is one scoring pass, one per-distinct-score "
        "aggregate, and windows over the 256-bucket frame"
    ),
    "timeseries_survival_km": (
        "the BNLJ count is the waived 1-row observation-end and "
        "total-count scalar attaches re-printed per reference; the "
        "cumulative windows run over the #distinct-exit-days frame"
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries
    from pipeline_apache_beam_entrega1_cs_spark.session import get_spark

    spark = get_spark("explain-audit")
    registry = all_queries()

    print("# EXPLAIN audit — physical-plan properties of the headline queries")
    print()
    print(f"Generated by `python explain_audit.py` at `{sf_dir}`. For each")
    print("query: join strategies chosen, exchange (shuffle) count, filters")
    print("pushed into the parquet scan, and columns actually read.")
    print()
    for name in AUDIT:
        df = registry[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        joins = {
            k: plan.count(k)
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                # nested-loop strategies are usually scale smells — count
                # them so a cartesian can't hide from the audit
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if plan.count(k)
        }
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_nonempty = [p for p in pushed if p.strip()]
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        print(f"## {name}")
        print(f"- joins: {joins or 'none'}")
        print(f"- shuffles (Exchange): {n_exchange}")
        if pushed_nonempty:
            print(f"- pushed filters: {len(pushed_nonempty)} scan(s), e.g. `{pushed_nonempty[0][:120]}`")
        else:
            print("- pushed filters: none (no scan-level predicates in this plan)")
        if schemas:
            cols = schemas[0].split(",")
            print(f"- first scan reads {len(cols)} column(s): `{schemas[0][:120]}`")
        if name in NOTES:
            print(f"- note: {NOTES[name]}")
        print()


if __name__ == "__main__":
    main()
