"""Unified query registry: every operator from SURVEY.md §2 with its
Spark plan and (where SQL-expressible) DuckDB oracle. Consumed by
/root/repo/__spark_entry__.py (driver contract), tests/test_oracle.py,
and bench.py.

ORDER MATTERS: the driver's per-round correctness gate checks the first
50 registry entries, so entries that still lack a driver CORRECTNESS row
are listed first (DRIVER_PRIORITY). Round 1 checked the then-first 50
(all of relational + 12 of relational2); round 2 front-loads the fixed
q1 plus the TPC-H remainder, LLM-data, UDF-surface, windows/streaming,
and relational2 stragglers so they get driver rows; everything already
green in CORRECTNESS_r01 rides at the back. Local tests always run ALL
entries regardless of order.

ROUND 4 ROTATION (done): r01 ∪ r02 ∪ r03 covers every pre-round-4 entry;
the only red row was pack_token_budget (oracle HUGEINT typing, fixed).
The window now holds: the 12 entries with no driver row (pack re-check,
sample_seeded, agg_approx_percentile, and the nine round-4 additions
decile_stats_bucketed, streaming_stream_left_join,
streaming_foreach_batch_sink, streaming_rollup_upsert,
text_unigram_logprob, text_bigram_pmi, try_functions, key_skew_profile,
dataset_build_pipeline), the 3 entries whose rank columns moved
int->bigint this round, and 35 of the 49
entries whose only driver evidence is r01 (stalest-first refresh; also
re-covers the loader's NTZ-timestamp normalization on time-dependent
plans).

ROUND 5 ROTATION (done): r04 had zero failures, so the window holds
(a) entries added during round 5 itself (front), (b) the 14 r01-only
entries (six set ops, the seven scalar-function families, and
date_functions — the entries whose driver evidence predated the round-4
testdata timestamp re-encoding), (c) back-fill with r02-only entries,
time-dependent ones first (TPC-H date-filter queries, batch/streaming
windows, watermark dedup) since r02 evidence also predates that
re-encoding. Left out of the window: r02-only entries that are
rows-only by design (ann_lsh/ivf, dedup_minhash_lsh) or
timestamp-independent (multimodal meta, embedding ops) — stalest of
those rotate in round 6.

ROUND 6 ROTATION (done): r05 had zero failures, so the window holds
(a) the 26 round-6 additions (first session: multimodal_png_meta,
multimodal_byte_chisq, streaming_tfidf_state, ann_ivf_topk_det,
sample_fixed_k_per_stratum, graph_pagerank; second session:
dedup_span_ngram, join_bucketed, embedding_pq_codes,
streaming_curation_stats, multimodal_wav_meta, streaming_ivf_state,
maintenance_compact_small_files, agg_hll_partial_merge,
source_binary_files, graph_label_propagation, ann_pq_adc_topk,
ann_pq_ivf_adc_topk, text_bm25_topk, join_interval_overlap,
timeseries_ewma, text_feature_hashing, dq_split_leakage,
basket_brand_lift, source_custom_python, sql_udf_functions),
(b) all 19 r02-only
entries — the LLM-data dedup family, ANN, text ops, multimodal meta,
embedding_centroids, cogroup/mapinarrow — whose driver evidence was
three rounds old, (c) back-fill with 5 of the 48 r03-only entries,
streaming/UDF/sink/window surfaces first (the execution-path-heavy
ones). The second session's 20 additions displaced the last 20
back-fill names (pandas_udf_scalar, applyinpandas_trimmed_mean,
udtf_order_installments,
sink_csv_roundtrip, sink_jsonl_roundtrip, sink_xml_roundtrip,
q10_returned_revenue, window_range_frame, window_value_navigation,
join_asof_forward, join_shuffle_hash, join_skew_salted,
recursive_month_spine, lateral_topk_customers, group_by_all_orders,
correlated_subquery_orders, filter_null_safe_eq, explode_lateral,
variant_functions, bitwise_functions) past slot 50 — they rejoin the
round-7 back-fill.

ROUND 7 ROTATION (done): r06 had zero failures, so the window holds
(a) the 7 round-7 additions (text_bpe_apply, text_quality_model,
maintenance_zorder_layout, ann_mmr_rerank, text_bpe_fit,
join_asof_nearest, source_schema_evolution), (b) ALL 43 r03-only
entries — the 20 names the round-6 additions displaced past slot 50
plus the 23 analytics/scalar stragglers — so after this round no
entry's driver evidence is older than r04. 7 + 43 fill the window
exactly; three FURTHER round-7 additions (ann_retrieval_pipeline,
graph_link_prediction, sample_temperature_mixture) were deliberately
placed at slots 51-53 rather than displace promoted r03 entries, and
the planned r04 back-fill names (the three streaming sinks/joins,
parquet/ORC roundtrips, pack_token_budget, key_skew_profile) follow
them.

ROUND 8 ROTATION (done — final window composition verified against
CORRECTNESS_r01..r07): the 50-entry window holds exactly (a) the
EIGHTEEN round-8 additions (dq_distribution_drift,
dedup_binary_payload, agg_quantile_partial_merge,
streaming_token_accounting, streaming_quantile_state,
join_asof_tolerance, dedup_keep_best, sample_weighted_priority,
ann_truncated_rescore, join_pointintime_scd2, pattern_match_sequence,
streaming_pattern_match, pattern_match_runs, window_reset_cumsum,
dedup_containment, embedding_norm_profile, pipeline_observe_metrics,
dataset_shuffle_shards), (b) ALL TEN never-driver-checked round-7
additions (the previous revision of this note undercounted them as
three; VERDICT r7 flag #2 corrected the count) — two of which
(sample_temperature_mixture, graph_link_prediction) also changed
semantics this round per ADVICE r7, so their rows double as
regression evidence, (c) FOUR fourth-session additions (text_perplexity_backoff,
dedup_semantic_clusters, maintenance_incremental_manifest,
multimodal_pcm_frame_energy) — these took the slots originally
given to 4 r04-only entries (the three streaming sinks/joins,
dataset_build_pipeline), which rejoin the round-9 back-fill;
the session's two other additions (dedup_url_canonicalize,
text_pii_redact, both locally oracle-green at sf0.001 and sf0.01
plus spec-tested) wait for round 9, (d) the
EIGHTEEN late round-8 additions from the second and third sessions
(join_bloom_prefilter, join_dynamic_partition_pruning,
agg_bitmap_distinct, join_null_skew_split; graph_bfs_levels,
window_interval_coalesce, timeseries_anomaly_mad,
agg_countmin_heavy_hitters, eval_retrieval_metrics,
dedup_cross_source_overlap, sample_neyman_allocation,
window_max_drawdown, graph_sssp_weighted,
timeseries_forecast_backtest, dq_ks_bucketed,
multimodal_resize_plumbing, eval_langid_confusion,
maintenance_retention_ttl — all locally
oracle-green at sf0.001 and the sf0.01 gate SF).
18 + 10 + 4 + 18 = 50; the fourth-session revision swapped slice
(c), so the final window is 46 never-checked round-7/8 additions
from the first three sessions + the 4 never-checked fourth-session
additions.

ROUND 9 CHORE: rotate again — promote (a) any r08 failures, (b)
entries added during round 9 itself, (b2) the fourth-session
round-8 additions left past the window
(dedup_url_canonicalize, text_pii_redact,
agg_variance_partial_merge, graph_kcore_prune,
eval_score_calibration, multimodal_ahash_dedup,
embedding_standardize, graph_modularity_eval,
streaming_file_source_incremental, timeseries_cusum_drift,
dq_benford_check, text_code_detect, agg_covariance_matrix,
sample_poisson_bootstrap, streaming_cusum_state,
eval_ab_proportions, agg_group_entropy, text_readability,
multimodal_cdc_chunking, multimodal_audio_trim_bounds,
attribution_linear_touch, dq_referential_integrity,
timeseries_seasonal_residual, agg_gini_concentration,
dq_primary_key_uniqueness, dedup_boundary_stitch — TWENTY-SIX in
all, never driver-checked, all locally oracle-green at both SFs
and spec-tested),
(c) the FIFTY r04-only
entries left outside the round-8 window: the three streaming
sinks/joins + dataset_build_pipeline displaced by the fourth
session, plus agg_approx_distinct,
agg_approx_percentile, agg_basic_stats, agg_collect_sorted, agg_cube,
agg_distinct, agg_grouping_sets, agg_having, agg_min_max_by,
agg_percentiles, agg_rollup, ann_cosine_topk, cte_above_avg_nations,
decile_stats_bucketed, filter_project_nullsafe, join_anti,
key_skew_profile,
join_asof_events, join_broadcast_dim, join_full_outer,
join_left_outer, join_range_nonequi, join_right_outer, join_semi,
join_sort_merge, ntile_decile_stats, pack_token_budget,
pivot_flag_status, q3_shipping_priority, q5_region_revenue,
sample_seeded, scalar_subquery_parts, sink_orc_roundtrip,
sink_parquet_roundtrip, skew_salted_agg,
sort_limit_global, text_bigram_pmi, text_tfidf_top_terms,
text_unigram_logprob, topk_per_group, try_functions,
unpivot_order_metrics, window_distribution, window_lag_lead,
window_rank, window_running_frames;
(d) back-fill any remaining slots with r05-only entries,
stalest/execution-heaviest first.
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

# Front of the driver's 50-entry correctness window for round 8:
# round-8 additions first, then the TEN never-checked round-7 entries,
# then r04-only back-fill (execution-heaviest first). Everything
# fresher rides at the back. Each round-8 addition inserted at the
# front displaces the last back-fill name past slot 50 (trimmed names
# join the round-9 chore list in the module docstring).
DRIVER_PRIORITY: list[str] = [
    # --- fourth-session round-8 additions: the four execution-heavy
    # ones (LM-scoring join chain, kmeans + in-cluster pair join,
    # manifest-diff file I/O, binary PCM parsing) take the window slots
    # freed by dropping the four r04-backfill names (see (c) below);
    # the two narrow string-expression additions of the same session
    # (dedup_url_canonicalize, text_pii_redact — both spec-tested
    # beyond the oracle) wait for round 9 ---
    "text_perplexity_backoff",
    "dedup_semantic_clusters",
    "maintenance_incremental_manifest",
    "multimodal_pcm_frame_energy",
    # --- round-8 additions (never driver-checked) go here, front ---
    "dq_distribution_drift",
    "dedup_binary_payload",
    "agg_quantile_partial_merge",
    "streaming_token_accounting",
    "streaming_quantile_state",
    "join_asof_tolerance",
    "dedup_keep_best",
    "sample_weighted_priority",
    "ann_truncated_rescore",
    "join_pointintime_scd2",
    "pattern_match_sequence",
    "streaming_pattern_match",
    "pattern_match_runs",
    "window_reset_cumsum",
    "dedup_containment",
    "embedding_norm_profile",
    "pipeline_observe_metrics",
    "dataset_shuffle_shards",
    # --- the ten round-7 additions with no driver CORRECTNESS row;
    # sample_temperature_mixture and graph_link_prediction also changed
    # semantics this round (ADVICE r7 fixes), so their rows double as
    # regression evidence ---
    "ann_retrieval_pipeline",
    "graph_link_prediction",
    "sample_temperature_mixture",
    "source_json_permissive",
    "maintenance_partition_overwrite",
    "agg_hll_intersection",
    "agg_weighted_median",
    "window_running_distinct",
    "filter_not_in_null_trap",
    "timeseries_moving_median",
    # --- (c) r04-only back-fill: DROPPED in the fourth session — the
    # four names that sat here (streaming_foreach_batch_sink,
    # streaming_rollup_upsert, streaming_stream_left_join,
    # dataset_build_pipeline) have r04 driver evidence and give up
    # their slots to the four never-checked fourth-session additions
    # at the front; they rejoin the round-9 back-fill ---
    # --- the eighteen LATE round-8 additions (second + third session),
    # promoted into the window so NO registry entry is left without
    # driver evidence after r08; they displace the last EIGHTEEN r04
    # back-fill names (pack_token_budget, key_skew_profile,
    # sink_parquet_roundtrip,
    # sink_orc_roundtrip,
    # join_sort_merge,
    # join_broadcast_dim, join_left/right/full_outer, join_semi,
    # join_anti, join_range_nonequi, join_asof_events, skew_salted_agg,
    # q3_shipping_priority, q5_region_revenue, window_rank,
    # window_lag_lead — all stable many-times-green surfaces whose
    # re-check is the lowest-information slot use; they join the
    # round-9 back-fill, and q1/q3/q5 + the big joins stay
    # execution-covered by bench.py every round regardless) ---
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
    "maintenance_retention_ttl",
    # (pack_token_budget, key_skew_profile, sink_parquet_roundtrip,
    # sink_orc_roundtrip,
    # join_sort_merge,
    # join_broadcast_dim,
    # join_left_outer, join_right_outer, join_full_outer,
    # join_semi, join_anti, join_range_nonequi, join_asof_events,
    # skew_salted_agg, q3_shipping_priority, q5_region_revenue,
    # window_rank, window_lag_lead, window_distribution,
    # window_running_frames, topk_per_group,
    # agg_basic_stats, ann_cosine_topk, text_bigram_pmi, text_unigram_logprob,
    # text_tfidf_top_terms, agg_approx_percentile, agg_approx_distinct,
    # agg_collect_sorted, agg_min_max_by, agg_percentiles,
    # agg_grouping_sets, agg_having, agg_cube, agg_distinct, agg_rollup
    # trimmed past the window by the round-8 additions; they join the
    # round-9 back-fill)
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
