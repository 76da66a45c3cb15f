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

CURRENT WINDOW (round 9; r08 had zero failures): (a) the 26
never-driver-checked fourth-session round-8 additions, first; (b) the
24 round-9 additions — together they fill the window exactly, so the
planned r04-only back-fill slipped entirely to round 10 (never-checked
entries outrank stale-but-many-times-green re-checks; full list in
ROTATION.md).

ROUND 10 CHORE: promote (a) any r09 failures, (b) round-10 additions,
(c) the FIFTY r04-only entries (none got a round-9 slot),
execution-heaviest first: the three streaming sinks/joins,
dataset_build_pipeline, parquet/ORC roundtrips, pack_token_budget,
key_skew_profile, the join family, then windows/aggs (full list in
ROTATION.md round-9 section); (d) back-fill with r05-only entries,
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

# Round-9 window: the 26 never-driver-checked fourth-session round-8
# additions first, then round-9 additions, then r04-only back-fill
# (execution-heaviest first). Each round-9 addition inserted in the
# middle displaces the last back-fill name past slot 50; trimmed names
# rejoin the round-10 back-fill (tracked in ROTATION.md).
DRIVER_PRIORITY: list[str] = [
    # --- (a) the 26 fourth-session round-8 additions, never
    # driver-checked; all locally oracle-green at sf0.001/sf0.01 ---
    "dedup_url_canonicalize",
    "text_pii_redact",
    "agg_variance_partial_merge",
    "graph_kcore_prune",
    "eval_score_calibration",
    "multimodal_ahash_dedup",
    "embedding_standardize",
    "graph_modularity_eval",
    "streaming_file_source_incremental",
    "timeseries_cusum_drift",
    "dq_benford_check",
    "text_code_detect",
    "agg_covariance_matrix",
    "sample_poisson_bootstrap",
    "streaming_cusum_state",
    "eval_ab_proportions",
    "agg_group_entropy",
    "text_readability",
    "multimodal_cdc_chunking",
    "multimodal_audio_trim_bounds",
    "attribution_linear_touch",
    "dq_referential_integrity",
    "timeseries_seasonal_residual",
    "agg_gini_concentration",
    "dq_primary_key_uniqueness",
    "dedup_boundary_stitch",
    # --- (b) round-9 additions (each displaces the last back-fill
    # name past slot 50; displaced names rejoin the round-10
    # back-fill, tracked in ROTATION.md) ---
    "streaming_url_dedup_state",
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
    "streaming_cdc_apply_state",
    "agg_weighted_percentile",
    "text_ngram_novelty",
    "eval_pr_curve_thresholds",
    "multimodal_npy_meta",
    "geo_bucket_join",
    "text_mojibake_fix",
    "analytics_dau_cumulative",
    # The window is full: 26 never-checked round-8 entries + the 24
    # round-9 additions above. The 25th round-9 addition
    # (streaming_freshness_state, below at slot 51) plus the entire
    # FIFTY-entry r04-only back-fill (streaming sinks/joins,
    # dataset_build_pipeline, sink roundtrips, pack_token_budget,
    # key_skew_profile, the join/window families — full list in
    # ROTATION.md) carry over to the round-10 window. q1/q3/q5,
    # join_sort_merge, join_asof_events and window_running_frames stay
    # execution-covered by bench.py every round regardless.
    "streaming_freshness_state",
    "timeseries_lttb_downsample",
    "agg_winsorized_mean",
    "pandas_udf_grouped_agg",
    "window_session_capped",
    "sample_systematic_interval",
    "dq_null_run_detector",
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
