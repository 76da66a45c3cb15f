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

CURRENT WINDOW (round 16; r15 was 50/50 green): the pending set is
EMPTY (cumulative driver evidence reached 400/400 in r12), so the
window is pure staleness back-fill — byte-exactly the 50-entry
proposal `python -m …plans.rotation` printed at the start of the
round: the entire r08-stale class (the partial-merge/bitmap/countmin
aggregates, the ANN rescore/retrieval pair, the dedup governance
forms, the join asof/bloom/DPP/skew family, the pattern-match trio,
the r08 streaming entries, the timeseries robust-stats entries, and
the rest listed below). Retiring all 50 moves the staleness
histogram's oldest class from r08 to r09 (the monotone-shrink
invariant, VERDICT r12 item 1). NO new registry entries this round by
design (optimization round): the window is exactly 50 wide and the
r08 class is exactly 50 deep.

NEXT-ROUND CHORE: no longer hand-maintained prose (VERDICT r11 item 7
— the round-7/round-9 drift mode). It is COMPUTED from the same
CORRECTNESS_r*.json diff the rotation test enforces:

    python -m pipeline_apache_beam_entrega1_cs_spark.plans.rotation

prints the pending set, the staleness histogram, and a composed
window proposal. tests/test_rotation.py consumes the same helpers
(plans/rotation.py), so the chore text and the CI gate can never
disagree.
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
    # ================= round-16 window =================
    # Pure r08-staleness back-fill (pending set is empty; this list is
    # byte-exactly the `plans.rotation` proposal computed at the start
    # of round 16 from CORRECTNESS_r01-r15 evidence).
    "agg_bitmap_distinct",
    "agg_countmin_heavy_hitters",
    "agg_hll_intersection",
    "agg_quantile_partial_merge",
    "agg_weighted_median",
    "ann_retrieval_pipeline",
    "ann_truncated_rescore",
    "dataset_shuffle_shards",
    "dedup_binary_payload",
    "dedup_containment",
    "dedup_cross_source_overlap",
    "dedup_keep_best",
    "dedup_semantic_clusters",
    "dq_distribution_drift",
    "dq_ks_bucketed",
    "embedding_norm_profile",
    "eval_langid_confusion",
    "eval_retrieval_metrics",
    "filter_not_in_null_trap",
    "graph_bfs_levels",
    "graph_link_prediction",
    "graph_sssp_weighted",
    "join_asof_tolerance",
    "join_bloom_prefilter",
    "join_dynamic_partition_pruning",
    "join_null_skew_split",
    "join_pointintime_scd2",
    "maintenance_incremental_manifest",
    "maintenance_partition_overwrite",
    "maintenance_retention_ttl",
    "multimodal_pcm_frame_energy",
    "multimodal_resize_plumbing",
    "pattern_match_runs",
    "pattern_match_sequence",
    "pipeline_observe_metrics",
    "sample_neyman_allocation",
    "sample_temperature_mixture",
    "sample_weighted_priority",
    "source_json_permissive",
    "streaming_pattern_match",
    "streaming_quantile_state",
    "streaming_token_accounting",
    "text_perplexity_backoff",
    "timeseries_anomaly_mad",
    "timeseries_forecast_backtest",
    "timeseries_moving_median",
    "window_interval_coalesce",
    "window_max_drawdown",
    "window_reset_cumsum",
    "window_running_distinct",
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
