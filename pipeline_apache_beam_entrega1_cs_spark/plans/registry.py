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

CURRENT WINDOW (round 12; r11 was 50/50 hash-green): all 41
never-driver-checked entries (the 8 deferred round-10 names + the 20
round-11 additions + the 13 round-12 additions — the rotation test
forces them into the front block), then the NINE bench-covered
r04-only names (closing the r04 back-fill entirely). 41 + 9 = the full
50-slot window; the r05-stale back-fill names sit at slots 51+ and
lead the round-13 back-fill (the five r05 streaming entries,
minhash/kmeans, the heavy TPC-H multi-join queries).

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
    # ================= round-12 window =================
    # --- the 20 round-11 additions + 8 deferred round-10 entries:
    # never driver-checked (tests/test_rotation.py enforces that ALL
    # of these sit ahead of any already-checked entry). Heaviest /
    # highest-risk first: the 3 foreachBatch streaming twins, then
    # the two dedup-governance reports (dedup_cosine_threshold_sweep's
    # plan gains a per-block cap this round), the RIFF walk, the
    # tokenizer-governance family, eval/robust-stats, timeseries,
    # interval analytics, then the DQ reports. ---
    "streaming_topk_state",
    "streaming_token_freq_state",
    "streaming_error_burst_state",
    "dedup_cosine_threshold_sweep",
    "dedup_lsh_bucket_stats",
    "multimodal_riff_chunk_index",
    "pack_efficiency_report",
    "text_tokenizer_fertility",
    "text_token_coverage_curve",
    "text_gopher_quality_filters",
    "text_zipf_tail_fit",
    "eval_brier_decomposition",
    "eval_expected_calibration_error",
    "agg_theil_sen_slope",
    "timeseries_changepoint_binary",
    "timeseries_spectral_peak",
    "timeseries_interpolate_linear",
    "window_hampel_filter",
    "analytics_interval_proration",
    "analytics_peak_concurrency",
    "analytics_yoy_growth",
    "analytics_pareto_share",
    "interval_gap_extraction",
    "dq_error_burst_detector",
    "dq_outlier_iqr_fences",
    "dq_reconciliation_totals",
    "dq_candidate_keys",
    "dq_value_set_drift",
    # --- round-12 additions (never checked by construction; the
    # rotation test forces them into the front block) ---
    "text_kneser_ney_bigram",
    "curation_filter_ablation",
    "embedding_matryoshka_eval",
    "dedup_incremental_new_vs_base",
    "stat_mann_whitney_u",
    "stat_kruskal_wallis",
    "analytics_abc_xyz_matrix",
    "dq_out_of_order_audit",
    "dataset_content_fingerprint",
    "maintenance_analyze_column_stats",
    "pandas_udf_scalar_iter",
    "streaming_out_of_order_state",
    "eval_kendall_tau_rankers",
    # --- the NINE r04-only entries (bench-covered every round but
    # driver-stale since r04): closes the r04 back-fill ---
    "q3_shipping_priority",
    "q5_region_revenue",
    "join_sort_merge",
    "join_asof_events",
    "join_range_nonequi",
    "agg_rollup",
    "window_running_frames",
    "topk_per_group",
    "ann_cosine_topk",
    # --- r05-stale back-fill, execution-heaviest / non-bench-covered
    # first (round-12 additions displace from the END of this block;
    # displaced names rejoin the round-13 back-fill) ---
    "streaming_dedup_watermark",
    "streaming_neardup_dedup",
    "streaming_stateful_counter",
    "streaming_stream_join",
    "streaming_tumbling",
    "dedup_minhash_banded",
    "embedding_kmeans_lloyd",
    "profile_documents",
    "multimodal_byte_entropy",
    "multimodal_format_detect",
    "q9_product_profit",
    "q21_waiting_suppliers",
    "q8_market_share",
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
