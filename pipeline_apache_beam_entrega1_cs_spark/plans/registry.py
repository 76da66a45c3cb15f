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

ROUND 3 ROTATION (done): CORRECTNESS_r01 ∪ r02 covers 99 entries, all
green. The 49 oracle-backed entries with no driver row yet fill slots
1-49; slot 50 is dedup_embedding_cosine_lsh (rows-only by design, but
first-class-graded with a local recall test). Left outside the window:
sample_seeded and agg_approx_percentile (rows-only, lowest marginal
evidence) and any entries added during round 3 itself.

ROUND 4 CHORE: after CORRECTNESS_r03 lands, rotate again — promote
(a) any r03 failures, (b) sample_seeded + agg_approx_percentile,
(c) every entry added in round 3 (they appear after the r02-green block
below), demote everything r03-green to the back.
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

# Front of the driver's 50-entry correctness window: the 49 oracle-backed
# entries with no CORRECTNESS_r01/r02 row, plus dedup_embedding_cosine_lsh
# (rows-only, slot 50). Everything driver-green rides at the back.
DRIVER_PRIORITY: list[str] = [
    # --- relational2.py stragglers past round 2's window ---
    "q10_returned_revenue",
    "string_similarity",
    "correlated_subquery_orders",
    "join_shuffle_hash",
    "filter_null_safe_eq",
    "sink_csv_roundtrip",
    "agg_filtered_bool",
    "agg_histogram",
    "bitwise_functions",
    "explode_lateral",
    "window_range_frame",
    "window_value_navigation",
    "pandas_udf_scalar",
    "join_asof_forward",
    "variant_functions",
    "sink_xml_roundtrip",
    "sink_jsonl_roundtrip",
    "agg_regression_stats",
    "agg_mode_exact",
    "streaming_sliding",
    "streaming_session",
    # --- llm_data round-2 additions ---
    "text_bpe_token_count",
    "multimodal_frame_sample",
    "embedding_quantize_int8",
    # --- udf_surface stragglers ---
    "applyinpandas_trimmed_mean",
    "udtf_order_installments",
    # --- curation.py ---
    "text_decontaminate",
    "text_scrub_blocklist",
    "text_chunk_sliding",
    "text_repetition_stats",
    # --- sql_modern.py stragglers ---
    "recursive_month_spine",
    "lateral_topk_customers",
    "group_by_all_orders",
    # --- pipeline_ops.py (dataset mechanics) ---
    "split_train_val_test",
    "pack_token_budget",
    "mixture_by_source",
    "upsert_changeset",
    "rollup_time_hierarchy",
    # --- analytics.py (all of it; stratified + triangle fixed this round) ---
    "funnel_conversion",
    "retention_cohorts",
    "timeseries_gapfill",
    "resample_ohlc",
    "scd2_user_state",
    "dq_constraint_report",
    "anomaly_zscore",
    "join_skew_salted",
    "ntile_decile_stats",
    "graph_triangle_count",
    "stratified_sample_hash",
    # --- slot 50: rows-only by design, first-class-graded dedup op ---
    "dedup_embedding_cosine_lsh",
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
