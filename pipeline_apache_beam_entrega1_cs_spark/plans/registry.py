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

ROUND 3 CHORE: after CORRECTNESS_r02 lands, rotate again — demote every
newly-green name to the back and promote (a) any r02 failures, (b) the
relational2 stragglers past position 50, and (c) the round-2 additions
(join_asof_forward, sink_xml/jsonl_roundtrip, embedding_quantize_int8,
streaming_session, multimodal_frame_sample, agg_regression_stats,
agg_mode_exact, dedup_embedding_cosine_lsh, text_bpe_token_count,
applyinpandas_trimmed_mean, udtf_order_installments, variant_events,
text_decontaminate, text_scrub_blocklist, text_chunk_sliding,
text_repetition_stats, recursive_month_spine, lateral_topk_customers,
group_by_all_orders, split_train_val_test, pack_token_budget,
mixture_by_source, upsert_changeset, rollup_time_hierarchy) into the
first 50 slots.
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

# Front of the driver's 50-entry correctness window. q1 leads (its round-1
# hash failure is fixed and must be re-verified), then modules with zero
# driver rows, oracle-backed entries before rows-only ones where possible.
DRIVER_PRIORITY: list[str] = [
    "q1_pricing_summary",
    # --- tpch.py: the 15 TPC-H remainder shapes (all oracle-backed) ---
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_inactive_customers",
    # --- llm_data.py: dedup / similarity / text / multimodal suite ---
    "dedup_exact",
    "dedup_hash",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "dedup_components",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "text_token_stats",
    "text_lang_id",
    "text_quality",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "text_winnow_sketch",
    "embedding_centroids",
    "profile_documents",
    "curation_pipeline",
    "multimodal_binary_meta",
    "multimodal_decode_fake",
    # --- udf_surface.py ---
    "cogroup_order_gaps",
    "mapinarrow_text_stats",
    # --- windows_batch.py: batch time-windows + streaming twins ---
    "window_tumbling",
    "window_sliding",
    "window_session",
    "dedup_keyed_first",
    "streaming_tumbling",
    "streaming_stream_join",
    "streaming_stateful_counter",
    "streaming_dedup_watermark",
    # --- relational2.py stragglers (positions 48-50 land in round 2's
    #     window; the rest queue for round 3) ---
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q4_late_shipments",
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
    "agg_approx_percentile",
    "sample_seeded",
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
