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

CURRENT WINDOW (round 15; r14 was 50/50 green): the pending set is
EMPTY (cumulative driver evidence reached 400/400 in r12), so the
window is pure staleness back-fill — byte-exactly the 50-entry
proposal `python -m …plans.rotation` printed at the start of the
round: the entire r07-stale class (the filtered/histogram/mode/
regression aggregates, ann_mmr_rerank, the as-of forward/nearest
joins, the BPE trio, the sink roundtrips, the sampling/split
utilities, and the rest listed below). Retiring all 50 moves the
staleness histogram's oldest class from r07 to r08 (the
monotone-shrink invariant, VERDICT r12 item 1). NO new registry
entries this round by design (optimization round): the window is
exactly 50 wide and the r07 class is exactly 50 deep.

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
    # ================= round-15 window =================
    # Pure r07-staleness back-fill (pending set is empty; this list is
    # byte-exactly the `plans.rotation` proposal computed at the start
    # of round 15 from CORRECTNESS_r01-r14 evidence).
    "agg_filtered_bool",
    "agg_histogram",
    "agg_mode_exact",
    "agg_regression_stats",
    "ann_mmr_rerank",
    "anomaly_zscore",
    "applyinpandas_trimmed_mean",
    "bitwise_functions",
    "correlated_subquery_orders",
    "dq_constraint_report",
    "explode_lateral",
    "filter_null_safe_eq",
    "funnel_conversion",
    "graph_triangle_count",
    "group_by_all_orders",
    "join_asof_forward",
    "join_asof_nearest",
    "join_shuffle_hash",
    "join_skew_salted",
    "lateral_topk_customers",
    "maintenance_zorder_layout",
    "mixture_by_source",
    "pandas_udf_scalar",
    "q10_returned_revenue",
    "recursive_month_spine",
    "resample_ohlc",
    "retention_cohorts",
    "rollup_time_hierarchy",
    "scd2_user_state",
    "sink_csv_roundtrip",
    "sink_jsonl_roundtrip",
    "sink_xml_roundtrip",
    "source_schema_evolution",
    "split_train_val_test",
    "stratified_sample_hash",
    "string_similarity",
    "text_bpe_apply",
    "text_bpe_fit",
    "text_bpe_token_count",
    "text_chunk_sliding",
    "text_decontaminate",
    "text_quality_model",
    "text_repetition_stats",
    "text_scrub_blocklist",
    "timeseries_gapfill",
    "udtf_order_installments",
    "upsert_changeset",
    "variant_functions",
    "window_range_frame",
    "window_value_navigation",
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
