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

CURRENT WINDOW (round 13; r12 was 50/50 green): the pending set is
EMPTY (cumulative driver evidence reached 400/400 in r12), so the
window is pure staleness back-fill — byte-exactly the 50-entry
proposal `python -m …plans.rotation` printed at the start of the
round: the entire r05-stale class (the five streaming-core entries,
dedup_minhash_banded, embedding_kmeans_lloyd, profile_documents, the
two multimodal profiles, the heavy TPC-H multi-join queries q8/q9/q21
plus the remaining sixteen TPC-H queries, the scalar-function
families, the set ops, and the three batch windows). Retiring all 50
moves the staleness histogram's oldest class from r05 to r06 (the
monotone-shrink invariant, VERDICT r12 item 1). NO new registry
entries this round by design: the window is exactly 50 wide and the
r05 class is exactly 50 deep — an addition would displace one.

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
    # ================= round-13 window =================
    # Pure r05-staleness back-fill (pending set is empty; this list is
    # byte-exactly the `plans.rotation` proposal computed at the start
    # of round 13 — execution-heaviest first within the class, the
    # order the r12 registry already encoded at slots 51+).
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
    "agg_approx_top_k",
    "agg_grouping_id",
    "array_functions",
    "conditional_functions",
    "curation_pipeline",
    "date_functions",
    "dedup_keyed_first",
    "higher_order_functions",
    "json_functions",
    "map_functions",
    "math_functions",
    "q11_important_parts",
    "q12_priority_shipping",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q20_heavy_suppliers",
    "q22_inactive_customers",
    "q2_min_cost_supplier",
    "q4_late_shipments",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "set_except",
    "set_except_all",
    "set_intersect",
    "set_intersect_all",
    "set_union",
    "set_union_all",
    "string_functions",
    "window_session",
    "window_sliding",
    "window_tumbling",
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
