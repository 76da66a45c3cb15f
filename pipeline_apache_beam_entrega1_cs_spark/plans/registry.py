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

ROUND 6 CHORE: rotate again — promote (a) any r05 failures, (b) the
r02-only entries left out this round (ann_lsh_topk, ann_ivf_topk,
cogroup_order_gaps, dedup_components, dedup_embedding_cosine,
dedup_minhash_lsh, dedup_ngram_jaccard, dedup_simhash,
embedding_centroids, mapinarrow_text_stats, multimodal_binary_meta,
multimodal_decode_fake, text_fingerprint, text_lang_id,
text_winnow_sketch, plus dedup_exact / dedup_hash / text_token_stats /
text_quality, which the round-5 additions pushed past slot 50),
(c) entries added during round 6 itself; back-fill with r03-only
entries (stalest remaining).
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

# Front of the driver's 50-entry correctness window for round 5:
# round-5 additions (inserted at the top as they land), then the 14
# entries whose only driver row is r01, then r02-only back-fill
# (time-dependent entries first). Everything fresher rides at the back.
DRIVER_PRIORITY: list[str] = [
    # --- round-5 additions: never driver-checked ---
    "streaming_neardup_dedup",
    "multimodal_format_detect",
    "multimodal_byte_entropy",
    "embedding_kmeans_lloyd",
    "agg_approx_top_k",
    "dedup_minhash_banded",
    "agg_grouping_id",
    # --- r01-only evidence: the six set ops + seven scalar-function
    # families + date_functions; all predate the round-4 testdata
    # timestamp re-encoding (nanos-long -> parquet us/NTZ) ---
    "date_functions",
    "set_union",
    "set_union_all",
    "set_intersect",
    "set_intersect_all",
    "set_except",
    "set_except_all",
    "string_functions",
    "math_functions",
    "conditional_functions",
    "json_functions",
    "map_functions",
    "array_functions",
    "higher_order_functions",
    # --- r02-only back-fill, time-dependent first: TPC-H date-filter
    # queries, batch/streaming windows, watermark dedup ---
    "q1_pricing_summary",
    "q4_late_shipments",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_shipping",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q20_heavy_suppliers",
    "q21_waiting_suppliers",
    "q22_inactive_customers",
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q13_customer_distribution",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "streaming_tumbling",
    "streaming_stream_join",
    "streaming_dedup_watermark",
    "streaming_stateful_counter",
    "dedup_keyed_first",
    # --- r02-only back-fill, timestamp-independent ---
    "curation_pipeline",
    "profile_documents",
    "dedup_exact",
    "dedup_hash",
    "text_token_stats",
    "text_quality",
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
