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

ROUND 5 CHORE: rotate again — promote (a) any r04 failures, (b) the 14
r01-only entries left out this round (the six set ops and the
math/conditional/json/map/array/higher_order/string function families
plus date_functions),
(c) entries added during round 5 itself; back-fill with r02-only entries
(stalest remaining).
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
    # --- never driver-checked: the r03 red row (fix re-check) + the two
    # rows-only stragglers + both round-4 additions ---
    "pack_token_budget",
    "sample_seeded",
    "agg_approx_percentile",
    "decile_stats_bucketed",
    "streaming_stream_left_join",
    "streaming_foreach_batch_sink",
    "text_unigram_logprob",
    "text_bigram_pmi",
    "try_functions",
    "key_skew_profile",
    "dataset_build_pipeline",
    "streaming_rollup_upsert",
    # --- output type changed in round 4 (rank columns int -> bigint per
    # the BIGINT-scalars convention): re-verify under the driver hash ---
    "ann_cosine_topk",
    "ntile_decile_stats",
    "text_tfidf_top_terms",
    # --- stalest evidence: green in r01 only, unchecked since; also
    # re-covers the round-4 loader change (testdata timestamps became
    # parquet us/NTZ) on the time-dependent relational entries ---
    "q3_shipping_priority",
    "q5_region_revenue",
    "filter_project_nullsafe",
    "join_broadcast_dim",
    "join_sort_merge",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_range_nonequi",
    "join_asof_events",
    "agg_basic_stats",
    "agg_distinct",
    "agg_approx_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "window_rank",
    "window_lag_lead",
    "window_running_frames",
    "topk_per_group",
    "sort_limit_global",
    "pivot_flag_status",
    "unpivot_order_metrics",
    "scalar_subquery_parts",
    "cte_above_avg_nations",
    "join_right_outer",
    "agg_percentiles",
    "agg_collect_sorted",
    "agg_min_max_by",
    "skew_salted_agg",
    "window_distribution",
    "sink_parquet_roundtrip",
    "sink_orc_roundtrip",
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
