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
    # ================= round-14 window =================
    # Pure r06-staleness back-fill (pending set is empty; this list is
    # byte-exactly the `plans.rotation` proposal computed at the start
    # of round 14 from CORRECTNESS_r01-r13 evidence).
    "agg_hll_partial_merge",
    "ann_ivf_topk",
    "ann_ivf_topk_det",
    "ann_lsh_topk",
    "ann_pq_adc_topk",
    "ann_pq_ivf_adc_topk",
    "basket_brand_lift",
    "cogroup_order_gaps",
    "dedup_components",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "dedup_exact",
    "dedup_hash",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_span_ngram",
    "dq_split_leakage",
    "embedding_centroids",
    "embedding_pq_codes",
    "embedding_quantize_int8",
    "graph_label_propagation",
    "graph_pagerank",
    "join_bucketed",
    "join_interval_overlap",
    "maintenance_compact_small_files",
    "mapinarrow_text_stats",
    "multimodal_binary_meta",
    "multimodal_byte_chisq",
    "multimodal_decode_fake",
    "multimodal_frame_sample",
    "multimodal_png_meta",
    "multimodal_wav_meta",
    "sample_fixed_k_per_stratum",
    "source_binary_files",
    "source_custom_python",
    "sql_udf_functions",
    "streaming_curation_stats",
    "streaming_ivf_state",
    "streaming_session",
    "streaming_sliding",
    "streaming_tfidf_state",
    "text_bm25_topk",
    "text_feature_hashing",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "text_winnow_sketch",
    "timeseries_ewma",
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
