#!/usr/bin/env python
"""Physical-plan audit: prints the scale-relevant plan properties of the
headline queries (pushdown, pruning, join strategies, exchange counts) as
a compact report. Regenerate EXPLAIN.md with:

    python explain_audit.py > EXPLAIN.md
"""

from __future__ import annotations

import contextlib
import io
import os
import re

# Round 13 (VERDICT r12 item 6): the audit covers the FULL registry —
# every entry gets a section, and any entry carrying plan_waivers has
# its waivers printed inline, so "every waiver has a matching EXPLAIN
# note" holds by construction. Hand-written adjudications for plans
# whose TEXT over-counts executed work stay in NOTES below.


# Caveats printed under an entry — for plans whose EXPLAIN text
# over-counts: a cached relation's subtree is re-printed at every
# reference, so entries that materialize a bounded frame (the MMR
# candidate/pair cache) show far more Exchanges in TEXT than execute.
NOTES = {
    "analytics_abc_xyz_matrix": (
        "exchange count is inflated by the two 1-row scalar attaches "
        "(month-count/total and max-revenue, the waived BNLJs) re-printed "
        "per reference; executed work is two rollups, the 256-bucket "
        "two-level prefix, and one final hash-agg (2.3 s at sf0.1, "
        "2.4x over 100x rows — SCALING.md round 12)"
    ),
    "embedding_matryoshka_eval": (
        "plan-TEXT inflation: the topk subtree is re-printed at each of "
        "its two consumers (per-dim lists and the dim-64 baseline) and "
        "the waived BNLJ is the broadcast query-panel attach re-printed "
        "per reference; an eager cache+release was tried and measured "
        "1.6x SLOWER than the double execution (docstring A/B)"
    ),
    "text_bpe_fit": (
        "the printed plan is a Union of three 1-row localCheckpoint "
        "scans: the round-16 pin rewrite materializes each merge "
        "round's winner and corpus form per invocation (inside the "
        "timed region — never across runs), so the pair-count work "
        "runs in the pin jobs the plan text cannot show; unpinned, "
        "round r re-embedded every prior round's pair-count subtree "
        "(measured 5.65-5.84 s -> 1.79-2.0 s at sf0.1 with the doc_id "
        "spread, OPTIMIZATION_r16.md)"
    ),
    "eval_kendall_tau_rankers": (
        "same double-reference shape as embedding_matryoshka_eval: the "
        "top-20 item list feeds both sides of the k^2-bounded pair "
        "self-join; BNLJ = the broadcast query-panel attach"
    ),
    "graph_sssp_weighted": (
        "cached-subtree inflation (see graph_bfs_levels): each "
        "Bellman-Ford round's dist frame is a cached materialization "
        "point — the round feeds the next twice (keep-min + relax), so "
        "an uncached lineage doubles per round"
    ),
    "graph_bfs_levels": (
        "cached-subtree inflation (see ann_mmr_rerank): each hop's "
        "frontier and the cumulative visited frame are cached Pregel "
        "materialization points (measured 2.1x at sf0.1 — SCALING.md); "
        "the plan text re-prints every cached lineage at each anti-join "
        "reference"
    ),
    "dedup_cross_source_overlap": (
        "cached-subtree inflation: the (fp, source) frame feeds three "
        "consumers from ONE cached evaluation (released after the "
        "190-row result materializes); the fingerprint aggregate "
        "combines map-side so the shuffle carries ~one row per document"
    ),
    "ann_mmr_rerank": (
        "counts above are inflated by cached-subtree re-prints; the "
        "retrieval stage executes ONCE into the k/m-bounded candidate/"
        "pair cache and the unrolled rounds reuse it (measured: cold "
        "7.6s->5.8s, warm 2.4s->1.5s at sf0.1 vs uncached — SCALING.md)"
    ),
    "ann_retrieval_pipeline": (
        "same cached-candidate inflation as ann_mmr_rerank; at runtime "
        "the IVF-PQ stage materializes once per query set and the MMR "
        "rounds run on the bounded cache. Since round 8 both MMR entries "
        "materialize their pick_rank*|queries|-row result eagerly and "
        "RELEASE the candidate/pair caches (ADVICE r7: no cache "
        "accumulation across invocations); the plan shown is the cached "
        "final frame over the full lineage"
    ),
    "eval_model_auc": (
        "plan-TEXT inflation: the quality-model scoring subtree is "
        "re-printed at each reference (per-score collapse + the 1-row "
        "bounds and 256-row bucket-base attaches — the waived BNLJs); "
        "executed work is one scoring pass, one per-distinct-score "
        "aggregate, and windows over the 256-bucket frame"
    ),
    "timeseries_survival_km": (
        "the BNLJ count is the waived 1-row observation-end and "
        "total-count scalar attaches re-printed per reference; the "
        "cumulative windows run over the #distinct-exit-days frame"
    ),
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries
    from pipeline_apache_beam_entrega1_cs_spark.session import get_spark

    spark = get_spark("explain-audit")
    registry = all_queries()

    print("# EXPLAIN audit — physical-plan properties of every registry entry")
    print()
    print(f"Generated by `python explain_audit.py` at `{sf_dir}`. For each")
    print("query: join strategies chosen, exchange (shuffle) count, filters")
    print("pushed into the parquet scan, columns actually read, and — for")
    print("entries carrying plan_waivers — the waiver text (the sanctioned")
    print("BNLJ / global-window uses the plan gates police).")
    print()
    print(f"Entries: {len(registry)} (full registry).")
    print()
    for name, spec in registry.items():
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        joins = {
            k: plan.count(k)
            for k in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                # nested-loop strategies are usually scale smells — count
                # them so a cartesian can't hide from the audit
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if plan.count(k)
        }
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        pushed_nonempty = [p for p in pushed if p.strip()]
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        print(f"## {name}")
        print(f"- joins: {joins or 'none'}")
        print(f"- shuffles (Exchange): {n_exchange}")
        if pushed_nonempty:
            print(f"- pushed filters: {len(pushed_nonempty)} scan(s), e.g. `{pushed_nonempty[0][:120]}`")
        else:
            print("- pushed filters: none (no scan-level predicates in this plan)")
        if schemas:
            cols = schemas[0].split(",")
            print(f"- first scan reads {len(cols)} column(s): `{schemas[0][:120]}`")
        for wk, wv in (spec.plan_waivers or {}).items():
            print(f"- waiver `{wk}`: {wv}")
        if name in NOTES:
            print(f"- note: {NOTES[name]}")
        print()


if __name__ == "__main__":
    main()
