"""Scale-idiom demonstrations with plan-shape assertions: bucketed
co-located joins (no shuffle), broadcast joins (no fact-side exchange),
seeded sampling bounds, and the fidelity pipeline under Structured
Streaming."""

from __future__ import annotations

import io
import json
import contextlib
from collections import Counter

import pytest
from pyspark.sql import functions as F


def physical_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Tables bucketed on the join key co-locate: the join runs with NO
    Exchange on either side — the bucketing contract that turns a daily
    100 TB join into a shuffle-free merge."""
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    import shutil

    # DROP TABLE only clears the in-memory catalog; stale files from a
    # previous session make saveAsTable refuse the managed location.
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    for t in ("li_bucketed", "ord_bucketed"):
        shutil.rmtree(f"/tmp/spark_graft_warehouse/{t}", ignore_errors=True)
    load_table(spark, sf_dir, "lineitem").write.bucketBy(8, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").saveAsTable("li_bucketed")
    load_table(spark, sf_dir, "orders").write.bucketBy(8, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").saveAsTable("ord_bucketed")

    li = spark.table("li_bucketed")
    orders = spark.table("ord_bucketed").hint("merge")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
        "o_orderstatus"
    ).count()
    plan = physical_plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{join_section}"

    # and the result matches the unbucketed join
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(load_table(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .count()
    )
    assert Counter(map(tuple, joined.collect())) == Counter(map(tuple, plain.collect()))


def test_broadcast_join_no_fact_exchange(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import join_broadcast_dim

    plan = physical_plan(join_broadcast_dim(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    pre_agg = plan.split("HashAggregate")[0]
    assert "Exchange hashpartitioning" not in pre_agg


def test_sample_seeded_bounds(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import sample_seeded
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    n_total = load_table(spark, sf_dir, "lineitem").count()
    n_sample = sample_seeded(spark, sf_dir).count()
    assert 0.05 * n_total < n_sample < 0.2 * n_total
    # seeded => reproducible within a session/partitioning
    assert sample_seeded(spark, sf_dir).count() == n_sample


def test_auto_broadcast_without_hint(spark, sf_dir):
    """Catalyst must pick a broadcast join for an under-threshold dim on
    its own (autoBroadcastJoinThreshold) — no hint in this plan."""
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders")
    nation_cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    joined = orders.join(nation_cust, orders.o_custkey == nation_cust.c_custkey).groupBy(
        "c_nationkey"
    ).count()
    plan = physical_plan(joined)
    assert "BroadcastHashJoin" in plan, plan[:800]


def test_foreachbatch_sink(spark, sf_dir, tmp_path):
    """foreachBatch: the custom-sink escape hatch (idempotent writes by
    epoch at scale). Drain the events stream through it into parquet and
    compare counts with the batch source."""
    import uuid

    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table
    from pipeline_apache_beam_entrega1_cs_spark.streaming.windows import _stream_events

    out = str(tmp_path / "fb_out")
    stream = _stream_events(spark, sf_dir).select("event_id", "user_id", "value")

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(f"fb_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream did not drain within 120s"
    finally:
        q.stop()
    n_stream = spark.read.parquet(out).count()
    n_batch = load_table(spark, sf_dir, "events").count()
    assert n_stream == n_batch
    assert spark.read.parquet(out).select("event_id").distinct().count() == n_batch


def test_fidelity_pipeline_streaming(spark):
    """The reference ETL executed as a Structured Streaming job produces
    exactly the batch (= golden) result."""
    from pipeline_apache_beam_entrega1_cs_spark.fidelity.pipeline import (
        build_fidelity_df,
        build_fidelity_stream,
    )
    from pipeline_apache_beam_entrega1_cs_spark.streaming.windows import _drain

    glob = "/root/reference/input/*fan_engagement-000-of-001.json"
    csv = "/root/reference/input_side/country_data_v2.csv"
    stream_out = _drain(build_fidelity_stream(spark, glob, csv), "append")
    batch_out = build_fidelity_df(spark, glob, csv)

    def canon_rows(df):
        return Counter(
            json.dumps(r.asDict(recursive=True), sort_keys=True, ensure_ascii=False)
            for r in df.collect()
        )

    s, b = canon_rows(stream_out), canon_rows(batch_out)
    assert sum(s.values()) == 237
    assert s == b


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Partitioned fact + filtered dim join triggers DPP: the fact scan
    gets a runtime partition filter from the dim side, so only matching
    year-partitions are read — the difference between scanning 100 TB
    and scanning one year of it."""
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    fact_dir = str(tmp_path / "orders_by_year")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    # DPP inserts the runtime filter only when the build side has a
    # SELECTIVE predicate (bare isnotnull doesn't qualify), so filter
    # the dim the way a real "current period" dim lookup would.
    dim = spark.createDataFrame(
        [(1997, "pick"), (1900, "skip")], "d_year INT, tag STRING"
    ).filter(F.col("tag") == "pick")
    joined = fact.join(F.broadcast(dim), fact.o_year == dim.d_year).groupBy(
        "tag"
    ).agg(F.count(F.lit(1)).alias("n"))
    plan = physical_plan(joined)
    assert "dynamicpruning" in plan.lower(), f"no DPP in plan:\n{plan}"

    n = joined.collect()[0]["n"]
    expected = orders.filter(F.col("o_year") == 1997).count()
    assert n == expected


def test_runtime_bloom_filter_join(spark, sf_dir):
    """Runtime bloom-filter join pruning (the row-level sibling of DPP):
    for a sort-merge join with a selective dim-side filter, Spark builds
    a bloom filter from the dim keys and applies might_contain on the
    fact side BEFORE the shuffle — at 100 TB that drops non-matching
    fact rows at the scan instead of shuffling them. Enabled by default
    in Spark 4; the size thresholds only exist to skip it for toy
    inputs, so lower them to demonstrate the plan shape."""
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = physical_plan(joined)
        assert "bloom_filter_agg" in plan, f"no bloom build side:\n{plan[:2000]}"
        assert "might_contain" in plan, f"no bloom probe on the fact side:\n{plan[:2000]}"
        bloom_result = Counter(map(tuple, joined.collect()))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders").filter(
                F.col("o_orderpriority") == "1-URGENT"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert bloom_result == Counter(map(tuple, plain.collect()))


def test_observe_single_pass_metrics(spark, sf_dir):
    """df.observe(): pipeline quality metrics (row count, null count,
    revenue total) accumulated DURING the write action — no second scan.
    At 100 TB a separate metrics pass doubles the job; observe() makes
    it free."""
    from pyspark.sql import Observation

    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("gross"),
    )
    observed.write.format("noop").mode("overwrite").save()
    metrics = obs.get

    expected = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double").alias("g"),
    ).collect()[0]
    assert metrics["n_rows"] == expected["n"]
    assert metrics["null_qty"] == 0
    assert metrics["gross"] == expected["g"]


# Nodes a SinglePartition exchange's rows flow through unchanged in
# cardinality on their way to a consumer: if only these separate the
# exchange from a Window, every input row is sorted in ONE task — the
# global-window shape the gate exists to catch. Anything else (an
# aggregate, a join, another Exchange) re-shapes the data first.
_PASS_THROUGH_NODES = frozenset({
    "Sort", "Project", "Filter", "ColumnarToRow", "InputAdapter",
    "WholeStageCodegen", "AQEShuffleRead", "ShuffleQueryStage",
    "ReusedExchange", "Coalesce",
})


def _plan_tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """Parse the formatted plan's tree section into (indent_depth,
    node_name, node_id) in render order — parents render above their
    children at smaller indentation."""
    import re

    nodes = []
    for line in plan.splitlines():
        m = re.match(r"^([ :+|*-]*)([A-Za-z]\w*)[^(\n]*\((\d+)\)", line)
        if m:
            nodes.append((len(m.group(1)), m.group(2), int(m.group(3))))
    return nodes


def has_single_partition_window(plan: str) -> bool:
    """True iff a Window/WindowGroupLimit consumes an Exchange
    SinglePartition through pass-through nodes only — walking the tree
    section's ancestor chain, not the detail numbering (consecutive
    detail ids do not guarantee a consumer relationship: ADVICE r05)."""
    import re

    args_by_id: dict[int, str] = {}
    for m in re.finditer(r"^\((\d+)\) Exchange\b", plan, re.M):
        tail = plan[m.end(): m.end() + 500]
        am = re.search(r"^Arguments: (.*)$", tail, re.M)
        args_by_id[int(m.group(1))] = am.group(1) if am else ""
    if not args_by_id:
        return False
    nodes = _plan_tree_nodes(plan)
    for idx, (depth, name, nid) in enumerate(nodes):
        if name != "Exchange" or not args_by_id.get(nid, "").startswith(
            "SinglePartition"
        ):
            continue
        # ancestors: nearest preceding lines at strictly smaller depth
        d = depth
        for adepth, aname, _ in reversed(nodes[:idx]):
            if adepth >= d:
                continue
            d = adepth
            if aname in ("Window", "WindowGroupLimit"):
                return True
            if aname not in _PASS_THROUGH_NODES:
                break  # cardinality re-shaped before any Window
    return False


def test_single_partition_window_detector(spark, sf_dir):
    """The detector itself: fires on a real global-ORDER-BY window plan
    (including one with interposed Project/Filter nodes the old 2-node
    scan missed) and stays quiet on a partitioned window and on a 1-row
    global aggregate."""
    from pyspark.sql import Window

    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    w_global = Window.orderBy("l_extendedprice")
    flagged = li.withColumn("rn", F.row_number().over(w_global))
    assert has_single_partition_window(physical_plan(flagged))
    # consumer further away than the detail numbering's +2: Window above
    # a Project above a Filter above the Sort fed by the exchange
    flagged_far = (
        li.withColumn("rn", F.row_number().over(w_global))
        .filter(F.col("rn") > 0)
        .select("l_orderkey", "l_extendedprice", "rn")
        .withColumn("lead_key", F.lead("l_orderkey").over(w_global))
    )
    assert has_single_partition_window(physical_plan(flagged_far))

    w_part = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ok = li.withColumn("rn", F.row_number().over(w_part))
    assert not has_single_partition_window(physical_plan(ok))
    one_row = li.agg(F.sum("l_quantity").alias("s"))
    assert not has_single_partition_window(physical_plan(one_row))


def test_no_cartesian_in_registry_plans(spark, sf_dir):
    """Scale guard (the explain-audit, promoted to a regression gate): no
    registry plan may contain a CartesianProduct; BroadcastNestedLoopJoin
    is allowed only where the broadcast side is a provably tiny
    scalar/query set; and a Window fed by an Exchange SinglePartition —
    the global-sort-into-one-task shape — is allowed only where the
    window input cardinality is scale-independent or the entry is the
    documented exact-tier exception. Sanctions are NOT hardcoded here:
    each lives on its operator's QuerySpec.plan_waivers with a
    justification (plans/spec.py), so the registry stays the single
    source of truth and a new entry can't ride an unrelated waiver."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

    skip_prefixes = ("streaming_", "sink_")  # these execute side effects
    failures = []
    for name, spec in all_queries().items():
        if name.startswith(skip_prefixes):
            continue
        waivers = spec.plan_waivers or {}
        plan = physical_plan(spec.fn(spark, sf_dir))
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and "bnlj" not in waivers:
            failures.append(f"{name}: unsanctioned BroadcastNestedLoopJoin")
        if has_single_partition_window(plan) and "global_window" not in waivers:
            failures.append(f"{name}: single-partition Window")
    assert not failures, f"scale smells in plans: {failures}"


def test_plan_waivers_not_stale(spark, sf_dir):
    """Every declared waiver must still be needed: a waiver whose smell
    no longer appears in the plan is dead weight that could silently
    sanction a future regression."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

    skip_prefixes = ("streaming_", "sink_")
    stale = []
    for name, spec in all_queries().items():
        if not spec.plan_waivers or name.startswith(skip_prefixes):
            continue
        plan = physical_plan(spec.fn(spark, sf_dir))
        if "bnlj" in spec.plan_waivers and "BroadcastNestedLoopJoin" not in plan:
            stale.append(f"{name}: bnlj waiver but no BNLJ in plan")
        if "global_window" in spec.plan_waivers and not has_single_partition_window(
            plan
        ):
            stale.append(f"{name}: global_window waiver but no such shape")
    assert not stale, f"stale plan waivers: {stale}"


def test_registry_bucketed_join_shuffle_free(spark, sf_dir):
    """The join_bucketed REGISTRY entry (not just the idiom) must run its
    SortMergeJoin with no Exchange on either side — bucket layout
    satisfies the join's required distribution."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import join_bucketed

    plan = physical_plan(join_bucketed(spark, sf_dir))
    join_section = plan.split("HashAggregate")[0]
    assert "SortMergeJoin" in plan
    assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{join_section}"


def test_compaction_yields_one_file_per_bucket(spark, sf_dir):
    """The compaction entry's physical outcome (not just its report):
    the rewritten table must hold exactly ONE file per range bucket —
    64 fragments in, 8 range-clustered files out — and each file's rows
    span a single bucket."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        maintenance_compact_small_files,
    )

    import os

    maintenance_compact_small_files(spark, sf_dir).collect()  # writes both dirs
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    back = spark.read.parquet(
        f"/tmp/spark_graft_compact/{tag}-{os.getpid()}/compact"
    )
    files = (
        back.select("bucket", F.input_file_name().alias("f"))
        .groupBy("bucket")
        .agg(F.countDistinct("f").alias("n_files"))
        .collect()
    )
    assert len(files) == 8
    assert all(r["n_files"] == 1 for r in files), files


def test_interval_overlap_blocking_is_lossless(spark, sf_dir):
    """Bucket blocking must be LOSSLESS: the week-bucketed overlap join
    returns exactly the pairs a direct theta join over the same samples
    finds — including intervals that straddle bucket boundaries — and
    its plan contains no nested-loop join."""
    from collections import Counter

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        join_interval_overlap,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    out = join_interval_overlap(spark, sf_dir)
    plan = physical_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 997 == 0)
        .select(
            "l_orderkey", "l_linenumber",
            F.to_date("l_shipdate").alias("ls"),
            F.date_add(F.to_date("l_shipdate"), 3).alias("le"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 13 == 0)
        .select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("os"),
            F.date_add(F.to_date("o_orderdate"), 7).alias("oe"),
        )
    )
    direct = (
        li.crossJoin(orders)
        .filter((F.col("ls") <= F.col("oe")) & (F.col("os") <= F.col("le")))
        .select(
            "l_orderkey",
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            "o_orderkey",
            (F.datediff(F.least("le", "oe"), F.greatest("ls", "os")) + 1)
            .cast("bigint")
            .alias("overlap_days"),
        )
    )
    assert Counter(map(tuple, out.collect())) == Counter(map(tuple, direct.collect()))


def test_zorder_files_are_two_dimensional_tiles(spark, sf_dir):
    """The Z-order layout's physical outcome: one file per Z-range, and
    every file's rows stay inside a 4x4 tile of (doc_id, n_chars)
    bucket space — min/max parquet bounds prune on BOTH dimensions. A
    single-key range layout over the same data bounds doc_id the same
    way but lets n_chars sprawl: the mean per-file n_chars-bucket span
    must be strictly wider than Z-order's (the reason the operator
    exists)."""
    import os

    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        maintenance_zorder_layout,
    )

    report = maintenance_zorder_layout(spark, sf_dir).collect()
    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    out_dir = f"/tmp/spark_graft_zorder/{tag}-{os.getpid()}"
    back = spark.read.parquet(out_dir)

    files = (
        back.select("zfile", F.input_file_name().alias("f"))
        .groupBy("zfile")
        .agg(F.countDistinct("f").alias("n_files"))
        .collect()
    )
    assert all(r["n_files"] == 1 for r in files), files

    for r in report:
        assert r["max_bx"] - r["min_bx"] <= 3, r
        assert r["max_by"] - r["min_by"] <= 3, r

    # contrast: single-key layout = group the same rows by bx-range
    # (doc_id div) only; per-group n_chars-bucket span sprawls
    single = (
        back.withColumn("kfile", F.expr("bx div 4"))
        .groupBy("kfile")
        .agg((F.max("by") - F.min("by")).alias("by_span"))
        .collect()
    )
    z_mean = sum(r["max_by"] - r["min_by"] for r in report) / len(report)
    k_mean = sum(r["by_span"] for r in single) / len(single)
    assert k_mean > z_mean, (k_mean, z_mean)


def test_bloom_prefilter_shape(spark, sf_dir):
    """join_bloom_prefilter's physical plan must show the runtime-filter
    shape: a broadcast LeftSemi join (the occupied-bucket prefilter)
    feeding a SortMergeJoin (the hinted shuffle join it is there to
    shrink). If the semi-join vanished the entry would still be correct
    but the 100 TB shuffle-reduction demonstration would be gone."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        join_bloom_prefilter,
    )

    plan = physical_plan(join_bloom_prefilter(spark, sf_dir))
    assert "SortMergeJoin" in plan, plan
    semi = [
        ln
        for ln in plan.splitlines()
        if "BroadcastHashJoin" in ln and "LeftSemi" in ln
    ]
    assert semi, f"no broadcast LeftSemi prefilter in plan:\n{plan}"
    # the semi-join must sit BELOW the SMJ (prefilter before shuffle)
    assert plan.index("LeftSemi") != -1 and "Exchange" in plan


def test_bloom_prefilter_is_selective(spark, sf_dir):
    """The bucket prefilter must actually drop probe rows at test SF
    (one week of orders occupies far fewer than _BLOOM_BUCKETS buckets),
    otherwise the demonstration is vacuous."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        _BLOOM_BUCKETS,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("2001-03-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("2001-03-07").cast("date"))
    )
    n_occupied = (
        orders.select(
            F.pmod(F.xxhash64("o_orderkey"), F.lit(_BLOOM_BUCKETS)).alias("b")
        )
        .distinct()
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    kept = li.filter(
        F.pmod(F.xxhash64("l_orderkey"), F.lit(_BLOOM_BUCKETS)).isin(
            # tiny at test SF; collect is bounded by _BLOOM_BUCKETS
            [
                r["b"]
                for r in orders.select(
                    F.pmod(
                        F.xxhash64("o_orderkey"), F.lit(_BLOOM_BUCKETS)
                    ).alias("b")
                )
                .distinct()
                .collect()
            ]
        )
    ).count()
    assert n_occupied < _BLOOM_BUCKETS / 4
    assert kept < total / 2, (kept, total)


def test_dpp_prunes_partitions(spark, sf_dir):
    """join_dynamic_partition_pruning's fact scan must carry BOTH a
    dynamicpruningexpression (runtime pruning from the dim's broadcast)
    and the statically-inferred partition predicate; together they keep
    the scan to the 2/5 surviving partitions."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        join_dynamic_partition_pruning,
    )

    plan = physical_plan(join_dynamic_partition_pruning(spark, sf_dir))
    assert "dynamicpruningexpression" in plan.lower(), plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "StartsWith" in pf[0], pf


def test_bitmap_distinct_merge_beats_popcount_sum(spark, sf_dir):
    """The grand-total row must come from MERGED WORDS, not summed
    popcounts: customers ordering under several priorities would be
    double-counted by the latter. Assert the ALL row is strictly below
    the sum of the per-priority rows (guaranteed at test SF where
    overlap exists) and equals the naive global distinct."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        agg_bitmap_distinct,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    rows = {
        r["o_orderpriority"]: r["n_distinct_customers"]
        for r in agg_bitmap_distinct(spark, sf_dir).collect()
    }
    per_sum = sum(v for k, v in rows.items() if k != "ALL")
    exact_all = (
        load_table(spark, sf_dir, "orders")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()[0]["n"]
    )
    assert rows["ALL"] == exact_all
    assert rows["ALL"] < per_sum, rows


def test_null_skew_split_shape(spark, sf_dir):
    """join_null_skew_split must be a Union of exactly one shuffle join
    branch (non-null keys) and a join-free bypass branch; the bypass
    side contributes no Exchange of its own — the point of the idiom is
    that unmatchable NULL-key rows never enter the join's shuffle."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        join_null_skew_split,
    )

    import re

    plan = physical_plan(join_null_skew_split(spark, sf_dir))
    assert "Union" in plan, plan
    # formatted explain prints each node in the tree AND a detail
    # section; count the numbered detail nodes
    assert len(re.findall(r"\(\d+\) SortMergeJoin", plan)) == 1, plan
    assert not re.findall(r"\(\d+\) (?:BroadcastHash|ShuffledHash)Join", plan), plan
    # null-key rows must be filtered out BEFORE the join branch
    assert "isnotnull(cust_opt" in plan or "isnotnull" in plan, plan


def test_null_skew_split_counts(spark, sf_dir):
    """The NULL segment row must hold exactly the orders whose synthetic
    FK is null (o_orderkey % 3 == 0), and the total across segments must
    equal the full orders count — nothing dropped or duplicated by the
    split."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        join_null_skew_split,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    rows = {
        r["c_mktsegment"]: r["n_orders"]
        for r in join_null_skew_split(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    n_total = orders.count()
    n_null = orders.filter(F.col("o_orderkey") % 3 == 0).count()
    assert rows[None] == n_null, (rows.get(None), n_null)
    assert sum(rows.values()) == n_total


def test_countmin_overestimates_only(spark, sf_dir):
    """Count-min guarantee, per probed key: est >= true ALWAYS (hash
    collisions add counts, never subtract), and min-over-4-rows keeps
    the overestimate within the sketch's coarse epsilon*N bound
    (eps = e/w; with d = 4 independent rows the realized error is far
    smaller — asserted loosely so the test pins the direction, not the
    tail luck)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        _CMS_W,
        agg_countmin_heavy_hitters,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    rows = agg_countmin_heavy_hitters(spark, sf_dir).collect()
    assert len(rows) == 10
    n_total = load_table(spark, sf_dir, "orders").count()
    for r in rows:
        assert r["est_cnt"] >= r["true_cnt"], r
        assert r["est_cnt"] - r["true_cnt"] <= 3 * n_total / _CMS_W, (
            r, n_total
        )


def test_retention_ttl_physically_drops_expired_partitions(spark, sf_dir):
    """TTL sweep physical semantics: after the entry runs, the scratch
    table's partition directories contain ONLY years >= the cutoff (the
    expired directories are gone from disk, not merely filtered), the
    survivors' data files are the ORIGINAL write's files (retention
    never rewrites surviving rows), and the returned years match."""
    import os

    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        _TTL_CUTOFF_YEAR,
        maintenance_retention_ttl,
    )

    out = maintenance_retention_ttl(spark, sf_dir)
    years = sorted(r["o_year"] for r in out.collect())
    assert years and all(y >= _TTL_CUTOFF_YEAR for y in years)

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    d = f"/tmp/spark_graft_ttl/{tag}-{os.getpid()}"
    part_years = sorted(
        int(e.split("=", 1)[1])
        for e in os.listdir(d)
        if e.startswith("o_year=")
    )
    assert part_years == years
    # survivors still hold parquet data files (present, non-empty) —
    # the sweep touched only expired directories
    for y in part_years:
        files = [
            f for f in os.listdir(os.path.join(d, f"o_year={y}"))
            if f.endswith(".parquet")
        ]
        assert files, y


def test_incremental_manifest_reads_only_new_files(spark, sf_dir):
    """The incremental-ingest entry's physical outcome: the returned
    report plan's input files are EXACTLY the unprocessed batch's
    files — already-manifested files see zero data I/O (the pruning
    happens at file-listing time, not as a post-scan filter)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        _MANIFEST_NEW_FILES,
        maintenance_incremental_manifest,
    )

    df = maintenance_incremental_manifest(spark, sf_dir)
    files = df.inputFiles()
    assert len(files) == _MANIFEST_NEW_FILES
    assert all("/landing/b2/" in f for f in files), files


def test_orphan_audit_reads_only_orphan_files(spark, sf_dir):
    """The orphan-file audit's physical outcome: the report plan's
    input files are EXACTLY the unregistered stray files — committed
    (manifested) data sees zero I/O, and every stray file is found."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        _ORPHAN_FILES,
        maintenance_orphan_files,
    )

    df = maintenance_orphan_files(spark, sf_dir)
    files = df.inputFiles()
    assert len(files) == _ORPHAN_FILES
    assert all("/data/stray/" in f for f in files), files


def test_cpu_dense_barriers_carry_explicit_partition_count(spark, sf_dir):
    """The byte-light/CPU-dense stages (CDC rolling hash, the
    length-walk container parsers) must not inherit the scan's split
    layout — their plans carry an explicit-count doc_id exchange sized
    by spark.sql.shuffle.partitions (the round-11 CDC re-ladder: the
    exchange-free shape ran the hash stage on ONE core, 3.54 s vs
    2.22 s at sf0.1; SCALING.md round 11)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import (
        all_queries,
    )

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    reg = all_queries()
    for name in (
        "multimodal_cdc_chunking",
        "multimodal_tar_index",
        "multimodal_zip_index",
        "multimodal_mp4_box_index",
        "multimodal_png_chunk_index",
    ):
        plan = physical_plan(reg[name].fn(spark, sf_dir))
        import re

        m = re.search(rf"hashpartitioning\(doc_id#\d+L?, {n}\)", plan)
        assert m, (
            f"{name}: no explicit {n}-partition doc_id exchange in plan "
            "— the CPU-dense stage would inherit the scan split layout"
        )


def test_rollup_then_window_discipline(spark, sf_dir):
    """The robust/seasonal timeseries entries (round-11 family) must
    keep their Window over the ROLLED-UP hourly/daily frame, never the
    raw events — a refactor that windows raw rows first would still be
    value-correct but 1000x heavier at scale. In the formatted plan the
    root prints first, so 'Window consumes the rollup' appears as the
    first Window line sitting ABOVE the first HashAggregate line; the
    inverse order (aggregate above a raw-row window) or a missing
    rollup aggregate fails."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.registry import (
        all_queries,
    )

    reg = all_queries()
    for name in (
        "window_hampel_filter",
        "timeseries_changepoint_binary",
        "timeseries_interpolate_linear",
        "timeseries_spectral_peak",
        "timeseries_acf_lags",
        "timeseries_m4_downsample",
    ):
        plan = physical_plan(reg[name].fn(spark, sf_dir))
        assert "HashAggregate" in plan, f"{name}: no rollup aggregate"
        if "Window" in plan:
            assert plan.index("Window") < plan.index("HashAggregate"), (
                f"{name}: a Window runs BELOW the rollup aggregate — "
                "windowing raw rows instead of the rolled-up series"
            )
