"""Accuracy tests for approximate operators: HLL distinct counts within
their advertised error, and the streaming session window equaling its
batch twin."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct(rsd=0.02) must land within ~5 sigma of the
    exact distinct count."""
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
            F.countDistinct("l_partkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r.approx - r.exact) / max(r.exact, 1)
        assert rel_err < 0.10, f"{r.l_returnflag}: approx={r.approx} exact={r.exact}"


def test_approx_percentile_close_to_exact(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_linestatus")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        )
        .collect()
    )
    for r in rows:
        assert abs(r.approx - r.exact) / r.exact < 0.05, r


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """Native session_window under Structured Streaming (watermark +
    complete replay) must equal the batch session aggregation."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.sessionize import session_window_agg
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table
    from pipeline_apache_beam_entrega1_cs_spark.streaming.windows import _drain, _stream_events

    batch = session_window_agg(
        load_table(spark, sf_dir, "events"), "user_id", "ts", "30 minutes", "value"
    )
    stream = session_window_agg(
        _stream_events(spark, sf_dir).withWatermark("ts", "2 hours"),
        "user_id", "ts", "30 minutes", "value",
    )
    out = _drain(stream, "complete")
    assert Counter(map(tuple, out.collect())) == Counter(map(tuple, batch.collect()))


def test_approx_top_k_recall_vs_exact(spark, sf_dir):
    """agg_approx_top_k's 20 items must recover >= 80% of the exact
    top-20 terms (ties at the boundary can legitimately differ), and
    every reported count must be within 10% of that term's exact count."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import explode_tokens
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import agg_approx_top_k
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    approx = {r.term: r.approx_count for r in agg_approx_top_k(spark, sf_dir).collect()}
    assert len(approx) == 20

    tok = explode_tokens(load_table(spark, sf_dir, "documents"), out="term")
    exact = dict(
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(20)
        .collect()
    )
    recall = len(approx.keys() & exact.keys()) / 20
    assert recall >= 0.8, f"recall={recall}: approx={sorted(approx)} exact={sorted(exact)}"

    exact_all = dict(
        tok.filter(F.col("term").isin(list(approx)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    for term, cnt in approx.items():
        assert abs(cnt - exact_all[term]) / exact_all[term] <= 0.10, (
            f"{term}: approx={cnt} exact={exact_all[term]}"
        )


def test_pagerank_mass_and_degree_ordering(spark, sf_dir):
    """Unrolled PageRank semantic checks (beyond the hash oracle):
    total mass stays ~1 on the symmetric no-dangling graph, every rank
    is positive, and high-degree nodes out-rank low-degree ones on
    average (degree-proportionality of PageRank on undirected graphs)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import graph_pagerank

    pr = graph_pagerank(spark, sf_dir).cache()
    rows = pr.collect()
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-3, f"mass not conserved: {total}"
    assert all(r["pr"] > 0 for r in rows)

    # rebuild the same graph's degrees and compare decile means
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_orderkey") % 20 == 0)
        .select("l_orderkey", "l_suppkey")
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("c"), (F.col("l_suppkey") + 1000000).alias("s"))
        .distinct()
    )
    deg = (
        pairs.select(F.col("c").alias("node"))
        .unionAll(pairs.select(F.col("s").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    joined = pr.join(deg, "node").collect()
    ranked = sorted(joined, key=lambda r: r["deg"])
    k = max(1, len(ranked) // 10)
    low = sum(r["pr"] for r in ranked[:k]) / k
    high = sum(r["pr"] for r in ranked[-k:]) / k
    assert high > low, f"degree ordering violated: high={high} low={low}"


def test_hll_partial_merge_accuracy(spark, sf_dir):
    """Mergeable-HLL entry: every per-group estimate AND the union-of-
    sketches global estimate must be within 5% of the exact distinct
    counts — and the merged row must estimate the GLOBAL distinct set
    (not the sum of per-group counts, which double-counts customers
    appearing under several priorities)."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import (
        agg_hll_partial_merge,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    got = {r["grp"]: r["est_distinct"] for r in agg_hll_partial_merge(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    exact = {
        r["o_orderpriority"]: r["d"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    exact["__all__"] = orders.select("o_custkey").distinct().count()
    assert set(got) == set(exact)
    for g, e in exact.items():
        assert abs(got[g] - e) <= max(1, 0.05 * e), (g, got[g], e)
    # the union must deduplicate across groups: global exact is well
    # below the per-group sum on this data
    assert exact["__all__"] < sum(v for k, v in exact.items() if k != "__all__")


def test_label_propagation_separates_communities(spark, sf_dir):
    """LPA semantics: every node ends with a label that exists among its
    neighbors' initial reachable set, labels are stable ids from the
    graph, and the algorithm produces FEWER distinct labels than nodes
    (communities actually merge) on the trade graph."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        graph_label_propagation,
    )

    out = graph_label_propagation(spark, sf_dir).cache()
    n_nodes = out.count()
    n_labels = out.select("label").distinct().count()
    assert n_nodes > 0
    assert n_labels < n_nodes  # propagation merged at least two nodes
    # labels are node ids drawn from the graph itself
    nodes = {r["node"] for r in out.select("node").collect()}
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels <= nodes
    out.unpersist()


def test_lpa_loop_matches_python_spec(spark):
    """The synchronous-LPA core vs a plain-Python spec on randomized
    small symmetric graphs (seeded stdlib random — hypothesis's
    function-scoped fixture health check makes the explicit loop the
    simpler harness here): identical (node, label) maps after 2 steps,
    including multi-component graphs and tie-heavy cliques."""
    import random

    from collections import Counter

    from pyspark.sql import functions as F  # noqa: F401

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import lpa_loop

    def py_lpa(edges, iters=2):
        # nodes = src UNION dst; a node with no out-edges (no votes
        # under the e.dst->e.src flow) keeps its current label.
        nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
        labels = {n: n for n in nodes}
        for _ in range(iters):
            new = {}
            for n in nodes:
                cnt = Counter(labels[b] for a, b in edges if a == n)
                # max count, ties -> min label; no votes -> keep label
                new[n] = min((-c, lb) for lb, c in cnt.items())[1] if cnt else labels[n]
            labels = new
        return labels

    rng = random.Random(1234)
    for trial in range(12):
        n_nodes = rng.randint(2, 10)
        n_edges = rng.randint(1, 14)
        undirected = {
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
            if n_nodes >= 2
        }
        if not undirected:
            continue
        if trial < 8:
            edges = [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected]
        else:
            # directed: exercises dst-only sinks + no-vote label keep
            edges = sorted(undirected)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["label"] for r in lpa_loop(df, 2).collect()}
        assert got == py_lpa(edges), (trial, edges)


def test_ewma_constant_and_step_series(spark):
    """EWMA semantics on planted series: a constant series smooths to
    the constant; after a step change the EWMA lies strictly between
    the old and new levels and moves monotonically toward the new one."""
    import datetime

    from pyspark.sql import functions as F  # noqa: F401

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        timeseries_ewma,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "e",
         1.0 if i < 8 else 5.0, None)
        for i in range(16)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string"
    )
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    orig = A.load_table
    A.load_table = lambda spark, sf_dir, name: df
    try:
        out = {r["event_id"]: r["ewma"] for r in timeseries_ewma(spark, "x").collect()}
    finally:
        A.load_table = orig
    assert out[7] == 1.0                       # constant prefix -> exact constant
    after = [out[i] for i in range(8, 16)]
    assert all(1.0 < v < 5.0 for v in after[:-1])
    assert all(b > a for a, b in zip(after, after[1:]))  # monotone approach
    assert after[-1] > 4.9                     # nearly converged at depth 8


def test_basket_lift_planted_association(spark, sf_dir):
    """Lift semantics on planted baskets: two brands that ALWAYS
    co-occur get lift ~ N/c > 1 and rank first; two brands that never
    co-occur are absent; independent brands sit near lift 1."""
    from pyspark.sql import functions as F  # noqa: F401

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    # 40 orders: brands X,Y always together (10 orders); Z alone (10);
    # P,Q mixed independently across the remaining 20
    li_rows, part_rows = [], []
    parts = {"X": 1, "Y": 2, "Z": 3, "P": 4, "Q": 5}
    for b, pk in parts.items():
        part_rows.append((pk, f"name{pk}", b, "t", 1, 1.0))
    oid = 0
    for _ in range(10):
        li_rows += [(oid, parts["X"]), (oid, parts["Y"])]; oid += 1
    for _ in range(10):
        li_rows += [(oid, parts["Z"])]; oid += 1
    for i in range(20):
        li_rows.append((oid, parts["P"] if i % 2 == 0 else parts["Q"]))
        if i % 4 == 0:
            li_rows.append((oid, parts["Q"]))
        oid += 1
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(
        part_rows,
        "p_partkey long, p_name string, p_brand string, p_size_t string,"
        " p_size int, p_retailprice double",
    )
    orig = A._t
    A._t = lambda s, d, name: {"lineitem": li, "part": part}[name]
    try:
        out = A.basket_brand_lift(spark, "x").collect()
    finally:
        A._t = orig
    got = {(r["b1"], r["b2"]): r["lift"] for r in out}
    assert got[("X", "Y")] == max(got.values())  # perfect association tops
    assert got[("X", "Y")] == 4.0                # N/c = 40/10
    assert ("X", "Z") not in got and ("Y", "Z") not in got


def test_link_prediction_planted_square(spark):
    """Planted 4-cycle (1-2, 1-3, 2-4, 3-4): the two non-adjacent
    diagonals (1,4) and (2,3) share BOTH neighbors -> jaccard 1.0 and
    must rank first; no adjacent pair may appear."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    # co-purchase graph from lineitem-shaped rows: one order per edge
    rows = []
    for okey, parts in ((0, (1, 2)), (20, (1, 3)), (40, (4, 2)), (60, (4, 3))):
        rows += [(okey, p) for p in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    orig = A._t
    A._t = lambda spark, sf_dir, name: li
    try:
        out = A.graph_link_prediction(spark, "ignored").collect()
    finally:
        A._t = orig
    pairs = {(r["u"], r["w"]): r for r in out}
    assert set(pairs) == {(1, 4), (2, 3)}, pairs
    for r in out:
        assert r["jaccard"] == 1.0 and r["n_common"] == 2 and r["n_union"] == 2


def test_hll_intersection_accuracy(spark, sf_dir):
    """Inclusion-exclusion intersection on HLL sketches: each side and
    the union within 5% of exact; the derived intersection within 10%
    (subtraction amplifies relative error — documented tolerance)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import (
        agg_hll_intersection,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    row = agg_hll_intersection(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")

    def exact(pred):
        return orders.filter(pred).select("o_custkey").distinct().count()

    a = exact(F.col("o_orderpriority") == "1-URGENT")
    b = exact(F.col("o_orderpriority") == "2-HIGH")
    u = exact(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    inter = a + b - u
    assert abs(row["est_urgent"] - a) <= max(1, 0.05 * a)
    assert abs(row["est_high"] - b) <= max(1, 0.05 * b)
    assert abs(row["est_union"] - u) <= max(1, 0.05 * u)
    assert abs(row["est_intersection"] - inter) <= max(2, 0.10 * inter), (
        row, a, b, u, inter)
    # the identity holds on the estimates by construction
    assert row["est_intersection"] == row["est_urgent"] + row["est_high"] - row["est_union"]


def test_weighted_median_respects_weights(spark):
    """Planted weights: a heavy high value must pull the weighted
    median above the plain median (value 30 carries 5/7 of the mass),
    and a dominant-weight row IS the median."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.relational2 as R2

    rows = [
        ("A", 10.0, 1, 1.0, 1),
        ("A", 20.0, 2, 1.0, 1),
        ("A", 30.0, 3, 5.0, 1),
        ("B", 5.0, 4, 10.0, 1),
        ("B", 99.0, 5, 1.0, 1),
    ]
    li = spark.createDataFrame(
        rows,
        "l_returnflag string, l_extendedprice double, l_orderkey long, "
        "l_quantity double, l_linenumber int",
    )
    orig = R2._t
    R2._t = lambda spark, sf_dir, name: li
    try:
        out = {r["l_returnflag"]: r for r in R2.agg_weighted_median(spark, "x").collect()}
    finally:
        R2._t = orig
    assert out["A"]["weighted_median"] == 30.0 and out["A"]["total_weight"] == 7
    assert out["B"]["weighted_median"] == 5.0 and out["B"]["total_weight"] == 11


def test_running_distinct_is_prefix_exact(spark):
    """Planted event stream: the running distinct-type count must be
    the exact prefix cardinality at every event, including repeats."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.relational2 as R2

    t0 = datetime.datetime(2025, 1, 1)
    seq = ["click", "view", "click", "purchase", "view", "signup"]
    rows = [
        (i, 1, t0 + datetime.timedelta(minutes=i), ty, 0.0)
        for i, ty in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    orig = R2._t
    R2._t = lambda spark, sf_dir, name: ev
    try:
        out = {r["event_id"]: r["n_distinct_types"]
               for r in R2.window_running_distinct(spark, "x").collect()}
    finally:
        R2._t = orig
    assert [out[i] for i in range(6)] == [1, 2, 2, 3, 3, 4]


def test_distribution_drift_detects_planted_shift(spark):
    """Planted drift: snapshot B's prices sit in a disjoint range from
    snapshot A's, so the PSI sum must scream (>> 0.25, the conventional
    'drifted' line); an identically-distributed control must read 0."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    da = datetime.datetime(1996, 6, 1)   # in snapshot A (year <= 1997)
    db = datetime.datetime(1999, 6, 1)   # in snapshot B

    def run(b_prices):
        rows = [(float(1 + i * 2), da) for i in range(500)] + [
            (p, db) for p in b_prices
        ]
        orders = spark.createDataFrame(
            rows, "o_totalprice double, o_orderdate timestamp"
        )
        orig = A._t
        A._t = lambda spark, sf_dir, name: orders
        try:
            out = A.dq_distribution_drift(spark, "x").collect()
        finally:
            A._t = orig
        return out

    shifted = run([float(1001 + i * 2) for i in range(500)])
    psi = sum(r["psi_term"] for r in shifted)
    assert psi > 0.25, shifted
    assert sum(r["n_a"] for r in shifted) == 500
    assert sum(r["n_b"] for r in shifted) == 500
    # A-only buckets have share_b = 0 (clamped to eps inside the log)
    assert any(r["n_b"] == 0 and r["psi_term"] > 0 for r in shifted)

    control = run([float(1 + i * 2) for i in range(500)])
    assert sum(r["psi_term"] for r in control) == 0.0, control


def test_quantile_partial_merge_error_bound(spark, sf_dir):
    """The histogram quantile estimate must satisfy the one-sided bound
    t <= est <= t + width for every scope and q, where t is the exact
    rank-ceil(q*n) element and width = (mx-mn)/64 — the documented
    mergeable-summary guarantee."""
    import math

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import (
        _QPM_BUCKETS,
        _QPM_QS,
        agg_quantile_partial_merge,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    rows = li.collect()
    by_scope: dict[str, list[float]] = {"__all__": []}
    for r in rows:
        by_scope.setdefault(r["l_returnflag"], []).append(r["l_extendedprice"])
        by_scope["__all__"].append(r["l_extendedprice"])
    for v in by_scope.values():
        v.sort()
    allv = by_scope["__all__"]
    width = (allv[-1] - allv[0]) / _QPM_BUCKETS

    out = agg_quantile_partial_merge(spark, sf_dir).collect()
    assert len(out) == len(by_scope) * len(_QPM_QS)
    for r in out:
        vals = by_scope[r["scope"]]
        assert r["n_rows"] == len(vals)
        t = vals[math.ceil(r["q"] * len(vals)) - 1]  # exact lower quantile
        assert t - 1e-6 <= r["est_quantile"] <= t + width + 1e-6, (r, t, width)


def test_weighted_priority_sample_matches_python_spec(spark, sf_dir):
    """The Efraimidis-Spirakis draw is fully deterministic: an
    independent plain-Python replay (hashlib md5 + math.log) must
    produce the exact same (source, rank, doc_id) selection, and every
    source must draw min(k, |source|) distinct docs."""
    import hashlib
    import math
    from collections import defaultdict

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _WPRIO_K,
        sample_weighted_priority,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()

    by_source = defaultdict(list)
    for r in docs:
        if r["n_chars"] <= 0:
            continue
        h = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        key = round(math.log(u) / r["n_chars"], 12)
        by_source[r["source"]].append((-key, r["doc_id"]))
    expected = set()
    for src, lst in by_source.items():
        lst.sort()
        for rank, (_, did) in enumerate(lst[:_WPRIO_K], start=1):
            expected.add((src, rank, did))

    out = sample_weighted_priority(spark, sf_dir).collect()
    got = {(r["source"], r["draw_rank"], r["doc_id"]) for r in out}
    assert got == expected
    from collections import Counter

    per_src = Counter(r["source"] for r in out)
    for src, lst in by_source.items():
        assert per_src[src] == min(_WPRIO_K, len(lst))


def test_pointintime_scd2_boundary_semantics(spark):
    """Planted stream: purchases at interval boundaries must take the
    LATER state ([from, to) semantics), a purchase before any state row
    gets NULL, and the open last interval matches."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t = lambda s: datetime.datetime(2025, 1, 1, 0, 0, s)
    rows = [
        # (event_id, user_id, ts, event_type, value)
        (100, 1, t(0), "purchase", 0.0),   # before any state -> NULL
        (1, 1, t(1), "signup", 0.0),
        (101, 1, t(2), "purchase", 0.0),   # inside signup interval
        (2, 1, t(3), "view", 0.0),
        (102, 1, t(3), "purchase", 0.0),   # boundary: belongs to view
        (3, 1, t(5), "click", 0.0),
        (103, 1, t(9), "purchase", 0.0),   # open last interval: click
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out = {r["event_id"]: r["state"]
               for r in A.join_pointintime_scd2(spark, "x").collect()}
    finally:
        A._t = orig
    assert out == {100: None, 101: "signup", 102: "view", 103: "click"}


def test_pattern_match_sequence_planted(spark):
    """Planted stream: one exact view->click->purchase run matches, an
    interrupted run does not, and back-to-back overlapping starts each
    report their own match."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t = lambda s: datetime.datetime(2025, 1, 1, 0, 0, s)
    rows = [
        # user 1: exact match at 1-2-3; interrupted at 4 (view,view,click)
        (1, 1, t(1), "view", 0.0),
        (2, 1, t(2), "click", 0.0),
        (3, 1, t(3), "purchase", 0.0),
        (4, 1, t(4), "view", 0.0),
        (5, 1, t(5), "view", 0.0),
        (6, 1, t(6), "click", 0.0),
        # user 2: view view click purchase -> match anchored at the 2nd view
        (10, 2, t(1), "view", 0.0),
        (11, 2, t(2), "view", 0.0),
        (12, 2, t(3), "click", 0.0),
        (13, 2, t(4), "purchase", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out = {(r["user_id"], r["start_event_id"]): r
               for r in A.pattern_match_sequence(spark, "x").collect()}
    finally:
        A._t = orig
    assert set(out) == {(1, 1), (2, 11)}
    assert out[(1, 1)]["end_event_id"] == 3
    assert out[(1, 1)]["duration_us"] == 2_000_000
    assert out[(2, 11)]["end_event_id"] == 13


def test_pattern_match_runs_quantified(spark):
    """Planted stream: view view click click click purchase is ONE
    quantified match with run lengths (2,3,1); an interrupted sequence
    (view click view) matches nothing."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t = lambda s: datetime.datetime(2025, 1, 1, 0, 0, s)
    rows = [
        (1, 1, t(1), "view"), (2, 1, t(2), "view"),
        (3, 1, t(3), "click"), (4, 1, t(4), "click"), (5, 1, t(5), "click"),
        (6, 1, t(6), "purchase"),
        (10, 2, t(1), "view"), (11, 2, t(2), "click"), (12, 2, t(3), "view"),
    ]
    ev = spark.createDataFrame(
        [(eid, uid, ts, et, 0.0) for eid, uid, ts, et in rows],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out = A.pattern_match_runs(spark, "x").collect()
    finally:
        A._t = orig
    assert len(out) == 1
    m = out[0]
    assert m["user_id"] == 1
    assert m["pattern_start_event_id"] == 1 and m["pattern_end_event_id"] == 6
    assert (m["n_views"], m["n_clicks"], m["n_purchases"]) == (2, 3, 1)
    assert m["duration_us"] == 5_000_000


def test_window_reset_cumsum_restarts_at_trigger(spark):
    """Planted stream: the running value total must restart exactly at
    each signup event (the signup row itself starts the new segment)."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t = lambda s: datetime.datetime(2025, 1, 1, 0, 0, s)
    rows = [
        (1, 1, t(1), "view", 10.0),
        (2, 1, t(2), "signup", 1.0),
        (3, 1, t(3), "view", 5.0),
        (4, 1, t(4), "view", 2.0),
        (5, 1, t(5), "signup", 1.0),
        (6, 1, t(6), "view", 7.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out = {r["event_id"]: (r["seg"], r["running_value"])
               for r in A.window_reset_cumsum(spark, "x").collect()}
    finally:
        A._t = orig
    assert out == {
        1: (0, 10.0),
        2: (1, 1.0),
        3: (1, 6.0),
        4: (1, 8.0),
        5: (2, 1.0),
        6: (2, 8.0),
    }


def test_dataset_shuffle_shards_is_balanced_permutation(spark, sf_dir):
    """The epoch shuffle must be a PERMUTATION (ranks are exactly
    1..n), shards must be balanced to ±1, per-shard positions must be
    dense 0..size-1, and the two-phase bucket ranking must equal the
    naive global md5 ordering computed independently in Python."""
    import hashlib

    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        _SHUFFLE_EPOCH,
        _SHUFFLE_N_SHARDS,
        dataset_shuffle_shards,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    out = dataset_shuffle_shards(spark, sf_dir).collect()
    n = len(out)
    assert sorted(r["epoch_rank"] for r in out) == list(range(1, n + 1))

    sizes = {}
    positions = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
        positions.setdefault(r["shard"], []).append(r["shard_position"])
    assert max(sizes.values()) - min(sizes.values()) <= 1
    for s, ps in positions.items():
        assert sorted(ps) == list(range(len(ps)))

    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    expected = sorted(
        (hashlib.md5(f"epoch{_SHUFFLE_EPOCH}:{r['doc_id']}".encode()).hexdigest(),
         r["doc_id"])
        for r in docs
    )
    expected_rank = {did: i + 1 for i, (_, did) in enumerate(expected)}
    for r in out:
        assert r["epoch_rank"] == expected_rank[r["doc_id"]], r
        assert r["shard"] == (r["epoch_rank"] - 1) % _SHUFFLE_N_SHARDS


def test_pattern_match_random_streams_vs_bruteforce(spark):
    """Seeded random event streams with heavy timestamp collisions: the
    window-navigation pattern scan must equal a plain-Python brute
    force over the same (ts, event_id) ordering, for both the fixed
    consecutive-triple form and the quantified run form."""
    import datetime

    import numpy as np

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rng = np.random.default_rng(2024)
    types = ["view", "click", "purchase", "signup"]
    rows = []
    for eid in range(400):
        rows.append(
            (
                eid,
                int(rng.integers(0, 8)),
                datetime.datetime(2025, 1, 1) + datetime.timedelta(
                    seconds=int(rng.integers(0, 60))
                ),
                types[int(rng.integers(0, 4))],
                0.0,
            )
        )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )

    # Python brute force over the same ordering
    by_user: dict[int, list] = {}
    for eid, uid, ts, et, _ in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    fixed_expected = set()
    runs_expected = set()
    for uid, evs in by_user.items():
        evs.sort()
        seq = [e[2] for e in evs]
        for i in range(len(seq) - 2):
            if seq[i] == "view" and seq[i + 1] == "click" and seq[i + 2] == "purchase":
                fixed_expected.add((uid, evs[i][1], evs[i + 2][1]))
        # collapse to runs
        rl = []
        for ts, eid, et in evs:
            if rl and rl[-1][0] == et:
                rl[-1][1].append((ts, eid))
            else:
                rl.append([et, [(ts, eid)]])
        for i in range(len(rl) - 2):
            if rl[i][0] == "view" and rl[i + 1][0] == "click" and rl[i + 2][0] == "purchase":
                runs_expected.add(
                    (uid, rl[i][1][0][1], rl[i + 2][1][-1][1],
                     len(rl[i][1]), len(rl[i + 1][1]), len(rl[i + 2][1]))
                )

    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        got_fixed = {
            (r["user_id"], r["start_event_id"], r["end_event_id"])
            for r in A.pattern_match_sequence(spark, "x").collect()
        }
        got_runs = {
            (r["user_id"], r["pattern_start_event_id"], r["pattern_end_event_id"],
             r["n_views"], r["n_clicks"], r["n_purchases"])
            for r in A.pattern_match_runs(spark, "x").collect()
        }
    finally:
        A._t = orig
    assert got_fixed == fixed_expected
    assert got_runs == runs_expected


def test_bfs_levels_matches_python_spec(spark):
    """The delta-iteration BFS core vs a plain-Python min-hop spec on
    randomized small digraphs (seeded stdlib random, same harness as
    the LPA spec test): identical (node, level) maps under the hop cap,
    including unreachable nodes (absent), multi-seed graphs (min over
    seeds), and cycles (the anti-join must not re-expand)."""
    import random

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        bfs_levels_loop,
    )

    def py_bfs(edges, seeds, hops):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
        level = {s: 0 for s in seeds}
        frontier = set(seeds)
        for h in range(1, hops + 1):
            nxt = set()
            for n in frontier:
                nxt |= adj.get(n, set())
            nxt -= level.keys()
            for n in nxt:
                level[n] = h
            frontier = nxt
        return level

    rng = random.Random(4321)
    for trial in range(10):
        n_nodes = rng.randint(2, 12)
        edges = sorted(
            {
                (rng.randrange(n_nodes), rng.randrange(n_nodes))
                for _ in range(rng.randint(1, 20))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes_in_graph = sorted({a for a, _ in edges})
        seeds = rng.sample(
            nodes_in_graph, k=min(len(nodes_in_graph), rng.randint(1, 3))
        )
        hops = rng.randint(1, 4)
        edf = spark.createDataFrame(edges, "src long, dst long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {
            r["node"]: r["level"]
            for r in bfs_levels_loop(edf, sdf, hops).collect()
        }
        assert got == py_bfs(edges, seeds, hops), (trial, edges, seeds, hops)


def test_interval_coalesce_matches_python_spec(spark):
    """The overlap-merge core vs a plain-Python sweep on planted
    VARIABLE-length intervals: chained overlaps merge, touching ends
    merge (s == prev end), a gap splits, and — the case the cummax
    form exists for — a long interval CONTAINING later short ones must
    not let a short interval's early end reopen the island."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        interval_coalesce_core,
    )

    rows = [
        # user 1: chain [0,300]+[100,400]+[350,650], gap, [1000,1300]
        (1, 1, 0, 300), (1, 2, 100, 400), (1, 3, 350, 650),
        (1, 4, 1000, 1300),
        # user 2: containment — [0,1000] swallows [100,200] and
        # [300,400]; then [900,1100] still overlaps the long one;
        # [1200,1250] is a new island. lag(e) would wrongly split at
        # s=300 (prev row's e=200) — cummax keeps e=1000 live.
        (2, 1, 0, 1000), (2, 2, 100, 200), (2, 3, 300, 400),
        (2, 4, 900, 1100), (2, 5, 1200, 1250),
        # user 3: touching ends merge
        (3, 1, 0, 300), (3, 2, 300, 600),
    ]
    expected = {
        (1, 0, 650, 3), (1, 1000, 1300, 1),
        (2, 0, 1100, 4), (2, 1200, 1250, 1),
        (3, 0, 600, 2),
    }
    iv = spark.createDataFrame(
        rows, "user_id long, event_id long, s long, e long"
    )
    got = {
        (r["user_id"], r["island_start_s"], r["island_end_s"], r["n_events"])
        for r in interval_coalesce_core(iv).collect()
    }
    assert got == expected


def test_anomaly_mad_flags_planted_outlier(spark):
    """Median/MAD robustness on a planted series: 20 values near 10.0
    plus THREE extreme outliers — the outliers must be exactly the
    flagged rows, the median must ignore them, and (the reason the
    robust twin exists) the same series' mean/stddev z-score stays
    BELOW the 3-sigma bar because the outlier cluster inflates sigma
    itself (masking: 3 x 500 among 23 drags sigma to ~169, z ~2.5)."""
    import datetime
    import statistics

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    base = [9.0 + 0.1 * i for i in range(20)]  # median ~10, tight MAD
    vals = base + [500.0] * 3
    t0 = datetime.datetime(2025, 1, 1)
    ev = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(seconds=i), 1, "click", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        [row] = A.timeseries_anomaly_mad(spark, "x").collect()
    finally:
        A._t = orig
    assert row["n_rows"] == 23
    assert row["n_anomalies"] == 3
    assert abs(row["med_value"] - statistics.median(vals)) < 1e-9
    assert row["max_robust_z"] > 3.0
    # classical z-score on the same series: the outlier cluster pulls
    # sigma to ~169, so each outlier's z is only ~2.5 — under the
    # 3-sigma bar. This masking is what the MAD entry guards against.
    mu = statistics.mean(vals)
    sd = statistics.stdev(vals)
    assert (500.0 - mu) / sd < 3.0


def test_neyman_allocation_favors_high_variance(spark):
    """Neyman semantics on planted strata: two equal-size strata, one
    near-constant and one high-variance — the variance stratum must win
    nearly the whole budget (k_h ∝ N_h·σ_h), the constant stratum keeps
    the floor of 1, per-stratum draws never exceed N_h, and the draw is
    deterministic across invocations."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t0 = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(100):
        rows.append((i, t0, 1, "flat", 10.0, "{}"))          # sigma ~0.0
        rows.append((1000 + i, t0, 1, "wild", float(i * i), "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out1 = A.sample_neyman_allocation(spark, "x").collect()
        out2 = A.sample_neyman_allocation(spark, "x").collect()
    finally:
        A._t = orig
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    alloc = {}
    for r in out1:
        alloc[r["event_type"]] = r["alloc_k"]
        assert r["alloc_k"] <= r["n_h"]
        assert r["draw_rank"] <= r["alloc_k"]
    assert alloc["flat"] == 1          # sigma = 0 -> floor allocation
    assert alloc["wild"] >= 90         # wins ~the whole 200 budget (cap n_h=100)
    drawn = [r for r in out1 if r["event_type"] == "wild"]
    assert len(drawn) == alloc["wild"]

    # degenerate corpus: EVERY stratum constant -> Neyman weights all 0;
    # the guard must fall back to equal allocation (200/2 capped at
    # n_h), not NULL-propagate into whole-table allocation
    ev2 = spark.createDataFrame(
        [(i, t0, 1, "a" if i % 2 == 0 else "b", 5.0, "{}")
         for i in range(200)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    A._t = lambda spark, sf_dir, name: ev2
    try:
        out3 = A.sample_neyman_allocation(spark, "x").collect()
    finally:
        A._t = orig
    alloc3 = {r["event_type"]: r["alloc_k"] for r in out3}
    assert alloc3 == {"a": 100, "b": 100}  # floor(200/2) == n_h == 100
    # and with a tighter budget the fallback is equal, not full-table
    A._t = lambda spark, sf_dir, name: ev2
    try:
        out4 = A.sample_neyman_allocation(spark, "x", total_k=10).collect()
    finally:
        A._t = orig
    assert {r["event_type"]: r["alloc_k"] for r in out4} == {"a": 5, "b": 5}


def test_max_drawdown_planted_curve(spark):
    """Drawdown semantics on a planted equity curve: values
    10, -5, 3, -10, 20 give cum 10,5,8,-2,18 / peak 10,10,10,10,18 /
    drawdown 0,5,2,12,0 — max drawdown 12 at the trough, peak 18."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t0 = datetime.datetime(2025, 1, 1)
    vals = [10.0, -5.0, 3.0, -10.0, 20.0]
    ev = spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(seconds=i), 7, "click", v, "{}")
            for i, v in enumerate(vals)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        [row] = A.window_max_drawdown(spark, "x").collect()
    finally:
        A._t = orig
    assert row["user_id"] == 7
    assert row["n_events"] == 5
    assert row["peak_equity"] == 18.0
    assert row["max_drawdown"] == 12.0


def test_sssp_matches_python_bellman_ford(spark):
    """The fixed-round Bellman-Ford core vs a plain-Python spec on
    randomized small weighted digraphs: identical (node, dist) maps —
    including the invariant that after R rounds dist is the min cost
    over paths of <= R edges, and that a multi-hop path through cheap
    edges beats a direct expensive edge."""
    import random

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import sssp_loop

    INF = 2**62

    def py_bf(edges, seeds, rounds):
        nodes = {a for a, _, _ in edges} | {b for _, b, _ in edges} | set(seeds)
        dist = {n: (0 if n in seeds else INF) for n in nodes}
        for _ in range(rounds):
            new = dict(dist)
            for a, b, w in edges:
                if dist[a] + w < new[b]:
                    new[b] = dist[a] + w
            dist = new
        return {n: d for n, d in dist.items() if d < INF}

    rng = random.Random(987)
    for trial in range(10):
        n_nodes = rng.randint(2, 10)
        edges = sorted(
            {
                (rng.randrange(n_nodes), rng.randrange(n_nodes))
                for _ in range(rng.randint(1, 18))
            }
        )
        edges = [
            (a, b, rng.randint(1, 9)) for a, b in edges if a != b
        ]
        if not edges:
            continue
        nodes_in = sorted({a for a, _, _ in edges})
        seeds = rng.sample(nodes_in, k=min(len(nodes_in), rng.randint(1, 2)))
        rounds = rng.randint(1, 3)
        edf = spark.createDataFrame(edges, "src long, dst long, w long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {
            r["node"]: r["dist"]
            for r in sssp_loop(edf, sdf, rounds).collect()
        }
        # sssp_loop reports seeds + relaxed nodes; unreached nodes carry
        # the sentinel only if they appeared as a seed-side key — filter
        # to finite distances for comparison
        got = {n: d for n, d in got.items() if d < INF}
        assert got == py_bf(edges, seeds, rounds), (trial, edges, seeds, rounds)

    # deterministic micro-case: 2-hop cheap path (1+1) beats direct 9
    edf = spark.createDataFrame(
        [(0, 1, 9), (0, 2, 1), (2, 1, 1)], "src long, dst long, w long"
    )
    sdf = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["dist"] for r in sssp_loop(edf, sdf, 2).collect()}
    assert got[1] == 2 and got[2] == 1 and got[0] == 0


def test_forecast_backtest_planted_seasonal(spark):
    """Seasonal-naive backtest semantics on planted series: a type
    whose day 2 repeats day 1 exactly scores MAPE 0 / bias 0 over 24
    scored hours; a type whose day 2 doubles day 1 scores APE 0.5 at
    every hour (|2v-v|/|2v|) and positive bias; a type with an EMPTY
    hourly grain on day 1 must EXCLUDE (not misalign) the matching
    day-2 hour — the case a lag-24-ROWS implementation gets wrong
    (it would silently read a 25h-old value and report nonzero APE)."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    t0 = datetime.datetime(2025, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        ts = t0 + datetime.timedelta(hours=h)
        base = 10.0 + (h % 24)
        rows.append((eid, ts, 1, "repeat", base, "{}")); eid += 1
        rows.append((eid, ts, 1, "double", base * (2.0 if h >= 24 else 1.0), "{}")); eid += 1
        if h != 5:  # day-1 hour 5 is an empty grain for this type
            rows.append((eid, ts, 1, "gappy", base, "{}")); eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = A._t
    A._t = lambda spark, sf_dir, name: ev
    try:
        out = {r["event_type"]: r for r in
               A.timeseries_forecast_backtest(spark, "x").collect()}
    finally:
        A._t = orig
    assert out["repeat"]["n_scored"] == 24
    assert out["repeat"]["mape"] == 0.0
    assert out["repeat"]["mean_bias"] == 0.0
    assert out["double"]["n_scored"] == 24
    assert out["double"]["mape"] == 0.5
    assert out["double"]["mean_bias"] > 0.0
    # hour 29 (day-2 hour 5) has no 24h-old counterpart: excluded, and
    # every scored gappy hour still matches exactly
    assert out["gappy"]["n_scored"] == 23
    assert out["gappy"]["mape"] == 0.0
    assert out["gappy"]["mean_bias"] == 0.0


def test_ks_bucketed_planted_distributions(spark):
    """KS semantics on planted snapshots: snapshot A uniform over the
    LOWER half of the price range, B over the UPPER half — the ECDF gap
    at the midpoint edge is ~1.0, so ks_d ~ 1; an identical-control
    pair scores exactly 0."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    da = datetime.date(1995, 1, 1)   # year <= 1997 -> snapshot A
    db = datetime.date(1999, 1, 1)   # snapshot B

    # disjoint halves: A in [0, 100), B in [100, 200)
    rows = [(float(i), da) for i in range(100)] + [
        (float(100 + i), db) for i in range(100)
    ]
    orders = spark.createDataFrame(rows, "o_totalprice double, o_orderdate date")
    orig = A._t
    A._t = lambda spark, sf_dir, name: orders
    try:
        out = A.dq_ks_bucketed(spark, "x").collect()
    finally:
        A._t = orig
    ks = out[0]["ks_d"]
    assert ks >= 0.98, ks
    # control: identical distributions in both snapshots
    rows = [(float(i), da) for i in range(100)] + [
        (float(i), db) for i in range(100)
    ]
    orders = spark.createDataFrame(rows, "o_totalprice double, o_orderdate date")
    A._t = lambda spark, sf_dir, name: orders
    try:
        out = A.dq_ks_bucketed(spark, "x").collect()
    finally:
        A._t = orig
    assert all(r["d"] == 0.0 for r in out)
    assert out[0]["ks_d"] == 0.0


def test_kcore_prune_contains_true_core(spark, sf_dir):
    """Fixed-round pruning must (a) be monotone (more rounds -> subset)
    and (b) always CONTAIN the true k-core fixpoint, computed by a
    plain-Python peel on the same edge set."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _KCORE_K,
        graph_kcore_prune,
    )

    r2 = {r.node for r in graph_kcore_prune(spark, sf_dir, rounds=2).collect()}
    r3 = {r.node for r in graph_kcore_prune(spark, sf_dir, rounds=3).collect()}
    assert r3 <= r2  # monotone shrink

    # plain-Python true k-core on the same symmetric trade graph
    from collections import defaultdict

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pairs = {
        (r.o_custkey, r.l_suppkey + 1000000)
        for r in li.filter(F.col("l_orderkey") % 20 == 0)
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .collect()
    }
    adj = defaultdict(set)
    for c, s in pairs:
        adj[c].add(s)
        adj[s].add(c)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < _KCORE_K]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    true_core = {n for n, nb in adj.items() if nb}
    assert true_core <= r3


def test_modularity_eval_properties(spark, sf_dir):
    """Modularity invariants: the __Q__ total equals the sum of exact
    per-community numerators (recomputed in Python), Q is within
    [-0.5, 1], and intra-edge + degree totals are conserved."""
    from fractions import Fraction

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        graph_modularity_eval,
    )

    import pytest

    rows = graph_modularity_eval(spark, sf_dir).collect()
    per = [r for r in rows if r.scope != "__Q__"]
    tot = next(r for r in rows if r.scope == "__Q__")
    assert tot.l2_intra == sum(r.l2_intra for r in per)
    assert tot.d_sum == sum(r.d_sum for r in per)
    e2 = tot.d_sum  # every directed edge contributes one degree
    q_exact = sum(
        Fraction(r.l2_intra * e2 - r.d_sum * r.d_sum, e2 * e2) for r in per
    )
    assert tot.q == pytest.approx(round(float(q_exact), 9))
    assert -0.5 <= tot.q <= 1.0


def test_cusum_matches_recurrence(spark, sf_dir):
    """The closed form (prefix sum minus running min) must equal the
    textbook recurrence S_t = max(0, S_{t-1} + x_t - k) replayed in
    plain Python per user."""
    from collections import defaultdict
    from decimal import Decimal

    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _CUSUM_K,
        timeseries_cusum_drift,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    k = Decimal(_CUSUM_K)
    series = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.user_id, r.ts, r.event_id)):
        series[r.user_id].append((r.event_id, Decimal(str(round(r.value, 6)))))
    # NB: Decimal(str(round(v,6))) == the engine's DECIMAL(18,6) cast for
    # these magnitudes
    expected = {}
    for uid, xs in series.items():
        s = Decimal(0)
        for eid, x in xs:
            s = max(Decimal(0), s + (x - k))
            expected[eid] = s
    got = {r.event_id: r for r in timeseries_cusum_drift(spark, sf_dir).collect()}
    assert len(got) == len(expected)
    for eid, s in expected.items():
        assert got[eid].cusum == pytest.approx(float(round(s, 6)), abs=1e-9)
        assert got[eid].drifting == (s > Decimal("5.0"))


def test_benford_check_shape(spark, sf_dir):
    """All nine digits present, frequencies sum to 1, chi2 terms are
    non-negative, and digit 1 is the most common (o_totalprice spans
    orders of magnitude, so it should lean Benford-ward)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        dq_benford_check,
    )

    rows = {r.digit: r for r in dq_benford_check(spark, sf_dir).collect()}
    assert set(rows) <= {str(d) for d in range(1, 10)}
    total_freq = sum(r.freq for r in rows.values())
    assert abs(total_freq - 1.0) < 1e-3
    assert all(r.chi2_term >= 0 for r in rows.values())


def test_covariance_matrix_matches_numpy(spark, sf_dir):
    """cov/corr from the exact-moment pass must match numpy population
    covariance on the same integer-unit data."""
    import numpy as np
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import (
        agg_covariance_matrix,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    ).collect()
    a = np.array([int(r.l_quantity) for r in li], dtype=np.int64)
    b = np.array([int(np.floor(r.l_extendedprice * 100 + 0.5)) for r in li])
    c = np.array([int(np.floor(r.l_discount * 100 + 0.5)) for r in li])
    got = {(r.col_a, r.col_b): r for r in agg_covariance_matrix(spark, sf_dir).collect()}

    def check(key, x, y, uu):
        r = got[key]
        cov = np.cov(x, y, bias=True)[0, 1] / uu
        corr = np.corrcoef(x, y)[0, 1]
        assert r.cov == pytest.approx(round(float(cov), 6), abs=1e-4)
        assert r.corr == pytest.approx(round(float(corr), 6), abs=1e-6)

    check(("quantity", "extendedprice"), a, b, 100.0)
    check(("quantity", "discount"), a, c, 100.0)
    check(("extendedprice", "discount"), b, c, 10000.0)


def test_poisson_bootstrap_statistics(spark, sf_dir):
    """Replicate weights behave like Poisson(1): n_eff ≈ n per
    replicate (Σw concentrates around n), replicate means concentrate
    around the true mean, and all replicates are distinct draws."""
    import statistics
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _BOOT_R,
        sample_poisson_bootstrap,
    )

    rows = sample_poisson_bootstrap(spark, sf_dir).collect()
    assert len(rows) == _BOOT_R
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_totalprice")
    vals = [r.o_totalprice for r in o.collect()]
    n, mu = len(vals), statistics.fmean(vals)
    for r in rows:
        assert abs(r.n_eff - n) < 5 * (n ** 0.5)  # Poisson(1) sum ~ N(n, n)
        assert r.boot_mean == pytest.approx(mu, rel=0.05)
    assert len({r.boot_mean for r in rows}) > 1  # genuinely different draws


def test_ab_proportions_matches_scipy_form(spark, sf_dir):
    """The z-score must equal the textbook pooled two-proportion formula
    recomputed in plain Python, and the cells must partition all users."""
    import math

    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        eval_ab_proportions,
    )

    r = eval_ab_proportions(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    pa, pb = r.conv_a / r.n_a, r.conv_b / r.n_b
    pool = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / r.n_a + 1 / r.n_b))
    z = (pb - pa) / se if se > 0 else 0.0
    assert r.z_score == pytest.approx(round(z, 6), abs=1e-6)
    assert 0 < pool < 1  # threshold keeps both classes populated


def test_referential_integrity_detects_planted_orphan(spark, sf_dir):
    """On the clean corpus every relationship reports zero orphans; a
    planted dangling FK and a NULL FK are classified separately."""
    from pipeline_apache_beam_entrega1_cs_spark.plans import analytics as A

    clean = {r.relationship: r
             for r in A.dq_referential_integrity(spark, sf_dir).collect()}
    assert all(r.n_orphans == 0 for r in clean.values())
    assert len(clean) == 5

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    broken = li.limit(2).withColumn(
        "l_orderkey",
        F.when(F.monotonically_increasing_id() == 0,
               F.lit(999999999)).otherwise(F.lit(None).cast("long")),
    ).unionByName(li)
    orig = A._t
    A._t = lambda s, d, t: broken if t == "lineitem" else orig(s, d, t)
    try:
        got = {r.relationship: r
               for r in A.dq_referential_integrity(spark, sf_dir).collect()}
    finally:
        A._t = orig
    r = got["lineitem->orders"]
    assert r.n_orphans == 1 and r.n_null_fk == 1
    assert r.n_child == li.count() + 2


def test_attribution_conserves_revenue(spark, sf_dir):
    """Linear attribution must conserve total purchase revenue up to the
    micro-cent floors (each purchase loses < k micro-units), and the
    channel set is the four pseudo-channels plus 'direct'."""
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        attribution_linear_touch,
    )

    rows = attribution_linear_touch(spark, sf_dir).collect()
    chans = {r.channel for r in rows}
    assert chans <= {"ch0", "ch1", "ch2", "ch3", "direct"}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select("value").collect()
    total_cents = sum(int(v.value * 100 + 0.5) for v in purchases)
    attributed = sum(r.attributed_revenue for r in rows)
    # floors lose at most (k-1)/1e6 per touched purchase
    assert attributed == pytest.approx(total_cents / 100.0, abs=len(purchases) * 1e-3)
    assert attributed <= total_cents / 100.0 + 1e-9


def test_gini_known_distributions(spark):
    """Gini invariants on planted distributions: perfectly equal
    revenue -> 0; one whale holding everything -> (n-1)/n; matches the
    textbook formula recomputed in Python on the real data shape."""
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans import analytics as A

    cust = spark.createDataFrame(
        [(i, "EQ") for i in range(4)] + [(i + 10, "WHALE") for i in range(4)],
        ["c_custkey", "c_mktsegment"],
    )
    orders = spark.createDataFrame(
        [(i, 100.0) for i in range(4)]       # equal: 100 each
        + [(13, 400.0)],                      # whale: one holds all
        ["o_custkey", "o_totalprice"],
    )
    orig = A._t
    A._t = lambda s, d, t: {"customer": cust, "orders": orders}[t]
    try:
        got = {r.segment: r for r in
               A.agg_gini_concentration(spark, "x").collect()}
    finally:
        A._t = orig
    assert got["EQ"].gini == pytest.approx(0.0)
    assert got["WHALE"].gini == pytest.approx((4 - 1) / 4)
    assert got["WHALE"].total_revenue == pytest.approx(400.0)


def test_seasonal_residual_properties(spark, sf_dir):
    """Residuals are mean-zero per hour bucket (within the micro-unit
    floor), sigma matches a numpy recomputation on the micro-residuals,
    and anomalies obey the 3-sigma rule exactly."""
    import numpy as np
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        timeseries_seasonal_residual,
    )

    rows = timeseries_seasonal_residual(spark, sf_dir).collect()
    resid = np.array([r.residual for r in rows])
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.filter(F.col("value").isNotNull()).count()
    assert len(rows) == n
    # per-hour mean-zero (floors bias < 1e-6 each)
    import collections
    by_hod = collections.defaultdict(list)
    for r in rows:
        by_hod[r.hod].append(r.residual)
    for hod, rs in by_hod.items():
        assert abs(sum(rs) / len(rs)) < 1e-4
    sig = rows[0].sigma
    # the flag tests floor(r_num/n_h)/1e6 while the reported residual is
    # ROUNDED to 6 dp, so reconstruct with a ±2-micro tolerance band
    for r in rows:
        if r.is_anomaly:
            assert abs(r.residual) > 3 * sig - 2e-6, r
        else:
            assert abs(r.residual) <= 3 * sig + 2e-6, r
    flagged = sum(r.is_anomaly for r in rows)
    assert 0 < flagged < n * 0.05  # a real but small 3-sigma tail


def test_k_anonymity_planted_violation(spark):
    """Planted micro-frame: one QI class of size 2 (< k = 5) must be
    flagged at_risk, the size-6 class must not, sizes sum to the row
    count, and table_share sums to 1."""
    from unittest import mock

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = [(i, 7, "AUTO") for i in range(6)] + [(10, 3, "RARE"), (11, 3, "RARE")]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey long, c_mktsegment string"
    )
    with mock.patch.object(A, "_t", lambda sp, sf, t: c):
        out = {(r.qi_nation, r.qi_segment): r
               for r in A.dq_k_anonymity(spark, "x").collect()}
    assert out[(7, "AUTO")].class_size == 6 and not out[(7, "AUTO")].at_risk
    assert out[(3, "RARE")].class_size == 2 and out[(3, "RARE")].at_risk
    assert sum(r.class_size for r in out.values()) == 8
    assert abs(sum(r.table_share for r in out.values()) - 1.0) < 1e-6


def test_geo_path_stats_matches_bruteforce(spark):
    """Per-user path length equals a pure-Python haversine walk over
    the same deterministic points in (ts, event_id) order; bbox is the
    min/max of the visited coordinates."""
    import datetime
    import math
    from unittest import mock

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = []
    for u in (1, 5, 42):
        for e in range(7):
            rows.append(
                (u, u * 100 + e,
                 datetime.datetime(2024, 3, 1, 10, e * 7 % 60, 0))
            )
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    with mock.patch.object(A, "_t", lambda sp, sf, t: ev):
        got = {r.user_id: r for r in A.geo_path_stats(spark, "x").collect()}

    def pt(u, e):
        return (((u * 7919 + e * 31) % 12000) / 100 - 60,
                ((u * 104729 + e * 17) % 36000) / 100 - 180)

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        h = (math.sin(math.radians(la2 - la1) / 2) ** 2
             + math.cos(math.radians(la1)) * math.cos(math.radians(la2))
             * math.sin(math.radians(lo2 - lo1) / 2) ** 2)
        return round(2 * 6371.0 * math.asin(math.sqrt(h)), 6)

    for u in (1, 5, 42):
        ordered = sorted(
            [(ts, eid) for (uu, eid, ts) in rows if uu == u]
        )
        path = [pt(u, eid) for (ts, eid) in ordered]
        total = sum(
            math.floor(hav(a, b) * 1_000_000)
            for a, b in zip(path, path[1:])
        ) / 1_000_000
        r = got[u]
        assert r.n_points == 7
        assert abs(r.path_km - round(total, 6)) < 1e-9, (u, r.path_km, total)
        assert r.min_lat == min(p[0] for p in path)
        assert r.max_lon == max(p[1] for p in path)


def test_funnel_windowed_tighter_than_unwindowed(spark, sf_dir):
    """The 1-hour-window funnel can never count MORE conversions than
    the unwindowed funnel on the same events, and its stage counts obey
    the funnel monotonicity n_view >= n_click_1h >= n_purchase_1h."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    w = A.analytics_funnel_windowed(spark, sf_dir).collect()[0]
    u = A.funnel_conversion(spark, sf_dir).collect()[0]
    assert w.n_users == u.n_users and w.n_view == u.n_view
    assert w.n_click_1h <= u.n_click_after_view
    assert w.n_purchase_1h <= u.n_purchase_after_click
    assert w.n_view >= w.n_click_1h >= w.n_purchase_1h


def test_funnel_windowed_planted_boundaries(spark):
    """Hand-built events: a click exactly at t1+1h counts (closed upper
    bound), one second later does not; a purchase before the qualifying
    click never counts."""
    import datetime
    from unittest import mock

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def s(mins, secs=0):
        return T0 + datetime.timedelta(minutes=mins, seconds=secs)

    rows = [
        # user 1: click at exactly +60min (counts), purchase +61min ok
        (1, 1, "view", s(0)), (1, 2, "click", s(60)), (1, 3, "purchase", s(61)),
        # user 2: click at +60min +1s (does NOT count)
        (2, 4, "view", s(0)), (2, 5, "click", s(60, 1)),
        # user 3: purchase BEFORE its click -> no purchase credit
        (3, 6, "view", s(0)), (3, 7, "purchase", s(10)), (3, 8, "click", s(20)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts timestamp"
    )
    with mock.patch.object(A, "_t", lambda sp, sf, t: ev):
        r = A.analytics_funnel_windowed(spark, "x").collect()[0]
    assert (r.n_users, r.n_view) == (3, 3)
    assert r.n_click_1h == 2      # users 1 and 3
    assert r.n_purchase_1h == 1   # user 1 only


def test_vocab_growth_monotone_and_exact_total(spark, sf_dir):
    """Heaps curve invariants: vocab_size is nondecreasing, the last
    checkpoint equals the corpus's exact distinct token count, n_docs
    at checkpoint 10 equals the corpus size, and growth per checkpoint
    never exceeds the tokens addable by the docs in that slice."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L
    from pyspark.sql import functions as F

    rows = sorted(
        L.text_vocab_growth(spark, sf_dir).collect(),
        key=lambda r: r.checkpoint,
    )
    assert [r.checkpoint for r in rows] == list(range(1, 11))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.trim("text") != ""
    )
    n_docs = docs.count()
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("t")
        ).select("t").distinct().count()
    )
    assert rows[-1].n_docs == n_docs
    assert rows[-1].vocab_size == vocab
    prev = 0
    for r in rows:
        assert r.vocab_size >= prev
        prev = r.vocab_size


def test_group_aware_split_never_splits_duplicates(spark):
    """Planted duplicate groups: two exact copies and a
    whitespace/case variant of the same text must land in the SAME
    split (the split is a function of normalized content), and the
    group counts reflect the collapse."""
    from unittest import mock

    import pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops as P
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma", 16),
        (2, "alpha beta gamma", 16),          # exact copy
        (3, "  ALPHA   beta GAMMA ", 21),     # normalizes to the same
        (4, "something completely different", 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    with mock.patch.object(P, "_t", lambda sp, sf, t: docs):
        out = P.dataset_split_group_aware(spark, "x").collect()
    assert sum(r.n_docs for r in out) == 4
    assert sum(r.n_groups for r in out) == 2  # two content groups
    # the 3-dup group is indivisible: its whole surplus (3 docs - 1
    # group = 2) sits in ONE split — no split holds a partial group
    surpluses = [r.n_docs - r.n_groups for r in out]
    assert sum(surpluses) == 2 and max(surpluses) == 2


def test_rfm_quintiles_balanced_and_coded(spark, sf_dir):
    """RFM invariants: quintile labels are 1..5, each quintile holds
    between 10% and 30% of customers (exact-percentile cuts on ~uniform
    metrics), rfm_code == 100r+10f+m, and the best-recency customers
    (max recency_day) sit in r_q = 5."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = A.analytics_rfm_segmentation(spark, sf_dir).collect()
    n = len(rows)
    for dim in ("r_q", "f_q", "m_q"):
        vals = [getattr(r, dim) for r in rows]
        assert set(vals) <= {1, 2, 3, 4, 5}
        for q in (1, 5):  # the extreme buckets exist and are plausible
            share = vals.count(q) / n
            assert 0.05 < share < 0.45, (dim, q, share)
    for r in rows:
        assert r.rfm_code == r.r_q * 100 + r.f_q * 10 + r.m_q
    best_rec = max(r.recency_day for r in rows)
    assert all(r.r_q == 5 for r in rows if r.recency_day == best_rec)


def test_cohort_ltv_consistency(spark, sf_dir):
    """LTV curve invariants: per cohort, ltv_per_customer is
    nondecreasing in age; revenue sums across all (cohort, age) cells
    equal the table's total; cohort sizes sum to the distinct customer
    count."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    rows = A.analytics_cohort_ltv(spark, sf_dir).collect()
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    total = float(
        o.agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).first()[0]
    )
    assert abs(sum(r.revenue for r in rows) - total) < 1e-2
    n_cust = o.select("o_custkey").distinct().count()
    sizes = {}
    for r in rows:
        sizes[r.cohort_year] = r.n_customers
    assert sum(sizes.values()) == n_cust
    from collections import defaultdict
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r.cohort_year].append(r)
    for ages in by_cohort.values():
        ages.sort(key=lambda r: r.age_years)
        prev = 0.0
        for r in ages:
            assert r.ltv_per_customer >= prev - 1e-9
            prev = r.ltv_per_customer


def test_bottom_k_sample_mergeable(spark, sf_dir):
    """KMV mergeability: bottom-k of the union of per-half bottom-k's
    equals the global bottom-k, and a re-run is bit-identical."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops as P
    from pyspark.sql import functions as F

    k = P._BOTTOM_K
    full = P.sample_bottom_k_sketch(spark, sf_dir).collect()
    assert len({r.doc_id for r in full}) == len(full) <= k
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.select(
        "doc_id", "source",
        F.md5(F.concat(F.lit("bks:"), F.col("doc_id").cast("string"))).alias(
            "sample_key"
        ),
    )
    halves = [
        raw.filter(F.col("doc_id") % 2 == i).orderBy("sample_key").limit(k)
        for i in (0, 1)
    ]
    merged = (
        halves[0].unionByName(halves[1]).orderBy("sample_key").limit(k)
    ).collect()
    assert sorted(map(tuple, merged)) == sorted(map(tuple, full))
    again = P.sample_bottom_k_sketch(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, full))


def test_average_precision_matches_bruteforce(spark, sf_dir):
    """AP must equal a pure-Python computation with the same
    block-end-precision tie convention over the same (logit, label)
    pairs, and sit in [0, 1]; a perfect ranking on a planted frame
    gives AP = 1."""
    from collections import defaultdict

    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L
    from pipeline_apache_beam_entrega1_cs_spark.operators import textops as T
    from pyspark.sql import functions as F

    r = L.eval_average_precision(spark, sf_dir).collect()[0]
    model = L.text_quality_model(spark, sf_dir).select("doc_id", "logit")
    labels = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        (T.quality_score_col(F.col("text")) >= 0.7).cast("long").alias("y"),
    )
    pairs = [(p.logit, p.y) for p in model.join(labels, "doc_id").collect()]
    blocks = defaultdict(lambda: [0, 0])
    for logit, y in pairs:
        blocks[logit][0] += y
        blocks[logit][1] += 1 - y
    tp = tot = 0
    pico = 0
    for logit in sorted(blocks, reverse=True):
        pos, neg = blocks[logit]
        tp += pos
        tot += pos + neg
        pico += pos * ((tp * 10**12) // tot)
    n_pos = sum(v[0] for v in blocks.values())
    expect = round(pico / 10**12 / n_pos, 6)
    assert abs(r.avg_precision - expect) < 1e-9, (r.avg_precision, expect)
    assert 0.0 <= r.avg_precision <= 1.0
    assert r.n_pos == n_pos


def test_acf_matches_numpy_and_bounds(spark, sf_dir):
    """ACF must match a pure-Python moment computation over the same
    hourly micro-unit series (same gap semantics: only existing
    (t, t+l) hour pairs contribute), and lag-0 autocorrelation of any
    series is 1 by the same formula."""
    import math
    from collections import defaultdict

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    got = {(r.event_type, r.lag): r for r in
           A.timeseries_acf_lags(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    series_rows = (
        ev.groupBy(
            "event_type",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts")))
            .cast("bigint").alias("hour_s"),
        )
        .agg(F.sum(F.floor(F.col("value") * 1_000_000).cast("long")).alias("x"))
        .collect()
    )
    series = defaultdict(dict)
    for r in series_rows:
        series[r.event_type][r.hour_s] = r.x
    for (etype, lag), r in got.items():
        s = series[etype]
        n = len(s)
        sx = sum(s.values())
        sxx = sum(v * v for v in s.values())
        xbar = sx / n
        pairs = [(x, s[h + 3600 * lag]) for h, x in s.items()
                 if h + 3600 * lag in s]
        assert len(pairs) == r.n_pairs
        sxy = sum(a * b for a, b in pairs)
        sh = sum(a for a, _ in pairs)
        st = sum(b for _, b in pairs)
        num = sxy - xbar * (sh + st) + len(pairs) * xbar * xbar
        den = sxx - n * xbar * xbar
        assert abs(r.acf - round(num / den, 6)) < 1e-6, (etype, lag)


def test_m4_downsample_matches_bruteforce(spark):
    """M4 picks equal a pure-Python bucket walk over a planted series
    (same micro-units, same bucket arithmetic, same composite-key tie
    handling), and every bucket satisfies min <= first,last <= max."""
    import datetime
    import math
    from collections import defaultdict
    from unittest import mock

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = []
    for e in range(500):
        epoch = 1_700_000_000 + e * 137
        val = math.sin(e / 5.0) * 50 + (e * 7919 % 101)
        rows.append(("t%d" % (e % 2), e,
                     datetime.datetime.utcfromtimestamp(epoch), float(val)))
    ev = spark.createDataFrame(
        rows, "event_type string, event_id long, ts timestamp, value double"
    )
    with mock.patch.object(A, "_t", lambda sp, sf, t: ev):
        got = {(r.event_type, r.bucket): r
               for r in A.timeseries_m4_downsample(spark, "x").collect()}

    # NOTE: createDataFrame timestamps are session-tz-interpreted; use
    # the plan's own epoch reading for the reference walk
    eps = {r.event_id: None for r in []}
    from pyspark.sql import functions as F
    epochs = {r.event_id: r.es for r in ev.select(
        "event_id", F.unix_timestamp("ts").cast("bigint").alias("es")).collect()}

    series = defaultdict(list)
    for etype, e, ts, val in rows:
        ym = math.floor(val * 1_000_000)
        es = epochs[e]
        series[etype].append((es, e, ym))
    B = A._M4_BUCKETS
    for etype, pts in series.items():
        lo = min(p[0] for p in pts)
        hi = max(p[0] for p in pts)
        buckets = defaultdict(list)
        for es, e, ym in pts:
            b = min(B - 1, int((es - lo) * B / (hi - lo + 1))) if hi > lo else 0
            buckets[b].append((es * 10_000_000 + e, ym))
        for b, members in buckets.items():
            r = got[(etype, b)]
            assert r.n_points == len(members)
            first = min(members)[1]
            last = max(members)[1]
            vals = [m[1] for m in members]
            assert r.first_val == round(first / 1e6, 6)
            assert r.last_val == round(last / 1e6, 6)
            assert r.min_val == round(min(vals) / 1e6, 6)
            assert r.max_val == round(max(vals) / 1e6, 6)
            assert r.min_val <= r.first_val <= r.max_val
            assert r.min_val <= r.last_val <= r.max_val


def test_chi2_drift_matches_bruteforce(spark, sf_dir):
    """Chi-square cells recompute exactly from the raw contingency
    counts; row sums and expected sums agree; contributions are
    nonnegative."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    rows = {r.event_type: r
            for r in A.dq_chi2_categorical_drift(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cells = (
        ev.select(
            "event_type",
            ((F.unix_timestamp("ts").cast("bigint") / 86400)
             .cast("bigint") % 2).alias("p"),
        )
        .groupBy("event_type", "p").count().collect()
    )
    obs = {}
    for c in cells:
        obs.setdefault(c.event_type, [0, 0])[c.p] = c["count"]
    tot_a = sum(v[0] for v in obs.values())
    tot_b = sum(v[1] for v in obs.values())
    n = tot_a + tot_b
    for etype, (oa, ob) in obs.items():
        r = rows[etype]
        assert (r.obs_a, r.obs_b) == (oa, ob)
        ea = (oa + ob) * tot_a / n
        eb = (oa + ob) * tot_b / n
        assert abs(r.exp_a - round(ea, 6)) < 1e-9
        contrib = (oa - ea) ** 2 / ea + (ob - eb) ** 2 / eb
        assert abs(r.chi2_contrib - round(contrib, 6)) < 1e-6
        assert r.chi2_contrib >= 0


def test_pareto_share_matches_bruteforce(spark, sf_dir):
    """The Pareto cut equals a Python sort: smallest top-revenue prefix
    whose cumulative micro-cent revenue reaches 80% of the total (exact
    integer threshold), with the achieved share."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    r = A.analytics_pareto_share(spark, sf_dir).collect()[0]
    per = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum((F.col("o_totalprice") * 100).cast("decimal(38,0)"))
             .cast("decimal(38,0)").alias("rev"))
        .collect()
    )
    revs = sorted(
        ((int(p.rev), p.o_custkey) for p in per),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(v for v, _ in revs)
    cum = 0
    for i, (v, _) in enumerate(revs, start=1):
        cum += v
        if cum * 10 >= total * 8:
            break
    assert r.n_cust == len(revs)
    assert r.n_top == i, (r.n_top, i)
    assert abs(r.revenue_share - round(cum / total, 6)) < 1e-6


def test_dau_mau_stickiness_bounds_and_samples(spark, sf_dir):
    """mau >= dau and stickiness in (0, 1] everywhere; for three
    sampled days, mau equals the brute-force trailing-30-day distinct
    user count."""
    import datetime

    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    rows = {r.day: r
            for r in A.analytics_dau_mau_stickiness(spark, sf_dir).collect()}
    assert rows
    for r in rows.values():
        assert r.mau >= r.dau >= 1
        assert 0 < r.stickiness <= 1
    du = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.to_date("ts").alias("day"), "user_id").distinct().collect()
    )
    days = sorted({r.day for r in du})
    for day in (days[0], days[len(days) // 2], days[-1]):
        lo = day - datetime.timedelta(days=29)
        expect = len({r.user_id for r in du if lo <= r.day <= day})
        assert rows[str(day)].mau == expect, day


def test_fifo_allocation_matches_sequential_simulation(spark, sf_dir):
    """The set-based interval-overlap FIFO join reproduces the textbook
    sequential allocation loop exactly: per part, walk demands in
    (shipdate, orderkey, linenumber) order, consuming supplies in the
    same order, emitting (demand, supply, qty) slices."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from pyspark.sql import functions as F

    out = {
        (r.l_partkey, r.d_orderkey, r.d_linenumber,
         r.s_orderkey, r.s_linenumber): r.alloc_qty
        for r in A.analytics_fifo_allocation(spark, sf_dir).collect()
    }
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_partkey", "l_orderkey", "l_linenumber",
                "l_returnflag", "l_shipdate",
                F.floor("l_quantity").cast("long").alias("qty"))
        .collect()
    )
    from collections import defaultdict
    dem, sup = defaultdict(list), defaultdict(list)
    for r in li:
        (dem if r.l_returnflag == "R" else sup)[r.l_partkey].append(
            (r.l_shipdate, r.l_orderkey, r.l_linenumber, r.qty))
    expect = {}
    for pk, ds in dem.items():
        ds.sort()
        ss = sorted(sup.get(pk, []))
        si, s_rem = 0, ss[0][3] if ss else 0
        for (_, dok, dln, dq) in ds:
            need = dq
            while need > 0 and si < len(ss):
                take = min(need, s_rem)
                if take > 0:
                    expect[(pk, dok, dln, ss[si][1], ss[si][2])] = take
                need -= take
                s_rem -= take
                if s_rem == 0:
                    si += 1
                    s_rem = ss[si][3] if si < len(ss) else 0
    assert out == expect
    assert len(out) > 0


def test_moments_skew_kurtosis_match_numpy(spark, sf_dir):
    """The integer-moment-numerator algebra equals numpy's population
    skewness/excess-kurtosis to 6 dp, per flag scope and overall."""
    import numpy as np
    import pipeline_apache_beam_entrega1_cs_spark.plans.relational as R

    rows = {r.scope: r for r in
            R.agg_moments_skew_kurtosis(spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity").collect()
    import collections
    by_scope = collections.defaultdict(list)
    for r in li:
        q = float(int(r.l_quantity))
        by_scope[r.l_returnflag].append(q)
        by_scope["__all__"].append(q)
    for scope, xs in by_scope.items():
        a = np.asarray(xs)
        m2 = ((a - a.mean()) ** 2).mean()
        m3 = ((a - a.mean()) ** 3).mean()
        m4 = ((a - a.mean()) ** 4).mean()
        r = rows[scope]
        assert r.n == len(xs)
        assert abs(r.mean_qty - round(a.mean(), 6)) < 1e-6
        assert abs(r.skewness - m3 / m2 ** 1.5) < 1e-5, scope
        assert abs(r.ex_kurtosis - (m4 / m2 ** 2 - 3)) < 1e-5, scope


def test_prefix_filter_join_is_lossless_and_prunes(spark, sf_dir):
    """The prefix-filter lemma in practice: (a) the filtered join's
    output EQUALS the brute-force all-shared-token join's qualifying
    set (losslessness); (b) the prefix index is strictly smaller than
    the full incidence index (the point of the idiom)."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    num, den = L._PPJ_TAU_NUM, L._PPJ_TAU_DEN
    got = {
        (r.doc_a, r.doc_b): (r.n_common, r.jaccard)
        for r in L.dedup_prefix_filter_join(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    sets = {
        d.doc_id: frozenset(d.text.lower().strip().split())
        for d in docs if d.text.strip()
    }
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and den * inter >= num * union:
                expect[(a, b)] = (inter, round(inter / union, 6))
    assert got == expect
    assert len(got) > 0
    # (b) pruning: total prefix length < total token incidence
    n_tok = sum(len(s) for s in sets.values())
    n_pref = sum(
        len(s) - (num * len(s) + den - 1) // den + 1 for s in sets.values()
    )
    assert n_pref < n_tok


def test_functional_dependency_matches_bruteforce(spark, sf_dir):
    """The FD audit equals a Python dict walk: per candidate FD, the
    distinct-RHS-per-LHS map, its violation count and worst key."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from collections import defaultdict

    rows = {r.fd: r for r in
            A.dq_functional_dependency(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    for fd_name, lhs, rhs in A._FD_TESTS:
        m = defaultdict(set)
        for o in orders:
            m[o[lhs]].add(o[rhs])
        r = rows[fd_name]
        assert r.n_lhs == len(m)
        assert r.n_violating == sum(1 for v in m.values() if len(v) > 1)
        assert r.max_rhs_per_lhs == max(len(v) for v in m.values())
        assert r.holds == int(r.n_violating == 0)
    assert rows["o_orderkey->o_custkey"].holds == 1  # PK by construction


def test_markov_transitions_match_bruteforce(spark, sf_dir):
    """Transition counts equal a per-user sequential pair walk ordered
    by (ts, event_id); probabilities row-normalize exactly."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from collections import Counter, defaultdict

    got = {(r.from_type, r.to_type): (r.n_trans, r.p) for r in
           A.analytics_markov_transitions(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs = defaultdict(list)
    for e in ev:
        seqs[e.user_id].append((e.ts, e.event_id, e.event_type))
    counts = Counter()
    for s in seqs.values():
        s.sort()
        for a, b in zip(s, s[1:]):
            counts[(a[2], b[2])] += 1
    marg = Counter()
    for (f, _), c in counts.items():
        marg[f] += c
    expect = {k: (c, round(c / marg[k[0]], 6)) for k, c in counts.items()}
    assert got == expect


def test_embedding_label_outliers_match_numpy(spark, sf_dir):
    """The integer-D2 ranking equals an arbitrary-precision numpy/
    Python recompute of n²U²·||x − centroid||² per label, including the
    (D2 desc, vec_id) tie order and the reported double distance."""
    import math
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L
    from collections import defaultdict

    U, K = L._OUTLIER_U, L._OUTLIER_TOPK
    got = defaultdict(list)
    for r in L.embedding_label_outliers(spark, sf_dir).collect():
        got[r.label].append((r.rank, r.vec_id, r.dist_to_centroid))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    by_label = defaultdict(list)
    for e in emb:
        xu = [math.floor(float(v) * U) for v in e.embedding]
        by_label[e.label].append((e.vec_id, xu))
    for label, rows in by_label.items():
        n = len(rows)
        sums = [sum(x[d] for _, x in rows) for d in range(len(rows[0][1]))]
        d2s = sorted(
            (-sum((n * x[d] - sums[d]) ** 2 for d in range(len(x))), vid)
            for vid, x in rows
        )
        expect = [
            (i + 1, vid, round(math.sqrt(float(-negd2)) / (n * U), 6))
            for i, (negd2, vid) in enumerate(d2s[:K])
        ]
        assert sorted(got[label]) == expect, label


def test_l_diversity_matches_bruteforce(spark, sf_dir):
    """Per QI class: size and distinct-sensitive-band count equal a
    Python set walk; below_l flags exactly the l < 3 classes."""
    import math
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from collections import defaultdict

    got = {(r.qi_nation, r.qi_segment): (r.class_size, r.l_distinct,
                                         r.below_l)
           for r in A.dq_l_diversity(spark, sf_dir).collect()}
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    size, bands = defaultdict(int), defaultdict(set)
    for c in cust:
        k = (c.c_nationkey, c.c_mktsegment)
        size[k] += 1
        bands[k].add(math.floor(c.c_acctbal / 1000))
    expect = {k: (size[k], len(bands[k]), len(bands[k]) < A._LDIV_L)
              for k in size}
    assert got == expect


def test_reconciliation_totals_matches_decimal_recompute(spark, sf_dir):
    """The reconciliation report equals a Python Decimal recompute of
    per-order charges vs stored totals (exact 4-dp arithmetic)."""
    from decimal import Decimal
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from collections import defaultdict

    r = A.dq_reconciliation_totals(spark, sf_dir).collect()[0]
    q = Decimal("0.0001")
    per = defaultdict(Decimal)
    seen = set()
    for li in spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect():
        ep = Decimal(str(li.l_extendedprice)).quantize(q)
        dc = Decimal(str(li.l_discount)).quantize(q)
        tx = Decimal(str(li.l_tax)).quantize(q)
        per[li.l_orderkey] += ep * (1 - dc) * (1 + tx)
        seen.add(li.l_orderkey)
    n_orders = n_no = n_exact = n_cent = n_mis = 0
    mx = Decimal(0)
    for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
        n_orders += 1
        if o.o_orderkey not in seen:
            n_no += 1
            continue
        d = abs(per[o.o_orderkey] - Decimal(str(o.o_totalprice)).quantize(q))
        mx = max(mx, d)
        if d == 0:
            n_exact += 1
        elif d <= Decimal("0.01"):
            n_cent += 1
        else:
            n_mis += 1
    assert (r.n_orders, r.n_no_lines, r.n_exact, r.n_within_cent,
            r.n_mismatched) == (n_orders, n_no, n_exact, n_cent, n_mis)
    assert abs(r.max_abs_diff - float(round(mx, 4))) < 1e-9
    assert r.n_orders == r.n_no_lines + r.n_exact + r.n_within_cent + \
        r.n_mismatched


def test_iqr_fences_match_bruteforce(spark, sf_dir):
    """Quartiles (percentile_disc on micro-units), fences and outlier
    counts equal a Python sort walk per event type."""
    import math
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    from collections import defaultdict

    got = {r.event_type: r for r in
           A.dq_outlier_iqr_fences(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type = defaultdict(list)
    for e in ev:
        if e.value is not None:
            by_type[e.event_type].append(math.floor(e.value * A._IQR_U))
    for t, xs in by_type.items():
        xs.sort()
        n = len(xs)
        q1 = xs[math.ceil(n / 4) - 1]
        q3 = xs[math.ceil(3 * n / 4) - 1]
        iqr = q3 - q1
        lo = sum(1 for v in xs if 2 * v < 2 * q1 - 3 * iqr)
        hi = sum(1 for v in xs if 2 * v > 2 * q3 + 3 * iqr)
        r = got[t]
        assert r.n == n
        assert abs(r.q1 - round(q1 / A._IQR_U, 6)) < 1e-9
        assert abs(r.q3 - round(q3 / A._IQR_U, 6)) < 1e-9
        assert (r.n_low_outliers, r.n_high_outliers) == (lo, hi), t


def test_welch_ttest_matches_bruteforce(spark, sf_dir):
    """t and the Welch-Satterthwaite df equal a Python recompute on the
    same micro-unit grid (ddof=1 variances)."""
    import math
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    r = A.stat_welch_ttest(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    groups = {"purchase": [], "click": []}
    for e in ev:
        if e.value is not None and e.event_type in groups:
            groups[e.event_type].append(math.floor(e.value * A._STAT_U))
    a, b = groups["purchase"], groups["click"]
    U = float(A._STAT_U)

    def stats(xs):
        n = len(xs)
        s = sum(xs)
        q = sum(x * x for x in xs)
        mean = s / n / U
        var = (q - s * s / n) / (n - 1) / (U * U)
        return n, mean, var

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    se2 = va / na + vb / nb
    t = (ma - mb) / math.sqrt(se2)
    df = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.mean_a - ma) < 1.01e-6
    assert abs(r.mean_b - mb) < 1.01e-6
    assert abs(r.t_stat - t) < 1.01e-6
    assert abs(r.df_welch - df) < 1.01e-6


def test_anova_f_matches_bruteforce(spark, sf_dir):
    """SSB/SSW/F equal a Python recompute; the pivoted type domain is
    exactly the fixture's event-type set (the pivot's guard)."""
    import math
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    r = A.stat_anova_f(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    assert {e.event_type for e in ev} == set(A._ANOVA_TYPES)
    by = defaultdict(list)
    for e in ev:
        if e.value is not None:
            by[e.event_type].append(math.floor(e.value * A._STAT_U))
    U2 = float(A._STAT_U) ** 2
    n = sum(len(xs) for xs in by.values())
    s = sum(sum(xs) for xs in by.values())
    q = sum(x * x for xs in by.values() for x in xs)
    ssb = (sum(sum(xs) ** 2 / len(xs) for xs in by.values()) - s * s / n) / U2
    sst = (q - s * s / n) / U2
    ssw = sst - ssb
    k = len(by)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.n, r.k) == (n, k)
    assert abs(r.ssb - ssb) < max(1e-9 * abs(ssb), 1.01e-6)
    assert abs(r.ssw - ssw) < max(1e-9 * abs(ssw), 1.01e-6)
    assert abs(r.f_stat - f) < 1.01e-6


def test_spearman_matches_bruteforce(spark, sf_dir):
    """rho equals a Python average-tie-rank recompute (sort + Pearson
    on ranks); the doubled-rank sums obey the n(n+1) invariant."""
    import math
    from collections import Counter
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    r = A.agg_spearman_corr(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    xs = [int(row.l_quantity) for row in li]
    ys = [row.l_extendedprice for row in li]
    n = len(xs)
    assert r.n == n

    def avg_ranks(vals):
        c = Counter(vals)
        ranks, cum = {}, 0
        for v in sorted(c):
            ranks[v] = cum + (c[v] + 1) / 2
            cum += c[v]
        return [ranks[v] for v in vals]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    sx, sy = sum(rx), sum(ry)
    assert sx == sy == n * (n + 1) / 2
    sxy = sum(a * b for a, b in zip(rx, ry))
    sxx = sum(a * a for a in rx)
    syy = sum(b * b for b in ry)
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(r.spearman_rho - rho) < 1.01e-6


def test_assortativity_matches_bruteforce(spark, sf_dir):
    """Newman's r equals a Python recompute over the same sampled
    co-purchase edge set (both orientations' degree pairs)."""
    from collections import defaultdict
    from itertools import combinations
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    r = A.graph_degree_assortativity(spark, sf_dir).collect()[0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per_order = defaultdict(set)
    for row in li:
        if row.l_orderkey % 20 == 0:
            per_order[row.l_orderkey].add(row.l_partkey)
    edges = {tuple(sorted(p))
             for parts in per_order.values()
             for p in combinations(parts, 2)}
    assert r.n_edges == len(edges)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    pairs = [(deg[u], deg[v]) for u, v in edges] + \
            [(deg[v], deg[u]) for u, v in edges]
    m = len(pairs)
    sx = sum(a for a, _ in pairs)
    sxy = sum(a * b for a, b in pairs)
    sxx = sum(a * a for a, _ in pairs)
    expect = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    assert abs(r.assortativity - expect) < 1.01e-6


def test_interval_gaps_match_bruteforce(spark, sf_dir):
    """Gaps equal a plain-Python interval merge + complement walk over
    the same padded events; every gap is strictly positive and lies
    between two islands of the coalesce entry."""
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = defaultdict(list)
    for r in A.interval_gap_extraction(spark, sf_dir).collect():
        got[r.user_id].append((r.gap_idx, r.gap_start_s, r.gap_end_s, r.gap_s))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    per_user = defaultdict(list)
    for e in ev:
        s = int(e.ts.timestamp())
        per_user[e.user_id].append((s, s + A._COALESCE_PAD_S))
    for uid, ivs in per_user.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        expect = [
            (i, merged[i - 1][1], merged[i][0], merged[i][0] - merged[i - 1][1])
            for i in range(1, len(merged))
        ]
        assert sorted(got.get(uid, [])) == expect, uid
        assert all(g[3] > 0 for g in expect)


def test_candidate_keys_match_bruteforce(spark, sf_dir):
    """Distinct-combo counts equal Python set sizes per candidate; the
    true PK is flagged as a key, the known-duplicated FK is not."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {r.candidate: r for r in A.dq_candidate_keys(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    assert set(got) == {"+".join(c) for c in A._CK_CANDIDATES}
    for cols in A._CK_CANDIDATES:
        combos = {tuple(str(getattr(o, c)) for c in cols) for o in orders}
        r = got["+".join(cols)]
        assert r.n_rows == len(orders)
        assert r.n_distinct == len(combos), cols
        assert r.dup_rows == len(orders) - len(combos)
        assert r.is_key == (len(combos) == len(orders))
    assert got["o_orderkey"].is_key is True
    assert got["o_custkey"].is_key is False


def test_file_skipping_stats_match_bruteforce(spark, sf_dir):
    """Zone-map skip counts equal a Python recompute of per-file
    min/max vs the probe window; the date-clustered layout skips most
    files while the hash layout skips none (the clustering cliff)."""
    import hashlib
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops as P
    from datetime import date

    got = {r.layout: r for r in
           P.maintenance_file_skipping_stats(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    lo = date.fromisoformat(P._SKIP_LO)
    hi = date.fromisoformat(P._SKIP_HI)
    for layout in ("date", "hash"):
        zones = defaultdict(list)
        for o in orders:
            d = o.o_orderdate.date() if hasattr(o.o_orderdate, "date") \
                else o.o_orderdate
            if layout == "date":
                fid = (d.year - 1995) * 4 + (d.month - 1) // 3
            else:
                fid = int(hashlib.md5(str(o.o_orderkey).encode())
                          .hexdigest()[:8], 16) % P._SKIP_HASH_FILES
            zones[fid].append(d)
        skip = {f for f, ds in zones.items()
                if max(ds) < lo or min(ds) > hi}
        r = got[layout]
        assert r.n_files == len(zones)
        assert r.n_skippable == len(skip)
        assert r.rows_total == len(orders)
        assert r.rows_skipped == sum(len(zones[f]) for f in skip)
    assert got["date"].n_skippable >= got["date"].n_files - 2
    assert got["hash"].n_skippable == 0


def test_yoy_growth_matches_decimal_recompute(spark, sf_dir):
    """Monthly revenue and the aligned YoY percentage equal a Python
    Decimal recompute; months with no prior-year month carry NULLs."""
    from collections import defaultdict
    from decimal import Decimal
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {(r.year, r.month): r
           for r in A.analytics_yoy_growth(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    rev, cnt = defaultdict(Decimal), defaultdict(int)
    for o in orders:
        key = (o.o_orderdate.year, o.o_orderdate.month)
        rev[key] += Decimal(str(o.o_totalprice)).quantize(Decimal("0.0001"))
        cnt[key] += 1
    assert set(got) == set(rev)
    for key, r in got.items():
        assert r.n_orders == cnt[key]
        assert abs(r.revenue - float(rev[key])) < 1e-6
        prev = (key[0] - 1, key[1])
        if prev in rev:
            expect = (float(rev[key]) - float(rev[prev])) / float(rev[prev])
            assert abs(r.yoy_pct - expect) < 1.01e-6
        else:
            assert r.prev_year_revenue is None and r.yoy_pct is None


def test_key_gap_audit_matches_sorted_walk(spark, sf_dir):
    """Gap stats equal a sorted-key Python walk, and the audit balances
    to the closed form missing_total = (max - min + 1) - n_keys."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    r = A.dq_key_gap_audit(spark, sf_dir).collect()[0]
    ks = sorted({o.o_orderkey for o in
                 spark.read.parquet(f"{sf_dir}/orders.parquet").collect()})
    gaps = [b - a - 1 for a, b in zip(ks, ks[1:])]
    assert r.n_keys == len(ks)
    assert (r.key_min, r.key_max) == (ks[0], ks[-1])
    assert r.n_gaps == sum(1 for g in gaps if g > 0)
    assert r.missing_total == sum(gaps)
    assert r.max_gap == max(gaps)
    assert r.missing_total == (r.key_max - r.key_min + 1) - r.n_keys


def test_clustering_coefficient_matches_bruteforce(spark, sf_dir):
    """Top-20 coefficients equal a Python adjacency-set recompute over
    the same sampled co-purchase edges (exact tie order replicated)."""
    from collections import defaultdict
    from itertools import combinations
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = [(r.node, r.deg, r.n_triangles, r.clustering_coef)
           for r in A.graph_clustering_coefficient(spark, sf_dir).collect()]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    per_order = defaultdict(set)
    for row in li:
        if row.l_orderkey % 20 == 0:
            per_order[row.l_orderkey].add(row.l_partkey)
    adj = defaultdict(set)
    for parts in per_order.values():
        for u, v in combinations(parts, 2):
            adj[u].add(v)
            adj[v].add(u)
    rows = []
    for n, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for u, v in combinations(sorted(nb), 2) if v in adj[u])
        rows.append((n, d, t, round(2 * t / (d * (d - 1)), 6)))
    rows.sort(key=lambda r: (-r[3], -r[2], r[0]))
    assert got == rows[:A._CLUSTCOEF_K]


def test_rake_matches_bruteforce(spark, sf_dir):
    """RAKE top-20 equals a pure-Python phrase segmentation + score
    walk with the same split regex and stoplist."""
    import re
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    got = [(r.word, r.freq, r.degree, r.rake_score)
           for r in L.text_keyword_rake(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    stop = set(L._RAKE_STOP)
    freq, degree = defaultdict(int), defaultdict(int)
    for d in docs:
        toks = re.split(r"[^a-z]+", d.text.lower())
        phrase = []
        for w in toks + [""]:
            if w == "" or w in stop:
                for pw in phrase:
                    freq[pw] += 1
                    degree[pw] += len(phrase)
                phrase = []
            else:
                phrase.append(w)
    rows = [(w, freq[w], degree[w], round(degree[w] / freq[w], 6))
            for w in freq if freq[w] >= L._RAKE_MIN_FREQ]
    rows.sort(key=lambda r: (-r[3], -r[1], r[0]))
    assert got == rows[:L._RAKE_K]


def test_pca_power_matches_numpy(spark, sf_dir):
    """The unrolled quantized power iteration equals a numpy replica of
    the SAME algorithm exactly, and the result aligns with numpy's true
    top eigenvector (|cos| > 0.99 after 3 iterations)."""
    import math
    import numpy as np
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    got = {r.dim: r.loading
           for r in L.embedding_pca_power(spark, sf_dir).collect()}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    U, S = L._PCA_U, L._PCA_SCALE
    M = np.array([[math.floor(float(x) * U) for x in r.embedding]
                  for r in emb], dtype=object)
    w = np.array([(j + 1) * U for j in range(64)], dtype=object)
    for _ in range(L._PCA_ITERS):
        s = M @ w                       # exact ints
        t = (M.T @ s).astype(float)     # exact ints -> float (as the
        # string-hop: both are correctly rounded conversions)
        ts = np.floor(t / S)
        nsq = float(sum(int(v) * int(v) for v in ts))
        w = np.array(
            [int(math.floor(tv / (math.sqrt(nsq) * S) * U)) for tv in t],
            dtype=object,
        )
    expect = {j: round(int(w[j]) / U, 6) for j in range(64)}
    assert got == expect
    # convergence invariants (the synthetic spectrum is FLAT — λ2/λ1 ≈
    # 0.93 — so 3 iterations cannot pin the exact eigenvector; what
    # power iteration guarantees is a monotone Rayleigh quotient
    # bounded by λ1, and that is what we assert):
    X = np.array([[float(x) for x in r.embedding] for r in emb])
    C = X.T @ X
    l1 = np.linalg.eigvalsh(C)[-1]

    def rayleigh(vec):
        v = np.array([float(x) for x in vec])
        v /= np.linalg.norm(v)
        return float(v @ C @ v)

    w2 = np.array([(j + 1) * U for j in range(64)], dtype=object)
    rs = [rayleigh(w2)]
    for _ in range(L._PCA_ITERS):
        s2 = M @ w2
        t2 = (M.T @ s2).astype(float)
        ts2 = np.floor(t2 / S)
        nsq2 = float(sum(int(v) * int(v) for v in ts2))
        w2 = np.array(
            [int(math.floor(tv / (math.sqrt(nsq2) * S) * U)) for tv in t2],
            dtype=object,
        )
        rs.append(rayleigh(w2))
    assert all(b > a for a, b in zip(rs, rs[1:])), rs
    final = rayleigh(np.array([got[j] for j in range(64)]))
    assert final <= l1 + 1e-9
    assert final / l1 > 0.7
    assert abs(final - rs[-1]) < 1e-6


def test_clustering_depth_matches_bruteforce(spark, sf_dir):
    """Per-layout overlap depth equals a Python recompute; the hash
    layout's every file overlaps every other (depth n-1) while the
    date layout stays near zero."""
    import hashlib
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops as P

    got = {r.layout: r for r in
           P.maintenance_clustering_depth(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    for layout in ("date", "hash"):
        zones = defaultdict(list)
        for o in orders:
            d = o.o_orderdate
            if layout == "date":
                fid = (d.year - 1995) * 4 + (d.month - 1) // 3
            else:
                fid = int(hashlib.md5(str(o.o_orderkey).encode())
                          .hexdigest()[:8], 16) % P._SKIP_HASH_FILES
            zones[fid].append(d)
        spans = {f: (min(ds), max(ds)) for f, ds in zones.items()}
        ov = {f: sum(1 for g, (mn2, mx2) in spans.items()
                     if g != f and mn <= mx2 and mn2 <= mx)
              for f, (mn, mx) in spans.items()}
        r = got[layout]
        assert r.n_files == len(spans)
        assert abs(r.avg_overlap - round(sum(ov.values()) / len(ov), 6)) < 1e-9
        assert r.max_overlap == max(ov.values())
    assert got["hash"].max_overlap == got["hash"].n_files - 1
    assert got["date"].avg_overlap < got["hash"].avg_overlap


def test_apriori_pairs_match_bruteforce(spark, sf_dir):
    """Top-20 pair scores equal a Python basket walk (supports,
    confidence, lift, exact tie order)."""
    from collections import Counter, defaultdict
    from itertools import combinations
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = [(r.x, r.y, r.support_xy, r.support_x, r.support_y,
            r.confidence_x_to_y, r.lift)
           for r in A.analytics_apriori_pairs(spark, sf_dir).collect()]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    baskets = defaultdict(set)
    for row in li:
        if row.l_orderkey % 20 == 0:
            baskets[row.l_orderkey].add(row.l_partkey)
    item = Counter()
    pair = Counter()
    for parts in baskets.values():
        for p in parts:
            item[p] += 1
        for a, b in combinations(sorted(parts), 2):
            pair[(a, b)] += 1
    nb = len(baskets)
    rows = [
        (a, b, c, item[a], item[b],
         round(c / item[a], 6), round(c * nb / (item[a] * item[b]), 6))
        for (a, b), c in pair.items() if c >= A._APRIORI_MIN_SUPPORT
    ]
    rows.sort(key=lambda r: (-r[6], -r[2], r[0], r[1]))
    assert got == rows[:A._APRIORI_K]


def test_rolling_regression_matches_bruteforce(spark, sf_dir):
    """Trailing-24-observation slopes equal a Python exact-integer
    recompute over each type's sorted hourly series."""
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A
    import math

    got = {(r.event_type, r.hour_s): (r.slope_per_hour, r.window_mean)
           for r in A.timeseries_rolling_regression(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(lambda: defaultdict(int))
    for e in ev:
        if e.value is not None:
            h = int(e.ts.replace(minute=0, second=0, microsecond=0)
                    .timestamp())
            series[e.event_type][h] += math.floor(e.value * 1_000_000)
    W = A._ROLLREG_W
    expect = {}
    for t, hs in series.items():
        pts = sorted(hs.items())
        for i in range(W - 1, len(pts)):
            win = pts[i - W + 1:i + 1]
            xs = [h // 3600 for h, _ in win]
            ys = [y for _, y in win]
            sx, sy = sum(xs), sum(ys)
            sxy = sum(x * y for x, y in zip(xs, ys))
            sxx = sum(x * x for x in xs)
            num, den = W * sxy - sx * sy, W * sxx - sx * sx
            expect[(t, pts[i][0])] = (
                round(num / den / 1e6, 6), round(sy / W / 1e6, 6))
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k][0] - expect[k][0]) < 1e-9, k
        assert abs(got[k][1] - expect[k][1]) < 1e-9, k


def test_bitemporal_asof_matches_bruteforce(spark, sf_dir):
    """Each probe's reconstruction equals a Python two-axis filter +
    per-key argmax; coverage is monotone in the transaction cut."""
    from collections import defaultdict
    from datetime import datetime
    from decimal import Decimal
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {r.probe_id: r
           for r in A.join_bitemporal_asof(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    mx = max(o.o_orderkey for o in orders)
    for i, (v, frac) in enumerate(A._BT_PROBES):
        vcut = datetime.fromisoformat(v + " 00:00:00")
        tcut = int(mx * frac)
        best = {}
        for o in orders:
            if o.o_orderdate <= vcut and o.o_orderkey <= tcut:
                key = (o.o_orderdate, o.o_orderkey)
                if o.o_custkey not in best or key > best[o.o_custkey][0]:
                    best[o.o_custkey] = (key, o.o_totalprice)
        r = got[i]
        assert r.n_keys == len(best), i
        if best:
            avg = sum(Decimal(str(p)).quantize(Decimal("0.0001"))
                      for _, p in best.values()) / len(best)
            assert abs(r.avg_price - round(float(avg), 6)) < 2e-6, i
    counts = [got[i].n_keys for i in range(len(A._BT_PROBES))]
    assert counts == sorted(counts)  # both axes widen across probes
    # the (valid_from, seq) -> BIGINT packing is lexicographic only
    # while seq stays below the 86400-epoch-second day step * 1e7
    assert mx < 8.64e11


def test_null_run_detector_planted_outage(spark, tmp_path):
    """dq_null_run_detector on a planted fixture (the driver fixtures
    contain zero nulls, so the entry's driver row is vacuously 0 == 0):
    a 4-null run is reported with exact bounds, a 2-run and scattered
    singles are excluded, and a clean user contributes nothing."""
    from datetime import datetime
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    def ts(minute):
        return datetime(2024, 1, 1, 0, minute, 0)

    rows = []
    # user 1: null run at positions 3-6 (events 103..106), single null
    # at position 8 (event 108)
    for i in range(10):
        val = None if i in (3, 4, 5, 6, 8) else float(i)
        rows.append((100 + i, ts(i), 1, "view", val, "{}"))
    # user 2: exactly-2 null run (events 202, 203) — below threshold
    for i in range(6):
        val = None if i in (2, 3) else float(i)
        rows.append((200 + i, ts(i), 2, "view", val, "{}"))
    # user 3: no nulls
    for i in range(4):
        rows.append((300 + i, ts(i), 3, "view", float(i), "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = A.dq_null_run_detector(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.run_len, r.first_event_id) == (1, 4, 103)
    # bounds are the planted run's first/last event timestamps
    # (epoch seconds in the session timezone — recompute via Spark to
    # stay TZ-agnostic)
    es = {
        x.event_id: x.es
        for x in df.selectExpr(
            "event_id", "unix_timestamp(ts) AS es").collect()
    }
    assert r.start_epoch_s == es[103]
    assert r.end_epoch_s == es[106]


def test_error_burst_detector_matches_bruteforce(spark, sf_dir):
    """dq_error_burst_detector (the non-vacuous islands twin) equals a
    per-user sequential scan for consecutive-'error' runs >= 3 — and
    actually fires on the fixture, certifying the shared rank-difference
    core that the null detector cannot exercise on null-free data."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {(r.user_id, r.first_event_id): (r.run_len, r.start_epoch_s,
                                           r.end_epoch_s)
           for r in A.dq_error_burst_detector(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "event_id", "event_type", "unix_timestamp(ts) AS es"
    ).collect()
    from collections import defaultdict
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r)
    expect = {}
    for u, rs in by_user.items():
        rs.sort(key=lambda r: (r.es, r.event_id))
        run = []
        for r in rs + [None]:
            if r is not None and r.event_type == "error":
                run.append(r)
                continue
            if len(run) >= 3:
                expect[(u, min(x.event_id for x in run))] = (
                    len(run), run[0].es, run[-1].es)
            run = []
    assert got == expect
    assert expect  # the signal fires on the fixture — never vacuous


def test_gains_deciles_match_bruteforce(spark, sf_dir):
    """The gains table equals a Python recompute with the same
    top-row-of-tie-group decile convention; decile 9 captures 100%."""
    from collections import Counter, defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    rows = {r.decile: r
            for r in L.eval_model_gains_deciles(spark, sf_dir).collect()}
    scored = L.text_quality_model(spark, sf_dir).select("doc_id", "logit") \
        .collect()
    logit = {r.doc_id: r.logit for r in scored}
    from pipeline_apache_beam_entrega1_cs_spark.operators import textops as T
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    labels = {
        r.doc_id: r.y
        for r in docs.select(
            "doc_id",
            (T.quality_score_col(F.col("text")) >= 0.7).cast("long")
            .alias("y"),
        ).collect()
    }
    per = defaultdict(lambda: [0, 0])
    for d, s in logit.items():
        per[s][0] += 1
        per[s][1] += labels[d]
    total = sum(n for n, _ in per.values())
    total_pos = sum(p for _, p in per.values())
    dec_agg = defaultdict(lambda: [0, 0])
    below = 0
    for s in sorted(per):
        n, p = per[s]
        decile = (10 * (total - below - n)) // total
        dec_agg[decile][0] += n
        dec_agg[decile][1] += p
        below += n
    cum_r = cum_p = 0
    for d in range(10):
        n, p = dec_agg.get(d, (0, 0))
        cum_r += n
        cum_p += p
        r = rows[d]
        assert (r.n_rows, r.n_pos) == (n, p), d
        if total_pos:
            assert abs(r.cum_capture - round(cum_p / total_pos, 6)) < 1e-9
        if cum_r:
            assert abs(
                r.cum_lift
                - round((cum_p / cum_r) / (total_pos / total), 6)
            ) < 1e-9
    assert rows[9].cum_capture == 1.0


def test_soundex_matches_python_and_classics(spark, sf_dir):
    """The expression Soundex equals a Python replica on the corpus
    vocabulary AND reproduces classic textbook codes (robert→R163,
    pfister→P236, tymczak→T522); group report equals a dict walk."""
    import re
    from collections import defaultdict
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    mapping = {c: d for c, d in
               zip("abcdefghijklmnopqrstuvwxyz", L._SOUNDEX_MAP)}

    def py_soundex(w):
        m = "".join(mapping[c] for c in w)
        for d in "123456":
            m = re.sub(d + "{2,}", d, m)
        rest = m[1:].replace("0", "")
        return w[0].upper() + (rest[:3] + "000")[:3]

    assert py_soundex("robert") == "R163"
    assert py_soundex("pfister") == "P236"
    assert py_soundex("tymczak") == "T522"
    planted = spark.createDataFrame(
        [("robert",), ("pfister",), ("tymczak",)], "w string"
    ).select(L._soundex_col(F.col("w")).alias("c")).collect()
    assert [r.c for r in planted] == ["R163", "P236", "T522"]

    got = [(r.code, r.n_words, r.sample_words)
           for r in L.dedup_phonetic_soundex(spark, sf_dir).collect()]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    vocab = {w for d in docs for w in re.split(r"[^a-z]+", d.text.lower())
             if len(w) >= 4}
    groups = defaultdict(list)
    for w in vocab:
        groups[py_soundex(w)].append(w)
    rows = [(c, len(ws), ",".join(sorted(ws)[:4]))
            for c, ws in groups.items() if len(ws) >= L._SOUNDEX_MIN_WORDS]
    rows.sort(key=lambda r: (-r[1], r[0]))
    assert got == rows[:L._SOUNDEX_K]


def test_sentence_ccnet_matches_bruteforce(spark, sf_dir):
    """Per-doc sentence counts, removals and reassembled-text md5
    equal a Python first-occurrence walk over the same split."""
    import hashlib
    import re
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    got = {r.doc_id: (r.n_sentences, r.n_removed, r.cleaned_md5)
           for r in L.dedup_sentence_ccnet(spark, sf_dir).collect()}
    docs = sorted(
        spark.read.parquet(f"{sf_dir}/documents.parquet").collect(),
        key=lambda d: d.doc_id,
    )
    first = {}
    per_doc = {}
    for d in docs:
        parts = re.split(r"[.!?]+", d.text)
        sents = [(i, p.strip()) for i, p in enumerate(parts) if p.strip()]
        per_doc[d.doc_id] = sents
        for i, sent in sents:
            key = sent.lower()
            packed = d.doc_id * 1_000_000 + i
            if key not in first or packed < first[key]:
                first[key] = packed
    for d in docs:
        sents = per_doc[d.doc_id]
        kept = [s for i, s in sents
                if first[s.lower()] == d.doc_id * 1_000_000 + i]
        md5 = hashlib.md5(". ".join(kept).encode()).hexdigest()
        assert got[d.doc_id] == (len(sents), len(sents) - len(kept), md5), \
            d.doc_id


def test_interpolate_linear_matches_bruteforce(spark, sf_dir):
    """Interpolated values equal a Python neighbor walk on the same
    hourly decimal-exact series; observed rows pass through; edge rows
    stay NULL."""
    from collections import defaultdict
    from decimal import Decimal
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {(r.event_type, r.hour_s): (r.value, r.fill_kind)
           for r in A.timeseries_interpolate_linear(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    series = defaultdict(lambda: defaultdict(Decimal))
    for e in ev:
        h = int(e.ts.timestamp()) // 3600 * 3600
        if e.value is not None:
            series[e.event_type][h] += \
                Decimal(str(e.value)).quantize(Decimal("0.0001"))
        else:
            series[e.event_type][h] += 0
    for t, hs in series.items():
        hours = sorted(hs)
        vals = {h: float(hs[h]) for h in hours}
        for h in range(hours[0], hours[-1] + 1, 3600):
            key = (t, h)
            if h in vals:
                assert got[key][1] == "observed"
                assert abs(got[key][0] - round(vals[h], 6)) < 1e-9
            else:
                prevs = [x for x in hours if x < h]
                nexts = [x for x in hours if x > h]
                if prevs and nexts:
                    hp, hn = prevs[-1], nexts[0]
                    expect = vals[hp] + (vals[hn] - vals[hp]) * (
                        (h - hp) / (hn - hp))
                    assert got[key][1] == "interpolated"
                    assert abs(got[key][0] - round(expect, 6)) < 1e-9
                else:
                    assert got[key] == (None, "edge")


def test_value_set_drift_matches_bruteforce(spark, sf_dir):
    """Category statuses equal a Python two-snapshot dict walk."""
    from collections import Counter
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {r.category: (r.n_old, r.n_new, r.status)
           for r in A.dq_value_set_drift(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    old, new = Counter(), Counter()
    for o in orders:
        cat = f"{o.o_orderpriority}|{o.o_orderstatus}"
        (old if o.o_orderdate.year <= 1997 else new)[cat] += 1
    expect = {}
    for c in set(old) | set(new):
        no, nn = old.get(c, 0), new.get(c, 0)
        status = ("persisting" if no and nn
                  else "vanished" if no else "new")
        expect[c] = (no, nn, status)
    assert got == expect


def test_bloom_filter_matches_bruteforce(spark, sf_dir):
    """Bitset occupancy, theoretical FPR and the empirical planted-
    probe hits equal a Python md5 recompute of the same k=3 hashes."""
    import hashlib
    import pipeline_apache_beam_entrega1_cs_spark.plans.llm_data as L

    r = L.agg_bloom_filter_stats(spark, sf_dir).collect()[0]
    keys = {o.o_custkey for o in
            spark.read.parquet(f"{sf_dir}/orders.parquet").collect()}

    def pos(rr, k):
        return int(hashlib.md5(f"{rr}:{k}".encode()).hexdigest()[:8], 16) \
            % L._BLOOM_M

    bits = {pos(rr, k) for k in keys for rr in range(L._BLOOM_K)}
    assert r.n_keys == len(keys)
    assert r.occupied_bits == len(bits)
    assert abs(
        r.fpr_theoretical
        - round((len(bits) / L._BLOOM_M) ** L._BLOOM_K, 6)
    ) < 1e-9
    fp = sum(
        1 for i in range(1, L._BLOOM_PROBE_ABSENT + 1)
        if all(pos(rr, -i) in bits for rr in range(L._BLOOM_K))
    )
    assert r.fp_hits == fp


def test_theil_sen_matches_bruteforce(spark, sf_dir):
    """Theil-Sen per type equals a Python all-pairs median over the
    same 64-point skeleton; OLS slope matches numpy on those points."""
    import statistics
    import numpy as np
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {r.event_type: r
           for r in A.agg_theil_sen_slope(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type", "event_id", "unix_timestamp(ts) AS es", "value"
    ).collect()
    from collections import defaultdict
    by_type = defaultdict(list)
    for r in ev:
        by_type[r.event_type].append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: (r.es, r.event_id))
        pts = rs[: A._THEIL_K]
        slopes = [
            round((b.value - a.value) / (b.es - a.es), 12)
            for i, a in enumerate(pts)
            for b in pts[i + 1:]
            if b.es != a.es
        ]
        r = got[t]
        assert r.n_points == len(pts)
        assert r.n_pairs == len(slopes)
        assert abs(r.theil_sen_slope - statistics.median(slopes)) < 1e-8
        x = np.array([p.es - A._THEIL_EPOCH for p in pts], dtype=float)
        y = np.array([p.value for p in pts])
        Amat = np.vstack([x, np.ones(len(x))]).T
        slope = np.linalg.lstsq(Amat, y, rcond=None)[0][0]
        assert abs(r.ols_slope - slope) < 1e-6


def test_changepoint_matches_bruteforce_and_finds_planted_shift(
        spark, sf_dir, tmp_path):
    """(1) The argmax split equals a Python recompute of the gain curve
    on the fixture; (2) on a planted level-shift series the detector
    finds the exact boundary."""
    from collections import defaultdict
    from datetime import datetime, timedelta
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    got = {r.event_type: r
           for r in A.timeseries_changepoint_binary(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type", "CAST(floor(unix_timestamp(ts) / 3600) AS LONG) AS hr",
        "value",
    ).collect()
    sums = defaultdict(lambda: [0.0, 0])
    for r in ev:
        s = sums[(r.event_type, r.hr)]
        s[0] += r.value
        s[1] += 1
    series = defaultdict(list)
    for (t, hr), (sv, n) in sums.items():
        series[t].append((hr, round(sv / n, 6)))
    for t, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        S = sum(ys)
        best = None
        for i in range(1, n):
            sl = sum(ys[:i])
            gain = sl * sl / i + (S - sl) ** 2 / (n - i) - S * S / n
            key = (round(gain, 9), -pts[i - 1][0])
            if best is None or key > best[0]:
                best = (key, pts[i - 1][0], i)
        r = got[t]
        assert r.n_hours == n
        assert r.split_last_left_hr == best[1], t
        assert abs(r.gain - best[0][0]) < 1e-6

    # planted level shift: 48 hourly points, mean 10 then mean 50
    base = datetime(2024, 3, 1)
    rows = []
    for i in range(48):
        val = 10.0 if i < 30 else 50.0
        rows.append((i, base + timedelta(hours=i, minutes=5), 1, "m", val,
                     "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = A.timeseries_changepoint_binary(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    hr29 = df.selectExpr(
        "CAST(floor(unix_timestamp(ts) / 3600) AS LONG) AS hr"
    ).collect()[29].hr
    assert r.split_last_left_hr == hr29  # last hour of the low regime
    assert abs(r.mean_before - 10.0) < 1e-9
    assert abs(r.mean_after - 50.0) < 1e-9


def test_interval_proration_conserves_days(spark, sf_dir):
    """Proration is exact: per-month day allocations sum back to each
    interval's total length (conservation), and a spot recompute of
    one month matches a Python day-walk."""
    from collections import Counter
    from datetime import timedelta
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    out = A.analytics_interval_proration(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "l_returnflag", "CAST(l_shipdate AS DATE) AS ship",
        "(l_orderkey * 7 + l_linenumber) % 45 + 5 AS dur",
    ).collect()
    total_alloc = sum(r.days_in_month for r in out)
    total_len = sum(r.dur + 1 for r in li)
    assert total_alloc == total_len  # every interval day lands exactly once
    expect = Counter()
    for r in li:
        d = r.ship
        for i in range(int(r.dur) + 1):
            day = d + timedelta(days=i)
            expect[(day.strftime("%Y-%m"), r.l_returnflag)] += 1
    got_days = {(r.month, r.l_returnflag): r.days_in_month for r in out}
    assert got_days == dict(expect)


def test_peak_concurrency_matches_bruteforce(spark, sf_dir):
    """Per-month peaks equal a single global Python sweep (the
    two-phase carry-in decomposition must be exactly equivalent to the
    one-pass form), and open/close totals conserve."""
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    out = {r.month: r
           for r in A.analytics_peak_concurrency(spark, sf_dir).collect()}
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey", "CAST(o_orderdate AS DATE) AS od",
        "date_add(CAST(o_orderdate AS DATE), "
        "CAST(o_orderkey % 20 + 3 AS INT)) AS cd",
    ).collect()
    bounds = []
    for r in o:
        bounds.append((r.od, 1, r.o_orderkey))
        bounds.append((r.cd, -1, r.o_orderkey))
    bounds.sort()
    level = 0
    month_peak, month_start_level = {}, {}
    for t, delta, _ in bounds:
        m = t.strftime("%Y-%m")
        if m not in month_start_level:
            month_start_level[m] = level
            month_peak[m] = level  # level at month start counts
        level += delta
        month_peak[m] = max(month_peak[m], level)
    assert set(out) == set(month_peak)
    for m, r in out.items():
        assert r.peak_concurrency == month_peak[m], m
        assert r.carry_in == month_start_level[m], m
    assert sum(r.n_opens for r in out.values()) == len(o)
    assert sum(r.n_closes for r in out.values()) == len(o)


def test_hampel_matches_python_and_flags_planted_spike(
        spark, sf_dir, tmp_path):
    """Rolling median/MAD equal statistics.median recomputes on every
    window; a planted single-sample spike in an otherwise steady
    series is flagged while the steady points are not."""
    import statistics
    from collections import defaultdict
    from datetime import datetime, timedelta
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = A.window_hampel_filter(spark, sf_dir).collect()
    series = defaultdict(dict)
    for r in rows:
        series[r.event_type][r.hr] = r
    for t, by_hr in series.items():
        hrs = sorted(by_hr)
        ys = [by_hr[h].yv for h in hrs]
        for i, h in enumerate(hrs):
            win = ys[max(0, i - 3): i + 4]
            med = round(statistics.median(win), 6)
            mad = round(statistics.median(
                [round(abs(x - med), 6) for x in win]), 6)
            r = by_hr[h]
            assert r.window_n == len(win)
            assert abs(r.rolling_med - med) < 1e-9, (t, h)
            assert abs(r.rolling_mad - mad) < 1e-9, (t, h)
            assert r.is_outlier == (abs(r.yv - med) > 3 * 1.4826 * mad)

    base = datetime(2024, 5, 1)
    planted = []
    for i in range(24):
        v = 100.0 + (i % 3)  # steady with tiny wobble, nonzero MAD
        if i == 12:
            v = 500.0
        planted.append((i, base + timedelta(hours=i, minutes=1), 1, "m", v,
                        "{}"))
    df = spark.createDataFrame(
        planted, "event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = A.window_hampel_filter(spark, str(tmp_path)).collect()
    flagged = [r for r in out if r.is_outlier]
    assert len(flagged) == 1
    assert flagged[0].yv == 500.0


def test_pack_efficiency_consistent_with_packing(spark, sf_dir):
    """The efficiency report is exactly the rollup of the packing
    frame: batch counts, totals, fill extremes, and the lower bound."""
    import math
    import pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops as P

    r = P.pack_efficiency_report(spark, sf_dir).collect()[0]
    batches = P.pack_token_budget(spark, sf_dir).collect()
    total = sum(b.n_tokens for b in batches)
    fills = [b.n_tokens / 2048 for b in batches]
    assert r.n_batches == len(batches)
    assert r.n_buckets == len({b.bucket for b in batches})
    assert r.n_docs == sum(b.n_docs for b in batches)
    assert r.total_tokens == total
    assert r.lower_bound_batches == math.ceil(total / 2048)
    assert abs(r.mean_fill - round(total / (len(batches) * 2048), 6)) < 1e-9
    assert abs(r.min_fill - round(min(fills), 6)) < 1e-9
    assert abs(r.max_fill - round(max(fills), 6)) < 1e-9
    assert r.n_overfull == sum(1 for b in batches if b.n_tokens > 2048)
    assert r.n_above_90pct == sum(1 for f in fills if f >= 0.9)


def test_spectral_peak_matches_numpy_and_finds_planted_cycle(
        spark, sf_dir, tmp_path):
    """(1) Harmonic amplitudes equal a numpy DFT recompute on the same
    rounded centered series; (2) a planted pure k=2 cosine series gets
    is_dominant at k=2 with the planted amplitude."""
    import math
    from collections import defaultdict
    from datetime import datetime, timedelta
    import numpy as np
    import pipeline_apache_beam_entrega1_cs_spark.plans.analytics as A

    rows = A.timeseries_spectral_peak(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "event_type", "CAST(floor(unix_timestamp(ts) / 3600) AS LONG) AS hr",
        "value",
    ).collect()
    sums = defaultdict(lambda: [0.0, 0])
    for r in ev:
        s = sums[(r.event_type, r.hr)]
        s[0] += r.value
        s[1] += 1
    series = defaultdict(list)
    for (t, hr), (sv, n) in sums.items():
        series[t].append((hr, round(sv / n, 6)))
    got = {(r.event_type, r.k): r for r in rows}
    for t, pts in series.items():
        pts.sort()
        ys = np.array([y for _, y in pts])
        n = len(ys)
        ybar = round(float(ys.sum()) / n, 6)
        yc = np.round(ys - ybar, 6)
        dominant = None
        for k in range(1, A._SPECTRAL_HARMONICS + 1):
            ang = 2 * math.pi * k * np.arange(n) / n
            sc = float(np.sum(yc * np.round(np.cos(ang), 12)))
            ss = float(np.sum(yc * np.round(np.sin(ang), 12)))
            amp = round(2 * math.sqrt(sc * sc + ss * ss) / n, 6)
            r = got[(t, k)]
            assert r.n_hours == n
            assert abs(r.amplitude - amp) < 1e-5, (t, k)
            if dominant is None or amp > dominant[1] + 1e-12:
                dominant = (k, amp)
        assert got[(t, dominant[0])].is_dominant

    base = datetime(2024, 6, 1)
    n = 48
    planted = []
    for i in range(n):
        v = 10.0 + 4.0 * math.cos(2 * math.pi * 2 * i / n)
        planted.append((i, base + timedelta(hours=i, minutes=2), 1, "m",
                        round(v, 4), "{}"))
    df = spark.createDataFrame(
        planted, "event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = {r.k: r
           for r in A.timeseries_spectral_peak(spark, str(tmp_path)).collect()}
    assert out[2].is_dominant
    assert abs(out[2].amplitude - 4.0) < 1e-3
    for k in (1, 3, 4, 5, 6):
        assert out[k].amplitude < 0.01
