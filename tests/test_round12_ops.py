"""Semantic tests for the round-12 additions: each entry is recomputed
brute-force in pure Python/numpy from the parquet inputs (a different
mechanism than the plan under test — e.g. direct sorted ranks vs the
bucketed prefix-sum machinery), so a bug in the distributed idiom can't
hide behind a matching oracle translation of the same mistake."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings", "orders", "lineitem"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchall()


# ---------------------------------------------------------------------------
# rank-based inference
# ---------------------------------------------------------------------------


def _avg_ranks(values):
    """Tie-averaged ranks via direct sort — the textbook mechanism, not
    the prefix-sum one."""
    order = sorted(range(len(values)), key=lambda i: values[i])
    ranks = [0.0] * len(values)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and values[order[j]] == values[order[i]]:
            j += 1
        avg = (i + 1 + j) / 2  # mean of ranks i+1..j
        for k in range(i, j):
            ranks[order[k]] = avg
        i = j
    return ranks


def test_mann_whitney_matches_direct_rank_computation(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _MWU_A,
        _MWU_B,
        stat_mann_whitney_u,
    )

    row = stat_mann_whitney_u(spark, sf_dir).collect()[0]
    rows = _duck(
        sf_dir,
        f"""SELECT event_type, CAST(floor(value * 1000000) AS BIGINT)
            FROM events WHERE value IS NOT NULL
            AND event_type IN ('{_MWU_A}', '{_MWU_B}')""",
    )
    vals = [v for _, v in rows]
    groups = [t for t, _ in rows]
    ranks = _avg_ranks(vals)
    ra = sum(r for r, g in zip(ranks, groups) if g == _MWU_A)
    na = sum(1 for g in groups if g == _MWU_A)
    nb = len(groups) - na
    u = ra - na * (na + 1) / 2
    tie = sum(c * (c * c - 1) for c in Counter(vals).values())
    n = na + nb
    sigma2 = na * nb / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u - na * nb / 2) / math.sqrt(sigma2)
    assert (row.n_a, row.n_b) == (na, nb)
    assert abs(row.u_stat - u) < 1e-6 * max(1, abs(u))
    assert abs(row.mean_rank_a - ra / na) < 1e-4
    assert abs(row.z_stat - z) < 1e-5


def test_kruskal_wallis_matches_direct_rank_computation(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _ANOVA_TYPES,
        stat_kruskal_wallis,
    )

    got = {r.event_type: r for r in stat_kruskal_wallis(spark, sf_dir).collect()}
    rows = _duck(
        sf_dir,
        """SELECT event_type, CAST(floor(value * 1000000) AS BIGINT)
           FROM events WHERE value IS NOT NULL""",
    )
    rows = [(t, v) for t, v in rows if t in _ANOVA_TYPES]
    vals = [v for _, v in rows]
    ranks = _avg_ranks(vals)
    rg, ng = defaultdict(float), Counter(t for t, _ in rows)
    for (t, _), r in zip(rows, ranks):
        rg[t] += r
    n = len(rows)
    h = 12 / (n * (n + 1)) * sum(
        rg[t] ** 2 / ng[t] for t in _ANOVA_TYPES
    ) - 3 * (n + 1)
    tie = sum(c * (c * c - 1) for c in Counter(vals).values())
    h_corr = h / (1 - tie / (n**3 - n))
    for t in _ANOVA_TYPES:
        assert got[t].n == ng[t]
        assert abs(got[t].mean_rank - rg[t] / ng[t]) < 1e-4
        assert abs(got[t].h_stat - round(h, 6)) < 1e-4
        assert abs(got[t].h_tie_corrected - round(h_corr, 6)) < 1e-4


# ---------------------------------------------------------------------------
# ABC/XYZ, out-of-order, fingerprint, analyze
# ---------------------------------------------------------------------------


def test_abc_xyz_matches_direct_classification(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        analytics_abc_xyz_matrix,
    )

    got = {
        (r.abc_class, r.xyz_class): (r.n_parts, r.revenue_cents)
        for r in analytics_abc_xyz_matrix(spark, sf_dir).collect()
    }
    rows = _duck(
        sf_dir,
        """SELECT l_partkey, date_trunc('month', l_shipdate),
                  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT),
                  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
           FROM lineitem GROUP BY 1, 2""",
    )
    months = sorted({m for _, m, _, _ in rows})
    per = defaultdict(lambda: [0, 0, 0])  # rev, s_q, q_q
    for pk, _, rev, mq in rows:
        per[pk][0] += rev
        per[pk][1] += mq
        per[pk][2] += mq * mq
    total = sum(v[0] for v in per.values())
    m = len(months)
    expected = defaultdict(lambda: [0, 0])
    cum = 0
    for pk in sorted(per, key=lambda k: (-per[k][0], k)):
        rev, s, q = per[pk]
        cum += rev
        abc = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C")
        cv2 = (m * q - s * s) / (s * s)
        xyz = "X" if cv2 <= 0.25 else ("Y" if cv2 <= 1.0 else "Z")
        expected[(abc, xyz)][0] += 1
        expected[(abc, xyz)][1] += rev
    assert got == {k: tuple(v) for k, v in expected.items()}


def test_out_of_order_audit_matches_direct_scan(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        dq_out_of_order_audit,
    )

    got = {r.event_type: r for r in dq_out_of_order_audit(spark, sf_dir).collect()}
    rows = _duck(
        sf_dir,
        """SELECT user_id, event_id, event_type,
                  CAST(floor(epoch(ts)) AS BIGINT)
           FROM events ORDER BY user_id, event_id""",
    )
    stats = defaultdict(lambda: [0, 0, 0])  # pairs, backwards, max_back
    prev = {}
    for uid, _, t, epo in rows:
        if uid in prev:
            back = prev[uid] - epo
            s = stats[t]
            s[0] += 1
            if back > 0:
                s[1] += 1
                s[2] = max(s[2], back)
        prev[uid] = epo
    for t, (np_, nb, mx) in stats.items():
        r = got[t]
        assert (r.n_pairs, r.n_backwards, r.max_backwards_seconds) == (np_, nb, mx)
        assert abs(r.backwards_ppm - round(nb * 1e6 / np_, 6)) < 1e-6


def test_content_fingerprint_is_order_insensitive_and_sensitive_to_rows(
    spark, sf_dir
):
    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        _FP_PRIME,
        dataset_content_fingerprint,
    )

    got = {r.split: r for r in dataset_content_fingerprint(spark, sf_dir).collect()}
    rows = _duck(sf_dir, "SELECT doc_id, text, n_chars FROM documents")
    P = _FP_PRIME
    agg = defaultdict(lambda: [0, 0, set(), 0])
    for doc_id, text, n_chars in rows:
        h8 = hashlib.md5(str(doc_id).encode()).hexdigest()[:8]
        split = "train" if h8 < "cccccccc" else ("val" if h8 < "e6666666" else "test")
        td = hashlib.md5(text.encode()).hexdigest()
        h = int(
            hashlib.md5(f"fp:{doc_id}:{td}".encode()).hexdigest()[:15], 16
        ) % P
        a = agg[split]
        a[0] += 1
        a[1] += n_chars
        a[2].add(td)
        a[3] = (a[3] + h) % P
    # python iteration order differs from any Spark partitioning — the
    # modular sum matching IS the order-insensitivity check
    for split, (nd, tc, tds, fp) in agg.items():
        r = got[split]
        assert (r.n_docs, r.total_chars, r.n_distinct_texts) == (nd, tc, len(tds))
        assert r.content_fingerprint == fp
    # sensitivity: changing any one row's text changes the stamp
    any_split, a = next(iter(agg.items()))
    assert (a[3] + 1) % P != got[any_split].content_fingerprint


def test_analyze_column_stats_exact_on_one_column(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        maintenance_analyze_column_stats,
    )

    got = {r.col_name: r for r in maintenance_analyze_column_stats(spark, sf_dir).collect()}
    rows = _duck(sf_dir, "SELECT o_orderpriority, o_totalprice FROM orders")
    prios = [r[0] for r in rows if r[0] is not None]
    r = got["o_orderpriority"]
    assert r.n_rows == len(rows)
    assert r.n_nonnull == len(prios)
    assert r.ndv_exact == len(set(prios))
    assert (r.min_val, r.max_val) == (min(prios), max(prios))
    cents = [round(p[1] * 100) for p in rows if p[1] is not None]
    rc = got["o_totalprice"]
    assert rc.ndv_exact == len(set(cents))
    assert int(rc.min_val) == min(cents) and int(rc.max_val) == max(cents)


# ---------------------------------------------------------------------------
# text / curation / embedding / dedup / udf
# ---------------------------------------------------------------------------


def test_kneser_ney_matches_direct_model(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.llm_data import (
        text_kneser_ney_bigram,
    )

    got = {r.doc_id: r for r in text_kneser_ney_bigram(spark, sf_dir).collect()}
    rows = _duck(sf_dir, "SELECT doc_id, text FROM documents")
    docs = {
        d: t.strip().lower().split() for d, t in rows if t.strip() != ""
    }
    big = Counter()
    for tk in docs.values():
        big.update(zip(tk, tk[1:]))
    c_w1, f_w1, b_w2 = Counter(), Counter(), Counter()
    for (w1, w2), c in big.items():
        c_w1[w1] += c
        f_w1[w1] += 1
        b_w2[w2] += 1
    t_types = len(big)
    d_disc = 0.75
    checked = 0
    for doc_id, tk in docs.items():
        bgs = list(zip(tk, tk[1:]))
        if not bgs:
            assert doc_id not in got
            continue
        logps = []
        for w1, w2 in bgs:
            p = (big[(w1, w2)] - d_disc) / c_w1[w1] + (
                d_disc / c_w1[w1]
            ) * f_w1[w1] * (b_w2[w2] / t_types)
            logps.append(math.log(p))
        r = got[doc_id]
        assert r.n_bigrams == len(bgs)
        assert abs(r.avg_kn_logprob - sum(logps) / len(logps)) < 1e-4
        checked += 1
    assert checked > 0
    # probabilities must sum to <= 1 per context (KN is a proper model):
    # spot-check the highest-fanout context
    w1 = max(c_w1, key=lambda w: c_w1[w])
    mass = sum(
        (big[(a, b)] - d_disc) / c_w1[w1]
        + (d_disc / c_w1[w1]) * f_w1[w1] * (b_w2[b] / t_types)
        for (a, b) in big
        if a == w1
    )
    assert mass <= 1.0 + 1e-9


def test_filter_ablation_consistent_with_gopher_flags(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.operators import textops as T
    from pipeline_apache_beam_entrega1_cs_spark.plans.llm_data import (
        _GOPHER_FLAGS,
        curation_filter_ablation,
        _docs,
    )

    got = {r.filter_name: r for r in curation_filter_ablation(spark, sf_dir).collect()}
    flags = T.gopher_quality_filters(_docs(spark, sf_dir)).collect()
    total = len(flags)
    for c in _GOPHER_FLAGS:
        n_flag = sum(1 for r in flags if not r[c])
        n_uniq = sum(
            1
            for r in flags
            if not r[c] and sum(1 for c2 in _GOPHER_FLAGS if not r[c2]) == 1
        )
        assert (got[c].n_flagged, got[c].n_unique_flagged) == (n_flag, n_uniq)
        assert abs(got[c].pct_flagged - round(n_flag / total, 6)) < 1e-9
    # unique counts can never exceed flag counts, and the sum of unique
    # counts equals the number of single-failure docs
    singles = sum(
        1 for r in flags if sum(1 for c in _GOPHER_FLAGS if not r[c]) == 1
    )
    assert sum(got[c].n_unique_flagged for c in _GOPHER_FLAGS) == singles


def test_matryoshka_recall_full_dim_is_one_and_dim8_matches_numpy(spark, sf_dir):
    import numpy as np

    from pipeline_apache_beam_entrega1_cs_spark.plans.llm_data import (
        _EVAL_PANEL_N,
        _MATRYOSHKA_K,
        embedding_matryoshka_eval,
    )

    got = {r.trunc_dim: r for r in embedding_matryoshka_eval(spark, sf_dir).collect()}
    assert got[64].recall_at_10 == 1.0
    rows = _duck(sf_dir, "SELECT vec_id, embedding FROM embeddings")
    ids = [r[0] for r in rows]
    mat = np.array([[float(x) for x in r[1]] for r in rows])
    # fixed-size deterministic panel: first N ids by (md5(id), id)
    panel = set(sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:_EVAL_PANEL_N])
    qidx = [i for i, v in enumerate(ids) if v in panel]
    assert got[64].n_queries == len(qidx) == _EVAL_PANEL_N
    assert got[64].panel_size == _EVAL_PANEL_N

    def topk(d, qi):
        q = mat[qi, :d]
        sims = mat[:, :d] @ q / (
            np.linalg.norm(mat[:, :d], axis=1) * np.linalg.norm(q)
        )
        order = sorted(
            (i for i in range(len(ids)) if i != qi),
            key=lambda i: (-round(float(sims[i]), 6), ids[i]),
        )
        return {ids[i] for i in order[: _MATRYOSHKA_K]}

    hits = sum(len(topk(8, qi) & topk(64, qi)) for qi in qidx)
    expect = round(hits / (len(qidx) * _MATRYOSHKA_K), 6)
    assert got[8].n_hits == hits
    assert abs(got[8].recall_at_10 - expect) < 1e-9


def test_incremental_dedup_classes_match_direct_scan(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.llm_data import (
        dedup_incremental_new_vs_base,
    )

    got = {
        r.category: (r.n_docs, r.n_distinct_fps)
        for r in dedup_incremental_new_vs_base(spark, sf_dir).collect()
    }
    rows = _duck(sf_dir, "SELECT doc_id, text FROM documents")
    base_fps, new = set(), []
    for doc_id, text in sorted(rows):
        b = int(hashlib.md5(f"inc:{doc_id}".encode()).hexdigest()[:8], 16) % 5
        fp = hashlib.md5(text.encode()).hexdigest()
        if b != 0:
            base_fps.add(fp)
        else:
            new.append((doc_id, fp))
    seen = set()
    expect = defaultdict(lambda: [0, set()])
    for doc_id, fp in sorted(new):
        if fp in base_fps:
            cat = "dup_of_base"
        elif fp in seen:
            cat = "dup_within_new"
        else:
            cat = "unique"
        seen.add(fp)
        expect[cat][0] += 1
        expect[cat][1].add(fp)
    assert got == {k: (v[0], len(v[1])) for k, v in expect.items()}
    # the incremental invariant: every new doc is classified exactly once
    assert sum(v[0] for v in got.values()) == len(new)


def test_scalar_iter_udf_exact_cents(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.udf_surface import (
        _SURCHARGE_PCT,
        pandas_udf_scalar_iter,
    )

    got = {r.o_orderkey: r.adjusted_cents
           for r in pandas_udf_scalar_iter(spark, sf_dir).collect()}
    rows = _duck(sf_dir, "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders")
    for key, prio, price in rows:
        cents = round(price * 100)
        assert got[key] == cents + cents * _SURCHARGE_PCT[prio] // 100


def test_kendall_tau_matches_direct_pair_count(spark, sf_dir):
    import numpy as np

    from pipeline_apache_beam_entrega1_cs_spark.plans.llm_data import (
        _EVAL_PANEL_N,
        _KENDALL_K,
        _KENDALL_TRUNC,
        eval_kendall_tau_rankers,
    )

    got = {r.query_id: r for r in eval_kendall_tau_rankers(spark, sf_dir).collect()}
    rows = _duck(sf_dir, "SELECT vec_id, embedding FROM embeddings")
    ids = [r[0] for r in rows]
    mat = np.array([[float(x) for x in r[1]] for r in rows])

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    panel = set(sorted(
        ids, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:_EVAL_PANEL_N])
    assert set(got) == panel
    assert all(r.panel_size == _EVAL_PANEL_N for r in got.values())
    checked = 0
    for qi, qid in enumerate(ids):
        if qid not in panel:
            continue
        scored = [
            (cos(mat[qi], mat[ci]), cos(mat[qi][: _KENDALL_TRUNC],
                                        mat[ci][: _KENDALL_TRUNC]), ids[ci])
            for ci in range(len(ids)) if ci != qi
        ]
        scored.sort(key=lambda t: (-t[0], t[2]))
        items = scored[: _KENDALL_K]
        c = d = ta = tb = 0
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                a, b = items[x], items[y]
                if a[2] > b[2]:
                    a, b = b, a  # pair keyed by cand_id order, like the plan
                sa = (a[0] > b[0]) - (a[0] < b[0])
                sb = (a[1] > b[1]) - (a[1] < b[1])
                if sa * sb > 0:
                    c += 1
                elif sa * sb < 0:
                    d += 1
                if sa == 0:
                    ta += 1
                if sb == 0:
                    tb += 1
        n0 = len(items) * (len(items) - 1) // 2
        tau = (c - d) / ((n0 - ta) * (n0 - tb)) ** 0.5
        r = got[qid]
        assert (r.n_pairs, r.n_concordant, r.n_discordant) == (n0, c, d)
        assert abs(r.tau_b - round(tau, 6)) < 1e-9
        assert -1.0 <= r.tau_b <= 1.0
        checked += 1
    assert checked > 0


def test_rank_below_prefix_machinery_on_adversarial_values(spark):
    """_rank_below (the bucketed two-level prefix sum behind MWU/KW)
    must equal a direct computation on values chosen to stress it:
    negatives (floor-division buckets), exact bucket-boundary values,
    a bucket containing a single value, and heavy ties."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _STAT_U,
        _rank_below,
    )

    U = _STAT_U
    vals = [-3 * U, -3 * U, -1, 0, 0, 0, 1, U - 1, U, U, 2 * U + 5,
            7 * U, 7 * U + 1]
    from collections import Counter

    cnt = Counter(vals)
    df = spark.createDataFrame(
        [(v, c) for v, c in cnt.items()], "v long, c long"
    )
    got = {r.v: r.below for r in _rank_below(df).collect()}
    for v in cnt:
        assert got[v] == sum(c for w, c in cnt.items() if w < v), v


def test_rank_expressions_exact_beyond_int64(spark):
    """ADVICE r12 (medium): the rank-sum and tie-term products must be
    computed in DECIMAL(38,0), not int64 — c·(c²−1) wraps silently in
    non-ANSI Spark once a tie class has c ≳ 2.1M rows, and
    ca·(2·below+c+1) wraps for below near the int64 range. Feed the
    shared expression helpers count/offset values PAST the int64 wrap
    point and compare against exact Python integer arithmetic (the same
    regime the DuckDB oracle reaches via HUGEINT)."""
    from pipeline_apache_beam_entrega1_cs_spark.plans.analytics import (
        _rank_sum_2x,
        _rank_tie_term,
    )

    cases = [
        # (cg, below, c): c=5M → c³ ≈ 1.25e20 > 2⁶³ ≈ 9.2e18
        (1_000_000, 4_000_000_000_000_000_000, 5_000_000),
        (7, 0, 3_000_000),
        (2, 10, 3),  # small sanity row
    ]
    df = spark.createDataFrame(cases, "cg long, below long, c long")
    rows = df.select(
        "cg",
        "below",
        "c",
        _rank_sum_2x(F.col("cg"), F.col("below"), F.col("c")).alias("r2"),
        _rank_tie_term(F.col("c")).alias("tie"),
    ).collect()
    for r in rows:
        assert int(r.r2) == r.cg * (2 * r.below + r.c + 1), r
        assert int(r.tie) == r.c * (r.c * r.c - 1), r
