"""Property tests: the native text expressions must agree with plain-
Python specifications on randomized (incl. non-ASCII) inputs — the doc
corpus the oracle runs on is ASCII word-soup, so these cover the space
the oracle doesn't."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def py_tokens(text: str) -> list[str]:
    t = text.strip().lower()
    return [] if t == "" else re.split(r"\s+", t)


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = py_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_fingerprint(text: str) -> str:
    canonical = " ".join(sorted(set(py_tokens(text))))
    return hashlib.md5(canonical.encode("utf-8")).hexdigest()


# Whitespace-ish + word-ish text, incl. unicode letters; avoid the regex
# class differences between Python \s and Java \s for exotic separators by
# drawing whitespace from the common subset.
texts = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=["Lu", "Ll", "Nd", "Po"]),
        min_size=1,
        max_size=8,
    ),
    min_size=0,
    max_size=12,
).map(lambda ws: " ".join(ws))


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=20))
def test_token_counts_match_python(spark, docs_texts):
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import token_stats

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_tokens, r.n_distinct_tokens) for r in token_stats(df).collect()}
    for i, t in enumerate(docs_texts):
        toks = py_tokens(t)
        assert got[i] == (len(toks), len(set(toks))), (t, got[i])


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=20))
def test_fingerprint_matches_python_md5(spark, docs_texts):
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.fp for r in fingerprint(df).collect()}
    for i, t in enumerate(docs_texts):
        assert got[i] == py_fingerprint(t), repr(t)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=10))
def test_shingle_sets_match_python(spark, docs_texts):
    from pipeline_apache_beam_entrega1_cs_spark.operators.dedup import ngram_shingles

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got: dict[int, set] = {i: set() for i in range(len(docs_texts))}
    for r in ngram_shingles(df, 3).collect():
        got[r.doc_id].add(r.shingle)
    for i, t in enumerate(docs_texts):
        assert got[i] == py_shingles(t), repr(t)


def py_span_dedup(docs_texts: list[str], n: int) -> dict[int, tuple]:
    """Plain-Python spec of operators/dedup.span_dedup: remove every
    occurrence of a corpus-wide repeated word n-gram except the first
    (min (doc_id, start)), reassemble the survivors in order."""
    from collections import defaultdict

    toks = {
        i: py_tokens(t) for i, t in enumerate(docs_texts) if t.strip() != ""
    }
    occ = defaultdict(list)
    for d in sorted(toks):
        tk = toks[d]
        for i in range(len(tk) - n + 1):
            occ[" ".join(tk[i : i + n])].append((d, i + 1))
    removed = defaultdict(set)
    for lst in occ.values():
        if len(lst) >= 2:
            lst.sort()
            for d, s in lst[1:]:
                removed[d].update(range(s, s + n))
    out = {}
    for d, tk in toks.items():
        cov = removed.get(d, set())
        kept = [w for i, w in enumerate(tk, start=1) if i not in cov]
        out[d] = (len(tk), len(cov), " ".join(kept))
    return out


# Tiny vocabulary so repeated n-grams actually occur: the interesting
# cases (overlapping spans, within-doc repeats, whole-doc removal) need
# collisions, which a broad alphabet would make vanishingly rare.
_span_docs = st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=20).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_span_docs)
def test_span_dedup_matches_python_spec(spark, docs_texts):
    from pipeline_apache_beam_entrega1_cs_spark.operators.dedup import span_dedup

    n = 3
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.clean_text)
        for r in span_dedup(df, n=n).collect()
    }
    assert got == py_span_dedup(docs_texts, n)


def test_bpe_apply_fixture_segmentations(spark):
    """Known merge table -> known segmentations, hand-derivable: the
    wrapped-symbol replace chain must produce exactly these symbol
    sequences (and the counts the entry reports)."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import (
        bpe_apply_stats,
        bpe_segment_expr,
    )

    cases = {
        # "the" chains t+h -> th, th+e -> the within one sweep
        1: ("the", "(the)", 1),
        # rule (a,n) fires before (an,d) in the same sweep -> "and"
        2: ("and", "(and)", 1),
        # "then there": the -> (the)(n) / (the)(re)
        3: ("then there", "(the)(n) (the)(re)", 4),
        # chars with no applicable rule stay single symbols
        4: ("xyz", "(x)(y)(z)", 3),
        # non-letters separate words (no cross-boundary merge with "e"),
        # but t+h still merges inside the first fragment
        5: ("th3e!", "(th) (e)", 2),
        6: ("", "", 0),
    }
    df = spark.createDataFrame(
        [(k, t) for k, (t, _, _) in cases.items()], "doc_id long, text string"
    )
    seg = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", bpe_segment_expr(F.col("text")).alias("s")).collect()
    }
    stats = {r["doc_id"]: r for r in bpe_apply_stats(df).collect()}
    for k, (text, want_seg, want_n) in cases.items():
        assert seg[k].strip() == want_seg, (text, seg[k])
        assert stats[k]["n_bpe_tokens"] == want_n, (text, stats[k])
        n_alpha = sum(c.isalpha() for c in text)
        assert stats[k]["n_alpha_chars"] == n_alpha
        assert stats[k]["n_merges_applied"] == n_alpha - want_n


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(texts, min_size=1, max_size=20))
def test_bpe_apply_matches_python_spec(spark, docs_texts):
    """The unrolled replace-chain segmentation == a plain-Python spec of
    priority-ordered sweep BPE on arbitrary (incl. unicode) text."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import (
        BPE_MERGES,
        BPE_SWEEPS,
        bpe_segment_expr,
    )

    def py_bpe(text: str) -> str:
        base = re.sub(r"[^a-z]+", " ", text.lower())
        s = re.sub(r"([a-z])", r"(\1)", base)
        for _ in range(BPE_SWEEPS):
            for a, b in BPE_MERGES:
                s = s.replace(f"({a})({b})", f"({a}{b})")
        return s

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", bpe_segment_expr(F.col("text")).alias("s")).collect()
    }
    for i, t in enumerate(docs_texts):
        assert got[i] == py_bpe(t), (t, got[i])


def test_bpe_fit_learns_chained_merges(spark):
    """Planted corpus: round 1 must learn the most frequent pair, and
    round 2 must merge a symbol CREATED in round 1 (proving the
    apply-between-rounds step), with lexicographic tie-breaks."""
    from pipeline_apache_beam_entrega1_cs_spark.operators.textops import bpe_fit

    # per doc "abc abd": pairs (a,b)x2, (b,c), (b,d)
    docs = spark.createDataFrame(
        [(i, "abc abd") for i in range(3)], "doc_id long, text string"
    )
    out = {r["round"]: r for r in bpe_fit(docs, rounds=3).collect()}
    assert (out[1]["left_sym"], out[1]["right_sym"], out[1]["n_occurrences"]) == ("a", "b", 6)
    # after merging (a,b): words are (ab)(c) / (ab)(d) -> pairs (ab,c), (ab,d) tie -> lexicographic
    assert (out[2]["left_sym"], out[2]["right_sym"], out[2]["n_occurrences"]) == ("ab", "c", 3)
    assert (out[3]["left_sym"], out[3]["right_sym"], out[3]["n_occurrences"]) == ("ab", "d", 3)
