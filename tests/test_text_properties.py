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
