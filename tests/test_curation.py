"""Semantic tests for the curation operators (operators/curation.py)
beyond the oracle parity in test_oracle.py: planted-input behavior
(a verbatim benchmark copy must flag as contaminated; a looped document
must flag as repetitive) and structural properties (chunk windows cover
every token exactly the overlap-expected number of times).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pipeline_apache_beam_entrega1_cs_spark.operators import curation as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_verbatim_benchmark_copy(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                      # benchmark member (0 % 97 == 0)
        (1, bench_text),                      # verbatim leak -> contaminated
        (2, "one two three four five six"),   # disjoint -> clean
        (3, "tiny doc"),                      # < n tokens -> 0 shingles, clean
    ]
    out = {r["doc_id"]: r for r in C.decontaminate(_docs(spark, rows), n=5).collect()}
    assert set(out) == {1, 2, 3}  # benchmark rows are not scored
    assert out[1]["contaminated"] and out[1]["contamination"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["n_shingles"] == 0 and not out[3]["contaminated"]


def test_decontaminate_external_benchmark_keeps_all_docs(spark):
    """With an externally supplied bench_shingles, the % mod exclusion
    must NOT apply (ADVICE round 6): every corpus doc — including ids
    that happen to be ≡ 0 mod `mod` — is scored against the external
    set. exclude_bench_ids=True restores the derived-set behavior."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                      # 0 % 97 == 0: kept now
        (1, bench_text),
        (2, "one two three four five six"),
    ]
    docs = _docs(spark, rows)
    ext = (
        _docs(spark, [(10, bench_text)])
        .select(F.explode(F.lit([" ".join(bench_text.split()[i:i + 5])
                                 for i in range(4)])).alias("shingle"))
        .distinct()
    )
    out = {r["doc_id"]: r for r in
           C.decontaminate(docs, n=5, bench_shingles=ext).collect()}
    assert set(out) == {0, 1, 2}  # no doc excluded
    assert out[0]["contaminated"] and out[1]["contaminated"]
    assert not out[2]["contaminated"]
    # forcing exclusion brings back the derived-set slicing
    forced = {r["doc_id"] for r in
              C.decontaminate(docs, n=5, bench_shingles=ext,
                              exclude_bench_ids=True).collect()}
    assert forced == {1, 2}


def test_scrub_counts_and_redacts(spark):
    rows = [
        (1, "contact a.b@example.com or see https://spark.apache.org/docs now"),
        (2, "customer data for customer and vector stores"),
        (3, "clean text with nothing sensitive"),
    ]
    out = {r["doc_id"]: r for r in C.scrub_blocklist(_docs(spark, rows)).collect()}
    assert (out[1]["n_emails"], out[1]["n_urls"]) == (1, 1)
    assert out[2]["n_blocked"] == 3
    assert (out[3]["n_urls"], out[3]["n_emails"], out[3]["n_blocked"]) == (0, 0, 0)
    # redaction changes the text hash iff something matched
    clean_md5 = spark.sql(
        "SELECT md5('clean text with nothing sensitive') AS h").first()["h"]
    assert out[3]["scrubbed_md5"] == clean_md5


@pytest.mark.parametrize("n_tok,size,stride", [(1, 32, 16), (32, 32, 16),
                                               (33, 32, 16), (100, 32, 16)])
def test_chunk_windows_cover_all_tokens(spark, n_tok, size, stride):
    text = " ".join(f"t{i}" for i in range(n_tok))
    chunks = C.chunk_sliding(_docs(spark, [(1, text)]), size, stride).collect()
    # starts at 1, 1+stride, ... <= n_tok
    expected_starts = list(range(1, n_tok + 1, stride))
    assert [c["chunk_idx"] for c in sorted(chunks, key=lambda c: c["chunk_idx"])] == [
        i + 1 for i in range(len(expected_starts))
    ]
    # token coverage: sum of chunk sizes == sum over starts of window length
    total = sum(c["n_chunk_tokens"] for c in chunks)
    assert total == sum(min(size, n_tok - s + 1) for s in expected_starts)


def test_repetition_flags_looped_text(spark):
    rows = [
        (1, "spam ham " * 30),                              # looped -> repetitive
        (2, " ".join(f"w{i}" for i in range(60))),          # all-distinct -> 0.0
        (3, "ab"),                                          # < n tokens -> 0.0
    ]
    out = {r["doc_id"]: r for r in C.repetition_stats(_docs(spark, rows)).collect()}
    assert out[1]["is_repetitive"] and out[1]["dup_ratio"] > 0.9
    assert out[2]["dup_ratio"] == 0.0 and not out[2]["is_repetitive"]
    assert out[3]["n_grams"] == 0 and out[3]["dup_ratio"] == 0.0


def test_scrub_plan_is_shuffle_free(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    df = C.scrub_blocklist(load_table(spark, sf_dir, "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only pass fused into the scan


def test_pack_token_budget_invariants(spark, sf_dir):
    """Packing invariants, independent of the oracle: (a) every non-empty
    bucket partitions its docs completely (n_docs sums to the bucket's
    doc count), (b) a batch only exceeds the 2048-token budget when a
    single document alone does (greedy close-on-overflow rule: a doc
    starts a new batch when the tokens BEFORE it fill the budget),
    (c) batch ids are dense from 0 within each bucket."""
    from pyspark.sql import functions as F

    from pipeline_apache_beam_entrega1_cs_spark.plans.pipeline_ops import (
        pack_token_budget,
    )
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table

    out = pack_token_budget(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    n_tok = F.when(F.trim(F.col("text")) == "", 0).otherwise(n_tok)
    per_bucket = {
        r.bucket: (r.n, r.max_tok)
        for r in docs.select(
            F.floor(F.col("doc_id") / 1024).alias("bucket"), n_tok.alias("t")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.max("t").alias("max_tok"))
        .collect()
    }

    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) == set(per_bucket)
    for bucket, rows in by_bucket.items():
        # (a) complete partition of the bucket's docs
        assert sum(r.n_docs for r in rows) == per_bucket[bucket][0]
        # (c) dense batch ids from 0
        ids = sorted(r.batch_id for r in rows)
        assert ids == list(range(len(ids)))
        # (b) overflow only via a single oversized doc: a multi-doc batch
        # can overshoot by at most its last doc, so tokens-before-last
        # were < 2048; a batch whose total wildly exceeds budget+max_doc
        # would be a packing bug
        for r in rows:
            if r.n_docs > 1:
                assert r.n_tokens <= 2048 + per_bucket[bucket][1]
