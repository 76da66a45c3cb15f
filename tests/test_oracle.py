"""Oracle parity tests: run every registry query through Spark AND its
DuckDB oracle SQL, compare row count + order-insensitive value multiset —
replicating the driver's correctness gate (SURVEY.md §5 item 2).

Comparison detail: columns sorted by name; floats canonicalized at 17
significant digits (repr-exact for float64 — the round-1 9-digit
canonicalization masked a real driver hash failure on q1 sum_charge,
so the local gate must be at least as strict as the driver); NaN == NaN.

Queries without an oracle get a rows-run smoke check here (their
semantic quality is covered by dedicated tests, e.g. LSH recall).
"""

from __future__ import annotations

import math

import pytest

from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

REGISTRY = all_queries()


def canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"f:{v:.17g}"
    if isinstance(v, int):
        return f"i:{v}"
    return f"s:{v}"


def frame_multiset(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    from collections import Counter

    return Counter(tuple(canon_cell(r[i]) for i in order) for r in rows)


def spark_result(spark, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    return df.columns, rows


def duck_result(duck, name):
    cur = duck.sql(REGISTRY[name].oracle)
    return [d[0] for d in cur.description], cur.fetchall()


WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, sf_dir, name):
    s_cols, s_rows = spark_result(spark, sf_dir, name)
    d_cols, d_rows = duck_result(duck, name)
    assert sorted(s_cols) == sorted(d_cols), f"column names differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count {len(s_rows)} vs oracle {len(d_rows)}"
    s_ms = frame_multiset(s_cols, s_rows)
    d_ms = frame_multiset(d_cols, d_rows)
    if s_ms != d_ms:
        missing = list((d_ms - s_ms).items())[:3]
        extra = list((s_ms - d_ms).items())[:3]
        pytest.fail(f"value multiset mismatch; oracle-only={missing} spark-only={extra}")


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, name):
    cols, rows = spark_result(spark, sf_dir, name)
    assert len(cols) > 0
    assert len(rows) >= 0  # smoke: executes and materializes
