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


# --- oracle type strictness -------------------------------------------------
#
# Twice the driver's hash rejected an oracle the local value-comparison
# accepted (round 1: q1 DECIMAL sums at 9-digit canon; round 3:
# pack_token_budget batch_id HUGEINT from DuckDB's windowed SUM(BIGINT)).
# The local gate must therefore be strict on DECLARED TYPES, not just
# values: every DuckDB oracle column must carry exactly the type Spark
# emits for that column, forcing explicit CASTs in the oracle SQL.


def _duck_type_for(spark_dt: str) -> str:
    """Map a Spark simpleString dtype to the exact DuckDB type the oracle
    must declare for hash parity (recursive for arrays)."""
    if spark_dt.startswith("array<") and spark_dt.endswith(">"):
        return _duck_type_for(spark_dt[len("array<"):-1]) + "[]"
    if spark_dt.startswith("decimal("):
        return "DECIMAL" + spark_dt[len("decimal"):].upper()
    scalar = {
        "tinyint": "TINYINT",
        "smallint": "SMALLINT",
        "int": "INTEGER",
        "bigint": "BIGINT",
        "float": "FLOAT",
        "double": "DOUBLE",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
        "timestamp_ntz": "TIMESTAMP",
        "binary": "BLOB",
    }
    if spark_dt in scalar:
        return scalar[spark_dt]
    raise AssertionError(f"no DuckDB mapping for Spark type {spark_dt!r}")


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_type_strict(spark, duck, sf_dir, name):
    df = REGISTRY[name].fn(spark, sf_dir)
    expected = {
        f.name: _duck_type_for(f.dataType.simpleString()) for f in df.schema.fields
    }
    desc = duck.sql("DESCRIBE " + REGISTRY[name].oracle).fetchall()
    actual = {r[0]: r[1] for r in desc}
    assert sorted(actual) == sorted(expected), (
        f"column names differ: {sorted(actual)} vs {sorted(expected)}"
    )
    mismatched = {
        c: (actual[c], expected[c]) for c in expected if actual[c] != expected[c]
    }
    assert not mismatched, (
        "oracle column types must match Spark exactly (add CASTs to the "
        f"oracle SQL): {{col: (duckdb, spark_expects)}} = {mismatched}"
    )
