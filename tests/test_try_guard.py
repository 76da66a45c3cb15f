"""The try_functions guard contract: the regex guards in front of
try_cast / try_to_timestamp must OVER-approximate the accepted grammar.
A guard false-positive is safe (the row falls through to try_*, which
nulls it); a false-negative would wrongly null a castable value — so
for every probe string, guarded CASE and bare try_* must agree exactly.

The guard exists because Spark implements try_* failure as a
thrown-and-caught JVM exception per failing row (~9 µs each, round-14
profiling): on a mostly-malformed column the failure path is ~15× the
success path, which at 100 TB turns a map-only projection into the
stage bottleneck. plans/relational2.try_functions documents the
measured 2.42 → ~0.5 s cut at sf0.1.
"""

from __future__ import annotations

# Adversarial probes: whitespace/control trimming (UTF8String.trimAll
# trims bytes <= 0x20), signs, decimals, exponent forms, type-suffix
# letters, overflow boundaries, full-width digits, junk.
LONG_PROBES = [
    "12", " 12 ", "\t12\n", "\x0012\x01", "+3", "-4", "1.5", "1.",
    ".5", "1e3", "1E+2", "12L", "12d", "0x10", "", "  ", "abc",
    "9223372036854775807", "-9223372036854775808", "9223372036854775808",
    "１２", "1 2", "--3", "+", "-", ".", "NaN", "Infinity", "F", "O", "P",
]

TS_PROBES = [
    "1995-01-15", " 1995-01-15", "1995-1-5", "0001-01-01", "10000-01-01",
    "1995-13-40", "1995-01-15T00:00:00", "1995/01/15", "F", "", "x",
    # signed expanded-year forms: strict 'yyyy' (SignStyle.EXCEEDS_PAD)
    # accepts '+10000-…' and requires the sign beyond 4 digits, so the
    # guard must pass them through to try_to_timestamp (ADVICE r14)
    "+10000-01-01", "-0100-01-01", "+1995-01-15", "-1995-01-15",
]


def test_long_guard_over_approximates_try_cast(spark):
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        try_functions,  # noqa: F401  (import proves the entry loads)
    )

    df = spark.createDataFrame([(s,) for s in LONG_PROBES], "s string")
    got = df.selectExpr(
        "s",
        "try_cast(s AS BIGINT) AS bare",
        "CASE WHEN s RLIKE "
        r"'^[\\x00-\\x20]*[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?"
        r"[dDfFlL]?[\\x00-\\x20]*$' "
        "THEN try_cast(s AS BIGINT) END AS guarded",
    ).collect()
    bad = [(r["s"], r["bare"], r["guarded"]) for r in got if r["bare"] != r["guarded"]]
    assert not bad, f"guard disagrees with bare try_cast on: {bad}"


def test_date_guard_over_approximates_try_to_timestamp(spark):
    df = spark.createDataFrame([(s,) for s in TS_PROBES], "s string")
    # Compare in-plan (null-safe equality) and collect only the boolean:
    # extreme-but-valid parses (e.g. '0001-01-01') produce timestamps
    # PySpark cannot deserialize on collect (year-0 local-time shift).
    got = df.selectExpr(
        "s",
        "try_to_timestamp(s, 'yyyy-MM-dd') <=> ("
        "CASE WHEN s RLIKE "
        r"'^[\\x00-\\x20]*[+-]?[0-9]{4,6}-[0-9]{1,2}-[0-9]{1,2}[\\x00-\\x20]*$' "
        "THEN try_to_timestamp(s, 'yyyy-MM-dd') END) AS agree",
    ).collect()
    bad = [r["s"] for r in got if not r["agree"]]
    assert not bad, f"guard disagrees with bare try_to_timestamp on: {bad}"


def test_try_functions_guarded_equals_bare_on_orders(spark, sf_dir):
    """End-to-end: the shipped guarded entry equals the bare-try_* form
    row-for-row on the actual orders table."""
    from pyspark.sql import functions as F  # noqa: F401

    from pipeline_apache_beam_entrega1_cs_spark.plans.relational2 import (
        try_functions,
    )

    df = try_functions(spark, sf_dir)
    bare = spark.read.parquet(f"{sf_dir}/orders.parquet").selectExpr(
        "o_orderkey",
        "try_cast(substr(o_orderpriority, 1, 1) AS BIGINT) AS prio_num",
        "try_cast(o_orderstatus AS BIGINT) AS status_num",
        "try_divide(o_totalprice, o_custkey % 7) AS price_per_mod",
        "try_element_at(split(o_orderpriority, '-'), 3) AS prio_part3",
        "try_to_timestamp(o_orderstatus, 'yyyy-MM-dd') IS NULL AS bad_ts_is_null",
    )
    assert df.exceptAll(bare).count() == 0
    assert bare.exceptAll(df).count() == 0
