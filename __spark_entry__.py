"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real registry lives in
``pipeline_apache_beam_entrega1_cs_spark/plans/`` — one QuerySpec per
operator from SURVEY.md §2, with the determinism conventions documented
in plans/spec.py (decimal-backed sums, BIGINT scalars, epoch/ISO time
outputs, total-ordered top-k).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pipeline_apache_beam_entrega1_cs_spark.plans.registry import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1 shape — scan + filter + 8-aggregate groupBy: exercises scan
    pushdown, partial aggregation, and the decimal-sum determinism
    convention in one plan.
    """
    from pipeline_apache_beam_entrega1_cs_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins (omitted for sketch/LSH ops whose
    bucketing is not SQL-expressible — those get rows-only checks and
    recall tests against exact baselines in tests/)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
