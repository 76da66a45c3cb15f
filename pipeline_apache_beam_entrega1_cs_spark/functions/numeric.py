"""Deterministic aggregate helpers.

Floating-point sums are partition-order dependent: Spark's partial
aggregation adds doubles in whatever order tasks finish, so the same
query can differ in the last ulps run-to-run — and will differ from a
single-threaded oracle. These helpers make aggregate results EXACT and
engine-independent by summing as fixed-scale decimals and casting the
final result back to double. This is also the right call at 100 TB:
money-like columns summed as decimal don't accumulate fp drift across
a million partial aggregates.

Oracle-side mirror (DuckDB):
    CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dsum(col: Column | str) -> Column:
    """Order-independent sum of a double column via decimal(18,4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count (double division
    of identical operands is deterministic everywhere)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({expr})"
