"""Unified query registry: every operator from SURVEY.md §2 with its
Spark plan and (where SQL-expressible) DuckDB oracle. Consumed by
/root/repo/__spark_entry__.py (driver contract), tests/test_oracle.py,
and bench.py.
"""

from __future__ import annotations

from . import llm_data, relational, relational2, tpch, udf_surface, windows_batch
from .spec import QuerySpec


def all_queries() -> dict[str, QuerySpec]:
    merged: dict[str, QuerySpec] = {}
    for mod in (relational, relational2, tpch, windows_batch, llm_data, udf_surface):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    return merged
