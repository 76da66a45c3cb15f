"""Round-15 optimization contract for the two rewritten udf-surface
entries: the optimized native plans must return EXACTLY the rows the
original applyInPandas/cogroup forms return (which the DuckDB oracle
already certifies). The ``*_pandas`` twins also keep the grouped-pandas
and cogroup calling conventions CI-exercised now that the registry
entries no longer route through Python (guide §2.3/§4.1: built-in
aggregates do map-side partial aggregation; grouped pandas ships every
row of every group to a Python worker)."""

from __future__ import annotations


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cogroup_order_gaps_native_equals_pandas(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.udf_surface import (
        cogroup_order_gaps,
        cogroup_order_gaps_pandas,
    )

    fast = cogroup_order_gaps(spark, sf_dir)
    ref = cogroup_order_gaps_pandas(spark, sf_dir)
    # names+types must match (nullability may tighten: built-in
    # count/coalesce prove non-null where pandas could not — the oracle
    # gate compares name+type only, tests/test_oracle.py)
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]
    assert _rows(fast) == _rows(ref)
    # the optimized plan must not cross the Python boundary
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_applyinpandas_trimmed_mean_native_equals_pandas(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.udf_surface import (
        applyinpandas_trimmed_mean,
        applyinpandas_trimmed_mean_pandas,
    )

    fast = applyinpandas_trimmed_mean(spark, sf_dir)
    ref = applyinpandas_trimmed_mean_pandas(spark, sf_dir)
    # names+types must match (nullability may tighten: built-in
    # count/coalesce prove non-null where pandas could not — the oracle
    # gate compares name+type only, tests/test_oracle.py)
    assert [(f.name, f.dataType) for f in fast.schema.fields] == [
        (f.name, f.dataType) for f in ref.schema.fields
    ]
    assert _rows(fast) == _rows(ref)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "EvalPython" not in plan
