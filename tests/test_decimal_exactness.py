"""The round-2 parity conventions rest on two claims (functions/numeric):

1. drev()/dcharge() products over 2-decimal money/rate doubles are EXACT
   (no rounding anywhere before the final cast back to double);
2. the final decimal->double string-cast hop is correctly rounded.

This suite checks both against an independent arbiter — Python's
decimal.Decimal at full precision — on 10k random 2-decimal rows,
including the grouped-sum form (the q1 shape that failed round 1).
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from pipeline_apache_beam_entrega1_cs_spark.functions.numeric import (
    dcharge,
    drev,
    dsum_dec,
)


def _money_frame(seed: int = 17, n: int = 10_000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # cents-grid values stored as doubles, like the testdata columns
    return pd.DataFrame(
        {
            "g": rng.integers(0, 4, n),
            "price": rng.integers(90_000, 10_500_000, n) / 100.0,
            "disc": rng.integers(0, 11, n) / 100.0,
            "tax": rng.integers(0, 9, n) / 100.0,
        }
    )


def _exact_sums(pdf: pd.DataFrame):
    out = {}
    for g, grp in pdf.groupby("g"):
        rev = Decimal(0)
        charge = Decimal(0)
        for p, d, t in zip(grp.price, grp.disc, grp.tax):
            # quantize the doubles back to their cents grid — the same
            # recovery the DECIMAL(12,2)/(4,2) casts perform
            pd_ = Decimal(f"{p:.2f}")
            dd = Decimal(f"{d:.2f}")
            td = Decimal(f"{t:.2f}")
            rev += pd_ * (1 - dd)
            charge += pd_ * (1 - dd) * (1 + td)
        out[int(g)] = (rev, charge)
    return out


def test_decimal_products_match_python_decimal(spark):
    pdf = _money_frame()
    df = spark.createDataFrame(pdf)
    got = {
        int(r["g"]): (r["rev"], r["charge"])
        for r in df.groupBy("g")
        .agg(
            dsum_dec(drev("price", "disc")).alias("rev"),
            dsum_dec(dcharge("price", "disc", "tax")).alias("charge"),
        )
        .collect()
    }
    exact = _exact_sums(pdf)
    for g, (rev_e, charge_e) in exact.items():
        rev_s, charge_s = got[g]
        # correctly-rounded double of the exact decimal == Spark's result
        assert rev_s == float(rev_e), f"group {g} rev: {rev_s!r} != {rev_e}"
        assert charge_s == float(charge_e), f"group {g} charge: {charge_s!r} != {charge_e}"


def test_rank_and_microunit_sums_exact_beyond_int64(spark):
    """Round-14 audit (VERDICT r13 item 5): sweeping for the
    Mann-Whitney overflow class found three aggregate SUMS whose totals
    outgrow int64 long before any single row does —
    agg_spearman_corr's Σ2r̄ (n²-magnitude: wraps once n ≳ 3e9 rows),
    and stat_welch_ttest / stat_anova_f's Σv micro-unit group sums
    (linear: ~2e10 rows × avg value 500). All three now promote to
    DECIMAL before the aggregate. Under this session's Spark 4 ANSI
    default the pre-fix long sum does not even wrap — it ABORTS THE
    JOB with ARITHMETIC_OVERFLOW (with ANSI off it would wrap
    silently; either way the query is dead at scale). This test drives
    the EXPRESSION SHAPE those fixes share past the int64 limit and
    compares the promoted form against exact Python integers (the
    regime DuckDB reaches via HUGEINT)."""
    import pytest

    from pipeline_apache_beam_entrega1_cs_spark.functions.numeric import (
        _dec_to_double,
    )

    # Four doubled-rank / micro-unit values whose SUM is 1.6e19 > 2⁶³
    # ≈ 9.22e18 (each value individually fits int64, as in production).
    vals = [4_000_000_000_000_000_000] * 4
    df = spark.createDataFrame([(v,) for v in vals], "x long")

    # the pre-fix shape kills the job at scale (ANSI overflow)
    with pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|overflow"):
        df.agg(F.sum("x").cast("bigint").alias("s")).first()

    # the promoted shape (decimal BEFORE the aggregate), both as the
    # exact decimal and through the house string->double conversion
    dec = df.agg(
        F.sum(F.col("x").cast("decimal(19,0)")).alias("s")
    ).first()["s"]
    assert int(dec) == sum(vals)
    dbl = df.agg(
        _dec_to_double(F.sum(F.col("x").cast("decimal(19,0)"))).alias("s")
    ).first()["s"]
    assert dbl == float(sum(vals))  # correctly rounded at 1.6e19
