"""Property tests: the native Spark expressions must agree with the
reference's Python functions (vendored below as the executable spec —
SURVEY.md §5 item 3) on randomized inputs and on every known edge case."""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# --- executable spec: the reference's functions, vendored verbatim-in-
#     semantics (reference src/pipeline.py:17-36 and :42-44) ---
_WORDS = re.compile(r"[A-Za-z]+")
_DIGITS = re.compile(r"\d+")


def ref_standardize_race_id(val: str) -> str:
    text = val.strip()
    word = "".join(_WORDS.findall(text)).lower()
    digits = "".join(_DIGITS.findall(text))
    if word and digits:
        return f"{word}{digits}"
    return re.sub(r"[^0-9a-zA-Z]", "", text).lower()


def ref_norm_country_key(name: str | None) -> str:
    return (name or "").strip().lower()


EDGE_CASES = [
    "Cup 25", "league:04", "race_11", "25 Cup", "c1u2p3",
    "cup", "25", "!!!", "", "  ", "CUP25", "a b c 1 2 3",
    "é25", "ñandú 7", "_-_-", "0", "A", " Other ",
]


def _spark_eval(spark, values: list[str], expr_fn) -> list[str]:
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    return [r.out for r in df.select(expr_fn(F.col("v")).alias("out")).collect()]


def test_race_id_edge_cases(spark):
    from pipeline_apache_beam_entrega1_cs_spark.functions.strings import standardize_race_id

    got = _spark_eval(spark, EDGE_CASES, standardize_race_id)
    want = [ref_standardize_race_id(v) for v in EDGE_CASES]
    assert got == want, list(zip(EDGE_CASES, got, want))


def test_norm_country_key_edge_cases(spark):
    from pipeline_apache_beam_entrega1_cs_spark.functions.strings import norm_country_key

    values = ["  UK ", "usa", "South Africa", "", "  ", "Côte d'Ivoire", None]
    df = spark.createDataFrame([(v,) for v in values], "v: string")
    got = [r.out for r in df.select(norm_country_key(F.col("v")).alias("out")).collect()]
    want = [ref_norm_country_key(v) for v in values]
    assert got == want


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.text(min_size=0, max_size=24), min_size=1, max_size=50))
def test_race_id_property(spark, values):
    from pipeline_apache_beam_entrega1_cs_spark.functions.strings import standardize_race_id

    got = _spark_eval(spark, values, standardize_race_id)
    want = [ref_standardize_race_id(v) for v in values]
    assert got == want


def test_alias_rewrite(spark):
    from pipeline_apache_beam_entrega1_cs_spark.functions.strings import (
        COUNTRY_ALIAS,
        apply_country_alias,
    )

    values = ["usa", "us", "u.s.", "uk", "uae", "france", ""]
    df = spark.createDataFrame([(v,) for v in values], ["v"])
    got = [r.out for r in df.select(apply_country_alias(F.col("v")).alias("out")).collect()]
    want = [COUNTRY_ALIAS.get(v, v) for v in values]
    assert got == want
