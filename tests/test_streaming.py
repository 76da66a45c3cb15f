"""Structured Streaming semantics tests (SURVEY.md §2B streaming row):
batch==streaming equivalence for the windowed aggregation, watermarked
dedup, and the applyInPandasWithState custom stateful operator."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def rows_multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_streaming_equals_batch_tumbling(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.plans.windows_batch import window_tumbling
    from pipeline_apache_beam_entrega1_cs_spark.streaming.windows import run_tumbling_stream

    batch = rows_multiset(window_tumbling(spark, sf_dir))
    stream = rows_multiset(run_tumbling_stream(spark, sf_dir))
    assert batch == stream


def test_dedup_within_watermark(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table
    from pipeline_apache_beam_entrega1_cs_spark.streaming.windows import (
        run_dedup_within_watermark,
    )

    out = run_dedup_within_watermark(spark, sf_dir)
    got = out.count()
    # One batch replay => every (user_id, event_type) key appears exactly
    # once (all duplicates fall inside the watermark window).
    expected = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .count()
    )
    assert got == expected
    assert out.groupBy("user_id", "event_type").count().filter(F.col("count") > 1).count() == 0


def test_stateful_counter(spark, sf_dir):
    from pipeline_apache_beam_entrega1_cs_spark.schemas import load_table
    from pipeline_apache_beam_entrega1_cs_spark.streaming.stateful import run_stateful_counter

    out = run_stateful_counter(spark, sf_dir).toPandas().set_index("user_id")
    expected = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4).alias("tv"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(out) == len(expected)
    for uid, row in expected.iterrows():
        assert out.loc[uid, "n_events"] == row["n_events"], uid
        assert abs(out.loc[uid, "total_value"] - row["tv"]) < 1e-6, uid
