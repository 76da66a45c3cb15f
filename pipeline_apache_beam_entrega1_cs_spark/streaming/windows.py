"""Structured Streaming forms of the time-window operators.

Same window expressions as plans/windows_batch.py, executed through
readStream -> withWatermark -> groupBy(window) -> memory sink. On a real
cluster the source becomes Kafka/files-in-arrival-order and the sink a
Delta/parquet append — the aggregation code does not change.

The memory sink + processAllAvailable pattern drains a bounded source
synchronously, which is how the tests (and the rows-only driver check)
get a deterministic result out of a streaming query.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum
from ..schemas import load_table


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Schema must be the RAW file schema (ts is a nanosecond long — see
    # schemas.load_table); the ns->us conversion reapplies on the stream.
    from ..schemas import ensure_session_confs, normalize_nanos_ts

    # The driver harness builds its OWN SparkSession: the nanos-timestamp
    # and UTC confs must be (re)applied here, not assumed from get_spark.
    ensure_session_confs(spark)
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # The file stream source requires a directory; glob-filter to the one
    # events file inside the sf dir.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_nanos_ts(stream)


def _drain(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming aggregation to completion via a memory sink and
    return the materialized result as a batch DataFrame."""
    name = f"drain_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.table(name)


def tumbling_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling aggregation — the streaming twin of
    plans/windows_batch.window_tumbling. The watermark bounds state:
    windows older than max(event time) - watermark finalize and evict."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the watermarked tumbling aggregation over the events
    parquet as a stream; complete mode because a cold replay is one batch
    (append mode would emit nothing until the watermark advances past a
    window in a LATER batch)."""
    return _drain(tumbling_agg_stream(_stream_events(spark, sf_dir)), "complete")


def sliding_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked sliding-window aggregation (1 h window, 30 min slide)
    — the streaming twin of plans/windows_batch.window_sliding. Each
    event updates exactly 2 overlapping windows; the watermark bounds
    how many window states stay live."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "n_events",
            "sum_value",
        )
    )


def run_sliding_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the watermarked sliding aggregation as a one-batch cold
    replay (complete mode — see run_tumbling_stream)."""
    return _drain(sliding_agg_stream(_stream_events(spark, sf_dir)), "complete")


def run_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type). State is evicted once the watermark passes —
    bounded memory on an unbounded stream."""
    ev = _stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    deduped = ev.dropDuplicatesWithinWatermark(["user_id", "event_type"])
    out = deduped.select("user_id", "event_type", "event_id")
    return _drain(out, "append")


def session_agg_stream(events: DataFrame, gap: str = "30 minutes",
                       watermark: str = "2 hours") -> DataFrame:
    """Watermarked streaming session windows — the streaming twin of
    operators/sessionize.session_window_agg. session_window under
    Structured Streaming needs the watermark to know when a session can
    no longer grow (no new event within gap after watermark) and be
    finalized + evicted from state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


def run_session_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute streaming sessionization over the events parquet; complete
    mode because a cold replay is one batch (sessions would otherwise wait
    for a later batch's watermark advance to finalize)."""
    return _drain(session_agg_stream(_stream_events(spark, sf_dir)), "complete")
