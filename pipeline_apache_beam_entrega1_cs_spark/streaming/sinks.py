"""foreachBatch sinks with exactly-once semantics.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a failure the same (batch_id, data) pair is replayed. End-to-end
exactly-once therefore rests on the SINK being idempotent per batch_id —
the pattern every transactional Spark sink (Delta, Iceberg, JDBC-with-
txn-table) implements internally. This is the engine-only file version:

- each micro-batch writes to its own ``batch_id=N`` partition directory
  with mode("overwrite") — a half-written replay self-heals because the
  rerun overwrites the same directory;
- a zero-byte ``_committed_N`` marker is created only after the write
  succeeds — a replay of an already-committed batch_id returns without
  touching data, so duplicated delivery never duplicates rows.

On a real cluster the marker lives next to the data on the object store
(visibility piggybacks on the store's list-after-put consistency) and
the overwrite is a directory rename — both already how FileStreamSink's
_spark_metadata log works; this class just makes the contract explicit
and testable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """``foreachBatch`` callable: exactly-once parquet append by batch id.

    Usage::

        sink = IdempotentParquetSink("/path/out")
        q = df.writeStream.foreachBatch(sink).start()
    """

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.path, f"_committed_{batch_id}")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def __call__(self, df: DataFrame, batch_id: int) -> None:
        if self.is_committed(batch_id):
            return  # replayed delivery of a committed batch: no-op
        (
            df.write.mode("overwrite").parquet(
                os.path.join(self.path, f"batch_id={batch_id}")
            )
        )
        with open(self._marker(batch_id), "w"):
            pass


def run_rollup_upsert_stream(spark, sf_dir: str):
    """Continuous aggregate via foreachBatch MERGE: the events table is
    replayed as FOUR micro-batches (event_id % 4 slices, one file per
    trigger) and each batch's hourly partial aggregate is merged into a
    parquet state table (read current + union + re-aggregate + atomic
    directory swap) — the engine-only form of a Delta/Iceberg
    `MERGE INTO` continuous rollup.

    Because count/decimal-sum partials are associative, the final state
    is independent of batch boundaries and equals the one-shot batch
    aggregate — which is exactly what the SQL oracle checks. Decimal
    state (DECIMAL(38,4)) keeps the cross-batch accumulation exact; the
    double conversion happens once at the end via the string-cast
    convention (plans/spec.py)."""
    import glob
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ..schemas import ensure_session_confs, normalize_nanos_ts

    ensure_session_confs(spark)
    work = tempfile.mkdtemp(prefix="graft_rollup_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i in range(4):
        stage = os.path.join(work, f"stage_{i}")
        (
            raw.filter(F.col("event_id") % 4 == i)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        shutil.copy(
            glob.glob(os.path.join(stage, "part-*.parquet"))[0],
            os.path.join(src, f"{i:02d}.parquet"),
        )
    state = os.path.join(work, "state")

    def merge_batch(batch_df, batch_id: int) -> None:
        bdf = normalize_nanos_ts(batch_df)
        inc = (
            bdf.groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
            ).agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("decimal(38,4)")
                .alias("sum_dec"),
            )
        )
        s = bdf.sparkSession
        if os.path.exists(state):
            inc = (
                s.read.parquet(state)
                .unionByName(inc)
                .groupBy("hour", "event_type")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_dec").cast("decimal(38,4)").alias("sum_dec"),
                )
            )
        tmp = f"{state}_tmp{batch_id}"
        inc.write.mode("overwrite").parquet(tmp)  # materializes BEFORE swap
        if os.path.exists(state):
            shutil.rmtree(state)
        os.rename(tmp, state)

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(state).select(
        F.unix_timestamp("hour").cast("long").alias("hour_s"),
        "event_type",
        "n_events",
        F.col("sum_dec").cast("string").cast("double").alias("sum_value"),
    )
