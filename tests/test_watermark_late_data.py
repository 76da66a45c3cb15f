"""Real watermark semantics: once the watermark has advanced (and been
committed to the offset log), events older than it are DROPPED from a
windowed streaming aggregation — the property that bounds state on an
unbounded stream.

Micro-batch layout (maxFilesPerTrigger=1, one file per batch):
  batch 0: 60 recent events      (watermark still at epoch during batch)
  batch 1: 30 more recent events (plans with watermark from batch 0)
  batch 2: 10 events 3 h older than the watermark -> must be dropped
  batch 3: far-future flush      (finalizes the recent windows)

Empirical Spark behavior pinned here: the watermark used to filter batch
N is the one committed after batch N-1 — i.e. drops take effect with a
one-batch lag (batch 0's data can never be dropped).
"""

from __future__ import annotations

import shutil
import time
import uuid
from datetime import datetime, timedelta
from pathlib import Path

from pyspark.sql import functions as F

BASE = datetime(2024, 6, 1, 12, 0, 0)
SCHEMA = "event_id LONG, ts TIMESTAMP, value DOUBLE"


def _write_batch(spark, flat: Path, name: str, rows) -> None:
    tmp = flat.parent / f"stage_{name}"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(str(tmp))
    shutil.copy(next(tmp.glob("part-*.parquet")), flat / f"{name}.parquet")
    time.sleep(1.1)  # distinct mod-times keep the file-source batch order


def test_late_rows_dropped_by_watermark(spark, tmp_path_factory):
    flat = Path(str(tmp_path_factory.mktemp("events_flat")))
    _write_batch(spark, flat, "00_recent",
                 [(i, BASE + timedelta(minutes=i), 1.0) for i in range(60)])
    _write_batch(spark, flat, "01_more",
                 [(200 + i, BASE + timedelta(minutes=60 + i), 1.0) for i in range(30)])
    _write_batch(spark, flat, "02_late",
                 [(100 + i, BASE - timedelta(hours=3, minutes=i), 1.0) for i in range(10)])
    _write_batch(spark, flat, "03_flush",
                 [(300, BASE + timedelta(hours=6), 1.0)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_timestamp("w.start").alias("ws"), "n")
    )
    name = f"late_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r.ws: r.n for r in spark.table(name).collect()}

    late_epochs = {
        int((BASE - timedelta(hours=3, minutes=i)).timestamp()) // 1800 * 1800
        for i in range(10)
    }
    recent_epochs = {
        int((BASE + timedelta(minutes=m)).timestamp()) // 1800 * 1800
        for m in range(90)
    }
    # the late batch arrived after the watermark was committed -> dropped
    assert not (late_epochs & set(out)), f"late windows leaked: {late_epochs & set(out)}"
    # the flush batch finalized every recent window with full counts
    assert recent_epochs <= set(out), f"missing finalized windows: {recent_epochs - set(out)}"
    assert all(out[ws] == 30 for ws in recent_epochs), out
