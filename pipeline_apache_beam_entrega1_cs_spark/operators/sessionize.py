"""Sessionization (gap-based) over an event stream, batch form.

Two equivalent implementations are exposed:

- ``session_window_agg``: Spark's native ``F.session_window`` (the same
  expression works under Structured Streaming with a watermark — see
  streaming/windows.py). Semantics: a session extends while the next
  event is < gap after the LAST event; end is half-open, so an event at
  exactly ``last + gap`` starts a new session.
- ``sessionize_islands``: the lag + cumulative-flag "islands" idiom —
  what the DuckDB oracle runs, and the form to reach for when per-session
  ordinals are needed.

Both are one shuffle on the key (window sort / session merge); no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import dsum


def session_window_agg(events: DataFrame, key: str, ts: str, gap: str,
                       value: str) -> DataFrame:
    """Per (key, session): start (epoch micros), event count, value sum."""
    return (
        events.groupBy(F.session_window(F.col(ts), gap).alias("sw"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col(value)).alias("sum_value"),
        )
        .select(
            key,
            F.unix_micros(F.col("sw.start")).alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_islands(events: DataFrame, key: str, ts: str, gap_seconds: int,
                       order_tiebreak: str) -> DataFrame:
    """Assign a session id (per-key ordinal) to every event. Gap compare
    runs on microseconds so sub-second timestamps split correctly."""
    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    tus = F.unix_micros(F.col(ts))
    prev = F.lag(tus).over(w)
    is_new = F.when(prev.isNull() | (tus - prev >= gap_seconds * 1_000_000), 1).otherwise(0)
    return events.withColumn("_is_new", is_new).withColumn(
        "session_id",
        F.sum("_is_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("_is_new")
