"""Arbitrary stateful streaming: applyInPandasWithState.

Demonstrates the custom-stateful-operator escape hatch (SURVEY.md §2B
"Streaming" row): a per-user running aggregate whose state survives
across micro-batches. At scale, state lives in the state store
(RocksDB-backed on a real cluster), partitioned by the grouping key —
the Python function only ever sees one key's state at a time.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE"
STATE_SCHEMA = "n LONG, total DOUBLE"


def _update_user_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate (count, value-sum) per user across micro-batches; emit
    the updated running totals each batch the user appears in."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Stateful per-user running totals over an event stream."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_counts,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_counter(spark, sf_dir: str) -> DataFrame:
    """Drive the stateful counter over the events parquet as a stream and
    return the materialized per-user totals."""
    from .windows import _drain, _stream_events

    return _drain(running_user_totals(_stream_events(spark, sf_dir)), "update")
