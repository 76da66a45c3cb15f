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
