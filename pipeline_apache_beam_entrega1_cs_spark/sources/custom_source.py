"""Spark 4 custom Python DataSource (``pyspark.sql.datasource``) — the
connector escape hatch for systems with no JVM driver (internal APIs,
catalogs, bespoke formats). Registered via ``spark.dataSource.register``
and read with ``spark.read.format("graft_rows")``.

The demo source emits a DETERMINISTIC (row id, md5-of-id) stream split
across 4 real input partitions, so the parallel-read contract is
exercised and a SQL oracle can replay the content exactly
(md5 of the decimal string of the id — both engines agree byte-for-byte).

100 TB note: Python data sources run the reader in Python workers
(Arrow-batched, but still the slow path) — the right use is
control-plane-size reads, never bulk data; bulk stays on the native
parquet/ORC readers.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

N_PARTITIONS = 4


class DeterministicRowsSource(DataSource):
    """format name: graft_rows; option ``n`` = total row count."""

    @classmethod
    def name(cls) -> str:
        return "graft_rows"

    def schema(self) -> str:
        return "id BIGINT, h STRING"

    def reader(self, schema) -> "DeterministicRowsReader":
        return DeterministicRowsReader(self.options)


class DeterministicRowsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 100))

    def partitions(self):
        return [InputPartition(i) for i in range(N_PARTITIONS)]

    def read(self, partition):
        import hashlib

        start = partition.value
        for k in range(start, self.n, N_PARTITIONS):
            yield (k, hashlib.md5(str(k).encode("utf-8")).hexdigest())
