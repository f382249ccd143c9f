"""Stream a transactional table's change feed with Structured Streaming:
``spark.readStream.format("txn_table").load(path)`` — the engine-native
form of "Delta table as a streaming source".

Built on Spark 4's Python Data Source API (pyspark.sql.datasource): the
commit log IS the offset log. An offset is just a table version; a
micro-batch (start, end] maps to the data files the append commits in
that range added — exactly `txn.table_changes` semantics, so the source
inherits its contract:

  * append/convert commits stream their rows exactly once (offsets ride
    in the stream's checkpoint; a restart resumes at the committed
    version, never replaying or skipping);
  * compact commits are invisible (rewrites of already-delivered rows);
  * content-CHANGING commits (merge / delete / update /
    replace_partitions) fail the stream loudly — a file-granular log
    cannot replay row-level mutations, and silently mis-streaming them
    would corrupt every downstream consumer;
  * vacuumed-away deltas fail loudly too (retention must cover consumer
    lag).

Scale shape: offset/partition planning is driver-side METADATA (JSON
log reads, no data IO); each changed file becomes one input partition
read executor-side as Arrow record batches (pyarrow footer+pages of
that file only). A 100 TB table streams at the cost of its deltas.

Hive-partitioned txn tables are refused for now: partition values live
in directory names, not footers, so file-local Arrow reads would drop
those columns; de-partitioned (flat) tables carry every column in-file.

Reference parity: the reference's streaming consumer tails Kafka
(kafka/wiki-s3-consumer.py:62-90); this source makes any txn TABLE
tailable the same way, which Kafka cannot offer retroactively.

Trigger note: Spark's Python data sources don't yet implement
``Trigger.AvailableNow`` natively — Spark logs a warning and falls back
to one batch covering latest-at-start, which drains correctly for the
catch-up pattern; continuous ``processingTime`` triggers stream
normally.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _FilePartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _log_entries(table_path: str) -> list[tuple[int, dict]]:
    """(version, entry) pairs of committed versions, ascending —
    standalone JSON reads (no SparkSession, no txn import) because the
    reader also runs where only the table directory is mounted."""
    from wikistream_lakehouse_spark.lakehouse.txn import (
        _committed_versions,
        _load_entry,
    )

    return [
        (v, _load_entry(table_path, v) or {})
        for v in _committed_versions(table_path)
    ]


class TxnTableStreamReader(DataSourceStreamReader):
    def __init__(self, table_path: str) -> None:
        if not os.path.isdir(os.path.join(table_path, "_txnlog")):
            raise ValueError(f"{table_path} is not a transactional table")
        for _v, e in _log_entries(table_path):
            if e.get("partitionBy"):
                raise ValueError(
                    "txn_table streaming source supports unpartitioned "
                    f"tables only; {table_path} is partitioned by "
                    f"{e['partitionBy']} (partition values live in "
                    "directory names, not file footers)"
                )
        self.table_path = table_path

    # -- offsets: a table version IS an offset ---------------------------
    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        from wikistream_lakehouse_spark.lakehouse.txn import current_version

        return {"version": current_version(self.table_path)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        files: list[str] = []
        for v, e in _log_entries(self.table_path):
            if v <= lo or v > hi:
                continue
            op = e.get("op")
            if op in ("append", "convert"):
                files.extend(e.get("add", []))
            elif op == "compact" or op in ("set_constraint", "drop_constraint"):
                continue  # layout rewrite / metadata-only: no new content
            else:
                raise ValueError(
                    f"version {v} is a content-changing {op!r} commit: the "
                    "txn_table stream can only replay appends — restart "
                    "from a fresh checkpoint after snapshot-reprocessing, "
                    "or keep the streamed table append-only"
                )
        missing = [
            f for f in files
            if not os.path.exists(os.path.join(self.table_path, f))
        ]
        if missing:
            raise ValueError(
                f"streamed delta files already vacuumed: {missing[:3]}... — "
                "raise vacuum retention above the stream's version lag"
            )
        return [
            _FilePartition(os.path.join(self.table_path, f)) for f in files
        ]

    def read(self, partition: _FilePartition):
        import pyarrow.parquet as pq

        yield from pq.ParquetFile(partition.path).iter_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream checkpoint


class TxnTableDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(TxnTableDataSource)`` (idempotent), then
    ``spark.readStream.format("txn_table").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema
        from wikistream_lakehouse_spark.lakehouse.txn import _replay, current_version

        path = self.options.get("path")
        if not path:
            raise ValueError("txn_table source requires .load(<table path>)")
        files = _replay(path, current_version(path))
        if not files:
            raise ValueError(f"no committed data in {path}")
        return from_arrow_schema(
            pq.read_schema(os.path.join(path, files[0]))
        )

    def streamReader(self, schema: StructType) -> TxnTableStreamReader:
        return TxnTableStreamReader(self.options["path"])


def register_txn_source(spark) -> None:
    """Idempotent registration helper."""
    spark.dataSource.register(TxnTableDataSource)
