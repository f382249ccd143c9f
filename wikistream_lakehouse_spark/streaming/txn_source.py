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
  * content-CHANGING commits (CoW delete/update, rewrite merges,
    replace_partitions) fail the stream loudly — a file-granular log
    cannot replay row-level mutations, and silently mis-streaming them
    would corrupt every downstream consumer (DV deletes and MoR merges
    CAN stream — under CDF mode below);
  * vacuumed-away deltas fail loudly too (retention must cover consumer
    lag).

**CDF mode** — ``.option("cdf", "true")`` — streams the row-level
change feed instead (the Delta ``readChangeFeed`` analogue): every row
carries ``_change_type`` ('insert' | 'delete') and ``_commit_version``,
and **deletion-vector deletes stream their exact delete images** (the
positions a MoR commit killed are read back from the untouched data
files — `txn.table_changes_cdf` semantics, executor-side). Downstream
consumers can maintain deletable state from a stream; CoW mutations
still fail loudly (their row deltas aren't recoverable). Planning
reads the (small) vector sidecars driver-side to assign per-file
position lists; data IO stays executor-side.

Scale shape: offset/partition planning is driver-side METADATA (JSON
log reads, no data IO); each changed file becomes one input partition
read executor-side as Arrow record batches (pyarrow footer+pages of
that file only). A 100 TB table streams at the cost of its deltas.

Hive-partitioned txn tables stream too: partition values live in
directory names, not footers, so planning parses each delta file's
hive segments driver-side (metadata work) and the executor-side read
CONFORMS every Arrow batch to the declared schema — data-stored
columns pass through (cast if a widened footer is narrow), path-encoded
columns materialize as constant arrays cast to their declared type,
and columns absent from both (schema evolution) null-fill. Partition
column types come from the log when it knows them (the partition-
evolution ``physicalSchemaJson`` stamp, or the widened union schema);
otherwise from a conservative value scan over the active paths (all
ints → long, all floats → double, ISO dates → date, else string).

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
    def __init__(
        self,
        path: str,
        positions: "list[int] | None" = None,
        change_type: "str | None" = None,
        version: int = -1,
        pv: "dict | None" = None,
    ) -> None:
        self.path = path
        self.positions = positions  # CDF delete: row indices to emit
        self.change_type = change_type  # None = plain (no CDF columns)
        self.version = version
        self.pv = pv or {}  # path-encoded column -> decoded raw string


def _decode_hive(raw: str) -> "str | None":
    """Hive directory value -> the written value's string form (Spark
    escapePathName percent-encodes specials; the null sentinel decodes
    to None)."""
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    from urllib.parse import unquote

    return unquote(raw)


def _infer_value_type(values: "list[str]"):
    """Type for a path-encoded column with no log-stamped authority:
    the same conservative ladder a human would apply to the observed
    directory strings — all-int → long, all-float → double, all
    ISO dates → date, anything else → string. Empty/all-null → string."""
    import re as _re

    from pyspark.sql.types import (
        DateType,
        DoubleType,
        LongType,
        StringType,
    )

    if values and all(_re.fullmatch(r"-?\d+", v) for v in values):
        return LongType()
    if values and all(
        _re.fullmatch(r"-?\d+(\.\d+)?([eE][+-]?\d+)?", v) for v in values
    ):
        return DoubleType()
    if values and all(
        _re.fullmatch(r"\d{4}-\d{2}-\d{2}", v) for v in values
    ):
        return DateType()
    return StringType()


def _file_pv(rel: str) -> dict:
    """Decoded hive partition values of a table-relative data file."""
    from wikistream_lakehouse_spark.lakehouse.txn import _partition_values

    return {k: _decode_hive(v) for k, v in _partition_values(rel)}


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
    def __init__(
        self,
        table_path: str,
        cdf: bool = False,
        max_commits_per_batch: "int | None" = None,
        output_schema: "StructType | None" = None,
    ) -> None:
        self.cdf = cdf
        if not os.path.isdir(os.path.join(table_path, "_txnlog")):
            raise ValueError(f"{table_path} is not a transactional table")
        self.table_path = table_path
        # column mapping (metadata-only rename/drop), pinned at query
        # start like any streaming schema: physical→logical applied per
        # Arrow batch in read()
        from wikistream_lakehouse_spark.lakehouse.txn import (
            _column_mapping_state,
        )

        mapping, dropped = _column_mapping_state(table_path)
        self._rename = {ph: lg for lg, ph in mapping.items()}
        self._dropped = set(dropped)
        # type widening: a widened table's files carry MIXED physical
        # types (int32 beside int64); every delivered batch is cast to
        # the log's union read schema, pinned at query start like the
        # mapping above
        from wikistream_lakehouse_spark.lakehouse.txn import _wide_schema

        ws = _wide_schema(table_path)
        if ws is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            self._wide_arrow = to_arrow_schema(ws)
        else:
            self._wide_arrow = None
        # the declared output schema (sans CDF columns) is the contract
        # every delivered batch is CONFORMED to: partitioned tables'
        # path-encoded columns materialize against it, and column order
        # is pinned by it (logical, post-mapping names)
        if output_schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema
            from pyspark.sql.types import StructType as _ST

            data_fields = [
                f
                for f in output_schema.fields
                if f.name not in ("_change_type", "_commit_version")
            ]
            self._out_arrow = to_arrow_schema(_ST(data_fields))
        else:
            self._out_arrow = None
        if max_commits_per_batch is not None and max_commits_per_batch < 1:
            raise ValueError("maxCommitsPerBatch must be >= 1")
        self.max_commits = max_commits_per_batch
        # high-water mark of versions this reader has handed to Spark —
        # the reference point batch-size capping advances from
        self._hwm: "int | None" = None

    # -- offsets: a table version IS an offset ---------------------------
    def initialOffset(self) -> dict:
        self._hwm = -1  # fresh stream: capping applies from batch one
        return {"version": -1}

    def latestOffset(self) -> dict:
        """Newest offset Spark may plan up to. With
        ``maxCommitsPerBatch`` (the Delta ``maxFilesPerTrigger``
        analogue at commit grain), progression is capped at that many
        commits past the last planned batch — a fresh consumer of a
        10⁵-commit table catches up in bounded micro-batches instead of
        one giant batch that buffers the whole history through a single
        checkpoint interval. The Python source API exposes no
        admission-control hook, so the cap keys off this reader's own
        high-water mark: every batch of a NEW stream is capped
        (initialOffset seeds the mark); after a checkpoint RESTART the
        first batch covers the accumulated gap (start is known only to
        Spark) and every later batch is capped again."""
        from wikistream_lakehouse_spark.lakehouse.txn import current_version

        cur = current_version(self.table_path)
        if self.max_commits is None or self._hwm is None:
            return {"version": cur}
        capped = min(cur, self._hwm + self.max_commits)
        return {"version": capped}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["version"], end["version"]
        self._hwm = max(self._hwm if self._hwm is not None else -1, hi)
        parts: list[_FilePartition] = []
        missing: list[str] = []

        def _abs(rel: str) -> str:
            p = os.path.join(self.table_path, rel)
            if not os.path.exists(p):
                missing.append(rel)
            return p

        from wikistream_lakehouse_spark.lakehouse.txn import _METADATA_OPS

        for v, e in _log_entries(self.table_path):
            if v <= lo or v > hi:
                continue
            op = e.get("op")
            if op == "compact" or op in _METADATA_OPS:
                continue  # layout rewrite / metadata-only: no new content
            elif op in ("append", "convert") or (
                op == "clone" and not e.get("dvAdd")
            ):
                parts.extend(
                    _FilePartition(_abs(f), None, "insert", v, _file_pv(f))
                    for f in e.get("add", [])
                )
            elif op == "clone":
                # DV-carrying clone: dead rows aren't a pure delta
                # (same rule as table_changes_cdf) — loud, not wrong
                raise ValueError(
                    f"version {v} is a clone carrying active deletion "
                    "vectors — compact the table and restart the feed "
                    "from that snapshot"
                )
            elif self.cdf and not e.get("remove") and not e.get("dvRetire"):
                # structural recoverability (txn.table_changes_cdf rule):
                # a non-removing commit is a pure insert ⊎ delete-image
                # delta — covers DV deletes AND merge_on_read_upsert.
                # A commit with NEITHER add nor dvAdd (e.g. an empty CDC
                # merge batch whose deletes matched no keys and whose
                # inserts wrote zero files) is a no-op — skippable, not a
                # stream-wedging error (ADVICE r5 low).
                parts.extend(
                    _FilePartition(_abs(f), None, "insert", v, _file_pv(f))
                    for f in e.get("add", [])
                )
                # MoR delete/merge: the vector names exactly the rows
                # this commit killed; group positions per target file
                # (the sidecar is positions-only — metadata-scale planning)
                import pyarrow.parquet as pq

                by_file: dict[str, list[int]] = {}
                for d in e.get("dvAdd", []):
                    p = _abs(d)
                    if missing and missing[-1] == d:
                        continue  # vacuumed sidecar: report the friendly
                        # retention error below, not a raw pyarrow crash
                    tbl = pq.read_table(p, columns=["f", "ri"])
                    for f_rel, ri in zip(
                        tbl.column("f").to_pylist(), tbl.column("ri").to_pylist()
                    ):
                        by_file.setdefault(f_rel, []).append(int(ri))
                parts.extend(
                    _FilePartition(
                        _abs(f_rel), sorted(pos), "delete", v, _file_pv(f_rel)
                    )
                    for f_rel, pos in sorted(by_file.items())
                )
            else:
                hint = (
                    "" if self.cdf else " (deletion-vector deletes CAN "
                    "stream with .option('cdf', 'true'))"
                )
                raise ValueError(
                    f"version {v} is a content-changing {op!r} commit: the "
                    "txn_table stream can only replay appends"
                    + hint
                    + " — restart from a fresh checkpoint after "
                    "snapshot-reprocessing, or keep the streamed table "
                    "append-only"
                )
        if missing:
            raise ValueError(
                f"streamed delta files already vacuumed: {missing[:3]}... — "
                "raise vacuum retention above the stream's version lag"
            )
        return parts

    def _map_columns(self, batch):
        """Physical→logical per Arrow batch: widen narrow columns to
        the union read schema, drop retired columns, rename mapped ones
        — zero-copy array reuse except the widening casts."""
        import pyarrow as pa

        if self._wide_arrow is not None:
            arrays, names = [], []
            for i, name in enumerate(batch.schema.names):
                col = batch.column(i)
                idx = self._wide_arrow.get_field_index(name)
                if idx >= 0 and col.type != self._wide_arrow.field(idx).type:
                    col = col.cast(self._wide_arrow.field(idx).type)
                arrays.append(col)
                names.append(name)
            batch = pa.RecordBatch.from_arrays(arrays, names=names)
        if not self._rename and not self._dropped:
            return batch
        arrays, names = [], []
        for i, name in enumerate(batch.schema.names):
            if name in self._dropped:
                continue
            arrays.append(batch.column(i))
            names.append(self._rename.get(name, name))
        return pa.RecordBatch.from_arrays(arrays, names=names)

    def _conform(self, batch, partition: _FilePartition):
        """Deliver exactly the declared schema, whatever one file's
        footer holds: data-stored columns pass through (cast when a
        footer is narrower than the declared type), path-encoded
        columns materialize as constant arrays cast from their decoded
        directory string, anything else (schema evolution) null-fills.
        Column order is the declared order — the Arrow batches ARE the
        stream's rows, so the contract lives here."""
        import pyarrow as pa

        if self._out_arrow is None:
            return batch
        # pv keys are physical (directory) names; the declared schema
        # is logical
        pv = {
            self._rename.get(k, k): v for k, v in partition.pv.items()
        }
        n = batch.num_rows
        have = {name: i for i, name in enumerate(batch.schema.names)}
        arrays = []
        for field in self._out_arrow:
            if field.name in have:
                col = batch.column(have[field.name])
                if col.type != field.type:
                    col = col.cast(field.type)
            elif field.name in pv:
                raw = pv[field.name]
                col = pa.array([raw] * n, pa.string()).cast(field.type)
            else:
                col = pa.nulls(n, field.type)
            arrays.append(col)
        return pa.RecordBatch.from_arrays(
            arrays, schema=pa.schema(self._out_arrow)
        )

    def read(self, partition: _FilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = pq.ParquetFile(partition.path).iter_batches()
        if not self.cdf:
            for batch in batches:
                yield self._conform(self._map_columns(batch), partition)
            return
        import numpy as np

        offset = 0
        wanted = (
            None
            if partition.positions is None
            else np.asarray(partition.positions, dtype=np.int64)
        )
        for batch in batches:
            n = batch.num_rows
            if wanted is not None:
                local = wanted[(wanted >= offset) & (wanted < offset + n)] - offset
                offset += n
                if not len(local):
                    continue
                batch = batch.take(pa.array(local))
            batch = self._conform(self._map_columns(batch), partition)
            out_n = batch.num_rows
            batch = batch.append_column(
                "_change_type",
                pa.array([partition.change_type] * out_n, pa.string()),
            ).append_column(
                "_commit_version",
                pa.array([partition.version] * out_n, pa.int64()),
            )
            yield batch

    def commit(self, end: dict) -> None:
        pass  # offsets are durable in the stream checkpoint


class TxnTableDataSource(DataSource):
    """Register once per session:
    ``spark.dataSource.register(TxnTableDataSource)`` (idempotent), then
    ``spark.readStream.format("txn_table").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "txn_table"

    def _cdf(self) -> bool:
        return str(self.options.get("cdf", "false")).lower() in ("true", "1")

    def schema(self) -> StructType:
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import LongType, StringType, StructField
        from wikistream_lakehouse_spark.lakehouse.txn import _replay, current_version

        path = self.options.get("path")
        if not path:
            raise ValueError("txn_table source requires .load(<table path>)")
        from wikistream_lakehouse_spark.lakehouse.txn import (
            _column_mapping_state,
        )

        files = _replay(path, current_version(path))
        if not files:
            raise ValueError(f"no committed data in {path}")
        from wikistream_lakehouse_spark.lakehouse.txn import _wide_schema

        ws = _wide_schema(path)
        if ws is not None:
            sch = ws  # widened table: the log's union read schema
        else:
            sch = from_arrow_schema(
                pq.read_schema(os.path.join(path, files[0]))
            )
        # partitioned tables: path-encoded columns aren't in any footer.
        # Types: the log's partition-evolution stamp when present, else
        # a conservative scan of the observed directory values.
        from wikistream_lakehouse_spark.lakehouse.txn import (
            _stamped_physical_types,
            _partition_values,
        )

        order: list[str] = []
        observed: dict[str, list] = {}
        for f in files:
            for k, raw in _partition_values(f):
                if k not in order:
                    order.append(k)
                v = _decode_hive(raw)
                if v is not None:
                    observed.setdefault(k, []).append(v)
        missing_cols = [
            c for c in order if c not in {f.name for f in sch.fields}
        ]
        if missing_cols:
            stamped = _stamped_physical_types(path) or {}
            sch = StructType(
                list(sch.fields)
                + [
                    StructField(
                        c,
                        stamped.get(c)
                        or _infer_value_type(observed.get(c, [])),
                        True,
                    )
                    for c in missing_cols
                ]
            )
        mapping, dropped = _column_mapping_state(path)
        if mapping or dropped:
            rev = {ph: lg for lg, ph in mapping.items()}
            sch = StructType(
                [
                    StructField(rev.get(f.name, f.name), f.dataType, f.nullable)
                    for f in sch.fields
                    if f.name not in dropped
                ]
            )
        if self._cdf():
            sch = StructType(
                list(sch.fields)
                + [
                    StructField("_change_type", StringType()),
                    StructField("_commit_version", LongType()),
                ]
            )
        return sch

    def streamReader(self, schema: StructType) -> TxnTableStreamReader:
        mc = self.options.get("maxCommitsPerBatch".lower())
        return TxnTableStreamReader(
            self.options["path"],
            cdf=self._cdf(),
            max_commits_per_batch=int(mc) if mc is not None else None,
            output_schema=schema,
        )


def register_txn_source(spark) -> None:
    """Idempotent registration helper."""
    spark.dataSource.register(TxnTableDataSource)
