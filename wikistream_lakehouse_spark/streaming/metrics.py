"""Streaming observability: capture per-micro-batch progress into a
queryable metrics table.

The reference operates blind between CloudWatch container logs and
manual Athena checks (kafka/wiki-s3-consumer.py logs flush counts;
nothing records ingest rate or batch latency durably). A production
stream needs its own telemetry *as data*: rows/second, batch duration,
state size, watermark lag — appended per micro-batch, queryable next to
the tables it feeds.

``MetricsRecorder`` wraps Spark's ``StreamingQueryListener``
(driver-side callback, fires once per micro-batch with the progress
JSON the engine already assembles — zero cost on the data path) and
appends one parquet row per batch. Parquet-append telemetry is
deliberately the same bronze pattern as the data itself: at fleet scale
the sink would be a Kafka topic, but the record schema — the part that
matters — is identical.

Driver-side by design: progress events are per-QUERY (one row per
micro-batch, not per task), so volume is O(batches) — metadata scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

#: One row per completed micro-batch.
METRICS_SCHEMA = (
    "query_id string, run_id string, batch_id long, timestamp string, "
    "num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double, batch_duration_ms long, "
    "state_rows long, watermark string"
)


def _progress_row(p: dict) -> tuple:
    """Flatten one StreamingQueryProgress JSON into a METRICS_SCHEMA row."""
    durations = p.get("durationMs") or {}
    state = p.get("stateOperators") or [{}]
    n_state = sum(int(s.get("numRowsTotal") or 0) for s in state)
    event_time = p.get("eventTime") or {}
    return (
        str(p.get("id", "")),
        str(p.get("runId", "")),
        int(p.get("batchId", -1)),
        str(p.get("timestamp", "")),
        int(p.get("numInputRows") or 0),
        float(p.get("inputRowsPerSecond") or 0.0),
        float(p.get("processedRowsPerSecond") or 0.0),
        int(durations.get("triggerExecution") or 0),
        n_state,
        str(event_time.get("watermark", "")),
    )


_ARROW_SCHEMA_FIELDS = [
    ("query_id", "string"),
    ("run_id", "string"),
    ("batch_id", "int64"),
    ("timestamp", "string"),
    ("num_input_rows", "int64"),
    ("input_rows_per_second", "float64"),
    ("process_rows_per_second", "float64"),
    ("batch_duration_ms", "int64"),
    ("state_rows", "int64"),
    ("watermark", "string"),
]


@dataclass
class MetricsRecorder(StreamingQueryListener):
    """Listener that appends one parquet row per completed micro-batch.

    Usage::

        rec = MetricsRecorder(path=".../stream_metrics")
        spark.streams.addListener(rec)
        ... run streaming queries ...
        spark.streams.removeListener(rec)
        read_metrics(spark, rec.path)  # -> DataFrame

    The append is a LOCAL pyarrow write of one row — never a Spark job:
    listener callbacks run on the shared event-dispatch thread, and a
    driver-scheduled write job there would back up the listener bus
    until Spark starts dropping progress events (silent metrics loss).
    A local single-row file is sub-millisecond and unconditionally safe;
    the compaction job (lakehouse/compact.py) owns merging the small
    files, exactly as it does for bronze.
    """

    path: str

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        p = json.loads(event.progress.json)
        row = _progress_row(p)
        schema = pa.schema(
            [(n, getattr(pa, t)()) for n, t in _ARROW_SCHEMA_FIELDS]
        )
        tbl = pa.Table.from_pydict(
            {n: [v] for (n, _), v in zip(_ARROW_SCHEMA_FIELDS, row)},
            schema=schema,
        )
        os.makedirs(self.path, exist_ok=True)
        fname = f"{row[1]}-{row[2]}-{uuid.uuid4().hex[:8]}.parquet"
        pq.write_table(tbl, os.path.join(self.path, fname))

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def read_metrics(spark: SparkSession, path: str) -> DataFrame:
    """The metrics table, ordered by (query_id, batch_id)."""
    if not os.path.isdir(path):
        raise ValueError(f"no metrics recorded at {path}")
    return spark.read.schema(METRICS_SCHEMA).parquet(path).orderBy(
        "query_id", "batch_id"
    )


def ingest_rate_summary(metrics: DataFrame) -> DataFrame:
    """Per-query rollup: batches, rows, mean rate, p95-ish max batch ms.

    The operational at-a-glance the reference never had: is the stream
    keeping up (rate), and is latency drifting (batch duration).
    """
    from pyspark.sql import functions as F

    return (
        metrics.groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_batches"),
            F.sum("num_input_rows").cast("long").alias("total_rows"),
            F.round(F.avg("process_rows_per_second"), 2).alias("avg_rows_per_sec"),
            F.max("batch_duration_ms").cast("long").alias("max_batch_ms"),
            F.max("state_rows").cast("long").alias("max_state_rows"),
        )
        .orderBy("query_id")
    )
