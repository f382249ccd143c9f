"""Streaming observability: per-micro-batch progress lands as a
queryable parquet metrics table with accurate row counts."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.metrics import (
    MetricsRecorder,
    ingest_rate_summary,
    read_metrics,
)
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream

from tests.test_streaming import wiki_event, write_ndjson


def test_metrics_recorder_captures_batches(spark, tmp_path):
    src = tmp_path / "src"
    for f in range(3):
        write_ndjson(
            src / f"part-{f}.ndjson",
            [wiki_event(f * 10 + i) for i in range(10)],
        )
    rec = MetricsRecorder(path=str(tmp_path / "metrics"))
    spark.streams.addListener(rec)
    try:
        stream = file_replay_stream(spark, str(src), WIKI_EVENT_SCHEMA)
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .option("maxFilesPerTrigger", "1")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        # listener events are delivered async: drain before detaching
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                got = read_metrics(spark, rec.path)
                if got.agg(F.sum("num_input_rows")).first()[0] == 30:
                    break
            except ValueError:
                pass
            time.sleep(1)
        spark.streams.removeListener(rec)

    m = read_metrics(spark, rec.path)
    rows = m.collect()
    # every input row is accounted for exactly once across batches
    assert sum(r.num_input_rows for r in rows) == 30
    # maxFilesPerTrigger=1 → at least 3 data-carrying batches
    assert sum(1 for r in rows if r.num_input_rows > 0) >= 3
    assert all(r.batch_duration_ms >= 0 for r in rows)
    # batch ids are unique per run
    ids = [(r.run_id, r.batch_id) for r in rows]
    assert len(ids) == len(set(ids))

    s = ingest_rate_summary(m).collect()
    assert len(s) == 1
    assert s[0].total_rows == 30
    assert s[0].n_batches == len(rows)
    assert s[0].max_batch_ms == max(r.batch_duration_ms for r in rows)
