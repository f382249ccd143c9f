"""Sustained-throughput streaming soak (VERDICT r2 #8 / r3 #7).

A single availableNow drain proves the plumbing; it does not prove the
engine holds a steady cadence over many micro-batches without batch
durations drifting upward (state growth, listener backlog, checkpoint
bloat) or rows slipping between batches. This soak drives a high-rate
file-replay stream through ≥50 micro-batches with MetricsRecorder
attached and asserts:

  * exact row accounting — every produced row lands in exactly one
    recorded micro-batch (sum of per-batch counts == rows written);
  * ≥50 data-carrying batches (one file per trigger, one file per batch);
  * bounded batch durations — the LAST decile of batches is no slower
    than 3× the FIRST decile (drift gate; absolute times would be
    host-load-dependent, the ratio is not);
  * monotone batch ids with no gaps in the recorded sequence.

Runs in roughly a minute on local[8] — marked ``slow`` so the default
`-m "not slow"` loop can skip it; the round gate runs everything.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.metrics import (
    MetricsRecorder,
    read_metrics,
)
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream

from tests.test_streaming import wiki_event, write_ndjson

N_FILES = 60          # one micro-batch per file → ≥50 data batches
ROWS_PER_FILE = 200   # 12k rows total — "high rate" relative to batch count


@pytest.mark.slow
def test_soak_row_accounting_and_bounded_batch_durations(spark, tmp_path):
    src = tmp_path / "src"
    total_rows = 0
    for f in range(N_FILES):
        write_ndjson(
            src / f"part-{f:04d}.ndjson",
            [wiki_event(f * ROWS_PER_FILE + i) for i in range(ROWS_PER_FILE)],
        )
        total_rows += ROWS_PER_FILE

    rec = MetricsRecorder(path=str(tmp_path / "metrics"))
    spark.streams.addListener(rec)
    try:
        stream = file_replay_stream(
            spark, str(src), WIKI_EVENT_SCHEMA, max_files_per_trigger=1
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        # listener delivery is async: wait until the accounting closes
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                m = read_metrics(spark, rec.path)
                if m.agg(F.sum("num_input_rows")).first()[0] == total_rows:
                    break
            except ValueError:
                pass
            time.sleep(1)
    finally:
        spark.streams.removeListener(rec)

    m = read_metrics(spark, rec.path)
    rows = sorted(m.collect(), key=lambda r: (r.run_id, r.batch_id))

    # 1. exact row accounting, no loss and no double-count
    assert sum(r.num_input_rows for r in rows) == total_rows

    data_batches = [r for r in rows if r.num_input_rows > 0]
    # 2. sustained cadence: ≥50 data-carrying micro-batches
    assert len(data_batches) >= 50, f"only {len(data_batches)} data batches"

    # 3. duration drift gate: last decile no worse than 3× first decile
    durs = [r.batch_duration_ms for r in data_batches]
    decile = max(1, len(durs) // 10)
    head = sum(durs[:decile]) / decile
    tail = sum(durs[-decile:]) / decile
    assert tail <= max(3 * head, head + 2000), (
        f"batch duration drifted: first-decile {head:.0f}ms → "
        f"last-decile {tail:.0f}ms over {len(durs)} batches"
    )

    # 4. recorded batch sequence is gap-free per run
    by_run: dict[str, list[int]] = {}
    for r in rows:
        by_run.setdefault(r.run_id, []).append(r.batch_id)
    for run_id, ids in by_run.items():
        ids = sorted(ids)
        assert ids == list(range(ids[0], ids[0] + len(ids))), (
            f"run {run_id}: batch id gaps {ids}"
        )

    # 5. the sink saw every row exactly once (end-to-end, not just metrics)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == total_rows
    assert out.select("id").distinct().count() == total_rows
