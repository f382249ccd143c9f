"""Incremental silver curation: process only bronze partitions not yet
curated (the batch analog of a streaming checkpoint).

The reference re-curates the *entire* raw zone every night
(glue/job_wiki_curate.py:31 reads RAW_PATH unfiltered) — correct only
because idempotency hides the waste; at 100 TB re-reading all history per
run is the difference between a 10-minute and a 10-hour job. Here a tiny
JSON state file records which processing-date (`ds`) partitions are done;
each run curates only the delta, and the dynamic partition overwrite in
curate_to_silver keeps re-runs of any single partition convergent.

(Streaming form: streaming/pipeline.streaming_silver — same transform,
checkpoint instead of the state file.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from wikistream_lakehouse_spark.lakehouse.compact import list_partition_dirs
from wikistream_lakehouse_spark.lakehouse.silver import curate_to_silver


def _list_part_files(bronze_path: str, part: str) -> list[str]:
    """Data files currently inside one ``ds=`` partition (sorted, relative)."""
    full = os.path.join(bronze_path, part)
    out: list[str] = []
    for root, _dirs, files in os.walk(full):
        rel = os.path.relpath(root, full)
        for f in files:
            if f.startswith((".", "_")):
                continue  # _SUCCESS / hidden markers are not data
            out.append(f if rel == "." else os.path.join(rel, f))
    return sorted(out)


def _load_state(state_path: str) -> dict[str, list[str]]:
    if os.path.exists(state_path):
        with open(state_path) as f:
            return dict(json.load(f).get("processed", {}))
    return {}


def _save_state(state_path: str, processed: dict[str, list[str]]) -> None:
    os.makedirs(os.path.dirname(state_path), exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"processed": {k: processed[k] for k in sorted(processed)}}, f)
    os.replace(tmp, state_path)


def curate_incremental(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    state_path: str,
    ts_col: str = "ts",
) -> list[str]:
    """Curate bronze partitions whose file set changed since the last run;
    returns the list of `ds=` partitions processed (empty = nothing new).

    State records the per-partition FILE LISTING, not just the partition
    name: a ``ds=`` directory that a live streaming bronze sink is still
    appending to (today's open partition) is re-curated on the next run
    when new files appear — marking bare partition names "done" would
    silently drop those late files. The listing is snapshotted *before*
    the read, so files landing mid-run surface as a diff next run; the
    re-read covers the whole partition, so the dynamic partition
    overwrite in curate_to_silver stays convergent.

    State is written only after a successful curation, so a crashed run
    re-processes its delta — convergent thanks to partition overwrite.
    """
    state = _load_state(state_path)
    all_parts = list_partition_dirs(bronze_path, "ds")
    snapshot = {p: _list_part_files(bronze_path, p) for p in all_parts}
    todo = [p for p in all_parts if state.get(p) != snapshot[p]]
    if not todo:
        return []
    batch = spark.read.option("basePath", bronze_path).parquet(
        *[os.path.join(bronze_path, p) for p in todo]
    )
    # keep_source_partition: each delta owns (event-day × its ds) partitions,
    # so deltas sharing an event day never overwrite each other, and a
    # re-run of THIS delta still converges
    curate_to_silver(batch, silver_path, ts_col=ts_col, keep_source_partition=True)
    _save_state(state_path, {**state, **{p: snapshot[p] for p in todo}})
    return todo
