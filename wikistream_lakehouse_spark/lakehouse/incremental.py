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


def _load_state(state_path: str) -> set[str]:
    if os.path.exists(state_path):
        with open(state_path) as f:
            return set(json.load(f)["processed_ds"])
    return set()


def _save_state(state_path: str, processed: set[str]) -> None:
    os.makedirs(os.path.dirname(state_path), exist_ok=True)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"processed_ds": sorted(processed)}, f)
    os.replace(tmp, state_path)


def curate_incremental(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    state_path: str,
    ts_col: str = "ts",
) -> list[str]:
    """Curate bronze partitions not yet in the state file; returns the list
    of `ds=` partitions processed this run (empty = nothing new).

    State is written only after a successful curation, so a crashed run
    re-processes its delta — convergent thanks to partition overwrite.
    """
    done = _load_state(state_path)
    all_parts = list_partition_dirs(bronze_path, "ds")
    todo = [p for p in all_parts if p not in done]
    if not todo:
        return []
    batch = spark.read.option("basePath", bronze_path).parquet(
        *[os.path.join(bronze_path, p) for p in todo]
    )
    # keep_source_partition: each delta owns (event-day × its ds) partitions,
    # so deltas sharing an event day never overwrite each other, and a
    # re-run of THIS delta still converges
    curate_to_silver(batch, silver_path, ts_col=ts_col, keep_source_partition=True)
    _save_state(state_path, done | set(todo))
    return todo
