"""Small-file compaction for PLAIN parquet directories (DEPRECATED as a
default — use ``lakehouse.txn.compact`` for transactional tables).

Streaming bronze writes one-or-more files per micro-batch per partition
(the reference's consumer produced one gzip object per ≤10 s flush,
kafka/wiki-s3-consumer.py:43-53) — after a day that's thousands of tiny
files, and scan cost at 100 TB is dominated by file-open overhead.
Compaction rewrites a partition's files into ~target-size outputs.

**Concurrency warning — why this is not the default path:** the
temp-write + directory-swap here is per-partition all-or-nothing for a
SINGLE writer only; a concurrent appender or reader can interleave with
the swap (rows landing between read and swap are lost; a reader can
list mid-swap). ``txn.compact`` provides the same OPTIMIZE contract as
an optimistic commit that is provably safe under live appends (race-
tested) — use it everywhere the table is transactional. This module
remains only for compacting bare parquet directory exports that no
other process writes.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def list_partition_dirs(path: str, partition_col: str) -> list[str]:
    """Immediate child partition directories (`ds=2024-01-15`, ...)."""
    if not os.path.isdir(path):
        return []
    return sorted(
        d for d in os.listdir(path) if d.startswith(f"{partition_col}=")
    )


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> tuple[int, int]:
    """Rewrite one partition's files into ceil(bytes/target) outputs.

    Returns (files_before, files_after). No-op when already compact.
    """
    full = os.path.join(table_path, partition_dir)
    files = [
        f for f in os.listdir(full) if f.endswith(".parquet") and not f.startswith(".")
    ]
    total_bytes = sum(os.path.getsize(os.path.join(full, f)) for f in files)
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil
    if len(files) <= n_out:
        return len(files), len(files)

    df = spark.read.parquet(full)
    tmp = f"{full}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{full}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(full, old)
    shutil.move(tmp, full)
    shutil.rmtree(old)
    after = len(
        [f for f in os.listdir(full) if f.endswith(".parquet")]
    )
    return len(files), after


def compact_table(
    spark: SparkSession,
    table_path: str,
    partition_col: str = "ds",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict[str, tuple[int, int]]:
    """Compact every partition of a table; returns per-partition
    (before, after) file counts."""
    return {
        p: compact_partition(spark, table_path, p, target_file_bytes)
        for p in list_partition_dirs(table_path, partition_col)
    }
