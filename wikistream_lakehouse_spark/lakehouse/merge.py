"""Keyed upsert (MERGE) — the serving-store sink (K5).

Reproduces `INSERT ... ON CONFLICT (dt, username) DO UPDATE SET edits =
EXCLUDED.edits` (upsert_athena_aggregates.py:95-110) as a set-based MERGE:
whenMatched-update + whenNotMatched-insert, no per-row loop.

**The default MERGE path is `upsert` (= txn.transactional_upsert): the
same set algebra committed through the transactional log** — optimistic
concurrency with conflict-retry, snapshot isolation for readers, safe
under any number of concurrent writers, compatible with txn.compact /
vacuum / time travel on the same table. The serving layer's atomicity
is the product (the reference's whole serving story is its idempotent
Postgres upsert); here it holds end-to-end, not on request.

`upsert_parquet` remains as the EXPORT form: identical semantics over a
bare parquet directory (temp-dir + rename swap) for external readers
that can't consume a transactional table. It is single-writer by
construction — concurrent callers can interleave the swap — so use it
only at the edge, never as the system of record.

Scale note: both forms shuffle the anti-join on the merge keys exactly
like Delta's inner merge phase; the txn form additionally gets file-level
partition replacement via txn.replace_partitions where the merge is
partition-aligned.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import transactional_upsert as upsert

__all__ = ["upsert", "upsert_parquet"]


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
