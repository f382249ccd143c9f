"""Lakehouse layer (SURVEY.md §2.2 sinks, §7 M2): bronze/silver/gold zone
writers with the dual-time model (processing-time `ds` in bronze,
event-time `yyyy/mm/dd` in silver — SURVEY.md §1.3) and idempotent
re-runs via partition overwrite + keyed MERGE.

The ACID substrate is txn.py — a from-scratch implementation of the
publicly documented Delta commit protocol (put-if-absent versioned
commits, optimistic concurrency, snapshot isolation, checkpoint/vacuum,
partition-level replace) over plain parquet. Gold materialization and
MERGE route through it by default; `upsert_parquet` and
`build_daily_gold_parquet` remain as single-writer bare-directory
export forms for external readers.
"""

from wikistream_lakehouse_spark.lakehouse.bronze import write_bronze
from wikistream_lakehouse_spark.lakehouse.incremental import (
    incremental_avg_view,
    read_view,
    refresh_aggregate,
    sync_append,
    view_lag,
)
from wikistream_lakehouse_spark.lakehouse.gold import (
    build_daily_gold,
    build_daily_gold_parquet,
)
from wikistream_lakehouse_spark.lakehouse.merge import upsert, upsert_parquet
from wikistream_lakehouse_spark.lakehouse.silver import (
    curate_to_silver,
    curate_to_silver_parquet,
    curate_to_silver_txn,
)
from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    clone_table,
    column_mapping,
    compact,
    convert_to_txn,
    delete_where,
    drop_column,
    history,
    logged_file_stats,
    maintain_table,
    merge_on_read_upsert,
    read_table,
    rename_column,
    replace_partitions,
    restore,
    snapshot,
    table_changes,
    table_changes_cdf,
    table_detail,
    transactional_upsert,
    update_where,
    vacuum,
)

__all__ = [
    "write_bronze",
    "refresh_aggregate",
    "incremental_avg_view",
    "read_view",
    "sync_append",
    "view_lag",
    "curate_to_silver",
    "curate_to_silver_parquet",
    "curate_to_silver_txn",
    "build_daily_gold",
    "build_daily_gold_parquet",
    "upsert",
    "upsert_parquet",
    "append",
    "clone_table",
    "compact",
    "convert_to_txn",
    "delete_where",
    "drop_column",
    "history",
    "maintain_table",
    "read_table",
    "rename_column",
    "column_mapping",
    "replace_partitions",
    "snapshot",
    "table_changes",
    "table_changes_cdf",
    "table_detail",
    "logged_file_stats",
    "merge_on_read_upsert",
    "restore",
    "transactional_upsert",
    "update_where",
    "vacuum",
]
