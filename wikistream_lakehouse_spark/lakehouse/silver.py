"""Silver (curated) zone: columnar, event-time partitioned, idempotent.

Reproduces glue/job_wiki_curate.py:31-51 — read raw, derive `ts` and
`yyyy/mm/dd` from the *event* timestamp (T6, the late-data correction
mechanism) — with two deliberate semantic upgrades over the reference:

1. **Idempotent re-curation.** The reference appends
   (glue/job_wiki_curate.py:48), so re-running curation duplicates rows
   (SURVEY.md §1.3). Here the write is dynamic-partition-overwrite: only
   the event-date partitions present in this batch are replaced, re-runs
   converge to the same state. (Delta `replaceWhere` in production; the
   mechanism below is Spark-native `partitionOverwriteMode=dynamic`.)
2. **No repartition(1).** The reference's single-file-per-partition is
   demo sizing (glue/job_wiki_curate.py:10,46); here AQE coalescing sizes
   output tasks (~64 MB targets) so a 100 TB day writes parallel,
   right-sized files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.tscompat import is_timestamp_type, to_utc_timestamp


def derive_event_time_columns(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Event-time columns: yyyy/mm/dd from the event timestamp
    (glue/job_wiki_curate.py:35-41). Works on an existing timestamp
    column — TIMESTAMP and TIMESTAMP_NTZ alike (raw-zone parquet declares
    either, depending on the writer's `isAdjustedToUTC`) — or an
    epoch-seconds long (the raw wiki `timestamp` field)."""
    dt = df.schema[ts_col].dataType
    if is_timestamp_type(dt):
        ts = to_utc_timestamp(df, ts_col)
    else:
        ts = F.to_timestamp(F.from_unixtime(ts_col))
    return (
        df.withColumn("_ts", ts)
        .withColumn("yyyy", F.year("_ts"))
        .withColumn("mm", F.month("_ts"))
        .withColumn("dd", F.dayofmonth("_ts"))
        .drop("_ts")
    )


def _event_time_partitions(
    raw: DataFrame, ts_col: str, keep_source_partition: bool
) -> tuple[DataFrame, list[str]]:
    curated = derive_event_time_columns(raw, ts_col)
    parts = ["yyyy", "mm", "dd"]
    if keep_source_partition:
        if "ds" not in curated.columns:
            raise ValueError("keep_source_partition=True requires a `ds` column")
        parts.append("ds")
    return curated, parts


def curate_to_silver(
    raw: DataFrame,
    table_path: str,
    ts_col: str = "ts",
    keep_source_partition: bool = False,
) -> int:
    """Raw → silver, **transactional by default** (the same substrate
    gold and the serving merge already use — VERDICT r5 next-round #4):
    derive event-time partitions and commit an atomic
    ``replace_partitions`` that swaps exactly the event-day partitions
    this batch touches. Idempotent re-runs, safe alongside concurrent
    compaction/readers (nobody sees half a day), and every curation is
    time-travelable (``txn.read_table(path, version=...)``). Read the
    table back with ``txn.read_table``; returns the committed version.

    `keep_source_partition=True` (the *incremental* mode) keeps the bronze
    processing-date `ds` as a trailing partition column, so the replace
    unit becomes (event-day × arrival-day). Without it, two incremental
    deltas whose rows share an event day would erase each other — the
    second delta's partition replace supersedes the whole event-day
    partition. Full re-curation (whole history in one batch) doesn't need
    it; delta curation does. Found by driving overlapping deltas, not by
    reasoning — see tests/test_lakehouse.py::test_incremental_overlapping.
    """
    from wikistream_lakehouse_spark.lakehouse import txn

    _refuse_legacy_parquet_dir(table_path)
    curated, parts = _event_time_partitions(raw, ts_col, keep_source_partition)
    return txn.replace_partitions(
        raw.sparkSession, table_path, curated, partition_by=parts
    )


def _refuse_legacy_parquet_dir(table_path: str) -> None:
    """Refuse to start a fresh txn log alongside a pre-existing
    plain-parquet silver directory (the old ``curate_to_silver``'s
    output): ``read_table`` would silently ignore all legacy data while
    bare ``spark.read.parquet`` readers see txc=/legacy duplicates.
    Adopt the legacy layout first (``txn.convert_to_txn``) or keep
    writing plain parquet (``curate_to_silver_parquet``)."""
    from wikistream_lakehouse_spark.lakehouse import txn

    if txn._claimed_versions(table_path):
        return  # already transactional — normal incremental curation
    if any(
        f.endswith(".parquet") for f in txn._data().walk_files(table_path)
    ):
        raise ValueError(
                f"{table_path} holds plain-parquet data with no "
                "transaction log; starting a txn table here would fork "
                "the layout (txn readers ignore the legacy files, bare "
                "parquet readers see duplicates). Run "
                "txn.convert_to_txn(...) to adopt the existing data, or "
                "use curate_to_silver_parquet for a plain directory."
            )


#: Back-compat alias from when the txn substrate was the opt-in twin.
curate_to_silver_txn = curate_to_silver


def curate_to_silver_parquet(
    raw: DataFrame,
    path: str,
    ts_col: str = "ts",
    keep_source_partition: bool = False,
) -> None:
    """Plain-parquet export form (single-writer), mirroring
    ``gold.build_daily_gold_parquet``: identical event-time derivation
    and replace-touched-partitions semantics via Spark-native
    ``partitionOverwriteMode=dynamic``, for external readers that expect
    a bare parquet directory rather than a transactional table."""
    spark = raw.sparkSession
    curated, parts = _event_time_partitions(raw, ts_col, keep_source_partition)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        curated.write.mode("overwrite").partitionBy(*parts).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def recover_partitions(spark, table_name: str) -> None:
    """Catalog partition registration — the engine-side replacement for
    `MSCK REPAIR TABLE` (dag/wiki_pipeline_dag.py:83-89)."""
    spark.sql(f"MSCK REPAIR TABLE {table_name}")
