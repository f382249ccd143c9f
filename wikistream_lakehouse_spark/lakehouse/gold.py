"""Gold (aggregate) zone: materialized query results, idempotent per day.

Replaces the reference's table-per-day CTAS (`daily_top_titles_<ds>`,
dag/wiki_pipeline_dag.py:27-44) with ONE partitioned gold table written
overwrite-by-partition — same re-run safety (`CREATE TABLE IF NOT
EXISTS` → partition overwrite), none of the table-name sprawl, and
readers get partition pruning across days instead of N unioned tables.

The default substrate is the transactional log (lakehouse/txn.py):
``build_daily_gold`` commits each day's refresh as an atomic
``replace_partitions``, so concurrent day-builds, compactions, and
readers can share the table safely and historical versions stay
time-travelable. Read the table back with ``txn.read_table``.
``build_daily_gold_parquet`` keeps the plain dynamic-overwrite form for
exporting to external readers that expect a bare parquet directory
(single-writer, like the reference's own CTAS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import replace_partitions


def daily_top_aggregate(
    silver: DataFrame,
    ds: str,
    title_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """The reference's signature aggregation for one day (A1 + P6):
    GROUP BY ds, title, user → count AS edits
    (dag/wiki_pipeline_dag.py:31-38)."""
    return (
        silver.filter(F.to_date(ts_col) == F.lit(ds).cast("date"))
        .groupBy(
            F.to_date(ts_col).alias("ds"),
            F.col(title_col).alias("title"),
            F.col(user_col).alias("user"),
        )
        .agg(F.count(F.lit(1)).alias("edits"))
    )


def build_daily_gold(silver: DataFrame, path: str, ds: str, **cols) -> None:
    """Materialize one day's aggregate into the partitioned gold TABLE
    (transactional): an atomic ``replace_partitions`` commit swaps
    exactly the ``ds`` partition — idempotent re-runs, safe alongside
    concurrent day-builds/compaction/readers, time-travelable history.
    Read back with ``txn.read_table(spark, path)``."""
    spark = silver.sparkSession
    agg = daily_top_aggregate(silver, ds, **cols)
    replace_partitions(spark, path, agg, partition_by=["ds"])


def build_daily_gold_parquet(silver: DataFrame, path: str, ds: str, **cols) -> None:
    """Plain-parquet export form (single-writer): dynamic partition
    overwrite on ds, for external readers that expect a bare parquet
    directory rather than a transactional table."""
    spark = silver.sparkSession
    agg = daily_top_aggregate(silver, ds, **cols)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        agg.write.mode("overwrite").partitionBy("ds").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
