"""Gold (aggregate) zone: materialized query results, idempotent per day.

Replaces the reference's table-per-day CTAS (`daily_top_titles_<ds>`,
dag/wiki_pipeline_dag.py:27-44) with ONE partitioned gold table written
overwrite-by-partition — same re-run safety (`CREATE TABLE IF NOT
EXISTS` → partition overwrite), none of the table-name sprawl, and
readers get partition pruning across days instead of N unioned tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    """Materialize one day's aggregate into the partitioned gold table,
    idempotently (dynamic partition overwrite on ds)."""
    spark = silver.sparkSession
    agg = daily_top_aggregate(silver, ds, **cols)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        agg.write.mode("overwrite").partitionBy("ds").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
