"""Bucketed tables: persist a shuffle so repeated joins/aggregations on
the bucket key never pay it again.

``df.write.bucketBy(n, key)`` hash-partitions rows into a FIXED number
of buckets recorded in the catalog. When two tables share the bucket
key and count, Spark's planner proves both sides are already
co-partitioned and elides the Exchange under a sort-merge join — the
single biggest cost of a large join. At 100 TB this is the difference
between re-shuffling the fact table on every query and shuffling it
once at write time:

  * fact ⋈ fact on the bucket key  → zero Exchange (both sides local)
  * fact ⋈ unbucketed dim          → one Exchange (the small side only)
  * groupBy(bucket key)            → partial+final agg with no Exchange
    when ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` holds

Bucket count is a LAYOUT decision: pick ``buckets`` so a single bucket
of the largest co-located table fits an executor's shuffle memory
(≈ table_size / buckets ≤ a few hundred MB). Buckets are per-table
immutable; changing the count means rewriting, exactly like Hive/Delta.

Spark-first mapping of the reference's repeated day-grain joins
(reference: upsert_athena_aggregates.py:95-110 re-joins aggregates to
the serving store every DAG run — a bucketed layout amortizes that
shuffle): declare the layout once, let the planner elide from then on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    keys: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed parquet table in the session
    catalog. ``sort_by`` additionally sorts WITHIN each bucket file, so
    a later sort-merge join skips its sort too (files stream pre-sorted).
    ``path`` makes it an external table (data outlives the catalog)."""
    if not keys:
        raise ValueError("bucketing requires at least one key column")
    missing = set(keys) - set(df.columns)
    if missing:
        raise ValueError(f"bucket keys not in DataFrame: {sorted(missing)}")
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucket_spec(spark: SparkSession, table_name: str) -> dict:
    """The table's bucket layout as the catalog records it:
    ``{"buckets": n, "keys": [...], "sort_by": [...]}`` — what a planner
    (or a human) checks before relying on shuffle elision."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        raise ValueError(f"{table_name} is not bucketed")

    def _cols(s: str) -> list[str]:
        return [c.strip().strip("`") for c in s.strip("[]").split(",") if c.strip()]

    return {
        "buckets": int(info["Num Buckets"]),
        "keys": _cols(info.get("Bucket Columns", "")),
        "sort_by": _cols(info.get("Sort Columns", "")),
    }


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan —
    the thing bucketing exists to drive to zero."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if line.lstrip("+-*: ").startswith("Exchange")
    )
