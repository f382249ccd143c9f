"""Scale utilities: skew-salted joins and bucketed co-located tables.

These are the two knobs AQE can't fully turn for you at 100 TB:

* **Salting** — when one join key holds a disproportionate share of rows
  (a viral page title, a null-ish default user), even AQE skew-split
  re-reads the same oversized build side. Salting splits the hot key into
  `salt` sub-keys: the skewed side gets a random salt, the other side is
  replicated across all salts. Equi-join semantics are preserved exactly.

* **Bucketing** — two fact tables bucketed by the same key and count
  co-locate their joins: the shuffle happens once at write time and every
  subsequent join/aggregate on that key is exchange-free (asserted in
  tests/test_scale.py).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on `key` with the left side salted and the right side
    replicated `salt`× — identical rows to `left.join(right, key, how)`,
    but a key holding 50% of left rows now spreads over `salt` reducers.

    Use when the *left* side is skewed and the right side is small enough
    to replicate (dim-like, but past the broadcast threshold). Supported:
    inner/left joins (replication would duplicate unmatched right rows
    under right/full joins).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    l2 = left.withColumn(
        "_salt", (F.rand(seed=42) * salt).cast("int")
    )
    r2 = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l2.join(r2, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: "str | list[str]",
    n_buckets: int = 16,
    sort_by: "str | list[str] | None" = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) table — pre-paying
    the shuffle so joins/aggregations on ``bucket_key`` between
    co-bucketed tables plan with zero Exchange. ``sort_by`` additionally
    sorts WITHIN each bucket file, letting a later sort-merge join skip
    its sort too. ``path`` makes it an external table (data outlives the
    catalog). Bucket count is a LAYOUT decision: size it so one bucket
    of the largest co-located table fits an executor's shuffle memory."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    if not keys:
        raise ValueError("bucketing requires at least one key column")
    missing = set(keys) - set(df.columns)
    if missing:
        raise ValueError(f"bucket keys not in DataFrame: {sorted(missing)}")
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    spark = df.sparkSession
    exists = spark.catalog.tableExists(table_name)
    if mode == "overwrite":
        # drop/clear ONLY on overwrite — ADVICE r5: an unconditional drop
        # made mode='append' silently destroy all prior data
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        if path is None:
            # a dangling location from a previous session blocks
            # managed-table creation even after DROP — clear it explicitly
            warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            stale = os.path.join(warehouse, table_name.lower())
            if os.path.exists(stale):
                shutil.rmtree(stale)
    elif exists:
        # appending with a different layout would silently break the
        # zero-Exchange co-location contract every reader relies on
        sort_keys = (
            [] if not sort_by
            else [sort_by] if isinstance(sort_by, str) else list(sort_by)
        )
        have = bucket_spec(spark, table_name)
        want = {"buckets": n_buckets, "keys": keys, "sort_by": sort_keys}
        if have != want:
            raise ValueError(
                f"append bucket layout mismatch on {table_name}: "
                f"table has {have}, write declares {want}"
            )
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*([sort_by] if isinstance(sort_by, str) else sort_by))
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


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def zipf_rows(
    spark: SparkSession,
    n_rows: int,
    n_keys: int,
    s: float = 1.2,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Seeded power-law-skewed fixture: ``(key bigint, value double)``.

    Real event/edit streams are zipfian (the reference dashboard's
    "Other 941,690" bucket IS that skew artifact) while the sandbox
    fixtures are uniform-ish, so scale tests need a generator.  Keys are
    drawn by inverse-transform from the discretized Pareto tail
    P(K >= k) = k^(-s) — the standard continuous approximation of a
    zipf(s+1) rank-frequency law: rank 1 is the hot key (~``2^-s`` of
    mass per doubling), ranks decay polynomially.  ``F.rand(seed)`` makes
    the draw deterministic per (seed, n_rows, partitions).

    Fully distributed: ``spark.range`` + codegen expressions, no driver
    data.
    """
    base = spark.range(0, n_rows, numPartitions=partitions or 32)
    u = F.rand(seed=seed)
    # u in [0,1) -> pareto rank >= 1; cap at n_keys (mass beyond the cap
    # folds onto the last key, preserving monotone skew)
    rank = F.least(
        F.floor(F.pow(F.lit(1.0) - u, F.lit(-1.0 / s))), F.lit(float(n_keys))
    )
    return base.select(
        (rank.cast("bigint") - F.lit(1)).alias("key"),
        F.rand(seed=seed + 1).alias("value"),
    )
