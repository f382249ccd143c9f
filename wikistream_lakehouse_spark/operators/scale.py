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
    bucket_key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table —
    pre-paying the shuffle so joins/aggregations on `bucket_key` between
    co-bucketed tables plan with zero Exchange."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # a dangling location from a previous session blocks managed-table
    # creation even after DROP — clear it explicitly
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    stale = os.path.join(warehouse, table_name.lower())
    if os.path.exists(stale):
        shutil.rmtree(stale)
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


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
