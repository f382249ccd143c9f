"""Fixture-table loaders (TESTDATA.md / FIXTURES.md).

All loaders return lazy DataFrames over parquet — Catalyst gets the full
plan (column pruning + predicate pushdown reach the scan), and partition
discovery/pruning is automatic for partitioned layouts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.session import ensure_session_conf
from wikistream_lakehouse_spark.tscompat import to_utc_timestamp

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at *any* scale factor —
#: region/nation are bounded by geography (25 nations) even at 100 TB.
ALWAYS_BROADCAST = ("region", "nation")


def table(
    spark: SparkSession, sf_dir: str, name: str, fanout: bool | None = None
) -> DataFrame:
    """Load one fixture table as a DataFrame.

    `events.ts` has shipped as parquet TIMESTAMP(NANOS) (reads as a
    nanosecond long under session.RUNTIME_CONF), as naive `timestamp[us]`
    (reads as TIMESTAMP_NTZ), and could ship as UTC-adjusted micros (reads
    as TIMESTAMP).  The engine's contract is one type — TIMESTAMP_LTZ
    under the pinned UTC session — so ALL three encodings are normalized
    here, at the load boundary (tscompat.to_utc_timestamp), and no
    downstream operator ever branches on the raw declaration.

    ``fanout=True`` opts the scan into `_small_scan_fanout` (below) —
    for call sites whose downstream map work is heavy JVM derivation
    over a small single-row-group file.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events" and not isinstance(df.schema["ts"].dataType, T.TimestampType):
        df = df.withColumn("ts", to_utc_timestamp(df, "ts"))
    if not fanout:
        return df
    return _small_scan_fanout(spark, df, path)


#: Fan-out bounds for `_small_scan_fanout` (bytes). Parameterised via
#: SPARK_GRAFT_SMALL_SCAN_MB (0 disables); floor skips broadcast-dim-size
#: tables where scheduling cores× near-empty tasks costs more than the
#: map work they would parallelize. The floor is overridable via
#: SPARK_GRAFT_SMALL_SCAN_FLOOR_KB (VERDICT r14 (b): forcing it to 0
#: lets the oracle sweep exercise the repartitioned path at sf0.01,
#: where every fixture file sits below the default floor).
_FANOUT_FLOOR_BYTES = 256 * 1024


def _fanout_floor_bytes() -> float:
    try:
        kb = os.environ.get("SPARK_GRAFT_SMALL_SCAN_FLOOR_KB")
        return float(kb) * 1024 if kb is not None else _FANOUT_FLOOR_BYTES
    except ValueError:
        return _FANOUT_FLOOR_BYTES


def _small_scan_fanout(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin a SMALL single-file heavy-derivation scan out to the
    session parallelism.

    Parquet scan parallelism is bounded by row-group count; a small table
    written as one row group scans as ONE task, serializing every
    downstream map stage on a many-core executor. Derived from input
    size, not tuned to a mode (guide §2.5/§6): above the threshold the
    input itself provides split parallelism and this is a no-op — at
    production scale the condition is never true — and below the floor
    the table is broadcast-dim-sized and scheduling extra tasks costs
    more than the map work.

    OPT-IN per call site (``table(..., fanout=True)``), never a default:
    measured r14, the fan-out wins ONLY where the downstream map work is
    heavy JVM derivation amortized over few rows per byte — the k-gram
    span Generate, all-pairs shingle/cosine comparisons, per-row JSON
    parse (0.23-0.88× paired ratios). It consistently LOSES everywhere
    else: cheap columnar passes pay the extra exchange (relational facts
    1.7-2.7× slower), and Arrow/mapInPandas consumers pay cores× Python
    worker round trips on near-empty batches instead of one full batch
    (PQ/IVF ANN family measured up to 16× slower with a fanned
    embeddings scan — guide §4.2: keep Arrow batches large).

    Results are unaffected: every registered query is partitioning-
    invariant (audited: seeded salts feed two-level aggregates, identity
    allocation is invariant-checked, windows carry explicit tie-breaks),
    and the correctness driver re-proves value equality at sf0.01.
    """
    try:
        limit_mb = float(os.environ.get("SPARK_GRAFT_SMALL_SCAN_MB", "64"))
    except ValueError:
        limit_mb = 64.0
    if limit_mb <= 0:
        return df
    try:
        if os.path.isdir(path):  # directory-style (possibly partitioned)
            # Walk recursively: partitioned layouts nest data files under
            # key=value subdirectories, and a top-level-only sum would
            # count dirents (bytes undercounted → fan-out silently skipped).
            size = 0
            for root, dirs, files in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
                size += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
        else:
            size = os.path.getsize(path)
    except OSError:
        return df
    par = spark.sparkContext.defaultParallelism
    if par > 1 and _fanout_floor_bytes() <= size <= limit_mb * 1024 * 1024:
        return df.repartition(par)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
