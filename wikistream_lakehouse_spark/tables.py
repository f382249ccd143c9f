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


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    `events.ts` has shipped as parquet TIMESTAMP(NANOS) (reads as a
    nanosecond long under session.RUNTIME_CONF), as naive `timestamp[us]`
    (reads as TIMESTAMP_NTZ), and could ship as UTC-adjusted micros (reads
    as TIMESTAMP).  The engine's contract is one type — TIMESTAMP_LTZ
    under the pinned UTC session — so ALL three encodings are normalized
    here, at the load boundary (tscompat.to_utc_timestamp), and no
    downstream operator ever branches on the raw declaration.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and not isinstance(df.schema["ts"].dataType, T.TimestampType):
        df = df.withColumn("ts", to_utc_timestamp(df, "ts"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
