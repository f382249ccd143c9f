"""Timestamp-encoding compatibility at the load boundary.

A lakehouse raw zone never controls how producers declare time. The same
logical instant arrives as at least three parquet encodings, and the
fixture generator has shipped all three across rounds:

  * ``TIMESTAMP(NANOS)``            — no Spark-native type; read as a raw
    nanosecond ``LongType`` under ``spark.sql.legacy.parquet.nanosAsLong``
    (session.py pins it).
  * ``timestamp[us]`` w/o timezone  — pyarrow/pandas default
    (``isAdjustedToUTC=false``); Spark 3.4+ reads **TIMESTAMP_NTZ**.
  * ``timestamp[us, tz=UTC]``       — reads the classic **TIMESTAMP**
    (TIMESTAMP_LTZ).

The engine's internal contract is a single type — TIMESTAMP_LTZ under the
pinned UTC session (session.py) — so every operator downstream (window
functions, ``unix_micros``, ``CAST(.. AS DOUBLE)`` epoch math, streaming
watermarks) sees one type.  These helpers normalize *any* of the three
encodings to that contract, losslessly to the microsecond:

  * Long nanos → ``timestamp_micros(v div 1000)`` (integer div, no float).
  * NTZ → ``CAST(x AS TIMESTAMP)`` — wall-clock-preserving under the UTC
    session, i.e. the identity interpretation ("naive means UTC"), which
    matches both the reference's UTC-everywhere posture
    (kafka/wiki-s3-consumer.py:47) and how DuckDB reads the same file.
  * LTZ → passthrough.

All expressions stay inside whole-stage codegen; none break parquet
column pruning (the cast sits above the scan, the scan still reads one
column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typeName() values that denote "already a timestamp" (either zone form).
TIMESTAMP_TYPENAMES = ("timestamp", "timestamp_ntz")


def is_timestamp_type(dt: T.DataType) -> bool:
    """True for TIMESTAMP (LTZ) and TIMESTAMP_NTZ alike."""
    return isinstance(dt, (T.TimestampType, T.TimestampNTZType))


def to_utc_timestamp(df: DataFrame, col: str) -> Column:
    """Column expression normalizing ``col`` to TIMESTAMP_LTZ (UTC session).

    Accepts LongType epoch-nanos, TIMESTAMP_NTZ, TIMESTAMP, or an
    epoch-seconds integer/double column (the raw wiki ``timestamp`` field,
    glue/job_wiki_curate.py:37).  Raises on types with no sane timestamp
    interpretation so schema drift fails loudly at the boundary, not three
    operators downstream.
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampType):
        return c
    if isinstance(dt, T.TimestampNTZType):
        return c.cast("timestamp")  # wall-clock identity under UTC session
    if isinstance(dt, T.LongType):
        # Heuristic-free: the only LongType time columns the engine meets
        # are nanosAsLong reads; epoch-seconds longs route via the explicit
        # epoch_seconds entry points (silver.derive_event_time_columns).
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    raise TypeError(
        f"column {col!r} has type {dt.simpleString()}; expected a timestamp "
        "(LTZ/NTZ) or an epoch-nanos long"
    )


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch-seconds ``double`` for a numeric OR timestamp column.

    The normalized stat domain for data skipping / Z-order: numeric
    columns cast directly; timestamp columns (either zone form) route
    through TIMESTAMP_LTZ first because ``CAST(timestamp_ntz AS DOUBLE)``
    is illegal while ``CAST(timestamp AS DOUBLE)`` is defined as epoch
    seconds.
    """
    dt = df.schema[col].dataType
    if is_timestamp_type(dt):
        return to_utc_timestamp(df, col).cast("double")
    return F.col(col).cast("double")
