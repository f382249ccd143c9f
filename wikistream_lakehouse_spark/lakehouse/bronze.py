"""Bronze (raw) zone: immutable, append-only landing, partitioned by
processing date.

Reference semantics being reproduced (kafka/wiki-s3-consumer.py:43-53):
raw objects land under `ds=YYYY-MM-DD/` where `ds` is *arrival* wall-clock
(T5 — a late event lands in the arrival day's partition), rows stay
row-oriented (NDJSON.gz there; configurable here, parquet default for
engine-internal replay). "Raw S3 is immutable for audit/rebuilds"
(README.md:117) → bronze is the replay log for everything downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_processing_date(df: DataFrame, ds: str | None = None) -> DataFrame:
    """Stamp the processing-date partition column (T5).

    `ds` pins the value for deterministic tests/backfills; default is the
    arrival wall-clock date, matching the consumer's
    `datetime.now(timezone.utc)` stamp (kafka/wiki-s3-consumer.py:47-48).
    """
    col = F.lit(ds).cast("date") if ds else F.to_date(F.current_timestamp())
    return df.withColumn("ds", col)


def write_bronze(
    df: DataFrame,
    path: str,
    ds: str | None = None,
    fmt: str = "parquet",
    compression: str | None = None,
) -> None:
    """Append a micro-batch to the bronze zone, partitioned by `ds`.

    mode=append is correct *here* (and only here): bronze is the immutable
    at-least-once landing zone — dedup/idempotency are silver's job
    (SURVEY.md §1.3). `fmt="json"` + compression="gzip" reproduces the
    reference's NDJSON.gz layout byte-for-byte in spirit.
    """
    writer = with_processing_date(df, ds).write.mode("append").partitionBy("ds")
    if compression:
        writer = writer.option("compression", compression)
    writer.format(fmt).save(path)
