"""Keyed Kafka producer sink (K1) — engine-side of
kafka/wiki-producer.py:69-100.

The record encoding (key = string id "good for partitioning/compaction
downstream", value = compact JSON of the full record) is a pure column
expression, separated from the writer so it is unit-testable without a
broker; delivery callbacks/flush (wiki-producer.py:22-31,99-100) become
checkpointed micro-batch commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def encode_kafka_records(df: DataFrame, key_col: str = "id") -> DataFrame:
    """(key string, value string) — key from the record id
    (kafka/wiki-producer.py:93-96), value = JSON of all columns."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
    )


def kafka_sink(
    events: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "id",
    trigger_secs: int = 10,
) -> StreamingQuery:
    """Publish a streaming DataFrame to Kafka, keyed and checkpointed."""
    return (
        encode_kafka_records(events, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
