"""File-backed fake Kafka source — the broker-less contract twin of
``sources.kafka_stream`` (S3).

No broker exists in this environment, so the Kafka *options contract* is
exercised end-to-end with a directory standing in for a topic log:

  * one JSON file per offset (``<offset>.json``) — a file IS a record,
    so ``maxOffsetsPerTrigger`` maps exactly onto ``maxFilesPerTrigger``;
  * the emitted DataFrame has the real Kafka source schema (key/value
    BINARY, topic, partition, offset, timestamp, timestampType), so
    everything downstream (``decode_json_events`` → bronze) runs
    unchanged against either source;
  * ``starting_offsets`` accepts ``"earliest"`` or the per-topic-
    partition JSON form ``{"topic": {"0": 5}}`` with Kafka's semantics
    (start AT that offset, i.e. skip offsets below it).

Reference contract: kafka/wiki-s3-consumer.py:12-17,62-66 (earliest
reset + BATCH_SIZE cap); kafka/wiki-producer.py:69-100 (keyed records).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The open-source Kafka source's fixed output schema, mirrored exactly.
KAFKA_RECORD_COLUMNS = [
    "key",
    "value",
    "topic",
    "partition",
    "offset",
    "timestamp",
    "timestampType",
]

_RAW_SCHEMA = (
    "key string, value string, topic string, partition int, "
    "offset long, timestamp timestamp"
)


def write_fake_kafka_log(
    log_dir: str,
    records: list[tuple[str | None, str]],
    topic: str = "wikipedia-changes",
    partition: int = 0,
    start_offset: int = 0,
) -> int:
    """Append keyed records to the fake topic log; returns next offset.

    Each record lands in its own ``<offset>.json`` file — the unit both
    the trigger cap and the offset filter operate on.
    """
    os.makedirs(log_dir, exist_ok=True)
    off = start_offset
    for key, value in records:
        rec = {
            "key": key,
            "value": value,
            "topic": topic,
            "partition": partition,
            "offset": off,
            "timestamp": "2024-01-15T00:00:00.000Z",
        }
        with open(os.path.join(log_dir, f"{off:012d}.json"), "w") as f:
            f.write(json.dumps(rec) + "\n")
        off += 1
    return off


def fake_kafka_stream(
    spark: SparkSession,
    log_dir: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming read of a fake topic log under ``kafka_stream``'s contract."""
    reader = spark.readStream.format("json").schema(_RAW_SCHEMA)
    if max_offsets_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_offsets_per_trigger))
    df = reader.load(log_dir)

    if starting_offsets not in ("earliest", "latest"):
        spec = json.loads(starting_offsets)
        cond = F.lit(False)
        for topic, parts in spec.items():
            for part, off in parts.items():
                cond = cond | (
                    (F.col("topic") == topic)
                    & (F.col("partition") == int(part))
                    & (F.col("offset") >= int(off))
                )
        df = df.filter(cond)

    return df.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
        F.lit(0).alias("timestampType"),
    )
