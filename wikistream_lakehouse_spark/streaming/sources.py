"""Streaming sources (S1/S3/S5): Kafka in production, deterministic
file-replay for tests/dev.

The reference's SSE→Kafka bridge (kafka/wiki-producer.py:33-65) stays a
thin non-engine adapter by design (SURVEY.md §3.1) — there is no native
SSE DataSource, and Kafka is the replayable boundary the engine reads
(`README.md:23`: "can replay and scale consumers").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_options(
    brokers: str,
    topic: str = "wikipedia-changes",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The EXACT option dict ``kafka_stream`` passes to the Kafka
    source, as a pure function so CI can pin it against a golden
    (VERDICT r12 #7): the file-backed contract fake proves the
    semantics of ``startingOffsets``/``maxOffsetsPerTrigger``, but a
    typo in an option NAME (silently ignored by the real source) is
    only catchable by asserting the dict itself."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }
    if max_offsets_per_trigger:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str = "wikipedia-changes",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka source mirroring the consumer's contract
    (kafka/wiki-s3-consumer.py:12-17,62-66): `earliest` reset for replay,
    micro-batch size cap standing in for BATCH_SIZE. Offsets live in the
    checkpoint, not broker group commits — restart-exact, not periodic."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_options(
                brokers, topic, starting_offsets, max_offsets_per_trigger
            )
        )
        .load()
    )


def file_replay_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "json",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Deterministic replay source: files appear → micro-batches happen.

    This is the test/dev stand-in for Kafka (SURVEY.md §2.1 S1): dropping
    one NDJSON file per trigger reproduces the consumer's batch cadence
    without a broker. Schema is explicit — inference on a stream is
    non-deterministic (SURVEY.md §1.2)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load(path)
    )


def decode_json_events(
    raw: DataFrame,
    schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Kafka value bytes → typed columns with malformed-drop (S5/P4).

    `from_json` yields a null (or, in PERMISSIVE mode, an all-null-field)
    struct for unparseable payloads — both are dropped here: the
    streaming equivalent of the producer/consumer `json.loads`-or-skip
    (kafka/wiki-producer.py:76-79, kafka/wiki-s3-consumer.py:93-95)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("r")
    )
    any_field = None
    for name in schema.names:
        c = F.col("r")[name].isNotNull()
        any_field = c if any_field is None else (any_field | c)
    return parsed.filter(F.col("r").isNotNull() & any_field).select("r.*")
