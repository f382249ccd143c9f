"""S3/K1 contract e2e without a broker: the file-backed fake Kafka source
drives the SAME downstream pipeline (decode_json_events → bronze) the real
``kafka_stream`` would, and its startingOffsets / maxOffsetsPerTrigger
options behave like Kafka's."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.kafka_contract import (
    KAFKA_RECORD_COLUMNS,
    fake_kafka_stream,
    write_fake_kafka_log,
)
from wikistream_lakehouse_spark.streaming.pipeline import bronze_sink
from wikistream_lakehouse_spark.streaming.sources import decode_json_events

BASE_TS = 1_705_300_000  # 2024-01-15 UTC


def _wiki_value(i: int) -> str:
    return json.dumps(
        {
            "id": i,
            "type": "edit",
            "title": f"Page_{i % 3}",
            "user": f"user_{i % 4}",
            "bot": False,
            "timestamp": BASE_TS + i * 60,
            "comment": "c",
            "minor": False,
        }
    )


def _write_topic(tmp_path, n=12):
    log = str(tmp_path / "topic")
    write_fake_kafka_log(log, [(str(i), _wiki_value(i)) for i in range(n)])
    return log


def test_fake_kafka_emits_kafka_record_schema(spark, tmp_path):
    """The fake source's schema is the Kafka source's schema — key/value
    binary — so pipelines are source-agnostic."""
    log = _write_topic(tmp_path)
    stream = fake_kafka_stream(spark, log)
    assert stream.isStreaming
    assert stream.columns == KAFKA_RECORD_COLUMNS
    types = dict(stream.dtypes)
    assert types["key"] == "binary" and types["value"] == "binary"


def test_starting_offsets_json_skips_earlier_offsets(spark, tmp_path):
    """startingOffsets='{"topic":{"0":4}}' starts AT offset 4: offsets
    0-3 are never delivered, 4..11 are — through decode into bronze."""
    log = _write_topic(tmp_path, n=12)
    stream = fake_kafka_stream(
        spark,
        log,
        starting_offsets=json.dumps({"wikipedia-changes": {"0": 4}}),
    )
    events = decode_json_events(stream, WIKI_EVENT_SCHEMA)
    bronze = str(tmp_path / "bronze")
    q = bronze_sink(events, bronze, str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(bronze).select("id").collect())
    assert got == list(range(4, 12))


def test_max_offsets_per_trigger_bounds_batches(spark, tmp_path):
    """maxOffsetsPerTrigger=5 over 12 offsets → micro-batches of at most
    5 records, all 12 delivered exactly once (offset-checkpoint replay)."""
    log = _write_topic(tmp_path, n=12)
    stream = fake_kafka_stream(spark, log, max_offsets_per_trigger=5)
    events = decode_json_events(stream, WIKI_EVENT_SCHEMA)

    batches: list[int] = []

    def count_batch(df, batch_id):
        batches.append(df.count())

    q = (
        events.writeStream.foreachBatch(count_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sum(batches) == 12
    assert max(batches) <= 5
    assert len(batches) >= 3  # 12 offsets / 5 per trigger → ≥3 batches


def test_malformed_values_dropped_not_fatal(spark, tmp_path):
    """A garbage value byte-string must be skipped (P4/S5), exactly like
    the consumer's json.loads-or-skip — never kill the stream."""
    log = str(tmp_path / "topic")
    write_fake_kafka_log(
        log,
        [("0", _wiki_value(0)), ("1", "{not json"), ("2", _wiki_value(2))],
    )
    stream = fake_kafka_stream(spark, log)
    events = decode_json_events(stream, WIKI_EVENT_SCHEMA)
    bronze = str(tmp_path / "bronze")
    q = bronze_sink(events, bronze, str(tmp_path / "ck"), available_now=True)
    q.awaitTermination(120)
    got = sorted(r.id for r in spark.read.parquet(bronze).select("id").collect())
    assert got == [0, 2]


# ---------------------------------------------------------------------------
# golden options (VERDICT r12 #7): the file-backed fake proves option
# SEMANTICS; this pins the option NAMES the real source would receive —
# the one thing the fake cannot catch (Kafka ignores unknown options
# silently, so a typo'd name degrades behavior without an error)
# ---------------------------------------------------------------------------


def test_kafka_stream_options_match_golden():
    from wikistream_lakehouse_spark.streaming.sources import kafka_options

    assert kafka_options("b1:9092,b2:9092") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "wikipedia-changes",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert kafka_options(
        "b:9092",
        topic="t2",
        starting_offsets='{"t2": {"0": 5}}',
        max_offsets_per_trigger=500,
    ) == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "t2",
        "startingOffsets": '{"t2": {"0": 5}}',
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "500",
    }


def test_fake_kafka_honors_the_shared_option_semantics(spark, tmp_path):
    """The contract fake consumes the SAME logical knobs the golden
    pins (startingOffsets JSON form, maxOffsetsPerTrigger), so the pair
    of tests covers names AND semantics."""
    import inspect

    from wikistream_lakehouse_spark.streaming.kafka_contract import (
        fake_kafka_stream,
    )
    from wikistream_lakehouse_spark.streaming.sources import kafka_stream

    real = inspect.signature(kafka_stream).parameters
    fake = inspect.signature(fake_kafka_stream).parameters
    for shared in ("starting_offsets", "max_offsets_per_trigger"):
        assert real[shared].default == fake[shared].default
