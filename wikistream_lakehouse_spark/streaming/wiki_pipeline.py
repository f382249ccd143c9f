"""The reference pipeline end-to-end, engine-native (SURVEY.md §3).

Five reference processes (SSE producer → Kafka → S3 consumer → Glue
curation → Athena CTAS → Postgres upsert) become three engine stages over
one SparkSession:

    ingest_wiki_stream : stream → typed 8-field record → bronze  (§3.1)
    curate_wiki_silver : bronze → event-time silver, idempotent  (§3.2)
    serve_daily_editors: silver → bot-filtered daily counts → MERGE (§3.3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from wikistream_lakehouse_spark.lakehouse.merge import upsert_parquet
from wikistream_lakehouse_spark.lakehouse.silver import curate_to_silver
from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.pipeline import bronze_sink
from wikistream_lakehouse_spark.streaming.sources import (
    decode_json_events,
    file_replay_stream,
)

WIKI_FIELDS = ("id", "type", "title", "user", "bot", "timestamp", "comment", "minor")


def project_wiki_record(df: DataFrame) -> DataFrame:
    """P1+P2: fixed 8-field projection with producer defaults —
    `minor` defaults False (kafka/wiki-producer.py:89), `bot` stays
    nullable and is read null-safely downstream
    (upsert_athena_aggregates.py:44)."""
    return df.select(*WIKI_FIELDS).withColumn(
        "minor", F.coalesce("minor", F.lit(False))
    )


def ingest_wiki_stream(
    spark: SparkSession,
    source_dir: str,
    bronze_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """§3.1 engine equivalent: replayable stream → typed record → bronze.
    (Kafka source drops in via sources.kafka_stream + decode_json_events —
    identical downstream.)"""
    raw = file_replay_stream(spark, source_dir, WIKI_EVENT_SCHEMA)
    events = project_wiki_record(raw)
    return bronze_sink(
        events, bronze_path, checkpoint, available_now=available_now
    )


def curate_wiki_silver(spark: SparkSession, bronze_path: str, silver_path: str) -> None:
    """§3.2 engine equivalent of the Glue job: bronze → silver with
    event-time yyyy/mm/dd from epoch-seconds `timestamp`
    (glue/job_wiki_curate.py:35-41), idempotent partition overwrite."""
    raw = spark.read.parquet(bronze_path)
    curated = raw.withColumn(
        "ts", F.to_timestamp(F.from_unixtime("timestamp"))
    )
    curate_to_silver(curated, silver_path, ts_col="ts")


def daily_editor_aggregate(silver: DataFrame, ds: str) -> DataFrame:
    """§3.3 serving query (upsert_athena_aggregates.py:39-50): bot-excluded
    per-editor daily counts for one event-date."""
    return (
        silver.filter(~F.coalesce(F.col("bot"), F.lit(False)))
        .filter(F.to_date("ts") == F.lit(ds).cast("date"))
        .groupBy(F.to_date("ts").alias("dt"), F.col("user").alias("username"))
        .agg(F.count(F.lit(1)).alias("edits"))
    )


def run_daily_batch(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    gold_path: str,
    serving_path: str,
    ds: str,
) -> None:
    """The whole Airflow DAG (dag/wiki_pipeline_dag.py:60-94: crawl →
    curate → msck → ctas → rds) as one re-runnable function call:
    curation is partition-overwrite idempotent, gold overwrites its ds
    partition, serving MERGEs — a retry at any point converges (the
    DAG's `retries=1` becomes a property of the jobs, not the scheduler).
    The crawler/MSCK steps vanish: schema travels with parquet
    (mergeSchema for evolution) and partitions self-register on read."""
    from wikistream_lakehouse_spark.lakehouse.gold import build_daily_gold

    curate_wiki_silver(spark, bronze_path, silver_path)
    silver = spark.read.parquet(silver_path)
    build_daily_gold(
        silver, gold_path, ds, title_col="title", user_col="user", ts_col="ts"
    )
    serve_daily_editors(spark, silver_path, serving_path, ds)


def serve_daily_editors(
    spark: SparkSession, silver_path: str, serving_path: str, ds: str
) -> None:
    """§3.3 engine equivalent: aggregate → MERGE on (dt, username) — the
    whole Athena poll/paginate/Postgres row-loop disappears into one
    set-based upsert."""
    silver = spark.read.parquet(silver_path)
    agg = daily_editor_aggregate(silver, ds)
    upsert_parquet(spark, serving_path, agg, keys=["dt", "username"])
