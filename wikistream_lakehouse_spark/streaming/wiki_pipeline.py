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

from wikistream_lakehouse_spark.lakehouse.merge import upsert
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
    (glue/job_wiki_curate.py:35-41). The silver is a TRANSACTIONAL table
    (curation = atomic partition replace; read it back with
    ``txn.read_table``) — the whole medallion shares one substrate."""
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
    curation is partition-overwrite idempotent, gold commits an atomic
    ds-partition replace through the txn log, serving MERGEs through the
    same log — a retry at any point converges (the DAG's `retries=1`
    becomes a property of the jobs, not the scheduler), and the gold +
    serving tables stay safe under concurrent writers. Read them back
    with ``txn.read_table``. The crawler/MSCK steps vanish: schema
    travels with parquet (mergeSchema for evolution) and partitions
    self-register on read."""
    from wikistream_lakehouse_spark.lakehouse.gold import build_daily_gold
    from wikistream_lakehouse_spark.lakehouse.txn import read_table

    curate_wiki_silver(spark, bronze_path, silver_path)
    silver = read_table(spark, silver_path)
    build_daily_gold(
        silver, gold_path, ds, title_col="title", user_col="user", ts_col="ts"
    )
    serve_daily_editors(spark, silver_path, serving_path, ds)


def serve_daily_editors(
    spark: SparkSession, silver_path: str, serving_path: str, ds: str
) -> None:
    """§3.3 engine equivalent: aggregate → MERGE on (dt, username) — the
    whole Athena poll/paginate/Postgres row-loop disappears into one
    set-based upsert, committed through the transactional log (the
    serving layer's atomicity IS the product; see lakehouse/merge.py).
    Read the serving table with ``txn.read_table``."""
    from wikistream_lakehouse_spark.lakehouse.txn import read_table

    silver = read_table(spark, silver_path)
    agg = daily_editor_aggregate(silver, ds)
    upsert(spark, serving_path, agg, keys=["dt", "username"])


# --------------------------------------------------------------------------
# Fully-transactional pipeline: every zone is a txn table
# --------------------------------------------------------------------------


def ingest_wiki_stream_txn(
    spark: SparkSession,
    source_dir: str,
    bronze_table: str,
    checkpoint: str,
    available_now: bool = True,
    app_id: str = "wiki-bronze",
    maintain_views: list | None = None,
) -> StreamingQuery:
    """§3.1 with a transactional bronze: exactly-once micro-batch appends
    (content-fingerprinted batch identity) into a ds-partitioned txn
    table — replayable audit log that tolerates concurrent compaction.
    ``maintain_views``: incremental serving views folded forward per
    micro-batch (see ``wiki_serving_view_spec``)."""
    from wikistream_lakehouse_spark.lakehouse.bronze import with_processing_date
    from wikistream_lakehouse_spark.streaming.pipeline import txn_append_sink

    raw = file_replay_stream(spark, source_dir, WIKI_EVENT_SCHEMA)
    events = with_processing_date(project_wiki_record(raw))
    return txn_append_sink(
        events,
        bronze_table,
        checkpoint,
        app_id=app_id,
        available_now=available_now,
        partition_by=["ds"],
        maintain_views=maintain_views,
    )


def wiki_serving_view_spec(serving_view: str):
    """The §3.3 serving aggregate as a declared ViewSpec, for continuous
    per-micro-batch maintenance by ``ingest_wiki_stream_txn``."""
    from wikistream_lakehouse_spark.lakehouse.incremental import ViewSpec

    return ViewSpec(
        path=serving_view,
        group_by=(
            "to_date(to_timestamp(from_unixtime(timestamp))) AS dt",
            "user AS username",
        ),
        measures={"edits": ("count", "1")},
        where="NOT coalesce(bot, false)",
    )


def run_daily_batch_txn(
    spark: SparkSession,
    bronze_table: str,
    silver_table: str,
    gold_table: str,
    serving_table: str,
    ds: str,
) -> None:
    """The whole daily DAG over transactional tables END-TO-END: bronze
    snapshot → silver replace_partitions → gold replace_partitions →
    serving merge, each an atomic commit. Any step can race a concurrent
    writer (another day's build, compaction, a streaming appender) and
    every reader sees complete snapshots only."""
    from wikistream_lakehouse_spark.lakehouse.gold import build_daily_gold
    from wikistream_lakehouse_spark.lakehouse.silver import curate_to_silver_txn
    from wikistream_lakehouse_spark.lakehouse.txn import read_table

    bronze = read_table(spark, bronze_table)
    curated = bronze.withColumn("ts", F.to_timestamp(F.from_unixtime("timestamp")))
    curate_to_silver_txn(curated.drop("ds"), silver_table, ts_col="ts")
    silver = read_table(spark, silver_table)
    build_daily_gold(
        silver, gold_table, ds, title_col="title", user_col="user", ts_col="ts"
    )
    agg = daily_editor_aggregate(silver, ds)
    upsert(spark, serving_table, agg, keys=["dt", "username"])


def serve_daily_editors_incremental(
    spark: SparkSession, bronze_table: str, serving_view: str
) -> int | None:
    """§3.3 as an INCREMENTAL materialized view: the same bot-excluded
    (dt, username) → edits serving aggregate the reference rebuilds from
    the full table every DAG run (upsert_athena_aggregates.py:39-50),
    maintained here by folding only the bronze rows appended since the
    last refresh (lakehouse/incremental.py).  At 100 TB this turns the
    daily serving refresh from a full fact-table scan into a
    delta-sized job — call it per micro-batch or per day, same result.
    Returns the new view version (None = already current)."""
    return wiki_serving_view_spec(serving_view).refresh(spark, bronze_table)
