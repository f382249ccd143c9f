"""Event-time window queries (SURVEY.md §2.9 X6) in their batch-equivalent
form — tumbling, sliding, and session windows over `events.ts`.

The reference's only "window" is the daily batch CTAS (a 1-day tumbling
window by another name, dag/wiki_pipeline_dag.py:37); the engine provides
real tumbling/sliding/session windows whose *streaming* form (readStream +
withWatermark, streaming/ package) reuses these exact expressions — batch
and streaming share the DataFrame API, so the oracle-checked batch results
certify the streaming aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


@register(
    "tumbling_hourly_counts",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               count(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY window_start
    """,
    tags=("X6", "streaming", "T7"),
)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate — window(ts, '1 hour'). In
    streaming mode the identical expression runs under a watermark with
    partial state per open window."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register(
    "sliding_window_counts",
    oracle="""
        WITH starts AS (
            SELECT unnest([CAST(date_trunc('hour', ts) AS TIMESTAMP),
                           CAST(date_trunc('hour', ts) AS TIMESTAMP)
                               - INTERVAL 1 HOUR]) AS window_start,
                   value
            FROM events
        )
        SELECT window_start, count(*) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM starts
        GROUP BY 1
        ORDER BY window_start
    """,
    tags=("X6", "streaming"),
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every 1 hour — each event lands in exactly two
    windows (window(ts, '2 hours', '1 hour')); the oracle expands the same
    assignment explicitly."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


@register(
    "session_windows_per_user",
    oracle="""
        WITH t AS (
            SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ), flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_session
            FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
            SELECT user_id, ts,
                   SUM(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events
        FROM numbered
        GROUP BY user_id, session_id
        ORDER BY user_id, session_start
    """,
    tags=("X6", "streaming", "sessions"),
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap —
    session_window(ts, '30 minutes'). Session end = last event + gap
    (Spark's definition); the oracle derives identical sessions via
    gaps-and-islands. Streaming form: same expression + withWatermark."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
