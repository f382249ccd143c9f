"""Reference-parity queries (SURVEY.md §2.1–2.6) over the `events` fixture.

The synthetic `events` table stands in for the wiki recentchange stream
(FIXTURES.md): event_id↔id, ts↔from_unixtime(timestamp), user_id↔user,
event_type↔type, props↔un-projected payload extras. Each query re-expresses
one reference operator family as an idiomatic Catalyst plan.

Scale notes: all aggregations here are hash aggregates with map-side partial
combine (Catalyst default), group-by keys are low-cardinality + date so the
shuffle is tiny relative to the scan; top-N uses TakeOrderedAndProject
(no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


# --- flagship: A1 + P6 + O1 — the reference's daily-top-titles CTAS -------
@register(
    "daily_top_titles",
    oracle="""
        SELECT CAST(ts AS DATE) AS ds, event_type, user_id, count(*) AS edits
        FROM events
        GROUP BY 1, 2, 3
        ORDER BY edits DESC, ds, event_type, user_id
        LIMIT 20
    """,
    tags=("reference", "A1", "O1", "flagship"),
)
def daily_top_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily top (type,user) by edit count — semantics of the reference CTAS
    `daily_top_titles_<ds>` (dag/wiki_pipeline_dag.py:29-39) + ad-hoc top-20
    (README.md:101-106), with deterministic tie-breaks for stable results."""
    e = table(spark, sf_dir, "events")
    return (
        e.withColumn("ds", F.to_date("ts"))
        .groupBy("ds", "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("edits"))
        .orderBy(F.desc("edits"), "ds", "event_type", "user_id")
        .limit(20)
    )


# --- P8 + F1–F4: the curation projection (glue/job_wiki_curate.py:35-41) ---
@register(
    "curate_projection",
    oracle="""
        SELECT event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
               CAST(year(ts) AS BIGINT)  AS yyyy,
               CAST(month(ts) AS BIGINT) AS mm,
               CAST(day(ts) AS BIGINT)   AS dd,
               event_type, user_id
        FROM events
        ORDER BY event_id
    """,
    tags=("reference", "P8", "F1", "F2", "F3", "F4"),
)
def curate_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column projection: event-time partition columns yyyy/mm/dd
    (glue/job_wiki_curate.py:35-41). Timestamp is rendered as a string so the
    oracle comparison is precision-exact across engines."""
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.year("ts").cast("long").alias("yyyy"),
        F.month("ts").cast("long").alias("mm"),
        F.dayofmonth("ts").cast("long").alias("dd"),
        "event_type",
        "user_id",
    ).orderBy("event_id")


# --- P6: parameterized one-day event-time slice ---------------------------
@register(
    "event_date_slice",
    oracle="""
        SELECT event_id, event_type, user_id, ROUND(value, 2) AS value
        FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        ORDER BY event_id
    """,
    tags=("reference", "P6"),
)
def event_date_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-day event-time window — `WHERE date(from_unixtime(timestamp)) =
    date('{ds}')` (dag/wiki_pipeline_dag.py:37, upsert_athena_aggregates.py:45).
    At scale this predicate prunes to one silver partition."""
    e = table(spark, sf_dir, "events")
    return (
        e.filter(F.to_date("ts") == F.lit("2024-01-15").cast("date"))
        .select(
            "event_id",
            "event_type",
            "user_id",
            F.round("value", 2).alias("value"),
        )
        .orderBy("event_id")
    )


# --- A2 + P5: CTE + null-safe boolean filter + two-key count ---------------
@register(
    "daily_editor_counts",
    oracle="""
        WITH f AS (
            SELECT CAST(ts AS DATE) AS dt, user_id
            FROM events
            WHERE NOT coalesce(
                CAST(json_extract_string(props, '$.k') AS BIGINT) % 2 = 0,
                false)
        )
        SELECT dt, user_id, count(*) AS edits
        FROM f
        GROUP BY 1, 2
        ORDER BY dt, user_id
    """,
    tags=("reference", "A2", "P5", "F5", "F8"),
)
def daily_editor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-editor daily counts with a null-safe boolean exclusion — shape of
    the serving query (upsert_athena_aggregates.py:39-50): CTE, bot filter
    via coalesce(bool, false), GROUP BY 1,2. Here odd `props.k` plays the
    human/bot flag role; the JSON probe exercises get_json_object (F8)."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    is_bot = (k % 2) == 0  # null-safe: coalesce(<null>, false) keeps the row
    return (
        e.filter(~F.coalesce(is_bot, F.lit(False)))
        .select(F.to_date("ts").alias("dt"), "user_id")
        .groupBy("dt", "user_id")
        .agg(F.count(F.lit(1)).alias("edits"))
        .orderBy("dt", "user_id")
    )


# --- A3: grouped sum (QuickSight "Sum of Edits by Title") ------------------
@register(
    "sum_by_title",
    oracle="""
        SELECT event_type AS title,
               count(*) AS edits,
               ROUND(SUM(value), 2) AS total_value
        FROM events
        GROUP BY 1
        ORDER BY edits DESC, title
    """,
    tags=("reference", "A3"),
)
def sum_by_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sum per title-analog (QuickSight dashboard_2 'Sum of Edits by
    Title'). Float sums are rounded identically on both sides — summation
    order differs between engines."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.col("event_type").alias("title"))
        .agg(
            F.count(F.lit(1)).alias("edits"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("edits"), "title")
    )


# --- A4: global (ungrouped) aggregate --------------------------------------
@register(
    "global_totals",
    oracle="""
        SELECT count(*) AS total_edits,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
               ROUND(SUM(value), 2) AS total_value
        FROM events
    """,
    tags=("reference", "A4"),
)
def global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped totals — the QuickSight gauge (dashboard_3, 1,129,591 total
    edits). Single-row reduce; partial aggregation makes this a scan-bound
    O(rows) job at any scale."""
    e = table(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("total_edits"),
        F.countDistinct("user_id").cast("long").alias("distinct_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


# --- A5: "Other" bucket rollup (QuickSight top-N + Other) ------------------
@register(
    "other_bucket_rollup",
    oracle="""
        WITH c AS (
            SELECT user_id, count(*) AS edits FROM events GROUP BY 1
        ), r AS (
            SELECT user_id, edits,
                   row_number() OVER (ORDER BY edits DESC, user_id) AS rk
            FROM c
        )
        SELECT CASE WHEN rk <= 10 THEN CAST(user_id AS VARCHAR)
                    ELSE 'Other' END AS bucket,
               CAST(SUM(edits) AS BIGINT) AS edits
        FROM r
        GROUP BY 1
        ORDER BY edits DESC, bucket
    """,
    tags=("reference", "A5", "O3"),
)
def other_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users with everything else folded into 'Other' — QuickSight's
    funnel behavior (dashboard_2: 'Other 941,690').

    Scale shape: NO global window. The top-10 membership comes from
    ``orderBy(desc).limit(10)`` — Catalyst plans TakeOrderedAndProject
    (per-partition top-k, 10-row driver merge) — and is broadcast back
    onto the aggregated frame as a left join. At wiki-scale user
    cardinality (10^7-10^8 distinct users) the old row_number over an
    unpartitioned window forced every group through one task; this plan
    keeps every stage parallel, and Catalyst reuses the groupBy exchange
    for both branches (ReusedExchange), so events is scanned once."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("edits"))
    top10 = (
        counts.orderBy(F.desc("edits"), "user_id")
        .limit(10)
        .select("user_id", F.lit(True).alias("is_top"))
    )
    return (
        counts.join(F.broadcast(top10), "user_id", "left")
        .withColumn(
            "bucket",
            F.when(F.col("is_top"), F.col("user_id").cast("string")).otherwise(
                F.lit("Other")
            ),
        )
        .groupBy("bucket")
        .agg(F.sum("edits").alias("edits"))
        .orderBy(F.desc("edits"), "bucket")
    )


# --- O3 / J5: per-dimension top-N via rank window --------------------------
@register(
    "top_titles_per_day",
    oracle="""
        WITH c AS (
            SELECT CAST(ts AS DATE) AS ds, event_type, count(*) AS edits
            FROM events GROUP BY 1, 2
        )
        SELECT ds, event_type, edits, rk FROM (
            SELECT ds, event_type, edits,
                   row_number() OVER (
                       PARTITION BY ds ORDER BY edits DESC, event_type) AS rk
            FROM c
        ) WHERE rk <= 3
        ORDER BY ds, rk
    """,
    tags=("reference", "O3", "J5"),
)
def top_titles_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 titles per day — QuickSight 'top N in <dim>' (dashboard_1/2)
    generalized as rank-window-over-aggregate. Window partitions by ds so
    state per partition is bounded by per-day group count."""
    e = table(spark, sf_dir, "events")
    counts = (
        e.withColumn("ds", F.to_date("ts"))
        .groupBy("ds", "event_type")
        .agg(F.count(F.lit(1)).alias("edits"))
    )
    w = Window.partitionBy("ds").orderBy(F.desc("edits"), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .orderBy("ds", "rk")
    )


# --- O2: plain limit over a materialized table -----------------------------
@register(
    "limit_scan",
    oracle="""
        SELECT event_id, event_type, user_id
        FROM events
        ORDER BY event_id
        LIMIT 20
    """,
    tags=("reference", "O2"),
)
def limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`SELECT * FROM daily_top_titles_… LIMIT 20` (README.md:108-109) with a
    deterministic order. Catalyst plans TakeOrderedAndProject — per-partition
    top-k then a 20-row merge on the driver, no global sort."""
    e = table(spark, sf_dir, "events")
    return e.select("event_id", "event_type", "user_id").orderBy("event_id").limit(20)


# --- P4 / F8 / S5: JSON decode with malformed-drop semantics ---------------
@register(
    "json_props_extract",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               CAST(json_extract_string(props, '$.missing') AS VARCHAR)
                   AS missing_attr
        FROM events
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        ORDER BY event_id
    """,
    tags=("reference", "P4", "F8", "S5"),
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON attribute extraction + not-parseable drop — the engine-side form
    of the producer/consumer `json.loads`-or-skip (kafka/wiki-producer.py:76-79,
    kafka/wiki-s3-consumer.py:93-95). Missing paths are null, not errors.

    One typed ``from_json`` parse per row instead of one Jackson walk per
    extracted attribute (``get_json_object`` ×N) — measured ~25% faster
    at sf0.1 with identical output; the gap widens with attribute count.
    ``fanout=True``: JSON parsing is heavy per-row derivation, so a
    single-row-group events scan is worth spreading (guide §2.5), unlike
    the cheap columnar passes the events default covers."""
    e = table(spark, sf_dir, "events", fanout=True)
    j = F.from_json("props", "k long, missing string")
    return (
        e.select("event_id", j.alias("j"))  # struct materialized once
        .select(
            "event_id",
            F.col("j.k").alias("k"),
            F.col("j.missing").alias("missing_attr"),
        )
        .filter(F.col("k").isNotNull())
        .orderBy("event_id")
    )


# --- P1 + P2: fixed-field projection with default fill ---------------------
@register(
    "project_with_defaults",
    oracle="""
        SELECT event_id, event_type,
               coalesce(user_id, -1) AS user_id_filled,
               coalesce(CAST(json_extract_string(props, '$.flag') AS BOOLEAN),
                        false) AS flag
        FROM events
        ORDER BY event_id
        LIMIT 100
    """,
    tags=("reference", "P1", "P2"),
)
def project_with_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-field projection with default-fill (kafka/wiki-producer.py:81-90:
    `minor` defaults False; upsert_athena_aggregates.py:44: null-safe bot).
    Absent `props.flag` coalesces to false exactly like `coalesce(bot,false)`."""
    e = table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            "event_type",
            F.coalesce("user_id", F.lit(-1)).alias("user_id_filled"),
            F.coalesce(
                F.get_json_object("props", "$.flag").cast("boolean"), F.lit(False)
            ).alias("flag"),
        )
        .orderBy("event_id")
        .limit(100)
    )
