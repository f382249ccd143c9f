"""Time-series gap-filling (the TimescaleDB ``time_bucket_gapfill`` /
``locf`` analogue), pure Catalyst: a dense bucket grid is generated
WITH ``sequence``+``explode`` from a 1-row broadcast bounds frame —
never collected to the driver, never a Python loop — sparse aggregates
left-join onto it, and last-observation-carried-forward is a frame-
bounded ``last(ignorenulls)`` window.

Scale shape: the grid is O(buckets × series), tiny next to the fact
table at any SF; the only wide operation is the per-series window,
which partitions by series key (bounded cardinality) — the same plan at
100 TB. Reference parity: none (the reference's dashboards silently
show gaps); this is the standard serving-layer fix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table

_TYPES = ("error", "signup")  # sparse slices: ~200 events / 720 hours

# rolling_zscore_anomalies tuning: trailing-day baseline, warm-up floor,
# and a 4dp-rounded threshold compared identically on both engines so
# the anomaly set can't flip on cross-engine float dust
_Z_LOOKBACK = 24  # hourly buckets
_Z_MIN_HISTORY = 12
_Z_THRESHOLD = 2.0


@register(
    "hourly_gapfill_locf",
    oracle="""
        WITH src AS (
            SELECT event_type, ts, value FROM events
            WHERE event_type IN ('error', 'signup') AND value >= 0.9
        ), bounds AS (
            SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS lo,
                   CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS hi
            FROM src
        ), grid AS (
            SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS ws
            FROM bounds
        ), agg AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
                   CAST(count(*) AS BIGINT) AS n,
                   ROUND(AVG(value), 4) AS av
            FROM src GROUP BY 1, 2
        )
        SELECT t.event_type AS event_type,
               CAST(g.ws AS TIMESTAMP) AS window_start,
               CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
               last_value(a.av IGNORE NULLS) OVER (
                   PARTITION BY t.event_type ORDER BY g.ws
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_avg
        FROM grid g
        CROSS JOIN (SELECT DISTINCT event_type FROM src) t
        LEFT JOIN agg a ON a.event_type = t.event_type AND a.ws = g.ws
        ORDER BY t.event_type, window_start
    """,
    tags=("timeseries", "gapfill", "extra"),
)
def hourly_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series for two sparse event slices: empty buckets
    appear with n_events = 0, and the average carries forward from the
    last observed bucket (LOCF). The grid comes from sequence() over a
    broadcast 1-row bounds frame × the distinct series keys — no
    driver-side range materialization, no UDF; the fill is one
    running-frame window per series."""
    src = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*_TYPES) & (F.col("value") >= 0.9)
    )
    bounds = src.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("ws")
    )
    types = src.select("event_type").distinct()
    agg = src.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ws")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("av"),
    )
    dense = grid.crossJoin(F.broadcast(types)).join(
        agg, ["event_type", "ws"], "left_outer"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ws")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        "event_type",
        F.col("ws").alias("window_start"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.last("av", ignorenulls=True).over(w).alias("filled_avg"),
    ).orderBy("event_type", "window_start")


@register(
    "rolling_zscore_anomalies",
    oracle=f"""
        WITH agg AS (
            SELECT event_type,
                   CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws,
                   avg(value) AS av
            FROM events GROUP BY 1, 2
        ), stats AS (
            SELECT event_type, ws, av,
                   avg(av) OVER w AS mu,
                   stddev_samp(av) OVER w AS sd,
                   count(*) OVER w AS nw
            FROM agg
            WINDOW w AS (
                PARTITION BY event_type ORDER BY ws
                ROWS BETWEEN {_Z_LOOKBACK} PRECEDING AND 1 PRECEDING
            )
        )
        SELECT event_type,
               ws AS window_start,
               ROUND(av, 4) AS hourly_avg,
               ROUND((av - mu) / sd, 4) AS zscore
        FROM stats
        WHERE nw >= {_Z_MIN_HISTORY} AND sd > 1e-9
          AND abs(ROUND((av - mu) / sd, 4)) >= {_Z_THRESHOLD}
        ORDER BY event_type, window_start
    """,
    # "extra": the 50-entry scored window is full (registry discipline);
    # the suite's oracle sweep still proves this against DuckDB
    tags=("timeseries", "anomaly", "extra"),
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection on hourly per-type series: a
    bucket is anomalous when its average sits ≥ 2σ from the trailing
    24-bucket mean (current bucket excluded, ≥ 12 buckets of warm-up so
    early noise can't fire). One hash-aggregate to hourly grain, then a
    single frame-bounded window per series — the series key has bounded
    cardinality, so the plan is two narrow shuffles at any SF; nothing
    is proportional to raw event count past the first aggregate.
    Reference parity: none (the reference's dashboards are
    threshold-free); this is the standard serving-layer alert query."""
    agg = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("ws")
        )
        .agg(F.avg("value").alias("av"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ws")
        .rowsBetween(-_Z_LOOKBACK, -1)
    )
    stats = agg.select(
        "event_type",
        "ws",
        "av",
        F.avg("av").over(w).alias("mu"),
        F.stddev_samp("av").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("nw"),
    )
    z = F.round((F.col("av") - F.col("mu")) / F.col("sd"), 4)
    return (
        stats.filter(
            (F.col("nw") >= _Z_MIN_HISTORY)
            & (F.col("sd") > 1e-9)
            & (F.abs(z) >= _Z_THRESHOLD)
        )
        .select(
            "event_type",
            F.col("ws").alias("window_start"),
            F.round("av", 4).alias("hourly_avg"),
            z.alias("zscore"),
        )
        .orderBy("event_type", "window_start")
    )
