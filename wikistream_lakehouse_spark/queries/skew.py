"""Skew-mitigated queries (VERDICT r4 #6): the scale.salted_join
operator exercised inside a REGISTERED, oracle-checked query rather
than only the synthetic harness (tests/test_skew.py).

The shape mirrors the reference dashboard's "Other 941,690" bucket —
real event streams are zipfian, and the dominant bucket is usually a
collapsed default ("anonymous" users, a null-ish key). A plain equi-join
sends every hot-key row to ONE reducer; ``salted_join`` spreads it over
``salt`` sub-keys with identical semantics, which is why the oracle SQL
below is a plain join — salting must be invisible in the result.

Plan shape pinned in tests/test_plan_quality.py: the executed join keys
include the synthetic ``_salt`` column (mitigation present), and the
post-join aggregation still partial-aggregates map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.scale import salted_join
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


def _cohort_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ~90% of rows collapsed into the anonymous cohort (-1)
    — rank-1-dominant, the distribution AQE's splitter or salting must
    handle at 100 TB."""
    return table(spark, sf_dir, "events").withColumn(
        "cohort",
        F.when(F.col("user_id") % 10 == 0, F.col("user_id")).otherwise(
            F.lit(-1).cast("bigint")
        ),
    )


def _cohort_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort dimension: customers by key plus the anonymous bucket.
    Small enough to broadcast at test scale — deliberately joined
    UN-broadcast (salted) because the query documents the 100 TB case
    where the dim outgrows the broadcast threshold."""
    customer = table(spark, sf_dir, "customer")
    dim = customer.select(
        F.col("c_custkey").alias("cohort"),
        F.col("c_mktsegment").alias("segment"),
    )
    anon = spark.createDataFrame([(-1, "ANONYMOUS")], "cohort long, segment string")
    return dim.unionByName(anon)


@register(
    "skewed_cohort_stats",
    oracle="""
        WITH cohorts AS (
            SELECT CASE WHEN user_id % 10 = 0 THEN user_id ELSE -1 END AS cohort,
                   value
            FROM events
        ), dim AS (
            SELECT c_custkey AS cohort, c_mktsegment AS segment FROM customer
            UNION ALL
            SELECT -1, 'ANONYMOUS'
        )
        SELECT c.cohort,
               d.segment,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(c.value), 2) AS total_value
        FROM cohorts c JOIN dim d USING (cohort)
        GROUP BY c.cohort, d.segment
        ORDER BY c.cohort, d.segment
    """,
    tags=("skew", "extra"),  # scored window is full; oracle-checked in pytest
)
def skewed_cohort_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-hot-key aggregation join, skew-mitigated by salting: the
    anonymous cohort (~90% of events) would otherwise hash to a single
    reducer; salted_join spreads it over 16 sub-keys while producing
    EXACTLY the rows of the plain join the oracle runs. The follow-up
    groupBy re-concentrates the hot key but partial (map-side) hash
    aggregation collapses it before the exchange — the standard two-step
    answer to skew that survives into an aggregation."""
    events = _cohort_events(spark, sf_dir)
    dim = _cohort_dim(spark, sf_dir)
    joined = salted_join(events, dim, "cohort", salt=16)
    return (
        joined.groupBy("cohort", "segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("cohort", "segment")
    )
