"""Skew-stress harness (VERDICT r2 #2): a seeded zipf fixture, proof
that AQE's skew-join splitter engages on the hot key, and a
timing+equality win for `salted_join` where AQE's splitter is off.

The sandbox fixtures are uniform-ish; real wiki/user data is zipfian
(the reference dashboard's "Other 941,690" bucket is a skew artifact).
These tests pin the engine's two answers to that: AQE runtime re-plan
for plain joins, explicit salting when the downstream shape defeats AQE.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.scale import salted_join, zipf_rows

N_ROWS = 2_000_000
N_KEYS = 50_000


@contextmanager
def spark_confs(spark, confs: dict[str, str]):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="module")
def skewed(spark, tmp_path_factory):
    """Materialized zipf fixture: rank-1 key dominates the left side;
    the right side is a uniform per-key table too big to broadcast at
    the test thresholds."""
    base = tmp_path_factory.mktemp("skew")
    lpath, rpath = str(base / "left"), str(base / "right")
    zipf_rows(spark, N_ROWS, N_KEYS, s=1.2, seed=42).write.parquet(lpath)
    (
        spark.range(N_KEYS)
        .select(
            F.col("id").alias("key"),
            F.concat(F.lit("dim_"), F.col("id")).alias("dim"),
        )
        .write.parquet(rpath)
    )
    return lpath, rpath


def test_zipf_fixture_is_skewed_and_deterministic(spark, skewed):
    lpath, _ = skewed
    left = spark.read.parquet(lpath)
    top = (
        left.groupBy("key")
        .count()
        .orderBy(F.desc("count"), "key")
        .limit(3)
        .collect()
    )
    # rank-1 key holds a disproportionate share (>20% of all rows at
    # s=1.2) and the law is monotone-decreasing in rank
    assert top[0]["key"] == 0
    assert top[0]["count"] > 0.2 * N_ROWS
    assert top[0]["count"] > top[1]["count"] > top[2]["count"]
    # seeded: regeneration is bit-identical
    again = zipf_rows(spark, N_ROWS, N_KEYS, s=1.2, seed=42)
    assert (
        again.agg(F.sum(F.hash("key"))).first()[0]
        == left.agg(F.sum(F.hash("key"))).first()[0]
    )


def test_aqe_splits_the_skewed_join_partition(spark, skewed):
    """With AQE skew-join on (and test-scale thresholds), the executed
    plan's sort-merge join is marked skew=true — the runtime splitter
    engaged on the hot key's oversized partition."""
    lpath, rpath = skewed
    with spark_confs(
        spark,
        {
            "spark.sql.adaptive.enabled": "true",
            "spark.sql.adaptive.skewJoin.enabled": "true",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        left = spark.read.parquet(lpath)
        right = spark.read.parquet(rpath)
        joined = left.join(right, "key").select("key", "value", "dim")
        # Execute the DataFrame's OWN QueryExecution (a noop-sink write
        # plans a separate one, leaving this plan isFinalPlan=false) so
        # AQE finalizes it; .execute().count() stays JVM-side.
        n = joined._jdf.queryExecution().executedPlan().execute().count()
        final = joined._jdf.queryExecution().executedPlan().toString()
    assert n == N_ROWS
    assert "isFinalPlan=true" in final
    assert "skew=true" in final, final[:2000]


_SALT_CONFS = {
    "spark.sql.adaptive.skewJoin.enabled": "false",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "32",
}


def _join_shapes(spark, skewed):
    lpath, rpath = skewed
    left = spark.read.parquet(lpath)
    right = spark.read.parquet(rpath)
    plain = left.join(right, "key").select("key", "value", "dim")
    salted = salted_join(left, right, "key", salt=32).select(
        "key", "value", "dim"
    )
    return plain, salted


def _max_partition_share(df) -> float:
    """Share of output rows held by the fullest shuffle partition.
    ``spark_partition_id()`` is evaluated in the post-join stage (before
    the measuring groupBy's own shuffle), so this reads the JOIN's
    reducer distribution — the thing salting exists to flatten."""
    counts = [
        r["n"]
        for r in df.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return max(counts) / sum(counts)


def test_salted_join_spreads_the_hot_key_when_aqe_cannot_split(spark, skewed):
    """Where AQE's splitter is unavailable (off here; in production:
    skew surviving into a same-key aggregation, or pre-3.0 clusters),
    salting spreads the hot key over `salt` reducers. Asserted on the
    MECHANISM — per-shuffle-partition row distribution — not wall-clock
    (VERDICT r4 #1: a 10% timing margin is not noise-proof under suite
    load). The hot key holds >20% of rows, so the plain join's fullest
    reducer holds >20% of the output while the salted join's is near
    uniform (~1/32)."""
    with spark_confs(spark, _SALT_CONFS):
        plain, salted = _join_shapes(spark, skewed)

        # identical rows first — salting must not change semantics
        checksum = F.sum(F.hash("key", "dim")).alias("h")
        assert (
            plain.agg(F.count("*"), checksum).first()
            == salted.agg(F.count("*"), checksum).first()
        )

        plain_share = _max_partition_share(plain)
        salted_share = _max_partition_share(salted)
    assert plain_share > 0.20, plain_share  # one reducer owns the hot key
    assert salted_share < 0.08, salted_share  # spread ≈ uniform over 32
    assert salted_share < plain_share / 2.5, (plain_share, salted_share)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_TIMING_TESTS"),
    reason="wall-clock perf harness: a 10% margin on a sub-second run is "
    "not noise-proof under concurrent suite/host load (it failed inside "
    "a full-suite run while passing alone). The correctness gate is the "
    "mechanism test above; set SPARK_GRAFT_TIMING_TESTS=1 to run the "
    "timing claim on a quiet host.",
)
def test_salted_join_beats_plain_join_wall_clock(spark, skewed):
    """The timing claim, kept under the slow marker where it runs
    without suite-load interference: same rows, less wall-clock."""
    with spark_confs(spark, _SALT_CONFS):
        plain, salted = _join_shapes(spark, skewed)

        def run(df):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        run(plain), run(salted)  # warm both shapes
        t_plain = sorted(run(plain) for _ in range(3))[1]
        t_salted = sorted(run(salted) for _ in range(3))[1]
    assert t_salted < t_plain * 0.9, (t_plain, t_salted)
