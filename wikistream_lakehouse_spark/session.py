"""SparkSession factory and session-conf pinning.

The reference is UTC-everywhere (consumer stamps ``datetime.now(timezone.utc)``,
kafka/wiki-s3-consumer.py:47; Airflow cron is UTC, dag/wiki_pipeline_dag.py:63),
so the engine pins ``spark.sql.session.timeZone=UTC`` — this also keeps
``from_unixtime``/``to_date`` consistent with the DuckDB oracle.

Scale posture (100 TB design, local[N] test):
  * AQE on — runtime coalescing of shuffle partitions, skew-join splitting,
    and dynamic join-strategy switching replace hand-tuned partition counts.
  * ``shuffle.partitions`` is a *starting* value; AQE coalesces it down on
    small inputs and the advisory target keeps reducers ~64 MB at scale.
  * Arrow execution on — every Python-side exchange (pandas UDFs, toPandas)
    is columnar/batched, never row-at-a-time pickling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are safe to (re)apply on a live session (runtime-settable).
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~64MB post-shuffle partitions once AQE coalesces; sane at every SF.
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    # Parquet TIMESTAMP(NANOS) columns are not a Spark-native type; read
    # them as raw nanosecond longs so the loader can convert (lossless to
    # the microsecond). The fixtures have shipped `ts` as NANOS, as naive
    # micros (TIMESTAMP_NTZ), and could ship UTC micros (TIMESTAMP) — the
    # loader normalizes ALL of them (tscompat.to_utc_timestamp); this conf
    # only keeps the NANOS case readable at all.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Write timestamps as INT64 micros, not the legacy INT96 default:
    # INT96 carries NO parquet min/max statistics, which silently disables
    # row-group skipping AND file-level data skipping (lakehouse/skipping.py)
    # on every timestamp column.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
}


def ensure_session_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally created session.

    The correctness driver hands us its own SparkSession; every registered
    query funnels through this so UTC/AQE/Arrow hold regardless of who
    built the session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host; engine still functions
    return spark


def get_spark(
    app_name: str = "wikistream-lakehouse",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` for tests/bench;
    on a real cluster the caller passes the cluster master/URL and the same
    confs apply unchanged (nothing here is local-mode specific).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus in ("*", "") else max(int(cpus), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM IS every executor; Spark's 1g default
        # heap GC-thrashes a local[32] run long before data size is the
        # problem (first hit: the sf1 scaling sweep). Only effective when
        # this process launches the JVM — a host-provided session keeps
        # its own sizing.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_session_conf(spark)
