"""Small-scan fan-out (tables._small_scan_fanout, r14 guide §2.5/§6).

Single-row-group parquet bounds scan parallelism at 1 task; the loader
round-robins small heavy-derivation tables (documents, embeddings) out
to the session parallelism. The fan-out must: fire only inside its size
band, only for the heavy-derivation tables (relational facts measured
SLOWER with it), honor the env kill-switch, and never change results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.tables import _FANOUT_FLOOR_BYTES, table


@pytest.fixture(scope="module")
def big_sf_dir(spark, tmp_path_factory):
    """A synthetic sf_dir whose documents/lineitem files exceed the
    fan-out floor (the committed sf0.001 fixtures sit below it)."""
    d = str(tmp_path_factory.mktemp("fanout_sf"))
    # high-entropy text so the parquet file lands ABOVE the fan-out floor
    # after compression (a repeated pad compresses below it)
    text = F.concat_ws(
        " ", *[F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(i))), 256)
               for i in range(8)]
    )
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length(text).alias("n_chars"),
    )
    docs.coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
    docs.selectExpr(
        "doc_id as l_orderkey", "text as l_comment"
    ).coalesce(1).write.parquet(os.path.join(d, "lineitem.parquet"))
    return d


def _nparts(df) -> int:
    return df.rdd.getNumPartitions()


def test_documents_fan_out_to_session_parallelism(spark, big_sf_dir):
    path = os.path.join(big_sf_dir, "documents.parquet")
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    assert size > _FANOUT_FLOOR_BYTES, "fixture must exceed the floor"
    df = table(spark, big_sf_dir, "documents")
    assert _nparts(df) == spark.sparkContext.defaultParallelism


def test_relational_tables_do_not_fan_out(spark, big_sf_dir):
    df = table(spark, big_sf_dir, "lineitem")
    assert _nparts(df) == 1


def test_explicit_fanout_overrides(spark, big_sf_dir):
    assert (
        _nparts(table(spark, big_sf_dir, "lineitem", fanout=True))
        == spark.sparkContext.defaultParallelism
    )
    assert _nparts(table(spark, big_sf_dir, "documents", fanout=False)) == 1


def test_env_kill_switch_disables(spark, big_sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SCAN_MB", "0")
    assert _nparts(table(spark, big_sf_dir, "documents")) == 1


def test_below_floor_stays_unsplit(spark, sf_dir):
    # committed sf0.001 documents is ~64 KB < floor: no fan-out
    assert _nparts(table(spark, sf_dir, "documents")) == 1


def test_fanout_never_changes_results(spark, big_sf_dir, monkeypatch):
    q = (
        table(spark, big_sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .orderBy("lang")
    )
    with_fanout = q.collect()
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SCAN_MB", "0")
    q2 = (
        table(spark, big_sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
        .orderBy("lang")
    )
    assert with_fanout == q2.collect()
