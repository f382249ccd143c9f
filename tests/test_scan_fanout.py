"""Small-scan fan-out (tables._small_scan_fanout, r14 guide §2.5/§6).

Single-row-group parquet bounds scan parallelism at 1 task; call sites
whose downstream map work is heavy JVM derivation opt in with
``table(..., fanout=True)`` to round-robin the scan out to the session
parallelism. OPT-IN, never a default: the same fan-out measured
consistently SLOWER for cheap columnar passes (extra exchange dominates)
and for Arrow/mapInPandas consumers (cores× Python worker round trips on
near-empty batches). The fan-out must: fire only inside its size band,
only when asked, honor the env kill-switch, and never change results.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.tables import _FANOUT_FLOOR_BYTES, table


@pytest.fixture(scope="module")
def big_sf_dir(spark, tmp_path_factory):
    """A synthetic sf_dir whose documents file exceeds the fan-out floor
    (the committed sf0.001 fixtures sit below it)."""
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
    return d


def _nparts(df) -> int:
    return df.rdd.getNumPartitions()


def test_fanout_is_opt_in(spark, big_sf_dir):
    path = os.path.join(big_sf_dir, "documents.parquet")
    size = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    assert size > _FANOUT_FLOOR_BYTES, "fixture must exceed the floor"
    # default: no fan-out even above the floor
    assert _nparts(table(spark, big_sf_dir, "documents")) == 1
    # explicit opt-in: session parallelism
    assert (
        _nparts(table(spark, big_sf_dir, "documents", fanout=True))
        == spark.sparkContext.defaultParallelism
    )


def test_env_kill_switch_disables(spark, big_sf_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SCAN_MB", "0")
    assert _nparts(table(spark, big_sf_dir, "documents", fanout=True)) == 1


def test_below_floor_stays_unsplit(spark, sf_dir):
    # committed sf0.001 documents is ~64 KB < floor: opt-in is a no-op
    assert _nparts(table(spark, sf_dir, "documents", fanout=True)) == 1


def test_fanout_never_changes_results(spark, big_sf_dir):
    def agg(fanout):
        return (
            table(spark, big_sf_dir, "documents", fanout=fanout)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("chars"))
            .orderBy("lang")
            .collect()
        )

    assert agg(True) == agg(False)


# Every call site that opts into the fan-out (grep `fanout=True`).
_OPTED_IN = [
    "ngram_jaccard_pairs",
    "dup_span_stats",
    "substring_dup_coverage",
    "span_dedup_filter",
    "cosine_topk_bruteforce",
    "embedding_cosine_pairs",
    "json_props_extract",
]


def test_opted_in_queries_match_oracle_with_fanout_live(spark, monkeypatch):
    """VERDICT r14 (b): the driver's oracle runs at sf0.01, where every
    fixture file sits below the 256 KB fan-out floor — so the gate never
    exercises the repartitioned path. Force the floor to 0 and re-prove
    every opted-in query against its DuckDB oracle at sf0.01 with the
    fan-out LIVE (the repartition changes row order; an order-sensitive
    query would only fail here)."""
    from conftest import assert_matches_oracle

    from wikistream_lakehouse_spark.queries import all_queries

    sf01 = "/root/testdata/sf0.01"
    monkeypatch.setenv("SPARK_GRAFT_SMALL_SCAN_FLOOR_KB", "0")
    # prove the fan-out is actually live under the forced floor
    assert (
        table(spark, sf01, "documents", fanout=True).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    qs = all_queries()
    for name in _OPTED_IN:
        q = qs[name]
        assert q.oracle is not None, name
        assert_matches_oracle(q.build(spark, sf01), q.oracle, sf01)
