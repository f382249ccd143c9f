"""Persisted IVF index: search equals the train-inline operator, reads
only the probed cluster partitions, and the index is rebuild-stable."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.ivf import (
    build_ivf_index,
    ivf_topk,
    search_ivf_index,
)
from wikistream_lakehouse_spark.tables import table

K_CLUSTERS, N_PROBE, TOP_K, N_QUERIES = 8, 3, 5, 10


@pytest.fixture(scope="module")
def index(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    e = table(spark, sf_dir, "embeddings")
    build_ivf_index(e, path, "vec_id", "embedding", k_clusters=K_CLUSTERS)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return e, q, path


def test_search_matches_inline_operator(spark, index):
    e, q, path = index
    direct = ivf_topk(
        e, q, "vec_id", "embedding", "query_id",
        k_clusters=K_CLUSTERS, n_probe=N_PROBE, top_k=TOP_K,
    ).collect()
    via_index = search_ivf_index(
        q, path, "vec_id", "embedding", "query_id",
        n_probe=N_PROBE, top_k=TOP_K,
    ).collect()
    assert [tuple(r) for r in via_index] == [tuple(r) for r in direct]


def test_search_reads_only_probed_partitions(spark, index):
    _e, q, path = index
    one_q = q.limit(1)
    res = search_ivf_index(
        one_q, path, "vec_id", "embedding", "query_id",
        n_probe=2, top_k=TOP_K,
    )
    # the probed-cluster isin predicate must reach the lists scan as a
    # PARTITION filter (directory pruning), not a post-scan row filter
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cluster" in ln and "IN" in ln for ln in pf), pf


def test_rebuild_is_deterministic(spark, sf_dir, index, tmp_path):
    e, q, path = index
    path2 = str(tmp_path / "index2")
    build_ivf_index(e, path2, "vec_id", "embedding", k_clusters=K_CLUSTERS)
    a = search_ivf_index(
        q, path, "vec_id", "embedding", "query_id", n_probe=N_PROBE, top_k=TOP_K
    ).collect()
    b = search_ivf_index(
        q, path2, "vec_id", "embedding", "query_id", n_probe=N_PROBE, top_k=TOP_K
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
