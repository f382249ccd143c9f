"""Scale-utility tests: salted join correctness, bucketed co-located joins
(no Exchange in the plan), hyperplane bucket implementation equivalence,
schema evolution via mergeSchema (the Glue-crawler replacement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plan_quality import plan_of
from wikistream_lakehouse_spark.functions.vectors import (
    hyperplane_buckets,
    hyperplane_buckets_pandas,
)
from wikistream_lakehouse_spark.operators.scale import (
    read_table,
    salted_join,
    write_bucketed,
)
from wikistream_lakehouse_spark.tables import table


def test_salted_join_equals_plain_join(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    o = o.withColumnRenamed("o_orderkey", "l_orderkey")
    plain = l.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(l, o, "l_orderkey", salt=8).groupBy("o_orderpriority").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    out = salted_join(left, right, "k", salt=4, how="left").collect()
    got = {(r.k, r.w) for r in out}
    assert got == {(1, "x"), (2, "y"), (99, None)}
    assert len(out) == 3  # replication must not duplicate left rows


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Co-bucketed tables join without a shuffle: the Exchange that a plain
    parquet join needs is absent from the physical plan."""
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(l, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "b_orders",
        "l_orderkey", n_buckets=8,
    )
    bl, bo = read_table(spark, "b_lineitem"), read_table(spark, "b_orders")
    # at tiny SF the planner prefers broadcast; disable it to surface the
    # co-located sort-merge path the bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, "l_orderkey")
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not shuffle"
        )
        assert "Bucketed: true" in plan
        expected = l.count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_hyperplane_bucket_impls_agree(spark, sf_dir):
    """The join-based (pure JVM) and mapInPandas (BLAS) bucket computations
    are the same function — identical planes, identical sign bits (up to
    FP summation order on near-zero dots)."""
    e = table(spark, sf_dir, "embeddings").limit(300)
    a = {
        (r.vec_id, r.t): r.bucket
        for r in hyperplane_buckets(
            e, "vec_id", "embedding", dim=64, n_tables=4, n_planes=4
        ).collect()
    }
    b = {
        (r.vec_id, r.t): r.bucket
        for r in hyperplane_buckets_pandas(
            e, "vec_id", "embedding", dim=64, n_tables=4, n_planes=4
        ).collect()
    }
    assert a.keys() == b.keys()
    agree = sum(1 for k in a if a[k] == b[k])
    assert agree / len(a) >= 0.99  # near-zero dots may flip a rare bit


def test_schema_evolution_merge_schema(spark, tmp_path):
    """The Glue-crawler role (re-inferring evolved raw schema,
    dag/wiki_pipeline_dag.py:69-73) becomes parquet mergeSchema: new
    columns appear, old files read them as null."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 3.5}
