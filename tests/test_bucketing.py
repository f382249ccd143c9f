"""Bucketed co-located joins (operators/scale.write_bucketed),
the persisted-shuffle layout. The scale
claim under test is structural — two tables bucketed on the join key
with equal bucket counts join with ZERO Exchange operators (the shuffle
was paid once at write), while the same join over plain parquet
shuffles both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.scale import (
    bucket_spec,
    exchange_count,
    write_bucketed,
)
from wikistream_lakehouse_spark.tables import table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    """orders + customer bucketed by custkey into the catalog."""
    root = tmp_path_factory.mktemp("buckets")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    write_bucketed(
        o, "orders_b", ["o_custkey"], n_buckets=8, sort_by=["o_custkey"],
        path=str(root / "orders_b"),
    )
    write_bucketed(
        c, "customer_b", ["c_custkey"], n_buckets=8, sort_by=["c_custkey"],
        path=str(root / "customer_b"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the Exchange comparison is apples to
    apples (broadcast would hide the shuffle on the small side)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_spec_round_trips(spark, bucketed):
    spec = bucket_spec(spark, "orders_b")
    assert spec == {
        "buckets": 8, "keys": ["o_custkey"], "sort_by": ["o_custkey"],
    }


def test_colocated_join_elides_all_exchanges(spark, sf_dir, bucketed, no_broadcast):
    ob, cb = spark.table("orders_b"), spark.table("customer_b")
    j = ob.join(cb, ob.o_custkey == cb.c_custkey)
    assert exchange_count(j) == 0

    # the identical join over plain parquet shuffles BOTH sides
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    plain = o.join(c, o.o_custkey == c.c_custkey)
    assert exchange_count(plain) == 2

    # same rows either way — layout must never change semantics
    assert j.count() == plain.count()
    checksum = F.sum(F.hash("o_orderkey", "c_name")).alias("h")
    assert j.agg(checksum).first() == plain.agg(checksum).first()


def test_one_sided_bucket_shuffles_only_the_other_side(
    spark, sf_dir, bucketed, no_broadcast
):
    ob = spark.table("orders_b")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = ob.join(c, ob.o_custkey == c.c_custkey)
    # the bucketed fact side stays in place; only the plain side moves
    assert exchange_count(j) == 1


def test_groupby_bucket_key_elides_exchange(spark, bucketed, no_broadcast):
    ob = spark.table("orders_b")
    agg = ob.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("spend"))
    assert exchange_count(agg) == 0


def test_rejects_missing_key(spark, sf_dir):
    df = table(spark, sf_dir, "region")
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_bucketed(df, "nope_b", ["no_such_col"], n_buckets=4)


def test_append_mode_preserves_existing_rows(spark, tmp_path):
    """mode='append' must ADD to a bucketed table — the unconditional
    DROP used to silently destroy all prior data (ADVICE r5)."""
    df1 = spark.range(0, 10).select(F.col("id").alias("k"))
    df2 = spark.range(10, 15).select(F.col("id").alias("k"))
    try:
        write_bucketed(df1, "appendable_b", ["k"], n_buckets=4,
                       path=str(tmp_path / "b"))
        write_bucketed(df2, "appendable_b", ["k"], n_buckets=4,
                       path=str(tmp_path / "b"), mode="append")
        got = sorted(r.k for r in spark.table("appendable_b").collect())
        assert got == list(range(15))
        # layout still intact for the co-location contract
        assert bucket_spec(spark, "appendable_b")["buckets"] == 4
    finally:
        spark.sql("DROP TABLE IF EXISTS appendable_b")


def test_append_mode_refuses_mismatched_layout(spark, tmp_path):
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    try:
        write_bucketed(df, "mismatch_b", ["k"], n_buckets=4,
                       path=str(tmp_path / "b"))
        with pytest.raises(ValueError, match="layout mismatch"):
            write_bucketed(df, "mismatch_b", ["k"], n_buckets=8,
                           path=str(tmp_path / "b"), mode="append")
    finally:
        spark.sql("DROP TABLE IF EXISTS mismatch_b")
