"""Point lookups that open O(matching files): skipping.point_lookup
composes partition-value, Bloom, and envelope pruning from log metadata
and must (a) return exactly the full-scan-filter rows, (b) provably
read a small candidate set on every layout the pruning faces cover."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.skipping import point_lookup


def _expected(spark, path, cond):
    return sorted(
        map(tuple, txn.read_table(spark, path).filter(cond).collect())
    )


def test_partition_key_prunes_to_the_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("ds"),
        (F.col("id") * 1.5).alias("v"),
    )
    for r in range(3):  # one commit per partition value → 3+ files
        txn.append(
            df.filter(F.col("ds") == str(r)), path, partition_by=["ds"]
        )
    got, n_read, n_total = point_lookup(
        spark, path, {"ds": "1", "k": 100}
    )
    assert sorted(map(tuple, got.collect())) == _expected(
        spark, path, "ds = '1' AND k = 100"
    )
    assert n_total >= 3
    ds1 = [
        f
        for f in txn._replay(path, txn.current_version(path))
        if "ds=1" in f
    ]
    assert n_read <= len(ds1) < n_total


def test_envelope_pruning_on_clustered_key(spark, tmp_path):
    path = str(tmp_path / "t")
    # 8 appends of disjoint k ranges → tight per-file envelopes
    for i in range(8):
        txn.append(
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k"), F.lit(float(i)).alias("v"))
            .coalesce(1),
            path,
            stats_cols=["k"],
        )
    got, n_read, n_total = point_lookup(spark, path, {"k": 345})
    assert sorted(map(tuple, got.collect())) == _expected(
        spark, path, "k = 345"
    )
    assert n_total == 8 and n_read == 1


def test_bloom_pruning_on_random_uuid_keys(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.set_stats_columns(path, ["uid"])
    rows = [(uuid.UUID(int=i * 2654435761 % (1 << 128)).hex, i)
            for i in range(400)]
    for c in range(4):  # every file spans the uuid space: envelopes useless
        txn.append(
            spark.createDataFrame(
                rows[c * 100 : (c + 1) * 100], "uid string, n long"
            ).coalesce(1),
            path,
        )
    target = rows[250][0]
    got, n_read, n_total = point_lookup(spark, path, {"uid": target})
    assert [tuple(r) for r in got.collect()] == [(target, 250)]
    assert n_total == 4 and n_read < 4  # blooms prune where envelopes can't


def test_mor_deleted_key_returns_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(
        spark.range(0, 50).select(
            F.col("id").alias("k"), F.lit(1.0).alias("v")
        ),
        path,
    )
    txn.delete_where(spark, path, "k = 7", mode="mor")
    got, _, _ = point_lookup(spark, path, {"k": 7})
    assert got.count() == 0
    still, _, _ = point_lookup(spark, path, {"k": 8})
    assert still.count() == 1


def test_column_mapping_lookup_by_logical_name(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"), F.lit(2.0).alias("v")
        ),
        path,
    )
    txn.rename_column(spark, path, "k", "key_id")
    got, _, _ = point_lookup(spark, path, {"key_id": 5})
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["key_id"] == 5
    assert sorted(got.columns) == ["key_id", "v"]


def test_absent_key_empty_with_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        txn.append(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id").alias("k"), F.lit(0.0).alias("v")
            ),
            path,
            stats_cols=["k"],
        )
    got, n_read, n_total = point_lookup(spark, path, {"k": 10_000})
    assert got.count() == 0
    assert sorted(got.columns) == ["k", "v"]
    assert n_read == 0 and n_total >= 4  # pruned to nothing, zero IO


def test_unknown_column_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(
        spark.range(0, 5).select(F.col("id").alias("k")), path
    )
    with pytest.raises(ValueError, match="unknown lookup column"):
        point_lookup(spark, path, {"nope": 1})
