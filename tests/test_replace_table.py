"""txn.replace_table (INSERT OVERWRITE / CREATE OR REPLACE semantics)
and its interplay with time travel, restore, partition layout, and the
physical-schema stamp."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.interop import read_snapshot_duckdb


def _ab(spark, n, tag=None):
    df = spark.range(0, n).select(
        F.col("id").alias("a"), (F.col("id") * 2.0).alias("b")
    )
    if tag is not None:
        df = df.withColumn("tag", F.lit(tag))
    return df.coalesce(1)


def test_replace_swaps_schema_in_one_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 10), path)
    v = txn.replace_table(
        spark,
        path,
        spark.range(0, 7).select(
            F.col("id").alias("x"), F.lit("n").alias("y")
        ),
    )
    assert v == 1
    now = txn.read_table(spark, path)
    assert sorted(now.columns) == ["x", "y"] and now.count() == 7
    old = txn.read_table(spark, path, version=0)
    assert sorted(old.columns) == ["a", "b"] and old.count() == 10


def test_replace_changes_partition_layout_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 10, tag="p"), path)  # unpartitioned
    txn.replace_table(
        spark,
        path,
        spark.range(0, 8).select(
            F.col("id").alias("a"),
            (F.col("id") % 2).cast("string").alias("tag"),
        ),
        partition_by=["tag"],
    )
    files = txn._replay(path, txn.current_version(path))
    assert all("tag=" in f for f in files)  # no mixed layout
    assert txn.read_table(spark, path).count() == 8
    # normal writes now inherit the NEW layout
    txn.append(
        spark.createDataFrame([(99, "9")], "a long, tag string"), path
    )
    assert txn.read_table(spark, path).count() == 9


def test_replace_applies_dv_deletes_physically(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 20), path)
    txn.delete_where(spark, path, "a < 5", mode="mor")
    txn.replace_table(spark, path, _ab(spark, 3))
    assert txn.read_table(spark, path).count() == 3
    # DVs retired: no active vectors at HEAD
    assert txn._replay_state(path, txn.current_version(path))[1] == []


def test_replace_creates_missing_table(spark, tmp_path):
    path = str(tmp_path / "t")
    v = txn.replace_table(spark, path, _ab(spark, 4))
    assert v == 0 and txn.read_table(spark, path).count() == 4


def test_restore_over_schema_changing_replace(spark, tmp_path):
    """The restore must roll the physical-schema stamp back with the
    data: after restoring over a replace, reads and the stamp authority
    serve the ORIGINAL schema."""
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 10), path)  # v0: (a, b)
    txn.replace_table(
        spark, path, spark.range(3).select(F.col("id").alias("x"))
    )  # v1: (x)
    txn.restore(path, version=0)  # v2
    got = txn.read_table(spark, path)
    assert sorted(got.columns) == ["a", "b"] and got.count() == 10
    types = txn._stamped_physical_types(path)
    assert set(types) == {"a", "b"}, (
        "stamp authority must follow the restore, not the replaced schema"
    )
    # and the independent DuckDB planner agrees
    tbl = read_snapshot_duckdb(path)
    assert sorted(tbl.column_names) == ["a", "b"] and tbl.num_rows == 10


def test_duckdb_reads_schema_changing_replace(spark, tmp_path):
    """The interop stamp union resets at the full-state replace: the
    dropped column must not leak into the DuckDB projection."""
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 10), path)
    txn.replace_table(
        spark,
        path,
        spark.range(5).select(
            F.col("id").alias("x"), F.lit(1.5).alias("y")
        ),
    )
    tbl = read_snapshot_duckdb(path)
    assert sorted(tbl.column_names) == ["x", "y"] and tbl.num_rows == 5
    old = read_snapshot_duckdb(path, version=0)
    assert sorted(old.column_names) == ["a", "b"] and old.num_rows == 10


def test_replace_races_with_append(spark, tmp_path):
    """A replace losing its commit race retries onto the new head —
    the final state is exactly the replacement frame."""
    path = str(tmp_path / "t")
    txn.append(_ab(spark, 10), path)
    real_rewrite = txn.rewrite
    raced = {"done": False}

    def racing_rewrite(df, table_path, base_version, **kw):
        if not raced["done"]:
            raced["done"] = True
            txn.append(_ab(spark, 5), table_path)  # steal the version
        return real_rewrite(df, table_path, base_version, **kw)

    import unittest.mock as mock

    with mock.patch.object(txn, "rewrite", side_effect=racing_rewrite):
        v = txn.replace_table(spark, path, _ab(spark, 2))
    assert raced["done"] and v == txn.current_version(path)
    assert txn.read_table(spark, path).count() == 2


def test_drop_table_removes_everything(spark, tmp_path):
    import os

    path = str(tmp_path / "t")
    txn.append(_ab(spark, 5), path)
    txn.checkpoint(path)
    txn.drop_table(path)
    assert txn.current_version(path) < 0
    assert not os.path.exists(path)


def test_replace_resets_column_mapping_namespace(spark, tmp_path):
    """CREATE OR REPLACE starts a FRESH physical namespace: a name the
    old table retired (renamed-away or dropped) is usable again, since
    no old file survives the replace; reads BEFORE the replace still
    serve the old mapping (the reset is replay-positional)."""
    from wikistream_lakehouse_spark.lakehouse import txn

    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, 2.0)], "k long, v double"), t
    )
    txn.rename_column(spark, t, "v", "price")  # retires physical 'v'
    assert txn.read_table(spark, t).columns == ["k", "price"]
    # re-introducing 'v' via replace was refused before the reset rule
    v = txn.replace_table(
        spark,
        t,
        spark.createDataFrame([(9, 9.0)], "k long, v double"),
    )
    tbl = txn.read_table(spark, t)
    assert tbl.columns == ["k", "v"]
    assert tbl.first().v == 9.0
    # pre-replace versions keep their own names
    assert txn.read_table(spark, t, version=1).columns == ["k", "price"]
    # and the new namespace supports its own fresh rename cycle
    txn.rename_column(spark, t, "v", "cost")
    assert txn.read_table(spark, t).columns == ["k", "cost"]
    assert v >= 2
