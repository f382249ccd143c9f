"""GENERATED ALWAYS AS columns (txn.set_generated_column): ingest
writes compute the column when omitted and validate it (null-safe
equality) when supplied, so `col <=> expr` holds for every committed
row — the Delta generated-column contract, whose classic use is a
derived partition key writers can't drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _df(spark, rows, schema="k long, ts timestamp"):
    return spark.createDataFrame(rows, schema)


from datetime import datetime

T1 = datetime(2024, 1, 15, 10, 0, 0)
T2 = datetime(2024, 1, 16, 3, 0, 0)


def test_omitted_column_is_computed_and_partitions_the_table(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")
    txn.append(
        _df(spark, [(1, T1), (2, T2)]), t, partition_by=["ds"]
    )
    # partition-value inference may type ds= as DATE — compare as text
    got = {(r.k, str(r.ds)) for r in txn.read_table(spark, t).collect()}
    assert got == {(1, "2024-01-15"), (2, "2024-01-16")}
    # the generated column is a real hive partition: files land under ds=
    files = txn._replay_state(t, txn.current_version(t))[0]
    assert all("/ds=2024-01-1" in f for f in files)


def test_supplied_matching_value_passes_wrong_value_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")
    ok = spark.createDataFrame(
        [(1, T1, "2024-01-15")], "k long, ts timestamp, ds string"
    )
    txn.append(ok, t)
    bad = spark.createDataFrame(
        [(2, T2, "1999-12-31")], "k long, ts timestamp, ds string"
    )
    with pytest.raises(txn.ConstraintViolation, match="GENERATED"):
        txn.append(bad, t)
    assert txn.read_table(spark, t).count() == 1  # nothing leaked


def test_merge_paths_enforce_generation(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")
    txn.append(_df(spark, [(1, T1)]), t)
    # MoR merge with the column omitted: computed
    txn.merge_on_read_upsert(spark, t, _df(spark, [(2, T2)]), keys=["k"])
    got = {(r.k, r.ds) for r in txn.read_table(spark, t).collect()}
    assert got == {(1, "2024-01-15"), (2, "2024-01-16")}
    # rewrite merge with a WRONG supplied value: refused
    bad = spark.createDataFrame(
        [(3, T1, "2000-01-01")], "k long, ts timestamp, ds string"
    )
    with pytest.raises(txn.ConstraintViolation, match="GENERATED"):
        txn.transactional_upsert(spark, t, bad, keys=["k"])


def test_declaring_on_dirty_table_validates_existing_rows(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame(
            [(1, T1, "2024-01-15"), (2, T2, "wrong")],
            "k long, ts timestamp, ds string",
        ),
        t,
    )
    with pytest.raises(txn.ConstraintViolation, match="existing row"):
        txn.set_generated_column(
            spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')"
        )
    # a DV delete of the offending row clears the path
    txn.delete_where(spark, t, "k = 2", mode="mor")
    txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")
    assert txn.generated_columns(t) == {"ds": "date_format(ts, 'yyyy-MM-dd')"}


def test_declaring_missing_column_on_nonempty_table_refused(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, T1)]), t)
    with pytest.raises(ValueError, match="does not exist"):
        txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")


def test_drop_stops_generation_and_feed_skips_metadata_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_generated_column(spark, t, "ds", "date_format(ts, 'yyyy-MM-dd')")
    txn.append(_df(spark, [(1, T1)]), t)
    base = txn.current_version(t)
    txn.drop_generated_column(t, "ds")
    # change feed: the metadata commit is invisible
    assert txn.table_changes(spark, t, base).count() == 0
    # generation stopped: an append without ds now fails the schema check
    with pytest.raises(Exception):
        txn.append(_df(spark, [(2, T2)]), t)
