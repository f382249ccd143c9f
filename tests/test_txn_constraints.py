"""CHECK constraints on the transactional layer (txn.set_constraint /
drop_constraint): Delta-invariant semantics — existing data validated
once at ADD time, every subsequent write validated against its WRITTEN
files only (O(new data), never a table rescan), violations rejected
BEFORE the commit so the table never exposes a bad row and the
conflicted data files are cleaned up. SQL CHECK semantics: a row
violates only when the expression is FALSE; NULL passes."""

from __future__ import annotations

import os

import pytest

from wikistream_lakehouse_spark.lakehouse.txn import (
    ConstraintViolation,
    append,
    constraints,
    current_version,
    drop_constraint,
    history,
    read_table,
    replace_partitions,
    restore,
    set_constraint,
    table_changes,
    transactional_upsert,
    update_where,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v double")


def _parquet_count(table_path):
    n = 0
    for root, _dirs, files in os.walk(table_path):
        if "_txnlog" in root:
            continue
        n += sum(f.endswith(".parquet") for f in files)
    return n


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)  # v0
    set_constraint(spark, t, "v_positive", "v > 0")  # v1 (metadata)
    return t


def test_set_lists_and_drop(spark, table):
    assert constraints(table) == {"v_positive": "v > 0"}
    drop_constraint(table, "v_positive")
    assert constraints(table) == {}
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(table, "nope")


def test_violating_append_rejected_before_commit(spark, table):
    v_before, files_before = current_version(table), _parquet_count(table)
    with pytest.raises(ConstraintViolation, match="v_positive"):
        append(_df(spark, [(3, "c", -1.0)]), table)
    # nothing committed, no leaked data files
    assert current_version(table) == v_before
    assert _parquet_count(table) == files_before
    # a clean append still lands
    append(_df(spark, [(3, "c", 3.0)]), table)
    assert read_table(spark, table).count() == 3


def test_null_passes_check_semantics(spark, table):
    append(_df(spark, [(4, "d", None)]), table)  # NULL satisfies v > 0
    assert read_table(spark, table).count() == 3


def test_add_constraint_validates_existing_data(spark, tmp_path):
    t = str(tmp_path / "dirty")
    append(_df(spark, [(1, "a", -5.0)]), t)
    with pytest.raises(ConstraintViolation, match="existing"):
        set_constraint(spark, t, "v_positive", "v > 0")
    assert constraints(t) == {}


def test_update_violating_constraint_rejected(spark, table):
    with pytest.raises(ConstraintViolation, match="v_positive"):
        update_where(spark, table, {"v": "-v"}, "k = 1")
    assert read_table(spark, table).filter("v <= 0").count() == 0


def test_merge_violating_constraint_rejected(spark, table):
    with pytest.raises(ConstraintViolation, match="v_positive"):
        transactional_upsert(
            spark, table, _df(spark, [(1, "a", -9.0)]), keys=["k"]
        )
    assert {r["v"] for r in read_table(spark, table).collect()} == {1.0, 2.0}


def test_dropped_constraint_stops_enforcement(spark, table):
    drop_constraint(table, "v_positive")
    append(_df(spark, [(5, "e", -1.0)]), table)
    assert read_table(spark, table).filter("v < 0").count() == 1


def test_multi_column_constraint_and_replace_partitions(spark, tmp_path):
    t = str(tmp_path / "part")
    replace_partitions(
        spark,
        t,
        _df(spark, [(1, "a", 1.0)]),
        partition_by=["grp"],
    )
    set_constraint(spark, t, "key_known", "k IS NOT NULL AND grp != ''")
    with pytest.raises(ConstraintViolation, match="key_known"):
        replace_partitions(spark, t, _df(spark, [(None, "b", 2.0)]))
    replace_partitions(spark, t, _df(spark, [(2, "b", 2.0)]))
    assert read_table(spark, t).count() == 2


def test_constraint_commits_are_metadata_only_for_change_feed(spark, table):
    """set/drop_constraint add no content: the change feed and history
    stay consistent across them instead of failing as 'content-changing'."""
    append(_df(spark, [(6, "f", 6.0)]), table)
    drop_constraint(table, "v_positive")  # another metadata commit
    got = {r["k"] for r in table_changes(spark, table, from_version=0).collect()}
    assert got == {6}
    assert [h["op"] for h in history(table)] == [
        "append", "set_constraint", "append", "drop_constraint",
    ]


def test_restore_is_exempt_but_new_writes_still_checked(spark, tmp_path):
    """Restore re-references previously committed state (which may
    predate the constraint) without revalidation — but the constraint
    itself survives the restore and keeps gating new writes."""
    t = str(tmp_path / "r")
    append(_df(spark, [(1, "a", -1.0)]), t)  # v0: pre-constraint bad row
    append(_df(spark, [(2, "b", 2.0)]), t)  # v1
    from wikistream_lakehouse_spark.lakehouse.txn import delete_where

    delete_where(spark, t, "v < 0")  # v2: table is clean now
    set_constraint(spark, t, "v_positive", "v > 0")  # v3
    restore(t, version=0)  # v4: brings the bad row back, allowed
    assert read_table(spark, t).filter("v < 0").count() == 1
    assert constraints(t) == {"v_positive": "v > 0"}
    with pytest.raises(ConstraintViolation):
        append(_df(spark, [(9, "z", -9.0)]), t)
