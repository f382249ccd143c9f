"""Row-level DML on the transactional layer (txn.delete_where /
update_where): merge-on-write with FILE-LEVEL pruning — the scale
property under test is that files without matching rows survive
byte-identical (same path in the new snapshot), so a selective DML on a
partitioned/z-ordered 100 TB table rewrites only the files it must."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    current_version,
    delete_where,
    history,
    read_table,
    snapshot,
    update_where,
    _replay,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v double")


@pytest.fixture()
def table(spark, tmp_path):
    """Three appends = three disjoint file sets; grp 'c' lives only in
    the third."""
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), t)
    append(_df(spark, [(3, "b", 3.0), (4, "b", 4.0)]), t)
    append(_df(spark, [(5, "c", 5.0), (6, "c", 6.0)]), t)
    return t


def test_delete_removes_matching_rows_only(spark, table):
    v = delete_where(spark, table, "grp = 'b' AND v > 3.5")
    assert v == 3
    assert sorted(r.k for r in read_table(spark, table).collect()) == [1, 2, 3, 5, 6]
    # time travel: the pre-delete snapshot still has row 4
    assert sorted(r.k for r in snapshot(spark, table, version=2).collect()) == [
        1, 2, 3, 4, 5, 6,
    ]


def test_delete_prunes_untouched_files(spark, table):
    before = set(_replay(table, current_version(table)))
    delete_where(spark, table, "grp = 'c'")
    after = set(_replay(table, current_version(table)))
    # the files holding grp a/b are the SAME paths — never rewritten
    untouched = before & after
    kept_rows = sorted(r.k for r in read_table(spark, table).collect())
    assert kept_rows == [1, 2, 3, 4]
    assert len(untouched) >= 2  # a-files and b-files survive byte-identical
    # and at least the c-file was retired
    assert before - after


def test_delete_null_predicate_rows_are_kept(spark, tmp_path):
    """SQL DELETE semantics: predicate NULL ⇒ row kept, not deleted."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, None), (2, 10.0), (3, 0.5)], "k long, v double"
    )
    append(df, t)
    delete_where(spark, t, "v > 1.0")
    assert sorted(r.k for r in read_table(spark, t).collect()) == [1, 3]


def test_delete_no_match_is_a_noop(spark, table):
    before = current_version(table)
    assert delete_where(spark, table, "grp = 'zzz'") is None
    assert current_version(table) == before


def test_update_changes_matching_rows_only(spark, table):
    v = update_where(
        spark, table, {"v": "v * 10", "grp": "upper(grp)"}, "k IN (1, 5)"
    )
    assert v == 3
    got = {r.k: (r.grp, r.v) for r in read_table(spark, table).collect()}
    assert got[1] == ("A", 10.0)
    assert got[5] == ("C", 50.0)
    assert got[2] == ("a", 2.0)  # same file as k=1, row untouched
    assert got[3] == ("b", 3.0)
    assert [h["op"] for h in history(table)][-1] == "update"


def test_update_prunes_untouched_files(spark, table):
    before = set(_replay(table, current_version(table)))
    update_where(spark, table, {"v": "0.0"}, "grp = 'a'")
    after = set(_replay(table, current_version(table)))
    assert len(before & after) >= 2  # b/c files survive in place


def test_update_unknown_column_rejected(spark, table):
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, table, {"nope": "1"}, "k = 1")


def test_update_preserves_column_types(spark, table):
    """Assignments are cast back to the column's type — the table schema
    cannot morph through an UPDATE."""
    update_where(spark, table, {"v": "CAST(7 AS INT)"}, "k = 2")
    assert dict(read_table(spark, table).dtypes)["v"] == "double"
    got = {r.k: r.v for r in read_table(spark, table).collect()}
    assert got[2] == 7.0


def test_update_partition_column_moves_rows(spark, tmp_path):
    t = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(1, "2024-01-01", 1.0), (2, "2024-01-02", 2.0)],
        "k long, ds string, v double",
    )
    append(df, t, partition_by=["ds"])
    update_where(spark, t, {"ds": "'2024-02-01'"}, "k = 1")
    # partition values come back hive-inferred (date-shaped ds ⇒ DATE)
    got = {r.k: str(r.ds) for r in read_table(spark, t).collect()}
    assert got == {1: "2024-02-01", 2: "2024-01-02"}
    # the moved row is physically in the new hive partition
    files = _replay(t, current_version(t))
    assert any("ds=2024-02-01" in f for f in files)


def test_delete_races_concurrent_append(spark, table):
    """A delete and an append race on the same table: both commit (the
    loser retries), no rows are lost or double-kept, and the appended
    rows survive even when they match the delete predicate (they were
    not in the delete's snapshot — serializable commit order)."""
    errs: list[Exception] = []

    def do_delete():
        try:
            delete_where(spark, table, "grp = 'a'", max_retries=10)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def do_append():
        try:
            append(_df(spark, [(7, "d", 7.0), (8, "d", 8.0)]), table)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=do_delete), threading.Thread(target=do_append)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    ks = sorted(r.k for r in read_table(spark, table).collect())
    assert ks == [3, 4, 5, 6, 7, 8]


def test_delete_all_leaves_readable_empty_table(spark, tmp_path):
    """A delete that matches every row must not brick the table: the
    commit logs the schema, reads return an empty frame in the table's
    shape, and the schema contract still binds later appends."""
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    delete_where(spark, t, "k >= 0")
    df = read_table(spark, t)
    assert df.count() == 0
    assert set(df.columns) == {"k", "grp", "v"}
    with pytest.raises(ValueError, match="schema mismatch"):
        append(spark.createDataFrame([(1,)], "other long"), t)
    append(_df(spark, [(9, "z", 9.0)]), t)
    assert [r.k for r in read_table(spark, t).collect()] == [9]


def test_dml_is_change_feed_mutating(spark, table, tmp_path):
    """DML commits are content-changing: an incremental consumer reading
    across one must get a loud error, not a silent mis-fold."""
    from wikistream_lakehouse_spark.lakehouse.txn import table_changes

    delete_where(spark, table, "grp = 'a'")
    with pytest.raises(ValueError, match="content-changing"):
        table_changes(spark, table, from_version=0)
