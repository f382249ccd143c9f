"""Row-level change data feed (txn.table_changes_cdf): appends emit
insert images, deletion-vector deletes emit EXACT delete images (the
positions a MoR commit killed still exist in the untouched data files —
one inner join recovers them), compactions/metadata commits are
invisible, and everything else refuses loudly. This is the property
that makes delete_where(mode='mor') the CDC-friendly delete: a
copy-on-write rewrite destroys the row-level delta, a vector preserves
it for free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


@pytest.fixture()
def t(spark, tmp_path):
    p = str(tmp_path / "t")
    txn.append(_df(spark, [(1, 1.0), (2, 2.0)]), p)  # v0
    txn.append(_df(spark, [(3, 3.0)]), p)  # v1
    txn.delete_where(spark, p, "k = 2", mode="mor")  # v2
    return p


def _rows(df):
    return sorted(
        (r.k, r.v, r._change_type, r._commit_version) for r in df.collect()
    )


def test_full_history_inserts_and_delete_images(spark, t):
    assert _rows(txn.table_changes_cdf(spark, t, -1)) == [
        (1, 1.0, "insert", 0),
        (2, 2.0, "delete", 2),
        (2, 2.0, "insert", 0),
        (3, 3.0, "insert", 1),
    ]


def test_compact_and_metadata_commits_invisible(spark, t):
    txn.compact(spark, t)  # v3: applies + retires the vector
    txn.append(_df(spark, [(4, 4.0)]), t)  # v4
    assert _rows(txn.table_changes_cdf(spark, t, 2)) == [
        (4, 4.0, "insert", 4)
    ]
    # the delete image survives ACROSS the compact while files remain
    assert (2, 2.0, "delete", 2) in _rows(txn.table_changes_cdf(spark, t, -1))


def test_stacked_dv_deletes_attribute_to_their_commits(spark, t):
    txn.delete_where(spark, t, "k = 1", mode="mor")  # v3
    got = _rows(txn.table_changes_cdf(spark, t, 1))
    assert got == [(1, 1.0, "delete", 3), (2, 2.0, "delete", 2)]


def test_cow_mutations_refused(spark, t):
    txn.update_where(spark, t, {"v": "v + 1"}, "k = 1")
    with pytest.raises(ValueError, match="not recoverable"):
        txn.table_changes_cdf(spark, t, -1)
    # ...but a range that stops before the mutation still reads
    assert len(_rows(txn.table_changes_cdf(spark, t, -1, to_version=2))) == 4


def test_empty_range_keeps_schema(spark, t):
    out = txn.table_changes_cdf(spark, t, 2, to_version=2)
    assert out.count() == 0
    assert out.columns == ["k", "v", "_change_type", "_commit_version"]


def test_vacuumed_preimage_refused(spark, t):
    txn.compact(spark, t)
    for i in range(3):
        txn.append(_df(spark, [(10 + i, 0.0)]), t)
    txn.vacuum(t, retain_versions=1, orphan_grace_secs=10**9)
    with pytest.raises(ValueError, match="vacuumed"):
        txn.table_changes_cdf(spark, t, -1)


# ---------------------------------------------------------------------------
# fast_forward: the one file-REMOVING op the feed expresses (VERDICT
# r12 #5) — a consumer on main sees the branch's delta as one
# insert/delete batch at the FF commit
# ---------------------------------------------------------------------------


def _ff_table(spark, tmp_path):
    """main: F1 = {4, 8, 14, 18} (one file), F2+ = {0, 2, 6, 10, 12, 16},
    MoR delete of k%10=8 (DV over F1). branch: insert {21, 27}, MoR
    delete k%10=6 (DV over F2s), CoW delete k%10=4 (F1 fully emptied —
    its 4s deleted, its 8s already DV-dead → remove with no rewrite).
    FF moves main. The feed at the FF commit must show insert {21, 27},
    delete {4, 14} (file images MINUS the pre-FF-masked 8s) and delete
    {6, 16} (the branch's new vector)."""
    p = str(tmp_path / "ff_t")
    evens = [(k, float(k)) for k in range(0, 20, 2)]
    f1 = [(k, v) for k, v in evens if k % 10 in (4, 8)]
    rest = [(k, v) for k, v in evens if k % 10 not in (4, 8)]
    txn.append(_df(spark, f1).coalesce(1), p)  # v0: ONE file F1
    txn.append(_df(spark, rest), p)  # v1
    txn.delete_where(spark, p, "k % 10 = 8", mode="mor")  # v2: DV on F1
    txn.create_branch(p, "dev")  # v3 (metadata on main)
    b = txn.branch_location(p, "dev")
    txn.append(_df(spark, [(21, 21.0), (27, 27.0)]), b)
    txn.delete_where(spark, b, "k % 10 = 6", mode="mor")
    txn.delete_where(spark, b, "k % 10 = 4")  # CoW: empties F1
    v = txn.fast_forward(spark, p, "dev")
    return p, v


def test_fast_forward_emits_branch_delta_as_one_batch(spark, tmp_path):
    p, v = _ff_table(spark, tmp_path)
    got = _rows(txn.table_changes_cdf(spark, p, v - 1, v))
    assert got == [
        (4, 4.0, "delete", v),
        (6, 6.0, "delete", v),
        (14, 14.0, "delete", v),
        (16, 16.0, "delete", v),
        (21, 21.0, "insert", v),
        (27, 27.0, "insert", v),
    ]
    # pre-FF-dead rows (the 8s) never get a delete image; netting the
    # batch onto the pre-FF snapshot yields exactly the post-FF one
    pre = {r.k for r in txn.read_table(spark, p, version=v - 1).collect()}
    post = {r.k for r in txn.read_table(spark, p, version=v).collect()}
    ins = {k for k, _v, c, _cv in got if c == "insert"}
    dels = {k for k, _v, c, _cv in got if c == "delete"}
    assert (pre - dels) | ins == post
    # and the whole-history feed spans the FF boundary too
    full = _rows(txn.table_changes_cdf(spark, p, -1))
    assert [r for r in full if r[3] == v] == got


def test_fast_forward_feed_matches_duckdb(spark, tmp_path):
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_changes_duckdb,
    )

    p, v = _ff_table(spark, tmp_path)
    got = _rows(txn.table_changes_cdf(spark, p, v - 1, v))
    tb = read_changes_duckdb(p, v - 1, v)
    duck = sorted(
        zip(
            tb.column("k").to_pylist(),
            tb.column("v").to_pylist(),
            tb.column("_change_type").to_pylist(),
            tb.column("_commit_version").to_pylist(),
        )
    )
    assert got == duck


def test_fast_forward_undelete_refused(spark, tmp_path):
    """A fast-forward that retires a vector whose target file SURVIVES
    would un-delete rows — no insert/delete stream can express that.
    Unreachable through the public verbs (a branch can only shed a
    fork-time vector by also removing its file: its history starts at
    the fork snapshot, so a restore can't go below it — pinned by the
    no-op assert in test_fast_forward_restore_to_fork_is_noop), so the
    guard is exercised on a hand-written log entry."""
    p = str(tmp_path / "undel_t")
    txn.append(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), p)  # v0
    v = txn.delete_where(spark, p, "k = 2", mode="mor")  # v1: DV
    dvs = txn._replay_state(p, v)[1]
    assert dvs
    e = txn._entry("fast_forward", [], [], [], {"branch": "x"})
    e["dvRetire"] = dvs
    assert txn._try_commit(p, v + 1, e)
    with pytest.raises(ValueError, match="un-delete"):
        txn.table_changes_cdf(spark, p, v, v + 1)


def test_fast_forward_restore_to_fork_is_noop(spark, tmp_path):
    """A branch restore to its v0 restores the FORK snapshot (deletion
    vector included) — branch history starts at the fork, so no branch
    op can resurrect rows main already deleted; the un-delete refusal
    in the feed is defensive, not a reachable path."""
    p = str(tmp_path / "fork_t")
    txn.append(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), p)  # v0
    txn.delete_where(spark, p, "k = 2", mode="mor")  # v1: DV
    txn.create_branch(p, "dev")
    b = txn.branch_location(p, "dev")
    txn.restore(b, version=0)
    v = txn.fast_forward(spark, p, "dev")
    assert {r.k for r in txn.read_table(spark, p).collect()} == {1, 3}
    # the restore commit is content-preserving: the feed sees nothing
    got = txn.table_changes_cdf(spark, p, v - 1, v)
    assert got.count() == 0


def _ff_overlap_table(spark, tmp_path):
    """The MoR-then-CoW-same-file branch shape: main is ONE file
    F = {1, 3, 5, 7}; the branch MoR-deletes k=3 (vector D over F),
    then CoW-deletes k=5 — which rewrites F (removing it from the
    branch state) but does NOT retire D (the file-pruned CoW path
    retires nothing), leaving D dangling-active. The FF commit then
    carries remove=[F] AND dvAdd=[D] targeting F: D's rows must be
    emitted by the dv arm ONLY, never also by F's delete image."""
    p = str(tmp_path / "ffo_t")
    txn.append(
        _df(spark, [(1, 1.0), (3, 3.0), (5, 5.0), (7, 7.0)]).coalesce(1), p
    )  # v0: ONE file F
    txn.create_branch(p, "dev")  # v1 (metadata on main)
    b = txn.branch_location(p, "dev")
    txn.delete_where(spark, b, "k = 3", mode="mor")  # D over F
    txn.delete_where(spark, b, "k = 5")  # CoW rewrite of F; D dangles
    v = txn.fast_forward(spark, p, "dev")
    return p, v


def test_fast_forward_mor_then_cow_same_file_emits_each_delete_once(
    spark, tmp_path
):
    p, v = _ff_overlap_table(spark, tmp_path)
    got = _rows(txn.table_changes_cdf(spark, p, v - 1, v))
    # every pre-FF-visible row of F deleted EXACTLY once (k=3 via the
    # dv arm, the rest via the file image), survivors re-inserted from
    # the rewrite — a duplicate (3, 'delete') here is the double-emit
    assert got == [
        (1, 1.0, "delete", v),
        (1, 1.0, "insert", v),
        (3, 3.0, "delete", v),
        (5, 5.0, "delete", v),
        (7, 7.0, "delete", v),
        (7, 7.0, "insert", v),
    ]
    pre = {r.k for r in txn.read_table(spark, p, version=v - 1).collect()}
    post = {r.k for r in txn.read_table(spark, p, version=v).collect()}
    ins = {k for k, _v, c, _cv in got if c == "insert"}
    dels = {k for k, _v, c, _cv in got if c == "delete"}
    assert (pre - dels) | ins == post


def test_fast_forward_mor_then_cow_same_file_matches_duckdb(
    spark, tmp_path
):
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_changes_duckdb,
    )

    p, v = _ff_overlap_table(spark, tmp_path)
    got = _rows(txn.table_changes_cdf(spark, p, v - 1, v))
    tb = read_changes_duckdb(p, v - 1, v)
    duck = sorted(
        zip(
            tb.column("k").to_pylist(),
            tb.column("v").to_pylist(),
            tb.column("_change_type").to_pylist(),
            tb.column("_commit_version").to_pylist(),
        )
    )
    assert got == duck
