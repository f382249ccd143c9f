"""RESTORE on the transactional layer (txn.restore): roll the table
back to a historical snapshot as a NEW commit. The scale property under
test is that restore is metadata-only — zero data files are written,
read, or copied (the commit re-references the target snapshot's
immutable files) — so undoing a bad backfill on a 100 TB table costs a
log write, not a table rewrite. Delta-parity semantics: history is
preserved (the mistake stays time-travelable), a racing append is
undone as if it serialized before the restore, and the restore horizon
is bounded by vacuum retention."""

from __future__ import annotations

import os

import pytest

from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    compact,
    current_version,
    history,
    read_table,
    restore,
    snapshot,
    table_changes,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v double")


def _data_files(table_path):
    out = []
    for root, _dirs, files in os.walk(table_path):
        if "_txnlog" in root:
            continue
        out.extend(n for n in files if n.endswith(".parquet"))
    return sorted(out)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), t)  # v0
    append(_df(spark, [(3, "b", 3.0)]), t)  # v1
    append(_df(spark, [(4, "c", 4.0), (5, "c", 5.0)]), t)  # v2
    return t


def test_restore_rolls_back_to_target_snapshot(spark, table):
    v = restore(table, version=1)
    assert v == 3
    got = {r["k"] for r in read_table(spark, table).collect()}
    assert got == {1, 2, 3}
    # the rolled-back-over version is still time-travelable (audit)
    assert {r["k"] for r in snapshot(spark, table, 2).collect()} == {
        1, 2, 3, 4, 5,
    }
    ops = [h["op"] for h in history(table)]
    assert ops == ["append", "append", "append", "restore"]
    assert history(table)[-1]["meta"] == {"restoredVersion": 1}


def test_restore_is_metadata_only(spark, table):
    before = _data_files(table)
    restore(table, version=0)
    assert _data_files(table) == before  # no files written OR deleted


def test_restore_to_current_version_is_a_noop(spark, table):
    assert restore(table, version=2) == 2
    assert current_version(table) == 2  # nothing committed


def test_append_after_restore_builds_on_restored_state(spark, table):
    restore(table, version=0)
    append(_df(spark, [(9, "z", 9.0)]), table)
    got = {r["k"] for r in read_table(spark, table).collect()}
    assert got == {1, 2, 9}


def test_restore_as_of_timestamp(spark, table):
    ts_v1 = history(table)[1]["ts"]
    restore(table, as_of=ts_v1)
    assert {r["k"] for r in read_table(spark, table).collect()} == {1, 2, 3}


def test_restore_refuses_vacuumed_target(spark, table):
    compact(spark, table, target_file_bytes=1 << 30)  # v3 rewrites all
    vacuum(table, retain_versions=1, orphan_grace_secs=0)
    with pytest.raises(ValueError, match="vacuum"):
        restore(table, version=1)


def test_restore_refuses_future_version(spark, table):
    with pytest.raises(ValueError, match="future"):
        restore(table, version=99)
    with pytest.raises(ValueError, match="exactly one"):
        restore(table, version=1, as_of=0.0)
    with pytest.raises(ValueError, match="exactly one"):
        restore(table)


def test_restore_survives_compact_then_restore_again(spark, table):
    compact(spark, table, target_file_bytes=1 << 30)  # v3
    restore(table, version=1)  # v4: back past the compact
    assert {r["k"] for r in read_table(spark, table).collect()} == {1, 2, 3}
    restore(table, version=3)  # v5: forward again to the compacted state
    assert {r["k"] for r in read_table(spark, table).collect()} == {
        1, 2, 3, 4, 5,
    }


def test_restore_preserves_evolved_schema_reads(spark, tmp_path):
    """Restoring to a schema-evolved snapshot AFTER a later compact must
    keep the footer-merge read path — otherwise the widened column would
    silently vanish from reads of the restored state."""
    t = str(tmp_path / "evo")
    append(_df(spark, [(1, "a", 1.0)]), t)  # v0
    wide = spark.createDataFrame(
        [(2, "b", 2.0, "extra")], "k long, grp string, v double, note string"
    )
    append(wide, t, merge_schema=True)  # v1: evolved
    compact(spark, t, target_file_bytes=1 << 30)  # v2: normalizes schema
    restore(t, version=1)  # v3: mixed-schema file set again
    df = read_table(spark, t)
    assert "note" in df.columns
    rows = {r["k"]: r["note"] for r in df.collect()}
    assert rows == {1: None, 2: "extra"}


def test_change_feed_rejects_restore_range(spark, table):
    """A restore is content-changing: the file-granular change feed must
    fail loudly over a range containing one, never mis-stream it."""
    restore(table, version=0)
    with pytest.raises(ValueError, match="content-changing"):
        table_changes(spark, table, from_version=-1)
