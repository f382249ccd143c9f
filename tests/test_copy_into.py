"""COPY INTO (txn.copy_into) — idempotent file loading: every source
file loads exactly once into the target table, re-runs are no-ops, a
grown source loads only its new files, and the loaded-file ledger is
commit metadata (checkpoint-anchored, so it survives log retention).
This is the batch face of incremental ingest — the scale-correct form
of the reference's re-runnable Glue curation, whose ``mode("append")``
write duplicated rows on every re-run (glue/job_wiki_curate.py:48,
SURVEY §1.3). Plus TRUNCATE TABLE (txn.truncate_table)."""

from __future__ import annotations

import shutil
from concurrent.futures import ThreadPoolExecutor

import pytest

from wikistream_lakehouse_spark.lakehouse import txn


def _write_src(spark, path, rows, fmt="parquet"):
    df = spark.createDataFrame(rows, "k long, name string")
    w = df.coalesce(1).write.mode("overwrite")
    getattr(w, "json" if fmt == "json" else "parquet")(str(path))
    return [
        p
        for p in sorted(path.iterdir())
        if not p.name.startswith(("_", "."))
    ]


def test_copy_into_loads_once_and_rerun_is_noop(spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a"), (2, "b")])
    t = str(tmp_path / "t")
    r1 = txn.copy_into(spark, t, str(src))
    assert r1["files_loaded"] == 1 and r1["version"] == 0
    assert txn.read_table(spark, t).count() == 2
    r2 = txn.copy_into(spark, t, str(src))
    assert r2 == {"version": None, "files_loaded": 0, "files_skipped": 1}
    assert txn.read_table(spark, t).count() == 2  # no duplicates


def test_grown_source_loads_only_new_files(spark, tmp_path):
    src = tmp_path / "src"
    [f1] = _write_src(spark, src, [(1, "a")])
    t = str(tmp_path / "t")
    txn.copy_into(spark, t, str(src))
    # a new file arrives (same bytes, new name — identity is the path)
    shutil.copy(f1, src / "part-extra.parquet")
    r = txn.copy_into(spark, t, str(src))
    assert r["files_loaded"] == 1 and r["files_skipped"] == 1
    assert txn.read_table(spark, t).count() == 2


def test_pattern_and_explicit_file_list(spark, tmp_path):
    src = tmp_path / "src"
    [f1] = _write_src(spark, src, [(1, "a")])
    t = str(tmp_path / "t")
    with pytest.raises(ValueError, match="no source files"):
        txn.copy_into(spark, t, str(src), pattern="*.csv")
    r = txn.copy_into(spark, t, [str(f1)])
    assert r["files_loaded"] == 1
    assert txn.read_table(spark, t).count() == 1


def test_json_format_with_explicit_rows(spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a"), (2, "b")], fmt="json")
    t = str(tmp_path / "t")
    r = txn.copy_into(spark, t, str(src), file_format="json")
    assert r["files_loaded"] == 1
    got = {(r.k, r.name) for r in txn.read_table(spark, t).collect()}
    assert got == {(1, "a"), (2, "b")}


def test_ledger_survives_checkpoint_and_log_cleanup(spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a")])
    t = str(tmp_path / "t")
    txn.copy_into(spark, t, str(src))
    txn.append(spark.createDataFrame([(9, "z")], "k long, name string"), t)
    txn.checkpoint(t)
    txn.cleanup_log(t)
    r = txn.copy_into(spark, t, str(src))  # ledger anchored in checkpoint
    assert r["version"] is None and r["files_skipped"] == 1
    assert txn.read_table(spark, t).count() == 2


def test_racing_copies_load_each_file_exactly_once(spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(i, f"r{i}") for i in range(6)])
    t = str(tmp_path / "t")

    def one(_):
        try:
            return txn.copy_into(spark, t, str(src))
        except txn.CommitConflict:
            return None

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(one, range(3)))
    assert txn.read_table(spark, t).count() == 6  # no double-load
    loaded = sum(r["files_loaded"] for r in results if r)
    assert loaded == 1  # exactly one racer actually loaded the file


def test_replace_and_truncate_reset_the_ledger(spark, tmp_path):
    src = tmp_path / "src"
    _write_src(spark, src, [(1, "a")])
    t = str(tmp_path / "t")
    txn.copy_into(spark, t, str(src))
    txn.truncate_table(spark, t)
    assert txn.read_table(spark, t).count() == 0
    r = txn.copy_into(spark, t, str(src))  # fresh content → re-loads
    assert r["files_loaded"] == 1
    assert txn.read_table(spark, t).count() == 1


def test_truncate_keeps_schema_partitioning_and_history(spark, tmp_path):
    t = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k long, name string, p string"
    )
    txn.append(df, t, partition_by=["p"])
    txn.set_constraint(spark, t, "k_pos", "k > 0")
    v_full = txn.current_version(t)
    txn.truncate_table(spark, t)
    empty = txn.read_table(spark, t)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "name", "p"}
    assert txn._current_partitioning(t) == ["p"]
    assert txn.constraints(t) == {"k_pos": "k > 0"}
    # history stays: the pre-truncate snapshot is one restore away
    assert txn.read_table(spark, t, version=v_full).count() == 2
    txn.restore(t, version=v_full)
    assert txn.read_table(spark, t).count() == 2


def test_truncate_does_not_restart_identity(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_identity_column(spark, t, "id")
    txn.append(spark.createDataFrame([("a",)], "name string"), t)
    hi = txn.identity_high_water(t, "id")
    txn.truncate_table(spark, t)
    txn.append(spark.createDataFrame([("b",)], "name string"), t)
    [new_id] = [r.id for r in txn.read_table(spark, t).collect()]
    assert new_id > hi  # old values are never re-issued
