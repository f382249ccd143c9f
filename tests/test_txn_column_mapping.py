"""Column mapping: metadata-only RENAME/DROP COLUMN (the Delta
column-mapping analogue). Data files keep their physical column names
forever; the log carries a logical→physical map readers apply and
writers invert — so renaming a column on a 100 TB table is one commit
and zero IO. Under test: metadata-only-ness (no data files written,
physical footers unchanged), full read/write/DML/merge surface under
the logical names, time travel showing each version's own names,
stats-skipping and merge-probe pruning surviving a rename, the
physical-name-reuse refusal, clone carry, and the feature stamp."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import skipping, txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


@pytest.fixture()
def t(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k"])
    txn.append(_kv(spark, 100, 200), t, stats_cols=["k"])
    return t


def test_rename_is_metadata_only_and_time_travels(spark, t):
    files_before = txn._replay(t, txn.current_version(t))
    v = txn.rename_column(spark, t, "k", "key")
    assert txn._replay(t, v) == files_before  # zero data files written
    assert txn.column_mapping(t) == {"key": "k"}
    df = txn.read_table(spark, t)
    assert df.columns == ["key", "v"]
    assert df.filter("key = 5").count() == 1
    # physical footer still carries the original name
    phys = pq.read_schema(os.path.join(t, files_before[0])).names
    assert "k" in phys and "key" not in phys
    # time travel: the pre-rename snapshot keeps its own names
    assert txn.read_table(spark, t, version=v - 1).columns == ["k", "v"]
    assert txn._load_entry(t, v)["readerFeatures"] == ["columnMapping"]


def test_writes_and_dml_speak_logical_names(spark, t):
    txn.rename_column(spark, t, "k", "key")
    new = spark.range(200, 210).select(
        F.col("id").alias("key"), F.lit(-1.0).alias("v")
    )
    txn.append(new, t)  # logical-name append translates to physical
    assert txn.read_table(spark, t).filter("v = -1.0").count() == 10
    # the appended file is physically written under the ORIGINAL name
    newest = txn._load_entry(t, txn.current_version(t))["add"][0]
    assert "k" in pq.read_schema(os.path.join(t, newest)).names
    txn.delete_where(spark, t, "key = 5")
    txn.delete_where(spark, t, "key = 6", mode="mor")
    txn.update_where(spark, t, {"v": "v + 100"}, "key = 7")
    txn.merge_on_read_upsert(
        spark,
        t,
        spark.createDataFrame([(8, 888.0)], "key long, v double"),
        keys=["key"],
    )
    rows = {r.key: r.v for r in txn.read_table(spark, t).collect()}
    assert 5 not in rows and 6 not in rows
    assert rows[7] == 114.0 and rows[8] == 888.0
    # CDF speaks logical names too (range covering just the MoR merge)
    cdf = txn.table_changes_cdf(spark, t, txn.current_version(t) - 1)
    assert "key" in cdf.columns and "k" not in cdf.columns


def test_drop_column_hides_bytes_and_blocks_name_reuse(spark, t):
    txn.drop_column(spark, t, "v")
    df = txn.read_table(spark, t)
    assert df.columns == ["k"]
    # new appends must not carry the dropped column...
    with pytest.raises(ValueError, match="mismatch"):
        txn.append(_kv(spark, 200, 210), t)
    txn.append(spark.range(200, 210).select(F.col("id").alias("k")), t)
    # ...and may never REUSE the retired physical name
    with pytest.raises(ValueError, match="retired PHYSICAL"):
        txn.append(
            spark.range(0, 1).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            ),
            t,
            merge_schema=True,
        )
    # a later compact rewrites without the dropped bytes
    txn.compact(spark, t, target_file_bytes=1 << 40)
    newest = txn._replay(t, txn.current_version(t))[0]
    assert pq.read_schema(os.path.join(t, newest)).names == ["k"]


def test_rename_then_new_column_with_old_name_refused(spark, t):
    txn.rename_column(spark, t, "k", "key")
    bad = spark.range(0, 1).select(
        F.col("id").alias("key"),
        F.lit(1.0).alias("v"),
        F.lit(9).alias("k"),  # the renamed-away physical name
    )
    with pytest.raises(ValueError, match="retired PHYSICAL"):
        txn.append(bad, t, merge_schema=True)


def test_refusals(spark, tmp_path):
    t = str(tmp_path / "p")
    df = spark.createDataFrame([("a", 1, 2.0)], "ds string, k long, v double")
    txn.append(df, t, partition_by=["ds"])
    with pytest.raises(ValueError, match="partition column"):
        txn.rename_column(spark, t, "ds", "day")
    txn.set_constraint(spark, t, "kpos", "k >= 0")
    with pytest.raises(ValueError, match="references it"):
        txn.rename_column(spark, t, "k", "key")
    with pytest.raises(ValueError, match="references it"):
        txn.drop_column(spark, t, "k")
    txn.drop_constraint(t, "kpos")
    txn.rename_column(spark, t, "k", "key")
    with pytest.raises(ValueError, match="already in use"):
        txn.rename_column(spark, t, "v", "key")
    with pytest.raises(ValueError, match="no column"):
        txn.rename_column(spark, t, "k", "kk")  # old name is gone


def test_stats_skipping_and_merge_probe_survive_rename(
    spark, t, monkeypatch
):
    txn.rename_column(spark, t, "k", "key")

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("footer pass despite full log coverage")

    monkeypatch.setattr(skipping, "collect_file_stats", boom)
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, t, {"key": (120.0, 130.0)}
    )
    assert (n_read, n_total) == (1, 2)  # pruned from LOG stats, zero IO
    assert sorted(r.key for r in df.collect()) == list(range(120, 131))
    # merge probe prunes on the RENAMED key against the old stats
    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    src = spark.createDataFrame([(150, -1.0)], "key long, v double")
    txn.merge_on_read_upsert(spark, t, src, keys=["key"])
    assert len(probes) == 1 and len(probes[0]) == 1  # one candidate file


def test_stream_source_applies_mapping(spark, t, tmp_path):
    from wikistream_lakehouse_spark.streaming.txn_source import (
        register_txn_source,
    )

    txn.rename_column(spark, t, "v", "value")
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .load(t)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(out.columns) == ["k", "value"]
    assert out.count() == 200


def test_clone_carries_mapping(spark, t, tmp_path):
    txn.rename_column(spark, t, "k", "key")
    d = str(tmp_path / "clone")
    txn.clone_table(t, d)
    assert txn.column_mapping(d) == {"key": "k"}
    assert txn.read_table(spark, d).columns == ["key", "v"]
    # and the clone's carried stats still prune under the logical name
    assert all("key" in s["min"] for s in txn.logged_file_stats(d).values())


def test_rename_racing_append_never_corrupts(spark, tmp_path):
    """A rename racing a concurrent append resolves to ONE of two safe
    outcomes, never a mixed state: either the append serialized first
    (its rows are visible under the post-rename name — physical names
    make old files forward-compatible), or the rename landed first and
    the append's post-race schema re-validation refused the stale
    logical name. Run several rounds to sample both interleavings."""
    import threading

    for i in range(4):
        t = str(tmp_path / f"t{i}")
        txn.append(_kv(spark, 0, 10), t)
        errs = []

        def do_append():
            try:
                txn.append(_kv(spark, 10, 20), t)
            except ValueError as e:
                errs.append(e)  # legitimate: schema changed under it

        th = threading.Thread(target=do_append)
        th.start()
        txn.rename_column(spark, t, "k", "key")
        th.join()
        df = txn.read_table(spark, t)
        assert df.columns == ["key", "v"]
        n = df.count()
        if errs:
            # two legitimate refusal shapes depending on WHERE in the
            # append the rename landed: after the appender's schema
            # read (post-race re-validation → "mismatch") or before
            # its physical-name conversion (the retired-name guard →
            # "collide"). Both leave no rows and no orphan files.
            assert "mismatch" in str(errs[0]) or "collide" in str(errs[0])
            assert n == 10  # refused append left no rows (and no leak)
            orphans = [
                f for f in txn.DEFAULT_DATA_STORE.walk_files(t)
                if f.endswith(".parquet") and "_txnlog" not in f
                and os.path.relpath(f, t)
                not in txn._replay(t, txn.current_version(t))
            ]
            assert orphans == []
        else:
            assert n == 20  # append landed; rows visible under new name
            assert df.filter("key = 15").count() == 1


def test_restore_rolls_the_mapping_back_with_the_data(spark, t):
    """RESTORE restores table metadata too: rolling back past a rename
    brings the old column name back (and rolling forward again is
    possible since history is never rewritten)."""
    pre = txn.current_version(t)  # v1: two appends, names (k, v)
    txn.rename_column(spark, t, "k", "key")
    txn.append(
        spark.range(200, 210).select(
            F.col("id").alias("key"), F.lit(-1.0).alias("v")
        ),
        t,
    )
    assert txn.read_table(spark, t).columns == ["key", "v"]
    v_restore = txn.restore(t, version=pre)
    df = txn.read_table(spark, t)
    assert df.columns == ["k", "v"]  # mapping rolled back with the data
    assert df.count() == 200
    # the restore commit carries the mapping reset + the reader feature
    e = txn._load_entry(t, v_restore)
    assert e["meta"]["columnMapping"] == {}
    assert "columnMapping" in e.get("readerFeatures", [])
    # and a rename made AFTER the restore stacks normally
    txn.rename_column(spark, t, "v", "value")
    assert txn.read_table(spark, t).columns == ["k", "value"]


def test_column_swap_via_tmp_rename_cycle(spark, t):
    """ADVICE r6 high: a permutation-cycle mapping (swap k/v via
    k→tmp, v→k, tmp→v) must read and write correctly. Sequential
    withColumnRenamed corrupted this (duplicate names mid-sequence →
    both columns misrouted); the mapping is now applied as ONE
    simultaneous select projection."""
    txn.rename_column(spark, t, "k", "tmp")
    txn.rename_column(spark, t, "v", "k")
    txn.rename_column(spark, t, "tmp", "v")
    assert txn.column_mapping(t) == {"v": "k", "k": "v"}
    df = txn.read_table(spark, t)
    assert sorted(df.columns) == ["k", "v"]
    # logical k carries the OLD v values (doubles), logical v the old k
    rows = {r.v: r.k for r in df.collect()}
    assert rows[5] == 10.0 and rows[199] == 398.0
    # writes under the swapped logical names route to the right
    # physical columns: new logical v=500 must land beside old k=500
    txn.append(
        spark.createDataFrame([(999.0, 500)], "k double, v long"), t
    )
    back = txn.read_table(spark, t).filter("v = 500").collect()
    assert len(back) == 1 and back[0].k == 999.0
    # physical footer of the new file uses the ORIGINAL physical names
    newest = txn._load_entry(t, txn.current_version(t))["add"][0]
    sch = pq.read_schema(os.path.join(t, newest))
    import pyarrow as pa

    assert sch.field("k").type == pa.int64()  # logical v → physical k
    # DML through the swap
    txn.delete_where(spark, t, "v = 500")
    assert txn.read_table(spark, t).filter("v = 500").count() == 0
    # time travel: pre-swap snapshot keeps the original orientation
    pre = txn.read_table(spark, t, version=1)
    assert {r.k: r.v for r in pre.limit(1).collect()}


def test_restore_racing_rename_still_resets_mapping(
    spark, t, monkeypatch
):
    """ADVICE r6 low: the mapping-rollback comparison must be computed
    INSIDE the retry loop — a rename committing between restore's
    initial read and its winning commit previously left the restore
    without the mapping reset, so the rename survived a rollback that
    claimed restoredVersion semantics."""
    pre = txn.current_version(t)  # mapping empty here
    txn.append(_kv(spark, 200, 300), t)

    real_try = txn._try_commit
    state = {"raced": False}

    def racing(path, v, entry, store=None):
        if entry.get("op") == "restore" and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(txn, "_try_commit", real_try)
            txn.rename_column(spark, t, "k", "key")  # race in a rename
            monkeypatch.setattr(txn, "_try_commit", racing)
            return False  # force the restore to retry against new HEAD
        return real_try(path, v, entry, store)

    monkeypatch.setattr(txn, "_try_commit", racing)
    v_restore = txn.restore(t, version=pre)
    e = txn._load_entry(t, v_restore)
    assert e["meta"].get("columnMapping") == {}  # reset recorded
    df = txn.read_table(spark, t)
    assert df.columns == ["k", "v"]  # raced rename rolled back too
    assert df.count() == 200
