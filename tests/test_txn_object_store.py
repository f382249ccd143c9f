"""The txn lifecycle on OBJECT-STORE semantics, both planes at once
(VERDICT r6 next-round #2): ``MemoryLogStore`` (conditional-put log,
S3 If-None-Match shape) + ``ObjectDataStore`` (no directories, HEAD
semantics for exists, rename = copy+delete, link = server-side copy).
``LogStore`` always had its object twin; this gives the data plane its
own and runs the operations most likely to hide a POSIX assumption —
clone's link, convert's per-file rename, vacuum's tree removal,
DV sidecar reads — on the pair, proving the "port to S3 = implement
these two classes" claim (txn.py DataStore docstring) instead of
asserting it. Every test is parametrized over (posix, object) so the
two substrates are held to the identical outcome."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


@pytest.fixture(params=["posix", "object"])
def substrate(request, monkeypatch):
    """(log_store, data_store_name): 'object' installs the
    MemoryLogStore + ObjectDataStore pair for the whole test."""
    if request.param == "posix":
        return None
    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", txn.ObjectDataStore())
    return txn.MemoryLogStore()


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


def test_lifecycle_on_object_semantics(spark, tmp_path, substrate):
    """Append → MoR delete → MoR merge (stats-pruned) → CDF → compact
    (DV purge) → checkpoint → vacuum → restore: identical outcomes on
    both substrate pairs."""
    st = substrate
    t = str(tmp_path / "t")
    txn.set_stats_columns(t, ["k"], store=st)
    txn.append(_kv(spark, 0, 100), t, store=st)
    txn.append(_kv(spark, 100, 200), t, store=st)
    txn.delete_where(spark, t, "k = 5", mode="mor", store=st)
    txn.merge_on_read_upsert(
        spark,
        t,
        _kv(spark, 150, 160).withColumn("v", F.lit(-1.0)),
        keys=["k"],
        store=st,
    )
    # window (2, head]: the k=5 MoR delete (1) + the merge (10)
    cdf = txn.table_changes_cdf(spark, t, 2, store=st)
    assert cdf.filter("_change_type = 'delete'").count() == 11
    pre_compact = txn.current_version(t, store=st)
    assert txn.compact(spark, t, target_file_bytes=1, store=st) is not None
    assert txn._replay_state(t, txn.current_version(t, store=st), store=st)[1] == []
    txn.checkpoint(t, store=st)
    assert txn.vacuum(t, retain_versions=1, store=st)  # reclaims rewrites
    df = txn.read_table(spark, t, store=st)
    assert df.count() == 199
    assert df.filter("v = -1.0").count() == 10
    # restore horizon respects vacuum on this substrate too
    with pytest.raises(ValueError, match="vacuum"):
        txn.restore(t, version=pre_compact - 1, store=st)


def test_clone_independence_without_hard_links(spark, tmp_path, substrate):
    """Clone on the object pair uses server-side COPY (no inode
    aliasing) — and the two tables stay fully independent under DML +
    vacuum on either side, the exact guarantee the POSIX hard-link
    implementation provides."""
    st = substrate
    s = str(tmp_path / "s")
    txn.append(_kv(spark, 0, 100), s, stats_cols=["k"], store=st)
    d = str(tmp_path / "d")
    txn.clone_table(s, d, store=st)
    txn.delete_where(spark, s, "k < 50", store=st)
    txn.vacuum(s, retain_versions=1, store=st)
    assert txn.read_table(spark, d, store=st).count() == 100  # untouched
    txn.delete_where(spark, d, "k >= 50", store=st)
    assert txn.read_table(spark, s, store=st).count() == 50
    assert txn.read_table(spark, d, store=st).count() == 50
    # carried stats still prune the clone's merge probe
    assert all(
        "k" in f_stats["min"] for f_stats in txn.logged_file_stats(d, store=st).values()
    )


def test_convert_adoption_with_copy_delete_rename(spark, tmp_path, substrate):
    """convert_to_txn's per-file move runs on rename = copy + delete
    (non-atomic, the S3 shape) and still adopts every row exactly once,
    hive partitions preserved."""
    st = substrate
    p = str(tmp_path / "p")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "ds string, k long"
    )
    df.write.partitionBy("ds").parquet(p)
    v = txn.convert_to_txn(spark, p, store=st)
    assert v == 0
    out = txn.read_table(spark, p, store=st)
    assert sorted((r.ds, r.k) for r in out.collect()) == [
        ("a", 1), ("a", 2), ("b", 3),
    ]
    assert txn._current_partitioning(p, store=st) == ["ds"]
    # no plain-parquet stragglers outside the commit dir (the copy
    # half of every rename was followed by its delete half)
    stragglers = [
        f
        for f in txn._data().walk_files(p)
        if f.endswith(".parquet")
        and txn._COMMIT_COL + "=" not in f
        and txn.LOG_DIR not in f
    ]
    assert stragglers == []


def test_object_store_exists_is_head_not_directory_probe(tmp_path):
    """The semantic the fake enforces: a 'directory' is not an object.
    Code that probes exists(dir) works on POSIX and silently breaks on
    S3 — this store surfaces that class of bug in tests."""
    ds = txn.ObjectDataStore()
    d = tmp_path / "dir"
    d.mkdir()
    (d / "obj").write_bytes(b"x")
    assert ds.exists(str(d / "obj"))
    assert not ds.exists(str(d))  # HEAD on a prefix: no such object
    # rename is copy+delete into not-yet-existing "directories"
    ds.rename(str(d / "obj"), str(d / "deep" / "er" / "obj2"))
    assert ds.exists(str(d / "deep" / "er" / "obj2"))
    assert not ds.exists(str(d / "obj"))


class _ConcurrencyProbeStore(txn.ObjectDataStore):
    """Counts peak in-flight link/rename calls (a tiny sleep widens the
    overlap window so genuine parallelism registers as peak > 1)."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self.in_flight = 0
        self.peak = 0
        self.calls = 0

    def _enter(self):
        import time

        with self._lock:
            self.in_flight += 1
            self.peak = max(self.peak, self.in_flight)
            self.calls += 1
        time.sleep(0.02)

    def _exit(self):
        with self._lock:
            self.in_flight -= 1

    def link(self, src, dst):
        self._enter()
        try:
            super().link(src, dst)
        finally:
            self._exit()

    def rename(self, src, dst):
        self._enter()
        try:
            super().rename(src, dst)
        finally:
            self._exit()


def test_clone_and_convert_fan_out_file_ops(spark, tmp_path, monkeypatch):
    """VERDICT r6 wrong #3: clone links and convert moves run on a
    driver thread pool — one call per file, demonstrably overlapping —
    so a 10⁶-file clone on a CopyObject-per-file store is minutes, not
    hours. Results stay byte-identical to the serial path."""
    ds = _ConcurrencyProbeStore()
    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", ds)
    s = str(tmp_path / "s")
    for lo in range(0, 80, 10):  # 8 files
        txn.append(_kv(spark, lo, lo + 10), s)
    d = str(tmp_path / "d")
    txn.clone_table(s, d)
    assert ds.calls == 8 and ds.peak > 1, (ds.calls, ds.peak)
    assert txn.read_table(spark, d).count() == 80
    # convert: parallel copy+delete moves, every row adopted once
    ds.calls, ds.peak = 0, 0
    p = str(tmp_path / "plain")
    spark.range(100).select(
        (F.col("id") % 8).alias("b"), F.col("id").alias("k")
    ).repartition(8, "b").write.parquet(p)
    txn.convert_to_txn(spark, p)
    assert ds.calls >= 2 and ds.peak > 1, (ds.calls, ds.peak)
    assert txn.read_table(spark, p).count() == 100


def test_r11_verbs_on_object_semantics(spark, tmp_path, substrate):
    """Identity allocation, COPY INTO's ledger, TRUNCATE, and tags run
    the same on the object-store pair — the r11 verbs add no POSIX
    assumption (ledger and marks are commit metadata; COPY's source
    listing goes through the DataStore seam)."""
    st = substrate
    t = str(tmp_path / "t")
    # identity: declare → two appends → unique, monotone across commits
    txn.set_identity_column(spark, t, "row_id", store=st)
    txn.append(_kv(spark, 0, 5), t, store=st)
    txn.append(_kv(spark, 5, 8), t, store=st)
    ids = [r.row_id for r in txn.read_table(spark, t, store=st).collect()]
    assert len(set(ids)) == 8
    assert txn.identity_high_water(t, "row_id", store=st) == max(ids)
    # tags: pin, mutate, resolve
    v_pin = txn.current_version(t, st)  # the snapshot the tag pins
    txn.create_tag(t, "pin", store=st)
    txn.append(_kv(spark, 8, 10), t, store=st)
    assert (
        txn.read_table(spark, t, version="pin", store=st).count() == 8
    )
    assert txn.table_tags(t, store=st) == {"pin": v_pin}
    # truncate keeps schema + declarations (identity does not restart),
    # resets the copy ledger; COPY INTO's append ALLOCATES the declared
    # identity column the source files don't carry
    src = tmp_path / "cp_src"
    spark.createDataFrame(
        [(100, 1.0)], "k long, v double"
    ).coalesce(1).write.parquet(str(src))
    hwm = txn.identity_high_water(t, "row_id", store=st)
    txn.truncate_table(spark, t, store=st)
    assert txn.read_table(spark, t, store=st).count() == 0
    r1 = txn.copy_into(spark, t, str(src), store=st)
    r2 = txn.copy_into(spark, t, str(src), store=st)
    assert r1["files_loaded"] == 1 and r2["version"] is None
    [row] = txn.read_table(spark, t, store=st).collect()
    assert row.row_id > hwm  # allocated by the copy, beyond the mark
    # the pinned tag still reads its snapshot across the truncate
    assert txn.read_table(spark, t, version="pin", store=st).count() == 8
