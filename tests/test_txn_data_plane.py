"""Round-6 txn hardening: (1) the data-plane seam — every driver-side
file operation on DATA files routes through ``txn.DataStore`` so the
whole layer ports to an object store by implementing one class (VERDICT
r5 next-round #2); (2) stats-pruned MoR merge probes — a CDC merge over
a stats-logged clustered table never opens non-candidate files, making
the merge O(delta) reads included (VERDICT r5 wrong #1); (3) sharded
deletion-vector writes — a multi-file match set produces parallel
sidecars, not one task's file (VERDICT r5 wrong #2); (4) URI-encodable
table paths (spaces, '%', '+') — `_with_rowpos` decodes
``_metadata.file_path`` before deriving table-relative identities
(ADVICE r5 medium); (5) CDF across schema evolution unions with
null-fill instead of throwing (ADVICE r5 medium)."""

from __future__ import annotations

import ast
import collections
import inspect

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


# --------------------------------------------------------------------------
# 1. Data-plane seam
# --------------------------------------------------------------------------


_FS_CALLS = {
    ("os", "walk"),
    ("os", "listdir"),
    ("os", "remove"),
    ("os", "rename"),
    ("os", "rmdir"),
    ("os", "makedirs"),
    ("os", "unlink"),
    ("os.path", "exists"),
    ("os.path", "isdir"),
    ("os.path", "isfile"),
    ("os.path", "getsize"),
    ("os.path", "getmtime"),
    ("shutil", "rmtree"),
    ("shutil", "copytree"),
}


def _attr_chain(node: ast.AST) -> str:
    parts = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
    return ".".join(reversed(parts))


def test_no_direct_fs_calls_outside_the_store_classes():
    """Everything txn.py does to the filesystem goes through LogStore or
    DataStore: the module body outside ``Posix{Log,Data}Store`` contains
    no direct os/shutil filesystem call (path STRING functions like
    os.path.join are fine — they are object-key math)."""
    tree = ast.parse(inspect.getsource(txn))
    allowed_classes = {"PosixLogStore", "PosixDataStore", "ObjectDataStore"}
    offenders = []

    class V(ast.NodeVisitor):
        def __init__(self):
            self.cls_stack = []

        def visit_ClassDef(self, node):
            self.cls_stack.append(node.name)
            self.generic_visit(node)
            self.cls_stack.pop()

        def visit_Call(self, node):
            chain = _attr_chain(node.func)
            for mod, fn in _FS_CALLS:
                if chain == f"{mod}.{fn}":
                    if not (set(self.cls_stack) & allowed_classes):
                        offenders.append((node.lineno, chain))
            self.generic_visit(node)

    V().visit(tree)
    assert not offenders, f"direct FS calls outside the seam: {offenders}"


class TrackingDataStore(txn.PosixDataStore):
    """Posix behavior + a call counter: proves the txn flows actually
    drive their file bookkeeping through the seam."""

    def __init__(self):
        self.calls = collections.Counter()

    def _t(self, name):
        self.calls[name] += 1

    def exists(self, path):
        self._t("exists")
        return super().exists(path)

    def walk_files(self, directory):
        self._t("walk_files")
        return super().walk_files(directory)

    def list_root(self, directory):
        self._t("list_root")
        return super().list_root(directory)

    def remove(self, path):
        self._t("remove")
        super().remove(path)

    def remove_tree(self, directory):
        self._t("remove_tree")
        super().remove_tree(directory)

    def size(self, path):
        self._t("size")
        return super().size(path)

    def mtime(self, path):
        self._t("mtime")
        return super().mtime(path)

    def open_input(self, path):
        self._t("open_input")
        return super().open_input(path)


def test_txn_lifecycle_routes_data_ops_through_the_seam(
    spark, tmp_path, monkeypatch
):
    """Append → MoR delete → MoR merge → CDF → compact → vacuum →
    restore-check, with a tracking DataStore installed: results stay
    correct AND every op class shows seam traffic."""
    ds = TrackingDataStore()
    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", ds)
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    txn.append(_kv(spark, 100, 200), t)
    txn.delete_where(spark, t, "k = 5", mode="mor")
    # no-match MoR delete: its empty sidecar dir cleanup goes through
    # the seam's remove_tree
    assert txn.delete_where(spark, t, "k = -1", mode="mor") is None
    txn.merge_on_read_upsert(
        spark, t, _kv(spark, 150, 160).withColumn("v", F.lit(-1.0)), keys=["k"]
    )
    cdf = txn.table_changes_cdf(spark, t, 2)
    assert cdf.filter("_change_type = 'delete'").count() == 10
    txn.compact(spark, t, target_file_bytes=1)
    # plant an orphan (crashed-writer residue) so the aged-orphan sweep
    # exercises its mtime/remove path through the seam too
    import os as _os
    import shutil as _sh

    commit_dir = next(
        d for d in _os.listdir(t) if d.startswith(txn._COMMIT_COL + "=")
    )
    a_file = ds.walk_files(_os.path.join(t, commit_dir))[0]
    _sh.copyfile(a_file, _os.path.join(_os.path.dirname(a_file), "orphan.parquet"))
    vacuumed = txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    assert vacuumed  # pre-compact files + retired vectors + the orphan
    assert any(v.endswith("orphan.parquet") for v in vacuumed)
    got = sorted(
        r.k for r in txn.read_table(spark, t).filter("v = -1.0").collect()
    )
    assert got == list(range(150, 160))
    assert txn.read_table(spark, t).count() == 199
    for op in ("walk_files", "exists", "remove", "remove_tree", "size",
               "mtime", "list_root", "open_input"):
        assert ds.calls[op] > 0, f"no seam traffic for {op}: {ds.calls}"


# --------------------------------------------------------------------------
# 2. Stats-pruned MoR merge probe
# --------------------------------------------------------------------------


@pytest.fixture()
def stats_table(spark, tmp_path):
    """Three single-file appends with disjoint k ranges, stats logged."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200):
        txn.append(_kv(spark, lo, lo + 100), t, stats_cols=["k", "v"])
    return t


def test_merge_probe_never_opens_non_candidate_files(
    spark, stats_table, monkeypatch
):
    files = txn._replay(stats_table, txn.current_version(stats_table))
    logged = txn.logged_file_stats(stats_table)
    expected = [
        f for f in files
        if logged[f]["min"]["k"] <= 130 and logged[f]["max"]["k"] >= 120
    ]
    assert len(expected) == 1  # well-clustered: one candidate file

    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    txn.merge_on_read_upsert(
        spark,
        stats_table,
        _kv(spark, 120, 131).withColumn("v", F.lit(-1.0)),
        keys=["k"],
    )
    assert probes == [expected]  # the other two files were never opened
    got = txn.read_table(spark, stats_table).filter("v = -1.0").count()
    assert got == 11


def test_merge_probe_prunes_to_zero_files_for_disjoint_keys(
    spark, stats_table, monkeypatch
):
    """Pure-insert batch (keys beyond every file's range): the probe
    reads NOTHING; the merge is still correct and adds no vector."""
    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    txn.merge_on_read_upsert(
        spark, stats_table, _kv(spark, 500, 510), keys=["k"]
    )
    assert probes == []  # zero probe IO
    assert txn._replay_state(
        stats_table, txn.current_version(stats_table)
    )[1] == []  # no vector
    assert txn.read_table(spark, stats_table).count() == 310


def test_merge_probe_keeps_statless_files_as_candidates(spark, tmp_path):
    """A file whose commit logged no stats can never be pruned — the
    merge stays correct on mixed-coverage tables."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k", "v"])
    txn.append(_kv(spark, 100, 200), t)  # NO stats
    txn.merge_on_read_upsert(
        spark, t, _kv(spark, 150, 151).withColumn("v", F.lit(-1.0)), keys=["k"]
    )
    rows = {r.k: r.v for r in txn.read_table(spark, t).collect()}
    assert rows[150] == -1.0 and len(rows) == 200


def test_merge_probe_pruning_matches_unpruned_semantics(spark, stats_table):
    """Differential: the same merge against a stats-less twin (no
    pruning possible) commits the identical final state."""
    import shutil as _sh

    twin = stats_table + "_twin"
    _sh.copytree(stats_table, twin)
    src = (
        _kv(spark, 90, 210)
        .withColumn("v", F.lit(-1.0))
    )
    dels = spark.range(0, 10).select(F.col("id").alias("k"))
    txn.merge_on_read_upsert(spark, stats_table, src, keys=["k"], deletes=dels)
    # twin: wipe the logged stats by compacting first (rewrite drops them)
    txn.compact(spark, twin, target_file_bytes=1 << 40)
    assert txn.logged_file_stats(twin) == {}
    txn.merge_on_read_upsert(spark, twin, src, keys=["k"], deletes=dels)
    a = sorted((r.k, r.v) for r in txn.read_table(spark, stats_table).collect())
    b = sorted((r.k, r.v) for r in txn.read_table(spark, twin).collect())
    assert a == b


# --------------------------------------------------------------------------
# 3. Sharded deletion-vector writes
# --------------------------------------------------------------------------


def test_bulk_dv_delete_writes_parallel_sidecars(spark, tmp_path):
    """The sidecar write is AQE-sized by target-file hash: under a tiny
    advisory partition size (standing in for a backfill-scale match
    set vs the 64 MB default) the vector spreads across >1 file —
    no single-task serialization — and readers and compact treat the
    sharded set identically to a single-file vector."""
    t = str(tmp_path / "t")
    for lo in range(0, 200, 10):  # 20 single-file appends
        txn.append(_kv(spark, lo, lo + 10), t)
    knobs = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64b",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64b",
    }
    prev = {k: spark.conf.get(k, None) for k in knobs}
    for k, v_ in knobs.items():
        spark.conf.set(k, v_)
    try:
        v = txn.delete_where(spark, t, "k % 10 < 5", mode="mor")
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
    assert v is not None
    dvs = txn._replay_state(t, txn.current_version(t))[1]
    assert len(dvs) > 1
    got = sorted(r.k for r in txn.read_table(spark, t).collect())
    assert got == [k for k in range(200) if k % 10 >= 5]
    # compact applies + retires the whole sharded set
    txn.compact(spark, t, target_file_bytes=1 << 40)
    assert txn._replay_state(t, txn.current_version(t))[1] == []
    assert sorted(r.k for r in txn.read_table(spark, t).collect()) == got


def test_trickle_dv_delete_coalesces_to_one_sidecar(spark, tmp_path):
    """The flip side: a small delete's positions coalesce into ONE
    sidecar under the normal advisory size — stacked trickle deletes
    don't litter the table with per-bucket files."""
    t = str(tmp_path / "t")
    for lo in range(0, 100, 10):
        txn.append(_kv(spark, lo, lo + 10), t)
    txn.delete_where(spark, t, "k % 10 = 0", mode="mor")
    assert len(txn._replay_state(t, txn.current_version(t))[1]) == 1


# --------------------------------------------------------------------------
# 4. URI-encodable table paths
# --------------------------------------------------------------------------


@pytest.mark.parametrize("dirname", ["my table", "pct%20dir", "a+b"])
def test_dv_dml_and_cdf_on_uri_encodable_paths(spark, tmp_path, dirname):
    """Spaces, literal percent-escapes, and '+' in the table path: the
    row-identity derivation decodes the _metadata URI, so MoR deletes,
    CoW deletes, and CDF delete images all address the right files."""
    t = str(tmp_path / dirname / "t")
    txn.append(_kv(spark, 0, 10), t)
    base = txn.current_version(t)
    assert txn.delete_where(spark, t, "k = 3", mode="mor") is not None
    assert sorted(r.k for r in txn.read_table(spark, t).collect()) == [
        0, 1, 2, 4, 5, 6, 7, 8, 9
    ]
    cdf = txn.table_changes_cdf(spark, t, base)
    assert [(r.k, r._change_type) for r in cdf.collect()] == [(3, "delete")]
    # copy-on-write path exercises _affected_files on the same identity
    assert txn.delete_where(spark, t, "k = 4") is not None
    assert sorted(r.k for r in txn.read_table(spark, t).collect()) == [
        0, 1, 2, 5, 6, 7, 8, 9
    ]


# --------------------------------------------------------------------------
# 5. CDF across schema evolution
# --------------------------------------------------------------------------


def test_cdf_spans_schema_evolution_with_null_fill(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(spark.createDataFrame([(1, "a")], "k long, s string"), t)
    txn.append(
        spark.createDataFrame([(2, "b", 9.0)], "k long, s string, extra double"),
        t,
        merge_schema=True,
    )
    txn.delete_where(spark, t, "k = 1", mode="mor")
    got = sorted(
        (r.k, r._change_type, r.extra)
        for r in txn.table_changes_cdf(spark, t, -1).collect()
    )
    assert got == [
        (1, "delete", None),
        (1, "insert", None),
        (2, "insert", 9.0),
    ]


def test_merge_probe_prunes_by_partition_values(spark, tmp_path, monkeypatch):
    """Merge keys that include the partition column prune the probe to
    the touched partitions — the CDC layout where the key is a STRING
    date no numeric stat can cover."""
    t = str(tmp_path / "t")
    for ds in ("day_a", "day_b", "day_c"):
        df = spark.createDataFrame(
            [(ds, i, 1.0) for i in range(10)], "ds string, k long, v double"
        ).coalesce(1)
        txn.append(df, t, partition_by=["ds"])
    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    src = spark.createDataFrame(
        [("day_b", 3, -1.0)], "ds string, k long, v double"
    )
    txn.merge_on_read_upsert(spark, t, src, keys=["ds", "k"])
    assert len(probes) == 1
    assert all("ds=day_b" in f for f in probes[0])
    rows = {
        (r.ds, r.k): r.v for r in txn.read_table(spark, t).collect()
    }
    assert rows[("day_b", 3)] == -1.0 and len(rows) == 30


# --------------------------------------------------------------------------
# 5. Size-logged maintenance planning (VERDICT r6 wrong #1 / next #1)
# --------------------------------------------------------------------------


def test_commits_carry_file_sizes_and_the_log_replays_them(
    spark, tmp_path
):
    """Every data-adding commit stamps ``fileSizes``; the replayed map
    equals the on-disk truth and follows the active set across a
    rewrite."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    txn.append(_kv(spark, 100, 200), t)
    e = txn._load_entry(t, 1)
    assert set(e["fileSizes"]) == set(e["add"])
    import os

    actual = {
        f: os.path.getsize(os.path.join(t, f))
        for f in txn._replay(t, txn.current_version(t))
    }
    assert txn.logged_file_sizes(t) == actual
    # a rewrite retires the old entries from the replayed view
    txn.compact(spark, t, target_file_bytes=1 << 40)
    actual = {
        f: os.path.getsize(os.path.join(t, f))
        for f in txn._replay(t, txn.current_version(t))
    }
    assert txn.logged_file_sizes(t) == actual


def test_maintenance_decisions_make_zero_data_plane_stat_calls(
    spark, tmp_path, monkeypatch
):
    """maintain_table / table_detail / compact's binning on a
    size-logged table read ONLY the log: zero exists/size/mtime/walk
    against the data plane — the difference between a metadata tick and
    10⁶ HEAD requests per tick at object-store scale."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    txn.append(_kv(spark, 100, 200), t)
    ds = TrackingDataStore()
    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", ds)
    # no-op maintenance: decisions made, nothing rewritten
    report = txn.maintain_table(
        spark, t, target_file_bytes=1, max_small_files=8
    )
    assert report == {}
    d = txn.table_detail(t)
    assert d["size_bytes"] > 0 and d["num_files"] == 2
    # tiny target ⇒ n_out ≥ n_files ⇒ binning decides "already compact"
    # — decided entirely from the logged sizes
    assert txn.compact(spark, t, target_file_bytes=1) is None
    for op in ("exists", "size", "mtime", "walk_files"):
        assert ds.calls[op] == 0, f"data-plane {op} on a size-logged table: {ds.calls}"


def test_statless_legacy_commits_fall_back_to_one_stat_probe(
    spark, tmp_path, monkeypatch
):
    """Back-compat: files committed before size logging (simulated by
    stripping ``fileSizes`` from the entry) still get sized — via the
    data-plane fallback, for exactly those files."""
    import json
    import os

    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    # strip the stamp from v0, as an old-engine commit would look
    vf = txn._version_file(t, 0)
    e = json.loads(txn._store(None).read(vf))
    del e["fileSizes"]
    os.remove(vf)
    assert txn._store(None).put_if_absent(vf, json.dumps(e).encode())
    txn.append(_kv(spark, 100, 200), t)  # size-logged commit on top
    assert txn.logged_file_sizes(t) and len(txn.logged_file_sizes(t)) == 1
    files = txn._replay(t, txn.current_version(t))
    sizes = txn._sizes_of(t, files)
    actual = {f: os.path.getsize(os.path.join(t, f)) for f in files}
    assert sizes == actual
    assert txn.table_detail(t)["size_bytes"] == sum(actual.values())


def test_checkpoint_carries_the_size_map(spark, tmp_path, monkeypatch):
    """The checkpoint snapshots the size map so maintenance planning
    stays O(commits-since-checkpoint); replay afterward never re-reads
    the pre-checkpoint entries."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200):
        txn.append(_kv(spark, lo, lo + 100), t)
    txn.checkpoint(t)
    txn.append(_kv(spark, 300, 400), t)
    before = dict(txn.logged_file_sizes(t))
    real = txn._load_entry
    loaded = []

    def spy(path, v, store=None):
        loaded.append(v)
        return real(path, v, store)

    monkeypatch.setattr(txn, "_load_entry", spy)
    assert txn.logged_file_sizes(t) == before
    assert all(v > 2 for v in loaded), f"pre-checkpoint entry loads: {loaded}"


# --------------------------------------------------------------------------
# 6. Bloom-filter merge-probe pruning on unclustered keys (VERDICT r6
#    wrong #2 / next #3)
# --------------------------------------------------------------------------


def _uuid_frame(spark, lo, hi):
    """Random-looking string keys (md5 of the id): every file's lexical
    min/max spans ~the whole hex space, so envelope pruning is useless
    — the exact key shape of a real CDC stream."""
    return (
        spark.range(lo, hi)
        .select(
            F.md5(F.col("id").cast("string")).alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def uuid_table(spark, tmp_path):
    """Declared stats columns (the dataSkippingStatsColumns analogue):
    every writer — including the merges under test — inherits them, so
    a merge's own rewritten files stay prunable for the NEXT merge."""
    t = str(tmp_path / "t")
    txn.set_stats_columns(t, ["k"])
    for lo in (0, 100, 200):
        txn.append(_uuid_frame(spark, lo, lo + 100), t)
    return t


def test_merge_probe_prunes_random_keys_via_blooms(
    spark, uuid_table, monkeypatch
):
    """RANDOM-key twin of test_merge_probe_never_opens_non_candidate_
    files: min/max envelopes overlap totally, yet the probe opens only
    the ONE file whose Bloom filter admits the touched keys."""
    logged = txn.logged_file_stats(uuid_table)
    files = txn._replay(uuid_table, txn.current_version(uuid_table))
    assert all("bloom" in logged[f] and "k" in logged[f]["bloom"] for f in files)
    # envelopes genuinely can't prune: string keys get no float bounds
    assert all(logged[f]["min"]["k"] is None for f in files)

    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    # touch keys that live only in the middle file (ids 150..160)
    src = _uuid_frame(spark, 150, 160).withColumn("v", F.lit(-1.0))
    txn.merge_on_read_upsert(spark, uuid_table, src, keys=["k"])
    assert len(probes) == 1 and len(probes[0]) == 1  # one candidate file
    got = txn.read_table(spark, uuid_table).filter("v = -1.0").count()
    assert got == 10
    # and a merge of keys in NO file probes nothing at all
    probes.clear()
    miss = spark.createDataFrame(
        [("zz-not-a-key-%d" % i, 0.0) for i in range(3)], "k string, v double"
    )
    txn.merge_on_read_upsert(spark, uuid_table, miss, keys=["k"])
    assert probes == []
    assert txn.read_table(spark, uuid_table).count() == 303


def test_bloom_pruning_never_false_negatives():
    """Hypothesis: for ANY key sets, a file containing a touched key is
    NEVER pruned (false positives allowed, false negatives impossible)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wikistream_lakehouse_spark.lakehouse import bloom

    keys = st.lists(
        st.one_of(st.integers(-2**62, 2**62), st.text(max_size=12)),
        min_size=1,
        max_size=40,
    )

    @settings(max_examples=200, deadline=None)
    @given(file_keys=keys, touched=keys)
    def check(file_keys, touched):
        import numpy as np

        m = bloom.bloom_m_bits(len(file_keys))
        bits = np.zeros(m, dtype=bool)
        for v in file_keys:
            bits[bloom.positions(bloom.key_bytes(v), m)] = True
        blooms = {
            "f": {"k": {"m": m, "k": bloom.BLOOM_K,
                        "bits": bloom.encode_bits(bits)}}
        }
        kept = bloom.prune_files_by_blooms(["f"], blooms, {"k": touched})
        if set(file_keys) & set(touched):
            assert kept == ["f"]  # a real match can never be pruned

    check()


def test_blooms_survive_rename_clone_and_restore(spark, uuid_table, tmp_path):
    """The filter follows the column's LOGICAL name across a rename,
    rides clone's stats carry, and keeps pruning afterwards."""
    txn.rename_column(spark, uuid_table, "k", "key")
    logged = txn.logged_file_stats(uuid_table)
    assert all("key" in s["bloom"] for s in logged.values())
    d = str(tmp_path / "clone")
    txn.clone_table(uuid_table, d)
    carried = txn.logged_file_stats(d)
    assert all("key" in s["bloom"] for s in carried.values())
    # pruning works on the clone under the logical name
    src = (
        _uuid_frame(spark, 150, 151)
        .withColumnRenamed("k", "key")
        .withColumn("v", F.lit(-9.0))
    )
    txn.merge_on_read_upsert(spark, d, src, keys=["key"])
    assert txn.read_table(spark, d).filter("v = -9.0").count() == 1


def test_declared_stats_columns_follow_every_writer(spark, tmp_path):
    """set_stats_columns makes stats/blooms ride append, MERGE-created
    files, replace_partitions and compact without per-call stats_cols;
    clearing with [] stops the logging."""
    t = str(tmp_path / "t")
    txn.set_stats_columns(t, ["k"])
    assert txn.stats_columns(t) == ["k"]
    txn.append(_kv(spark, 0, 100), t)
    e = txn._load_entry(t, txn.current_version(t))
    assert "stats" in e and all(
        "bloom" in s for s in e["stats"]["files"].values()
    )
    txn.merge_on_read_upsert(
        spark, t, _kv(spark, 50, 60).withColumn("v", F.lit(-1.0)), keys=["k"]
    )
    e = txn._load_entry(t, txn.current_version(t))
    assert "stats" in e  # the merge's own adds are stats-logged
    v = txn.compact(spark, t, target_file_bytes=1 << 40)
    assert "stats" in txn._load_entry(t, v)
    # partitioned twin: replace_partitions inherits too (partition
    # column itself is excluded — its values live in directory names)
    p = str(tmp_path / "p")
    txn.set_stats_columns(p, ["ds", "k"])
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("b", 2, 2.0)], "ds string, k long, v double"
    )
    txn.replace_partitions(spark, p, df, partition_by=["ds"])
    e = txn._load_entry(p, txn.current_version(p))
    assert e["stats"]["cols"] == ["k"]
    # clearing the declaration stops stats logging
    txn.set_stats_columns(t, [])
    txn.append(_kv(spark, 200, 210), t)
    assert "stats" not in txn._load_entry(t, txn.current_version(t))


# --------------------------------------------------------------------------
# 7. Disjoint-commit conflict re-validation (VERDICT r6 next #4)
# --------------------------------------------------------------------------


def _race_in(monkeypatch, trigger_op, racer):
    """Force a deterministic race: when a commit with op==trigger_op is
    first attempted, run ``racer()`` (a real committing operation) and
    fail the attempt, so the loser retries against the new HEAD."""
    real = txn._try_commit
    state = {"raced": False}

    def racing(path, v, entry, store=None):
        if entry.get("op") == trigger_op and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(txn, "_try_commit", real)
            racer()
            monkeypatch.setattr(txn, "_try_commit", racing)
            return False
        return real(path, v, entry, store)

    monkeypatch.setattr(txn, "_try_commit", racing)


def test_delete_racing_disjoint_append_restamps_without_rescan(
    spark, tmp_path, monkeypatch
):
    """A delete losing the commit race to a DISJOINT append (no
    matching rows) re-stamps its already-written rewrite: the
    read-compute-write cycle runs exactly ONCE, and the final state is
    the serializable outcome (appended rows present, matches gone)."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k"])
    writes = []
    real_write = txn._write_data_files

    def spy(df, path, pb, store=None):
        writes.append(1)
        return real_write(df, path, pb, store)

    monkeypatch.setattr(txn, "_write_data_files", spy)
    _race_in(
        monkeypatch, "delete",
        lambda: txn.append(_kv(spark, 500, 510), t, stats_cols=["k"]),
    )
    v = txn.delete_where(spark, t, "k < 10")
    assert v == txn.current_version(t)
    # exactly one rewrite execution: the loser re-stamped, not re-ran
    # (the racing append's own write is the second entry)
    assert len(writes) == 2, writes
    rows = {r.k for r in txn.read_table(spark, t).collect()}
    assert rows == set(range(10, 100)) | set(range(500, 510))


def test_delete_racing_matching_append_recomputes(
    spark, tmp_path, monkeypatch
):
    """Non-disjoint twin: the racing append CONTAINS matching rows, so
    the loser must re-run against the new snapshot (serializable: the
    delete that committed last covers them) — two rewrite executions,
    zero surviving matches."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k"])
    writes = []
    real_write = txn._write_data_files

    def spy(df, path, pb, store=None):
        writes.append(1)
        return real_write(df, path, pb, store)

    monkeypatch.setattr(txn, "_write_data_files", spy)
    _race_in(
        monkeypatch, "delete",
        lambda: txn.append(
            spark.createDataFrame([(5, -1.0)], "k long, v double"), t
        ),
    )
    txn.delete_where(spark, t, "k < 10")
    assert len(writes) == 3, writes  # loser's two runs + racer's one
    rows = {r.k for r in txn.read_table(spark, t).collect()}
    assert rows == set(range(10, 100))  # the raced-in k=5 died too


def test_update_racing_disjoint_append_restamps(
    spark, tmp_path, monkeypatch
):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k"])
    writes = []
    real_write = txn._write_data_files

    def spy(df, path, pb, store=None):
        writes.append(1)
        return real_write(df, path, pb, store)

    monkeypatch.setattr(txn, "_write_data_files", spy)
    _race_in(
        monkeypatch, "update",
        lambda: txn.append(_kv(spark, 500, 510), t, stats_cols=["k"]),
    )
    txn.update_where(spark, t, {"v": "v + 1000"}, "k = 7")
    assert len(writes) == 2, writes
    rows = {r.k: r.v for r in txn.read_table(spark, t).collect()}
    assert rows[7] == 1014.0 and rows[505] == 1010.0


def test_update_racing_constraint_takes_slow_path(
    spark, tmp_path, monkeypatch
):
    """A CHECK constraint racing in is NEVER disjoint for an update:
    the re-run validates the new values against it and refuses."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    _race_in(
        monkeypatch, "update",
        lambda: txn.set_constraint(spark, t, "v_small", "v < 100"),
    )
    with pytest.raises(txn.ConstraintViolation):
        txn.update_where(spark, t, {"v": "v + 1000"}, "k = 7")
    rows = {r.k: r.v for r in txn.read_table(spark, t).collect()}
    assert rows[7] == 14.0  # nothing leaked


def test_delete_racing_set_partitioning_takes_slow_path(
    spark, tmp_path, monkeypatch
):
    """A raced-in METADATA op must force re-execution, never a
    re-stamp (ADVICE r7: the slow-path list omitted set_partitioning —
    a re-stamped rewrite would silently predate the spec its commit
    records). Derived from _METADATA_OPS now, so this pins the class."""
    t = str(tmp_path / "t")
    txn.append(
        _kv(spark, 0, 100).withColumn(
            "b", (F.col("k") % 2).cast("string")
        ),
        t,
    )
    writes = []
    real_write = txn._write_data_files

    def spy(df, path, pb, store=None):
        writes.append(1)
        return real_write(df, path, pb, store)

    monkeypatch.setattr(txn, "_write_data_files", spy)
    _race_in(
        monkeypatch, "delete",
        lambda: txn.set_partitioning(spark, t, ["b"]),
    )
    v = txn.delete_where(spark, t, "k < 10")
    assert v == txn.current_version(t)
    # TWO rewrite executions (original + re-run after the lost race):
    # the racer itself writes no data files
    assert len(writes) == 2, writes
    rows = {r.k for r in txn.read_table(spark, t).collect()}
    assert rows == set(range(10, 100))


def test_delete_racing_set_stats_columns_takes_slow_path(
    spark, tmp_path, monkeypatch
):
    """Same class: a raced-in set_stats_columns means the re-stamped
    adds would lack the newly-declared stats — slow path required."""
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    writes = []
    real_write = txn._write_data_files

    def spy(df, path, pb, store=None):
        writes.append(1)
        return real_write(df, path, pb, store)

    monkeypatch.setattr(txn, "_write_data_files", spy)
    _race_in(
        monkeypatch, "delete",
        lambda: txn.set_stats_columns(t, ["k"]),
    )
    v = txn.delete_where(spark, t, "k < 10")
    assert v == txn.current_version(t)
    # TWO rewrite executions: the loser re-ran, it did not re-stamp
    assert len(writes) == 2, writes
    rows = {r.k for r in txn.read_table(spark, t).collect()}
    assert rows == set(range(10, 100))
    # and the raced-in declaration is the table's active stats policy
    assert txn.stats_columns(t) == ["k"]
