"""Shared-refs (metadata-only) branches — VERDICT r12 #4: `create_branch
mode="shared"` writes a branch log whose entries reference the parent's
files through the ``../../`` escape instead of linking them. On an
object store that replaces O(files) CopyObject RPCs with one log write,
which is what makes branching a 100 TB table O(1). The suite pins:

* zero data-file operations at create (counted on the object substrate);
* reads resolve shared + local files (partitioned tables included),
  with pre-fork deletion vectors translated into the branch's form;
* branch DML over shared files (MoR vectors in escaped form, CoW
  rewrites into branch-local files) with main untouched;
* vacuum isolation BOTH ways: branch vacuum never deletes through the
  escape; parent vacuum refcounts branch-pinned files and releases
  them at drop_branch;
* fast_forward canonicalizes escaped refs and translates branch-written
  vector sidecars, so the merged main reads main-form identities.
"""

from __future__ import annotations

import os

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


def _kv(spark, lo, hi):
    from pyspark.sql import functions as F

    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2.0).alias("v"),
        (F.col("id") % 2).cast("string").alias("tag"),
    )


def _ks(spark, path, **kw):
    return sorted(r.k for r in txn.read_table(spark, path, **kw).collect())


@pytest.fixture()
def t(spark, tmp_path):
    p = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), p, partition_by=["tag"])  # v0
    txn.delete_where(spark, p, "k = 3", mode="mor")  # v1: pre-fork DV
    return p


def test_shared_create_issues_zero_data_file_ops(spark, t, monkeypatch):
    ops: list[tuple[str, str]] = []

    class Probe(txn.ObjectDataStore):
        def link(self, src, dst):
            ops.append(("link", dst))
            super().link(src, dst)

        def put_bytes(self, path, data):
            ops.append(("put", path))
            super().put_bytes(path, data)

        def rename(self, src, dst):
            ops.append(("rename", dst))
            super().rename(src, dst)

    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", Probe())
    txn.create_branch(t, "dev", mode="shared")
    assert ops == [], f"shared fork touched data files: {ops}"
    b = txn.branch_location(t, "dev")
    # every fork ref is escaped; none resolves under the branch root
    fs, dvs = txn._replay_state(b, 0)
    assert fs and all(f.startswith("../../") for f in fs + dvs)
    # copy mode on the same substrate pays the per-file CopyObject
    txn.create_branch(t, "cp", mode="copy")
    assert any(op == "link" for op, _ in ops)


def test_shared_branch_reads_match_fork_snapshot(spark, t):
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    # the pre-fork MoR delete's vector (a shared sidecar whose f-values
    # are main-form) must still suppress k=3 on the branch
    assert _ks(spark, b) == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    assert _ks(spark, b) == _ks(spark, t)
    # partition pruning still works through the escape (parent-based
    # read group recovers tag from the parent's directory layout)
    got = {
        r.k
        for r in txn.read_table(spark, b).filter("tag = '1'").collect()
    }
    assert got == {1, 5, 7, 9}


def test_branch_dml_over_shared_files_isolated_from_main(spark, t):
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 100, 102), b)  # branch-local files
    txn.delete_where(spark, b, "k = 5", mode="mor")  # DV over a SHARED file
    txn.delete_where(spark, b, "k = 6")  # CoW rewrite of a shared file
    txn.update_where(spark, b, {"v": "999.0"}, "k = 1")
    rows = {r.k: r.v for r in txn.read_table(spark, b).collect()}
    assert sorted(rows) == [0, 1, 2, 4, 7, 8, 9, 100, 101]
    assert rows[1] == 999.0
    # main: byte-for-byte untouched
    mrows = {r.k: r.v for r in txn.read_table(spark, t).collect()}
    assert sorted(mrows) == [0, 1, 2, 4, 5, 6, 7, 8, 9]
    assert mrows[1] == 2.0


def test_vacuum_isolation_and_parent_refcount(spark, t):
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    # branch retires shared files (CoW rewrite) then vacuums hard: the
    # retired SHARED names must never be deleted through the escape
    txn.delete_where(spark, b, "k in (0, 2, 4, 6, 8)")
    gone = txn.vacuum(b, retain_versions=1, orphan_grace_secs=0)
    assert all(not r.startswith("../../") for r in gone)
    assert _ks(spark, t) == [0, 1, 2, 4, 5, 6, 7, 8, 9]  # main intact
    # main rewrites everything, then vacuums: files the branch still
    # references must SURVIVE main's vacuum (the refcount pin) …
    txn.replace_table(spark, t, _kv(spark, 50, 53))
    kept_for_branch = txn._branch_shared_refs(t)
    assert kept_for_branch
    doomed = txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    assert not (set(doomed) & kept_for_branch)
    assert _ks(spark, b) == [1, 3, 5, 7, 9] or _ks(spark, b) == [
        1, 5, 7, 9,
    ]  # branch still readable (k=3 dead pre-fork)
    # … and are released once the branch is dropped
    txn.drop_branch(t, "dev")
    doomed2 = txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    assert set(doomed2) & kept_for_branch
    assert _ks(spark, t) == [50, 51, 52]


def test_fast_forward_from_shared_branch(spark, t):
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 100, 102), b)
    txn.delete_where(spark, b, "k = 5", mode="mor")  # escaped-form vector
    v = txn.fast_forward(spark, t, "dev")
    assert _ks(spark, t, version=v) == [0, 1, 2, 4, 6, 7, 8, 9, 100, 101]
    # the merged vector was translated: main's own replay carries a
    # main-form sidecar whose targets resolve under main
    _fs, dvs = txn._replay_state(t, v)
    for d in dvs:
        assert not d.startswith("../../")
        for f in txn._dv_target_files(t, d):
            assert not f.startswith("../../")
    # rebased branch keeps working: second round-trip
    txn.append(_kv(spark, 200, 201), b)
    txn.fast_forward(spark, t, "dev")
    assert 200 in set(_ks(spark, t))
    # divergence still refused
    txn.append(_kv(spark, 300, 301), t)
    txn.append(_kv(spark, 400, 401), b)
    with pytest.raises(ValueError, match="diverged"):
        txn.fast_forward(spark, t, "dev")


def test_shared_branch_via_sql_surface(spark, t):
    catalog.register_table(spark, "sh_t", t)
    try:
        catalog.sql(spark, "ALTER TABLE sh_t CREATE BRANCH dev SHARED")
        b = txn.branch_location(t, "dev")
        fs, _ = txn._replay_state(b, 0)
        assert all(f.startswith("../../") for f in fs)
        catalog.sql(spark, "INSERT INTO sh_t@dev VALUES (77, 7.0, '1')")
        catalog.sql(spark, "DELETE FROM sh_t@dev WHERE k = 2")
        got = {r.k for r in catalog.sql(
            spark, "SELECT k FROM sh_t@dev"
        ).collect()}
        assert got == {0, 1, 4, 5, 6, 7, 8, 9, 77}
        assert {r.k for r in spark.table("sh_t").collect()} == {
            0, 1, 2, 4, 5, 6, 7, 8, 9,
        }
        catalog.sql(spark, "ALTER TABLE sh_t FAST FORWARD BRANCH dev")
        assert {r.k for r in spark.table("sh_t").collect()} == got
    finally:
        catalog.unregister_table(spark, "sh_t")


def test_shared_rel_helpers():
    assert txn._shared_hops("c=0/x.parquet") == (0, "c=0/x.parquet")
    assert txn._shared_hops("../../c=0/x.parquet") == (1, "c=0/x.parquet")
    assert txn._shared_hops("../../../../c=0/x") == (2, "c=0/x")
    assert txn._branch_parent("/a/t/_branches/dev") == "/a/t"
    assert txn._branch_parent("/a/t") is None
    assert (
        txn._branch_ancestor("/a/t/_branches/d/_branches/e", 2) == "/a/t"
    )
    with pytest.raises(ValueError, match="no such branch ancestor"):
        txn._branch_ancestor("/a/t", 1)
    # layout and partition values see through the escape
    assert txn._file_layout("../../__commit=1/ds=a/p.parquet") == txn._file_layout(
        "__commit=1/ds=a/p.parquet"
    )
    assert txn._partition_values("../../__commit=1/ds=a/p.parquet") == (
        ("ds", "a"),
    )


def test_shared_branch_duckdb_interop(spark, t):
    """The engine-free reader resolves escaped refs too (the snapshot
    SQL path joins + normalizes the same rels)."""
    duckdb = pytest.importorskip("duckdb")
    from wikistream_lakehouse_spark.lakehouse import interop

    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 100, 102), b)
    sql = interop.duckdb_snapshot_sql(b)
    got = sorted(
        r[0] for r in duckdb.connect().execute(
            f"SELECT k FROM ({sql})"
        ).fetchall()
    )
    assert got == [0, 1, 2, 4, 5, 6, 7, 8, 9, 100, 101]


def test_copy_clone_of_shared_branch_canonicalizes(spark, t, tmp_path):
    """A plain (copy-mode) CLONE whose SOURCE is a shared-refs branch
    must strip the ``../../`` escape hops: local names inside the clone
    root, links resolved from the parent, sidecar f-values translated —
    not links planted two levels above the clone with rels no
    non-branch reader can resolve."""
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 20, 23), b)  # branch-local file
    txn.delete_where(spark, b, "k IN (4, 21)", mode="mor")  # escaped f
    want = _ks(spark, b)

    dst = str(tmp_path / "clones" / "c1")
    txn.clone_table(b, dst)
    # the clone is a self-contained non-branch table: same rows,
    # every state rel local (no escape hops), every file inside root
    assert _ks(spark, dst) == want
    files, dvs = txn._replay_state(dst, 0)
    assert files and all(not f.startswith("../") for f in files + dvs)
    for rel in files + dvs:
        assert os.path.exists(os.path.join(dst, rel))
    # nothing escaped the clone root (the pre-fix failure planted
    # files under tmp_path/clones/../ = tmp_path)
    stray = [
        f for f in os.listdir(str(tmp_path / "clones"))
        if f not in ("c1",)
    ]
    assert stray == []
    # physical independence: dropping the branch and vacuuming the
    # parent must not perturb the clone (it holds its own links)
    txn.drop_branch(t, "dev")
    txn.vacuum(t, retain_versions=1)
    assert _ks(spark, dst) == want


def test_shared_create_detects_vacuum_race(spark, t, monkeypatch):
    """The fork-vs-vacuum TOCTOU: a vacuum whose keep-set was computed
    before the branch's registry pin can reclaim the fork's files in
    the clone->register window. create_branch must detect it AFTER
    registering (when later vacuums are blocked by the pin), unregister,
    and refuse loudly — never return a permanently unreadable branch.
    Injection: delete a referenced parent file just before the registry
    commit lands, exactly what the racing vacuum would have done."""
    real = txn._try_commit
    b = txn.branch_location(t, "dev")

    def patched(*args, **kw):
        entry = args[2]
        if entry.get("op") == "create_branch":
            fs, _dvs = txn._replay_state(b, 0)
            victim = os.path.normpath(os.path.join(b, sorted(fs)[0]))
            os.remove(victim)
        return real(*args, **kw)

    monkeypatch.setattr(txn, "_try_commit", patched)
    with pytest.raises(ValueError, match="lost a race with vacuum"):
        txn.create_branch(t, "dev", mode="shared")
    monkeypatch.undo()
    assert "dev" not in txn.table_branches(t)


def test_shared_refs_protocol_stamps(spark, t):
    """Escaped refs are a PROTOCOL surface: the branch log demands the
    sharedRefs reader feature (a reader joining ../../ onto the table
    root scans garbage), and the parent gains the sharedRefs WRITER
    feature at fork (an unaware engine's vacuum would delete files
    that are the branch's only copy). Copy-mode forks stamp neither."""
    txn.create_branch(t, "dev", mode="shared")
    b = txn.branch_location(t, "dev")
    assert "sharedRefs" in (txn._load_entry(b, 0).get("readerFeatures") or [])
    wf = set()
    for v in txn._committed_versions(t):
        e = txn._load_entry(t, v) or {}
        if e.get("op") == "create_branch":
            wf |= set(e.get("writerFeatures", []))
    assert {"branches", "sharedRefs"} <= wf
    txn.create_branch(t, "cp")  # copy mode
    bc = txn.branch_location(t, "cp")
    assert "sharedRefs" not in (
        txn._load_entry(bc, 0).get("readerFeatures") or []
    )
    cp_wf = set()
    for v in txn._committed_versions(t):
        e = txn._load_entry(t, v) or {}
        if e.get("op") == "create_branch" and e["meta"]["name"] == "cp":
            cp_wf |= set(e.get("writerFeatures", []))
    assert "sharedRefs" not in cp_wf and "branches" in cp_wf
