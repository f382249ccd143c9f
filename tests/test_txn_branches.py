"""Branches (txn.create_branch / fast_forward — the Iceberg BRANCH
analogue, VERDICT r11 #6): a writable zero-copy fork under
``<table>/_branches/<name>``, registered in the main log, merged back
by a single fast-forward commit when main hasn't moved. Tags stay
immutable pins; branches are full tables, so every txn verb works on
them unchanged."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


def _rows(spark, path, version=None):
    return sorted(
        (r.k, r.v)
        for r in txn.read_table(spark, path, version=version).collect()
    )


@pytest.fixture()
def t(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 5), path)
    return path


def test_branch_forks_at_snapshot_and_registers(spark, t):
    txn.append(_kv(spark, 5, 8), t)  # v1
    txn.create_branch(t, "dev", version=0)
    reg = txn.table_branches(t)
    assert list(reg) == ["dev"] and reg["dev"]["base"] == 0
    # the registry carries the fork-point content fingerprint (r13):
    # it's what lets fast_forward's gate outlive cleanup_log
    assert reg["dev"]["fork"] == txn._state_fingerprint(
        txn._replay_state(t, 0)
    )
    b = txn.branch_location(t, "dev")
    assert _rows(spark, b) == _rows(spark, t, version=0)
    assert "branches" in txn.writer_features(t)


def test_branch_writes_are_isolated_both_ways(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 100, 103), b)
    txn.delete_where(spark, b, "k = 0")
    txn.append(_kv(spark, 50, 51), t)
    main = dict(_rows(spark, t))
    branch = dict(_rows(spark, b))
    assert 50 in main and 50 not in branch
    assert 100 in branch and 100 not in main
    assert 0 not in branch and 0 in main


def test_fast_forward_moves_main_in_one_commit(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 10, 13), b)
    txn.merge_on_read_upsert(
        spark, b,
        spark.createDataFrame([(0, 99.0)], "k long, v double"), ["k"],
    )
    base_v = txn.current_version(t)
    v = txn.fast_forward(spark, t, "dev")
    assert v == base_v + 1  # ONE commit
    assert _rows(spark, t) == _rows(spark, b)
    assert dict(_rows(spark, t))[0] == 99.0  # the DV rode along
    # pre-merge snapshots still time-travel
    assert 10 not in dict(_rows(spark, t, version=base_v))


def test_fast_forward_is_zero_copy_for_shared_files(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 10, 13), b)
    txn.fast_forward(spark, t, "dev")
    # every active main file exists as a main-relative name (linked, not
    # re-written): the FF added only the branch's NEW file
    e = txn._load_entry(t, txn.current_version(t))
    assert e["op"] == "fast_forward"
    assert len(e["add"]) >= 1
    for rel in txn._replay(t, txn.current_version(t)):
        assert os.path.exists(os.path.join(t, rel))


def test_fast_forward_rebases_branch_for_another_round(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 10, 12), b)
    v1 = txn.fast_forward(spark, t, "dev")
    assert txn.table_branches(t)["dev"]["base"] == v1
    txn.append(_kv(spark, 20, 22), b)  # keep working on the branch
    txn.fast_forward(spark, t, "dev")
    assert dict(_rows(spark, t)).keys() == dict(_rows(spark, b)).keys()


def test_fast_forward_refuses_diverged_main(spark, t):
    txn.create_branch(t, "dev")
    txn.append(_kv(spark, 50, 51), t)  # main moved past the fork
    with pytest.raises(ValueError, match="diverged"):
        txn.fast_forward(spark, t, "dev")


def test_fast_forward_refuses_metadata_divergence(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.set_constraint(spark, b, "pos", "k >= 0")
    with pytest.raises(ValueError, match="constraints"):
        txn.fast_forward(spark, t, "dev")


def test_fast_forward_carries_identity_high_water(spark, t):
    # reshape the table to carry the identity column, then declare it
    txn.replace_table(
        spark, t,
        spark.createDataFrame([(1, 0, 0.0)], "rid long, k long, v double"),
    )
    txn.set_identity_column(spark, t, "rid", always=True)
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(spark.createDataFrame([(7, 7.0)], "k long, v double"), b)
    bh = txn.identity_high_water(b, "rid")
    txn.fast_forward(spark, t, "dev")
    assert txn.identity_high_water(t, "rid") == bh
    txn.append(spark.createDataFrame([(8, 8.0)], "k long, v double"), t)
    ids = [r.rid for r in txn.read_table(spark, t).collect()]
    assert len(ids) == len(set(ids))  # no collision after the merge


def test_drop_branch_purges_and_frees_the_name(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.drop_branch(t, "dev")
    assert txn.table_branches(t) == {}
    assert txn.current_version(b) < 0
    txn.create_branch(t, "dev")  # name immediately reusable
    assert "dev" in txn.table_branches(t)


def test_ref_namespace_is_shared_with_tags(spark, t):
    txn.create_tag(t, "audit")
    with pytest.raises(ValueError, match="TAG"):
        txn.create_branch(t, "audit")
    txn.create_branch(t, "dev")
    with pytest.raises(ValueError, match="BRANCH"):
        txn.create_tag(t, "dev")
    with pytest.raises(ValueError, match="reserved"):
        txn.create_branch(t, "v3")


def test_branches_survive_checkpoint_and_log_cleanup(spark, t):
    txn.create_branch(t, "dev")
    txn.append(_kv(spark, 5, 7), t)
    txn.checkpoint(t)
    txn.cleanup_log(t)
    reg = txn.table_branches(t)
    assert list(reg) == ["dev"] and reg["dev"]["base"] == 0
    assert "fork" in reg["dev"]  # fingerprint survives the cleanup
    b = txn.branch_location(t, "dev")
    assert len(_rows(spark, b)) == 5


def test_main_vacuum_never_touches_branch_bytes(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    before = _rows(spark, b)
    # rewrite main so the fork-time files retire, then vacuum them away
    txn.replace_table(spark, t, _kv(spark, 200, 203))
    txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    assert _rows(spark, b) == before  # clone independence


def test_resolve_version_names_branches_helpfully(spark, t):
    txn.create_branch(t, "dev")
    with pytest.raises(ValueError, match="BRANCH"):
        txn.resolve_version(t, "dev")


def test_fast_forward_on_partitioned_table_links_hive_dirs(spark, tmp_path):
    t = str(tmp_path / "pt")
    txn.append(
        spark.createDataFrame(
            [(1, "a", "d1"), (2, "b", "d2")], "k long, v string, ds string"
        ),
        t,
        partition_by=["ds"],
    )
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(
        spark.createDataFrame([(3, "c", "d3")], "k long, v string, ds string"),
        b,
    )
    txn.fast_forward(spark, t, "dev")
    got = {(r.k, r.ds) for r in txn.read_table(spark, t).collect()}
    assert got == {(1, "d1"), (2, "d2"), (3, "d3")}
    # the linked file keeps its hive partition dir inside the rel path
    e = txn._load_entry(t, txn.current_version(t))
    assert any("ds=d3" in rel for rel in e["add"])


def test_fast_forward_preserves_shared_column_mapping(spark, t):
    # a rename BEFORE the fork is shared state — both sides carry it,
    # the divergence gate passes, and post-merge reads serve the
    # logical name
    txn.rename_column(spark, t, "v", "price")
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(
        spark.createDataFrame([(100, 1.0)], "k long, price double"), b
    )
    txn.fast_forward(spark, t, "dev")
    out = txn.read_table(spark, t)
    assert "price" in out.columns and out.count() == 6


def test_branch_vacuum_never_touches_main_bytes(spark, t):
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    before = _rows(spark, t)
    # branch rewrites itself completely, then vacuums the fork files
    txn.replace_table(spark, b, _kv(spark, 300, 303))
    txn.vacuum(b, retain_versions=1, orphan_grace_secs=0)
    assert _rows(spark, t) == before  # main unharmed (hard-link names)


def test_diverged_branch_merges_into_main_via_merge(spark, t):
    # the workflow the fast_forward refusal points at: main moved, so
    # promote the branch's rows with MERGE INTO main USING the branch
    txn.create_branch(t, "dev")
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 10, 12), b)
    txn.append(_kv(spark, 50, 51), t)  # main diverges
    with pytest.raises(ValueError, match="diverged"):
        txn.fast_forward(spark, t, "dev")
    txn.merge_on_read_upsert(spark, t, txn.read_table(spark, b), ["k"])
    main = dict(_rows(spark, t))
    assert {10, 11, 50} <= set(main)


def test_fast_forward_survives_aggressive_log_cleanup(spark, tmp_path):
    """VERDICT r12 #8: a branch forked EARLY in a long-lived table must
    stay mergeable after checkpoint + cleanup_log pruned the log below
    its fork version. The registry (base + fork fingerprint) rides the
    checkpoint's branches snapshot, and the FF content gate compares
    main's HEAD against the FINGERPRINT instead of replaying the
    (now-unreadable) fork version. Divergence detection must survive
    the same cleanup."""
    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    txn.append(_kv(spark, 0, 5), t)  # v0
    txn.append(_kv(spark, 5, 8), t)  # v1
    txn.create_branch(t, "dev", version=1)  # v2
    # 50-commit history of metadata-only churn (content unchanged
    # since the fork; tags would PIN versions and block the cleanup)
    for i in range(50):
        txn.set_stats_columns(t, ["k"] if i % 2 == 0 else ["v"])
    txn.checkpoint(t)
    gone = txn.cleanup_log(t)
    assert gone  # the fork version's entries are really deleted
    with pytest.raises(ValueError, match="retention horizon"):
        txn._replay_state(t, 1)  # fork version is genuinely unreadable
    reg = txn.table_branches(t)
    assert reg["dev"]["base"] == 1 and "fork" in reg["dev"]
    b = txn.branch_location(t, "dev")
    txn.append(_kv(spark, 100, 103), b)
    v = txn.fast_forward(spark, t, "dev")
    assert len(_rows(spark, t, version=v)) == 11
    # rebase refreshed the fingerprint: a second branch round-trip works
    txn.append(_kv(spark, 200, 201), b)
    txn.fast_forward(spark, t, "dev")
    assert len(_rows(spark, t)) == 12
    # and the gate still CATCHES real divergence post-cleanup: content
    # on main after the rebase refuses the next fast-forward
    txn.append(_kv(spark, 300, 302), t)
    txn.append(_kv(spark, 400, 401), b)
    with pytest.raises(ValueError, match="diverged"):
        txn.fast_forward(spark, t, "dev")
