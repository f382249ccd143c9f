"""Conditional MERGE builder (VERDICT r7 next #1): clause-combination
equivalence against computed expected tables, first-clause-wins
ordering, multiple-match refusal, by-source clauses, MoR vs CoW
physical parity, CDF composition, probe pruning, and race safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.merge_builder import (
    MergeCardinalityError,
    merge,
)


def _base(spark, tmp_path, name="t"):
    p = str(tmp_path / name)
    df = spark.createDataFrame(
        [(k, float(k), "old") for k in range(10)], "k long, v double, tag string"
    )
    txn.append(df.coalesce(1), p)
    return p


def _rows(spark, p):
    return {
        (r.k, r.v, r.tag)
        for r in txn.read_table(spark, p).collect()
    }


def test_scd_shape_all_clause_kinds(spark, tmp_path):
    """The canonical CDC batch: upserts, conditional deletes, and
    expiry of keys absent from the source — every clause kind in one
    merge, validated against the hand-computed expected set."""
    p = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [
            (2, 20.0, "D"),   # matched + op=D  -> delete
            (3, 30.0, "U"),   # matched + op=U  -> update
            (11, 110.0, "U"), # not matched     -> insert
            (12, 120.0, "D"), # not matched + D -> insert refused by cond
        ],
        "k long, v double, op string",
    )
    v = (
        merge(p, src, on=["k"])
        .when_matched_delete(condition="s.op = 'D'")
        .when_matched_update(set_={"v": "s.v", "tag": "'upd'"})
        .when_not_matched_insert(
            condition="s.op <> 'D'",
            values={"k": "s.k", "v": "s.v", "tag": "'new'"},
        )
        .when_not_matched_by_source_delete(condition="t.k >= 8")
        .execute(spark)
    )
    assert v == txn.current_version(p)
    expected = (
        {(k, float(k), "old") for k in range(10) if k not in (2, 3, 8, 9)}
        | {(3, 30.0, "upd"), (11, 110.0, "new")}
    )
    assert _rows(spark, p) == expected


def test_first_clause_wins_ordering(spark, tmp_path):
    """Two matched clauses that both apply: the FIRST added wins."""
    p = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, -1.0)], "k long, v double")
    (
        merge(p, src, on=["k"])
        .when_matched_update(set_={"tag": "'first'"})
        .when_matched_update(set_={"tag": "'second'"})
        .execute(spark)
    )
    assert (1, 1.0, "first") in _rows(spark, p)
    # reversed order on a fresh table picks the other clause
    p2 = _base(spark, tmp_path, "t2")
    (
        merge(p2, src, on=["k"])
        .when_matched_update(
            condition="s.v > 0", set_={"tag": "'guarded'"}
        )
        .when_matched_update(set_={"tag": "'fallthrough'"})
        .execute(spark)
    )
    # condition false (s.v = -1): falls through to the second clause
    assert (1, 1.0, "fallthrough") in _rows(spark, p2)


def test_multiple_match_refused_and_harmless_dups_allowed(spark, tmp_path):
    p = _base(spark, tmp_path)
    dup_src = spark.createDataFrame(
        [(1, 10.0), (1, 11.0)], "k long, v double"
    )
    with pytest.raises(MergeCardinalityError, match="multiple source"):
        (
            merge(p, dup_src, on=["k"])
            .when_matched_update(set_={"v": "s.v"})
            .execute(spark)
        )
    # nothing committed by the refused attempt
    assert _rows(spark, p) == {(k, float(k), "old") for k in range(10)}
    # duplicates whose clauses DON'T apply to the duplicated row are
    # fine (Delta semantics: the check covers modified rows only)
    v = (
        merge(p, dup_src, on=["k"])
        .when_matched_update(condition="s.v > 100", set_={"v": "s.v"})
        .when_not_matched_insert(condition="s.k > 50")
        .execute(spark)
    )
    assert v is None  # no row acted on: no commit
    assert txn.current_version(p) == 0


def test_update_set_star_and_insert_star_defaults(spark, tmp_path):
    """set_=None mirrors UPDATE SET * (same-named source columns);
    values=None mirrors INSERT * (absent target columns null-fill)."""
    p = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 100.0, "star"), (21, 210.0, "ins")],
        "k long, v double, tag string",
    )
    (
        merge(p, src, on=["k"])
        .when_matched_update()
        .when_not_matched_insert()
        .execute(spark)
    )
    rows = _rows(spark, p)
    assert (1, 100.0, "star") in rows and (21, 210.0, "ins") in rows
    # source lacking a target column: INSERT * null-fills it
    p2 = _base(spark, tmp_path, "t2")
    narrow = spark.createDataFrame([(33,)], "k long")
    (
        merge(p2, narrow, on=["k"]).when_not_matched_insert().execute(spark)
    )
    got = txn.read_table(spark, p2).filter("k = 33").first()
    assert got.v is None and got.tag is None


def test_by_source_update_expires_stale_rows(spark, tmp_path):
    p = _base(spark, tmp_path)
    src = spark.createDataFrame([(0, 0.0)], "k long, v double")
    (
        merge(p, src, on=["k"])
        .when_not_matched_by_source_update(
            condition="t.k % 2 = 1", set_={"tag": "'stale'"}
        )
        .execute(spark)
    )
    rows = _rows(spark, p)
    assert all(tag == "stale" for k, _, tag in rows if k % 2 == 1)
    assert all(tag == "old" for k, _, tag in rows if k % 2 == 0)


def test_cow_and_mor_agree_and_compose_with_cdf(spark, tmp_path):
    """Same merge in both physical modes lands the same table; the MoR
    commit keeps the change feed recoverable (no removed files) and
    shows the update as its delete+insert pair."""
    srcs = []
    for name in ("mor", "cow"):
        p = _base(spark, tmp_path, name)
        srcs.append(p)
    src = spark.createDataFrame(
        [(1, -1.0, "x"), (15, 15.0, "x")], "k long, v double, tag string"
    )

    def run(p, mode):
        return (
            merge(p, src, on=["k"])
            .when_matched_update(set_={"v": "s.v"})
            .when_not_matched_insert()
            .execute(spark, mode=mode)
        )

    run(srcs[0], "mor")
    run(srcs[1], "cow")
    assert _rows(spark, srcs[0]) == _rows(spark, srcs[1])
    # MoR: append+DV commit -> CDF recoverable
    cdf = txn.table_changes_cdf(spark, srcs[0], 0)
    ins = {(r.k, r.v) for r in cdf.filter("_change_type = 'insert'").collect()}
    dels = {(r.k, r.v) for r in cdf.filter("_change_type = 'delete'").collect()}
    assert (1, -1.0) in ins and (15, 15.0) in ins and (1, 1.0) in dels
    # CoW: removes files -> CDF refuses, snapshot diff is the route
    with pytest.raises(ValueError, match="not recoverable|diff snapshots"):
        txn.table_changes_cdf(spark, srcs[1], 0)


def test_probe_pruning_reads_only_candidate_files(spark, tmp_path, monkeypatch):
    """Three disjoint stats-logged files; a merge touching keys in one
    file's range probes exactly that file."""
    p = str(tmp_path / "t")
    for lo in (0, 100, 200):
        df = spark.createDataFrame(
            [(k, float(k), "old") for k in range(lo, lo + 100)],
            "k long, v double, tag string",
        )
        txn.append(df.coalesce(1), p, stats_cols=["k"])
    probes = []
    real = txn._read_files

    def spy(spark_, path, fs, store=None, dvs=None, keep_rowpos=False):
        if keep_rowpos:
            probes.append(sorted(fs))
        return real(spark_, path, fs, store, dvs=dvs, keep_rowpos=keep_rowpos)

    monkeypatch.setattr(txn, "_read_files", spy)
    src = spark.createDataFrame([(150, -1.0)], "k long, v double")
    (
        merge(p, src, on=["k"])
        .when_matched_update(set_={"v": "s.v"})
        .execute(spark)
    )
    assert probes and len(probes[-1]) == 1
    # a by_source clause needs every target row: full candidate set
    probes.clear()
    (
        merge(p, src, on=["k"])
        .when_not_matched_by_source_delete(condition="t.k > 10000")
        .execute(spark)
    )
    # no row matched the condition -> no commit, but the probe read the
    # FULL active set (prior merge's appends included)
    active = txn._replay(p, txn.current_version(p))
    assert probes and probes[-1] == sorted(active)


def test_expression_on_with_extra_conjunct(spark, tmp_path):
    """ON can carry non-equi conjuncts; the equi pair still prunes and
    the full predicate gates matching."""
    p = _base(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, 99.0), (2, -2.0)], "k long, nv double"
    )
    (
        merge(p, src, on="t.k = s.k AND s.nv > 0")
        .when_matched_update(set_={"v": "s.nv"})
        .when_not_matched_insert(
            values={"k": "s.k + 100", "v": "s.nv", "tag": "'edge'"}
        )
        .execute(spark)
    )
    rows = _rows(spark, p)
    assert (1, 99.0, "old") in rows          # matched, updated
    assert (2, 2.0, "old") in rows           # k=2 unmatched (nv<0): kept
    assert (102, -2.0, "edge") in rows       # ...and inserted via clause


def test_race_rerun_lands_serializable_outcome(spark, tmp_path, monkeypatch):
    """A merge losing the commit race re-runs against the new HEAD: the
    racer's appended row is visible to the re-run (gets updated)."""
    p = _base(spark, tmp_path)
    real = txn._try_commit
    state = {"raced": False}

    def racing(path, v, entry, store=None):
        if entry.get("op") == "merge" and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(txn, "_try_commit", real)
            txn.append(
                spark.createDataFrame(
                    [(50, 50.0, "old")], "k long, v double, tag string"
                ),
                p,
            )
            monkeypatch.setattr(txn, "_try_commit", racing)
            return False
        return real(path, v, entry, store)

    monkeypatch.setattr(txn, "_try_commit", racing)
    # k=5 exists at base (so the first attempt reaches its commit and
    # loses the race); k=50 is the racer's row — the re-run sees it
    src = spark.createDataFrame(
        [(5, -5.0), (50, -50.0)], "k long, v double"
    )
    v = (
        merge(p, src, on=["k"])
        .when_matched_update(set_={"v": "s.v", "tag": "'upd'"})
        .execute(spark)
    )
    assert state["raced"] and v == txn.current_version(p)
    rows = _rows(spark, p)
    assert (5, -5.0, "upd") in rows and (50, -50.0, "upd") in rows


def test_constraints_and_generated_columns_apply_to_merge_output(
    spark, tmp_path
):
    p = _base(spark, tmp_path)
    txn.set_constraint(spark, p, "v_nonneg", "v >= 0")
    src_ok = spark.createDataFrame([(1, 5.0)], "k long, v double")
    (
        merge(p, src_ok, on=["k"])
        .when_matched_update(set_={"v": "s.v"})
        .execute(spark)
    )
    assert (1, 5.0, "old") in _rows(spark, p)
    src_bad = spark.createDataFrame([(2, -5.0)], "k long, v double")
    with pytest.raises(Exception, match="v_nonneg|violat"):
        (
            merge(p, src_bad, on=["k"])
            .when_matched_update(set_={"v": "s.v"})
            .execute(spark)
        )
    # refused attempt left no partial state
    assert (2, 2.0, "old") in _rows(spark, p)


def test_no_clauses_and_missing_table_refused(spark, tmp_path):
    p = _base(spark, tmp_path)
    src = spark.createDataFrame([(1, 1.0)], "k long, v double")
    with pytest.raises(ValueError, match="no WHEN clauses"):
        merge(p, src, on=["k"]).execute(spark)
    with pytest.raises(ValueError, match="no committed data"):
        (
            merge(str(tmp_path / "nope"), src, on=["k"])
            .when_matched_update()
            .execute(spark)
        )
