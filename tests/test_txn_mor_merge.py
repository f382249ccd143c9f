"""Merge-on-read MERGE (txn.merge_on_read_upsert) and CDC replication
(streaming/pipeline.cdc_replicate_sink). The scale property under test:
a merge commits new rows + a deletion vector in ONE atomic entry and
never read-rewrites an existing data file — every pre-merge file keeps
its exact path — while the row-level change feed stays recoverable
across it (an UPDATE streams as its delete+insert pair), so a replica
maintained from the CDF converges through inserts, updates, AND
deletes."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.incremental import (
    read_view,
    refresh_aggregate,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, grp string, v double")


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), t)
    txn.append(_df(spark, [(3, "b", 3.0), (4, "b", 4.0)]), t)
    return t


def _state(spark, t):
    return sorted((r.k, r.grp, r.v) for r in txn.read_table(spark, t).collect())


def test_merge_upserts_and_deletes_in_one_commit(spark, table):
    files_before = txn._replay_state(table, txn.current_version(table))[0]
    v = txn.merge_on_read_upsert(
        spark,
        table,
        _df(spark, [(2, "a", 20.0), (5, "c", 5.0)]),  # update k=2, insert k=5
        keys=["k"],
        deletes=spark.createDataFrame([(4,)], "k long"),  # delete k=4
    )
    assert v == 2  # ONE commit for the whole merge
    assert _state(spark, table) == [
        (1, "a", 1.0),
        (2, "a", 20.0),
        (3, "b", 3.0),
        (5, "c", 5.0),
    ]
    files_after, dvs = txn._replay_state(table, txn.current_version(table))
    # every pre-merge file survives at its exact path (MoR, not rewrite)
    assert set(files_before) <= set(files_after)
    # sidecar output is AQE-sized by target-file hash; a small merge's
    # positions coalesce into one sidecar
    assert len(dvs) == 1
    h = txn.history(table)[-1]
    assert h["op"] == "merge" and h["n_remove"] == 0


def test_merge_without_matches_adds_no_vector(spark, table):
    txn.merge_on_read_upsert(
        spark, table, _df(spark, [(9, "z", 9.0)]), keys=["k"]
    )
    assert txn._replay_state(table, txn.current_version(table))[1] == []
    assert len(_state(spark, table)) == 5


def test_merge_creates_table_and_ignores_vacuous_deletes(spark, tmp_path):
    t = str(tmp_path / "new")
    txn.merge_on_read_upsert(
        spark,
        t,
        _df(spark, [(1, "a", 1.0)]),
        keys=["k"],
        deletes=spark.createDataFrame([(99,)], "k long"),
    )
    assert _state(spark, t) == [(1, "a", 1.0)]


def test_merge_is_idempotent_semantics_equal_rewrite_merge(spark, table):
    """Same outcome as the O(table) transactional_upsert on the same
    inputs — the strategies differ only in physical IO."""
    import shutil
    import tempfile

    twin = tempfile.mkdtemp() + "/twin"
    shutil.copytree(table, twin)
    src = _df(spark, [(2, "a", 20.0), (5, "c", 5.0)])
    txn.merge_on_read_upsert(spark, table, src, keys=["k"])
    txn.transactional_upsert(spark, twin, src, keys=["k"])
    assert _state(spark, table) == _state(spark, twin)


def test_merge_races_append(spark, table):
    errs = []

    def do_append():
        try:
            txn.append(_df(spark, [(7, "b", 7.0)]), table)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th = threading.Thread(target=do_append)
    th.start()
    txn.merge_on_read_upsert(
        spark, table, _df(spark, [(1, "a", 10.0)]), keys=["k"], max_retries=10
    )
    th.join()
    assert not errs
    got = _state(spark, table)
    assert (1, "a", 10.0) in got and (7, "b", 7.0) in got and len(got) == 5


def test_cdf_recovers_merge_as_delete_insert_pairs(spark, table):
    base = txn.current_version(table)
    txn.merge_on_read_upsert(
        spark,
        table,
        _df(spark, [(2, "a", 20.0)]),
        keys=["k"],
        deletes=spark.createDataFrame([(3,)], "k long"),
    )
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in txn.table_changes_cdf(spark, table, base).collect()
    )
    # UPDATE k=2 → delete image of the old row + insert of the new;
    # DELETE k=3 → delete image only
    assert got == [(2, 2.0, "delete"), (2, 20.0, "insert"), (3, 3.0, "delete")]


def test_retract_view_folds_across_mor_merge(spark, table):
    view = table + "_view"
    measures = {"n": ("count", "k"), "total": ("sum", "v")}
    refresh_aggregate(
        spark, table, view, ["grp"], measures, on_mutation="retract"
    )
    txn.merge_on_read_upsert(
        spark,
        table,
        _df(spark, [(2, "a", 20.0)]),
        keys=["k"],
        deletes=spark.createDataFrame([(3,)], "k long"),
    )
    refresh_aggregate(
        spark, table, view, ["grp"], measures, on_mutation="retract"
    )
    expect = sorted(
        tuple(r)
        for r in txn.read_table(spark, table)
        .groupBy("grp")
        .agg(F.count("k").alias("n"), F.sum("v").alias("total"))
        .collect()
    )
    assert sorted(tuple(r) for r in read_view(spark, view).collect()) == expect


def test_cdc_replication_converges_through_deletes(spark, tmp_path):
    """End to end: source takes appends, a MoR merge (update+insert),
    and a DV delete; the CDF-driven replica converges to the source
    state, exactly-once across a replayed drain."""
    from wikistream_lakehouse_spark.streaming.pipeline import cdc_replicate_sink

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    txn.append(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), src)

    def drain():
        q = cdc_replicate_sink(
            spark, src, dst, ["k"], ckpt, available_now=True
        )
        q.awaitTermination(300)

    drain()
    assert _state(spark, dst) == _state(spark, src)

    txn.merge_on_read_upsert(
        spark, src, _df(spark, [(2, "a", 20.0), (3, "b", 3.0)]), keys=["k"]
    )
    txn.delete_where(spark, src, "k = 1", mode="mor")
    drain()
    assert _state(spark, dst) == _state(spark, src) == [
        (2, "a", 20.0),
        (3, "b", 3.0),
    ]
    # replay with nothing new: no duplicate application, same state
    drain()
    assert _state(spark, dst) == [(2, "a", 20.0), (3, "b", 3.0)]


def test_streaming_mv_maintenance_tracks_appends_and_mor_deletes(
    spark, tmp_path
):
    """VERDICT r5 #7: the CDF stream as refresh trigger + the
    incremental fold as exactly-once state — a continuously-maintained
    view equals the full recompute through appends, a MoR merge, and a
    DV delete, and a replayed drain changes nothing."""
    from wikistream_lakehouse_spark.lakehouse.incremental import ViewSpec
    from wikistream_lakehouse_spark.streaming.pipeline import (
        mv_maintenance_sink,
    )

    src = str(tmp_path / "src")
    view = str(tmp_path / "view")
    ckpt = str(tmp_path / "ckpt")
    spec = ViewSpec(
        path=view,
        group_by=("grp",),
        measures={"n": ("count", "k"), "total": ("sum", "v")},
        on_mutation="retract",
    )
    txn.append(_df(spark, [(1, "a", 1.0), (2, "a", 2.0)]), src)

    def drain():
        q = mv_maintenance_sink(spark, src, spec, ckpt, available_now=True)
        q.awaitTermination(300)

    def expect():
        return sorted(
            tuple(r)
            for r in txn.read_table(spark, src)
            .groupBy("grp")
            .agg(F.count("k").alias("n"), F.sum("v").alias("total"))
            .collect()
        )

    def got():
        return sorted(tuple(r) for r in read_view(spark, view).collect())

    drain()
    assert got() == expect()

    txn.append(_df(spark, [(3, "b", 3.0)]), src)
    txn.merge_on_read_upsert(
        spark,
        src,
        _df(spark, [(2, "a", 20.0), (4, "c", 4.0)]),
        keys=["k"],
    )
    txn.delete_where(spark, src, "k = 1", mode="mor")
    drain()
    assert got() == expect()

    drain()  # replay with nothing new: exactly-once, view unchanged
    assert got() == expect()
