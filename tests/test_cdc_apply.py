"""Streaming CDC apply (streaming/cdc_apply.py): latest-per-key collapse,
cross-batch sequence guarding, tombstoned deletes that survive
out-of-order arrival, exactly-once replay identity, and the purge
retention trade — APPLY CHANGES INTO semantics on the txn table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.streaming.cdc_apply import (
    DELETED_COL,
    _apply_batch,
    _prepared,
    apply_changes,
    cdc_snapshot,
    collapse_latest,
    purge_tombstones,
)

SCHEMA = "k long, v string, seq long, op string"


def _write_batch_file(spark, src_dir, rows, mtime):
    """One parquet file = one micro-batch (maxFilesPerTrigger=1); mtime
    ordering fixes the batch order the file source discovers."""
    os.makedirs(src_dir, exist_ok=True)
    n_before = len([f for f in os.listdir(src_dir) if f.startswith("b")])
    sub = os.path.join(src_dir, f"b{n_before}")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(sub)
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            p = os.path.join(root, f)
            if f"b{n_before}" in root:
                os.utime(p, (mtime, mtime))
    os.utime(sub, (mtime, mtime))


def _run(spark, src_dir, table, ckpt, app_id="cdc-test"):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(os.path.join(src_dir, "*"))
    )
    q = apply_changes(
        stream,
        str(table),
        keys=["k"],
        sequence_by="seq",
        checkpoint=str(ckpt),
        app_id=app_id,
        apply_as_delete="op = 'D'",
        except_columns=("op",),
        available_now=True,
    )
    q.awaitTermination(300)


def test_collapse_latest_picks_highest_sequence_deterministically(spark):
    rows = [
        (1, "a", 10, "U"),
        (1, "b", 12, "U"),
        (1, "c", 11, "U"),
        (2, "x", 5, "U"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.k: (r.v, r.seq) for r in collapse_latest(df, ["k"], "seq").collect()}
    assert got == {1: ("b", 12), 2: ("x", 5)}
    # exact-tie: the winner is a deterministic function of row content,
    # so two independent collapses (a replay) agree
    ties = spark.createDataFrame(
        [(1, "p", 7, "U"), (1, "q", 7, "U")], SCHEMA
    )
    w1 = collapse_latest(ties, ["k"], "seq").collect()[0].v
    w2 = collapse_latest(ties, ["k"], "seq").collect()[0].v
    assert w1 == w2


def test_apply_changes_end_to_end_out_of_order_and_deletes(spark, tmp_path):
    src, table, ckpt = tmp_path / "src", tmp_path / "t", tmp_path / "ckpt"
    # batch 0: initial keys; k=1 arrives three times out of order
    _write_batch_file(
        spark,
        str(src),
        [
            (1, "a0", 10, "U"),
            (1, "a1", 11, "U"),
            (1, "stale", 9, "U"),
            (2, "b0", 10, "U"),
            (3, "c0", 10, "U"),
            (4, "d0", 10, "U"),
        ],
        mtime=1_000,
    )
    # batch 1: delete k=2, newer update k=3, STALE update k=4, new k=5
    _write_batch_file(
        spark,
        str(src),
        [
            (2, None, 20, "D"),
            (3, "c1", 20, "U"),
            (4, "old", 5, "U"),
            (5, "e0", 20, "U"),
        ],
        mtime=2_000,
    )
    # batch 2: update OLDER than k=2's delete — must not resurrect
    _write_batch_file(spark, str(src), [(2, "zombie", 15, "U")], mtime=3_000)
    _run(spark, str(src), table, ckpt)

    live = {r.k: (r.v, r.seq) for r in cdc_snapshot(spark, str(table)).collect()}
    assert live == {1: ("a1", 11), 3: ("c1", 20), 4: ("d0", 10), 5: ("e0", 20)}
    # the tombstone is retained with the delete's sequence, op not stored
    full = txn.read_table(spark, str(table))
    assert "op" not in full.columns
    dead = full.filter(F.col(DELETED_COL)).collect()
    assert [(r.k, r.seq) for r in dead] == [(2, 20)]


def test_replay_after_lost_checkpoint_commits_nothing(spark, tmp_path):
    src, table = tmp_path / "src", tmp_path / "t"
    _write_batch_file(
        spark, str(src), [(1, "a", 1, "U"), (2, "b", 1, "U")], mtime=1_000
    )
    _write_batch_file(
        spark, str(src), [(1, "a2", 2, "U"), (2, None, 3, "D")], mtime=2_000
    )
    _run(spark, str(src), table, tmp_path / "ck1")
    v_before = txn.current_version(str(table))
    rows_before = sorted(
        (r.k, r.v, r.seq) for r in txn.read_table(spark, str(table)).collect()
    )
    # checkpoint lost → every batch replays with the same ids + content:
    # the commit-log identity recognizes each and commits NOTHING new
    _run(spark, str(src), table, tmp_path / "ck2")
    assert txn.current_version(str(table)) == v_before
    assert (
        sorted(
            (r.k, r.v, r.seq)
            for r in txn.read_table(spark, str(table)).collect()
        )
        == rows_before
    )


def test_checkpoint_reset_over_new_data_refuses(spark, tmp_path):
    src1, table = tmp_path / "src1", tmp_path / "t"
    _write_batch_file(spark, str(src1), [(1, "a", 1, "U")], mtime=1_000)
    _run(spark, str(src1), table, tmp_path / "ck1")
    # new checkpoint, same app_id, DIFFERENT batch-0 content
    src2 = tmp_path / "src2"
    _write_batch_file(spark, str(src2), [(9, "z", 9, "U")], mtime=1_000)
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="DIFFERENT content"):
        _run(spark, str(src2), table, tmp_path / "ck2")


def test_purge_tombstones_and_the_documented_resurrection_hazard(
    spark, tmp_path
):
    table = str(tmp_path / "t")

    def apply_rows(rows):
        batch = spark.createDataFrame(rows, SCHEMA)
        prepared = _prepared(batch, ["k"], "seq", "op = 'D'", ("op",))
        return _apply_batch(prepared, table, ["k"], "seq")

    apply_rows([(1, "a", 10, "U"), (2, "b", 10, "U")])
    apply_rows([(2, None, 20, "D")])
    # stale post-delete change: blocked while the tombstone exists
    apply_rows([(2, "zombie", 15, "U")])
    assert {r.k for r in cdc_snapshot(spark, table).collect()} == {1}

    purge_tombstones(spark, table, "seq", horizon=20)
    assert txn.read_table(spark, table).filter(F.col(DELETED_COL)).count() == 0
    # after the purge the horizon contract is the ONLY protection: the
    # same stale change now resurrects the key (the documented trade —
    # purge only past the out-of-order horizon)
    apply_rows([(2, "zombie", 15, "U")])
    assert {r.k for r in cdc_snapshot(spark, table).collect()} == {1, 2}


def test_partial_purge_keeps_young_tombstones(spark, tmp_path):
    table = str(tmp_path / "t")

    def apply_rows(rows):
        batch = spark.createDataFrame(rows, SCHEMA)
        prepared = _prepared(batch, ["k"], "seq", "op = 'D'", ("op",))
        return _apply_batch(prepared, table, ["k"], "seq")

    apply_rows([(1, "a", 10, "U"), (2, "b", 10, "U")])
    apply_rows([(1, None, 15, "D"), (2, None, 30, "D")])
    purge_tombstones(spark, table, "seq", horizon=20)
    dead = txn.read_table(spark, table).filter(F.col(DELETED_COL))
    assert [(r.k, r.seq) for r in dead.collect()] == [(2, 30)]


def test_cdc_lifecycle_purge_compact_time_travel(spark, tmp_path):
    """Maintenance composition: tombstone purge (MoR delete) then
    compact must leave the live snapshot unchanged, retire the deletion
    vectors physically, and keep pre-purge time travel showing the
    tombstone — the standard lakehouse retention lifecycle applied to
    the CDC serving table."""
    table = str(tmp_path / "t")

    def apply_rows(rows):
        batch = spark.createDataFrame(rows, SCHEMA)
        prepared = _prepared(batch, ["k"], "seq", "op = 'D'", ("op",))
        return _apply_batch(prepared, table, ["k"], "seq")

    apply_rows([(1, "a", 10, "U"), (2, "b", 10, "U"), (3, "c", 10, "U")])
    apply_rows([(2, None, 20, "D"), (3, "c1", 30, "U")])
    v_with_tombstone = txn.current_version(table)
    live_before = sorted(
        (r.k, r.v, r.seq) for r in cdc_snapshot(spark, table).collect()
    )
    purge_tombstones(spark, table, "seq")
    txn.compact(spark, table)
    assert (
        sorted((r.k, r.v, r.seq) for r in cdc_snapshot(spark, table).collect())
        == live_before
    )
    # full table now equals the live view (tombstones physically gone)
    assert txn.read_table(spark, table).filter(F.col(DELETED_COL)).count() == 0
    # pre-purge snapshot still shows the tombstone (time travel)
    old = txn.read_table(spark, table, version=v_with_tombstone)
    assert old.filter(F.col(DELETED_COL)).count() == 1


def test_cdc_apply_feeds_retract_materialized_view(spark, tmp_path):
    """Serving-chain composition: a retract-mode incremental view over
    the CDC table stays equal to a full re-aggregate of the LIVE
    snapshot after every apply batch — the view's row-local `where`
    excludes tombstones, and the MoR merge's recoverable change feed
    lets the fold subtract superseded rows instead of rebuilding."""
    from wikistream_lakehouse_spark.lakehouse.incremental import (
        ViewSpec,
        read_view,
    )

    table = str(tmp_path / "t")
    schema = "k long, grp string, val long, seq long, op string"
    spec = ViewSpec(
        path=str(tmp_path / "view"),
        group_by=("grp",),
        measures={"n_keys": ("count", "1"), "total": ("sum", "val")},
        where=f"NOT {DELETED_COL}",
        on_mutation="retract",
    )

    def apply_rows(rows):
        batch = spark.createDataFrame(rows, schema)
        prepared = _prepared(batch, ["k"], "seq", "op = 'D'", ("op",))
        _apply_batch(prepared, table, ["k"], "seq")
        spec.refresh(spark, table)

    def expected():
        return {
            (r.grp, r.n_keys, r.total)
            for r in cdc_snapshot(spark, table)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("val").alias("total"),
            )
            .collect()
        }

    def got():
        return {
            (r.grp, r.n_keys, r.total)
            for r in read_view(spark, spec.path).collect()
        }

    apply_rows(
        [(1, "a", 10, 1, "U"), (2, "a", 20, 1, "U"), (3, "b", 30, 1, "U")]
    )
    assert got() == expected()
    # update moves a value, delete tombstones a key, new key arrives
    apply_rows(
        [(1, "a", 15, 2, "U"), (3, None, 0, 2, "D"), (4, "b", 40, 2, "U")]
    )
    assert got() == expected()
    # a whole group dies
    apply_rows([(4, None, 0, 3, "D")])
    assert got() == expected()
    assert {r.grp for r in read_view(spark, spec.path).collect()} == {"a"}


def test_cdc_apply_composite_keys(spark, tmp_path):
    """Multi-column keys: collapse, sequence guard, and tombstones all
    partition on the full key tuple."""
    table = str(tmp_path / "t")
    schema = "region string, id long, v string, seq long, op string"

    def apply_rows(rows):
        batch = spark.createDataFrame(rows, schema)
        prepared = _prepared(
            batch, ["region", "id"], "seq", "op = 'D'", ("op",)
        )
        return _apply_batch(prepared, table, ["region", "id"], "seq")

    apply_rows(
        [
            ("eu", 1, "a", 10, "U"),
            ("us", 1, "b", 10, "U"),  # same id, different region
            ("eu", 2, "c", 10, "U"),
        ]
    )
    apply_rows(
        [
            ("eu", 1, "a2", 20, "U"),  # updates ONLY (eu, 1)
            ("us", 1, None, 20, "D"),  # deletes ONLY (us, 1)
        ]
    )
    live = {
        (r.region, r.id): r.v for r in cdc_snapshot(spark, table).collect()
    }
    assert live == {("eu", 1): "a2", ("eu", 2): "c"}


def test_kill_and_resume_replays_skip_and_converge(spark, tmp_path):
    """VERDICT r8 next #6: a real StreamingQuery killed mid-history and
    resumed FROM ITS CHECKPOINT must (a) fire the (app_id, batch_id,
    fingerprint) replay skip for the batch whose sink commit landed but
    whose streaming-checkpoint commit was lost (the classic crash
    window), and (b) converge to the one-shot oracle state. The crash
    is simulated surgically: run 1 processes batch 0 and stops; its
    checkpoint `commits/` marker is deleted, so run 2 REPLAYS batch 0
    before the new files — the commit-log identity must recognize it."""
    src, table, ckpt = tmp_path / "src", tmp_path / "t", tmp_path / "ckpt"
    _write_batch_file(
        spark,
        str(src),
        [(1, "a0", 10, "U"), (2, "b0", 10, "U"), (3, "c0", 10, "U")],
        mtime=1_000,
    )
    _run(spark, str(src), table, ckpt, app_id="cdc-resume")
    v_run1 = txn.current_version(str(table))
    assert v_run1 >= 0
    # crash window: the sink committed batch 0 but the streaming
    # checkpoint's completion marker was lost
    commits_dir = os.path.join(str(ckpt), "commits")
    newest = max(os.listdir(commits_dir), key=lambda n: n.lstrip("."))
    os.remove(os.path.join(commits_dir, newest))
    # more history arrives while the query is down (incl. out-of-order
    # and a delete, so convergence is not append-trivial)
    _write_batch_file(
        spark,
        str(src),
        [(2, None, 20, "D"), (3, "c1", 20, "U"), (4, "d0", 20, "U")],
        mtime=2_000,
    )
    _write_batch_file(
        spark, str(src), [(3, "stale", 15, "U"), (2, "zombie", 15, "U")],
        mtime=3_000,
    )
    _run(spark, str(src), table, ckpt, app_id="cdc-resume")
    # (a) the replayed batch 0 committed NOTHING new: exactly one commit
    # per batch_id in the table's whole history
    metas = [
        (m["batch_id"]) for m in txn.committed_meta(str(table))
        if m.get("app_id") == "cdc-resume"
    ]
    # batch 0 exactly ONCE (the replay skip fired); batch 2 is all-stale
    # rows, which commit nothing by design (no meta row)
    assert sorted(metas) == [0, 1], f"per-batch commits: {metas}"
    # (b) converged to the one-shot oracle state
    live = {r.k: (r.v, r.seq) for r in cdc_snapshot(spark, str(table)).collect()}
    assert live == {1: ("a0", 10), 3: ("c1", 20), 4: ("d0", 20)}
    full = txn.read_table(spark, str(table))
    dead = [(r.k, r.seq) for r in full.filter(F.col(DELETED_COL)).collect()]
    assert dead == [(2, 20)]


def test_scd2_kill_and_resume_replays_skip_and_converge(spark, tmp_path):
    """SCD2 mode of the same restart contract: the replayed batch is a
    no-op, and the spliced history equals the one-shot fold."""
    from wikistream_lakehouse_spark.streaming.cdc_apply import (
        SCD2_CURRENT,
        SCD2_END,
        SCD2_START,
        apply_changes_scd2,
    )

    src, table, ckpt = tmp_path / "src", tmp_path / "t2", tmp_path / "ck2"

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(str(src), "*"))
        )
        q = apply_changes_scd2(
            stream,
            str(table),
            keys=["k"],
            sequence_by="seq",
            checkpoint=str(ckpt),
            app_id="scd2-resume",
            apply_as_delete="op = 'D'",
            except_columns=("op",),
            available_now=True,
        )
        q.awaitTermination(300)

    _write_batch_file(
        spark, str(src), [(1, "a0", 10, "U"), (2, "b0", 10, "U")], mtime=1_000
    )
    run()
    commits_dir = os.path.join(str(ckpt), "commits")
    newest = max(os.listdir(commits_dir), key=lambda n: n.lstrip("."))
    os.remove(os.path.join(commits_dir, newest))
    # out-of-order version for k=1 splices BETWEEN existing ones after
    # the restart; k=2 gets a tombstone version
    _write_batch_file(
        spark, str(src), [(1, "a2", 30, "U"), (2, None, 20, "D")], mtime=2_000
    )
    _write_batch_file(spark, str(src), [(1, "a1", 20, "U")], mtime=3_000)
    run()
    metas = [
        m["batch_id"] for m in txn.committed_meta(str(table))
        if m.get("app_id") == "scd2-resume"
    ]
    assert sorted(metas) == [0, 1, 2], f"per-batch commits: {metas}"
    hist = sorted(
        (
            (r.k, r.v, r[SCD2_START], r[SCD2_END], r[SCD2_CURRENT])
            for r in txn.read_table(spark, str(table)).select(
                "k", "v", SCD2_START, SCD2_END, SCD2_CURRENT
            ).collect()
        ),
        key=lambda t: (t[0], t[2]),  # (key, start_seq): v may be None
    )
    assert hist == [
        (1, "a0", 10, 20, False),
        (1, "a1", 20, 30, False),
        (1, "a2", 30, None, True),
        (2, "b0", 10, 20, False),
        (2, None, 20, None, True),
    ], hist


# ---------------------------------------------------------------------------
# Expectations (DLT expect_all[_or_drop/_or_fail] shape)
# ---------------------------------------------------------------------------


def test_expectations_null_passes_and_actions(spark):
    from wikistream_lakehouse_spark.streaming.cdc_apply import (
        ExpectationViolation,
        _enforce_expectations,
    )

    df = spark.createDataFrame(
        [(1, "a", 10, "U"), (2, None, 20, "U"), (3, "c", -5, None)], SCHEMA
    )
    # CHECK semantics: NULL passes (op <> 'X' on a NULL op is not FALSE)
    clean, m = _enforce_expectations(
        df, {"op_known": "op <> 'X'", "v_present": "v IS NOT NULL"}
    )
    assert m["rows_in"] == 3
    assert m["checks"]["op_known"]["violations"] == 0
    assert m["checks"]["v_present"]["violations"] == 1
    assert clean.count() == 2  # default action drops the violator
    # warn keeps rows but still counts
    kept, m2 = _enforce_expectations(
        df, {"v_present": ("v IS NOT NULL", "warn")}
    )
    assert kept.count() == 3
    assert m2["checks"]["v_present"]["violations"] == 1
    # fail refuses the batch
    with pytest.raises(ExpectationViolation, match="seq_pos"):
        _enforce_expectations(df, {"seq_pos": ("seq > 0", "fail")})


def test_apply_changes_with_expectations_end_to_end(spark, tmp_path):
    """Dropped rows never reach the table; per-batch violation counts
    live in the commit log and read back via expectation_metrics."""
    from wikistream_lakehouse_spark.streaming.cdc_apply import (
        apply_changes,
        expectation_metrics,
    )

    src, table, ckpt = tmp_path / "src", tmp_path / "t", tmp_path / "ckpt"
    _write_batch_file(
        spark,
        str(src),
        [(1, "a", 10, "U"), (2, None, 11, "U"), (3, "c", 12, "U")],
        mtime=1_000,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(str(src), "*"))
    )
    q = apply_changes(
        stream,
        str(table),
        keys=["k"],
        sequence_by="seq",
        checkpoint=str(ckpt),
        app_id="cdc-exp",
        apply_as_delete="op = 'D'",
        except_columns=("op",),
        available_now=True,
        expectations={"v_present": "v IS NOT NULL"},
    )
    q.awaitTermination(300)
    live = {r.k for r in cdc_snapshot(spark, str(table)).collect()}
    assert live == {1, 3}  # k=2 violated and was dropped pre-merge
    metrics = expectation_metrics(str(table))
    assert len(metrics) == 1
    assert metrics[0]["rows_in"] == 3
    assert metrics[0]["checks"]["v_present"]["violations"] == 1
