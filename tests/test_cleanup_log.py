"""Log retention (txn.cleanup_log): pre-checkpoint commit entries are
deleted, every read at or after the checkpoint is byte-identical
(checkpoints snapshot sizes, per-file stats, declared stats columns,
and the physical-schema stamp), time travel and lagging change feeds
below the horizon refuse with clear errors, and feature-bearing tables
(partition-evolved and cloned ones included) clean too — their replay
state is checkpoint-snapshotted; only a stale pre-snapshot checkpoint
refuses."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.skipping import point_lookup


def _kv(spark, lo, hi, val=1.0):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), F.lit(float(val)).alias("v"))
        .coalesce(1)
    )


@pytest.fixture()
def cleaned(spark, tmp_path):
    """6 appends with declared stats, checkpoint at v6, cleanup."""
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 50), path)
    txn.set_stats_columns(path, ["k"])
    for i in range(1, 6):
        txn.append(_kv(spark, i * 50, (i + 1) * 50, float(i)), path)
    pre_rows = sorted(map(tuple, txn.read_table(spark, path).collect()))
    cpv = txn.checkpoint(path)
    removed = txn.cleanup_log(path)
    return path, cpv, pre_rows, removed


def test_cleanup_deletes_prehorizon_entries_and_reads_are_identical(
    spark, cleaned
):
    path, cpv, pre_rows, removed = cleaned
    assert removed, "cleanup must actually delete something"
    vs = txn._committed_versions(path)
    assert vs and vs[0] == cpv, "only the checkpoint version onward retained"
    got = sorted(map(tuple, txn.read_table(spark, path).collect()))
    assert got == pre_rows
    # the log directory physically shrank
    names = os.listdir(os.path.join(path, "_txnlog"))
    assert len([n for n in names if n.endswith(".json")]) <= 4


def test_writes_continue_after_cleanup(spark, cleaned):
    path, cpv, pre_rows, _ = cleaned
    txn.append(_kv(spark, 1000, 1010, 9.0), path)
    txn.delete_where(spark, path, "k < 10", mode="mor")
    txn.transactional_upsert(
        spark, path, _kv(spark, 1000, 1005, 7.0), keys=["k"]
    )
    n = txn.read_table(spark, path).count()
    assert n == len(pre_rows) + 10 - 10
    txn.compact(spark, path)
    assert txn.read_table(spark, path).count() == n


def test_time_travel_below_horizon_refuses_clearly(spark, cleaned):
    path, cpv, _, _ = cleaned
    with pytest.raises(ValueError, match="retention horizon"):
        txn.read_table(spark, path, version=cpv - 2)
    # at the horizon itself: fine
    assert txn.read_table(spark, path, version=cpv).count() == 300


def test_stats_authority_survives_via_checkpoint(spark, cleaned):
    """Declared stats columns and per-file envelopes were logged BELOW
    the horizon; the checkpoint must carry both so pruning keeps
    working."""
    path, cpv, _, _ = cleaned
    assert txn.stats_columns(path) == ["k"]
    got, n_read, n_total = point_lookup(spark, path, {"k": 125})
    assert [r.k for r in got.collect()] == [125]
    assert n_read < n_total, "envelope pruning must survive cleanup"


def test_schema_authority_survives_via_checkpoint(spark, cleaned):
    path, _, _, _ = cleaned
    types = txn._stamped_physical_types(path)
    assert types is not None and set(types) == {"k", "v"}
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_snapshot_duckdb,
    )

    tbl = read_snapshot_duckdb(path)
    assert sorted(tbl.column_names) == ["k", "v"]
    assert tbl.num_rows == 300


def test_change_feed_guards_lagging_consumers(spark, cleaned):
    path, cpv, _, _ = cleaned
    with pytest.raises(ValueError, match="log-cleaned at horizon"):
        txn.table_changes(spark, path, from_version=0)
    txn.append(_kv(spark, 2000, 2005), path)
    delta = txn.table_changes(spark, path, from_version=cpv)
    assert delta.count() == 5


def test_partition_evolved_table_cleans_and_mixed_reads_survive(
    spark, tmp_path
):
    """VERDICT r10 next #3: partition-evolved tables clean. The
    set_partitioning entry that stamped the physical-schema authority
    is deleted; the checkpoint copy must keep typing the path-encoded
    column (numeric-LOOKING string values are the trap: directory
    inference would corrupt "01" → 1)."""
    path = str(tmp_path / "pe")
    txn.append(
        spark.createDataFrame(
            [(1, "01"), (2, "02")], "k long, b string"
        ).coalesce(1),
        path,
    )  # v0 flat layout
    txn.set_partitioning(spark, path, ["b"])  # v1: the stamping commit
    txn.append(
        spark.createDataFrame([(3, "03")], "k long, b string"), path
    )  # v2 under b=… — the active set now mixes layouts
    pre = sorted(map(tuple, txn.read_table(spark, path).collect()))
    cpv = txn.checkpoint(path)
    removed = txn.cleanup_log(path)
    assert removed, "evolved table must actually clean"
    got = txn.read_table(spark, path)
    assert dict(got.dtypes)["b"] == "string", (
        "path-encoded column type must survive via the checkpoint stamp"
    )
    assert sorted(map(tuple, got.collect())) == pre
    # time travel at the horizon itself still serves
    assert txn.read_table(spark, path, version=cpv).count() == 3
    # DML over the mixed layout post-cleanup
    txn.delete_where(spark, path, "k = 1")
    assert sorted(
        map(tuple, txn.read_table(spark, path).collect())
    ) == [(2, "02"), (3, "03")]
    # change feed resumes from the horizon
    txn.append(
        spark.createDataFrame([(9, "09")], "k long, b string"), path
    )
    delta = txn.table_changes(spark, path, from_version=cpv + 1)
    assert delta.count() == 1
    # the reader-feature gate survives the stamping entry's deletion:
    # a foreign engine without the grouped read path must still refuse
    assert "partitionEvolution" in txn.writer_features(path)


def test_cloned_table_cleans_and_stays_independent(spark, tmp_path):
    """VERDICT r10 next #3: cloned tables clean. The v0 clone entry
    (lineage + schema authority for the linked snapshot) is deleted;
    reads, DML, compact and vacuum on the clone must keep working and
    never perturb the source's bytes."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    txn.append(_kv(spark, 0, 50), src)
    txn.append(_kv(spark, 50, 100, 2.0), src)
    txn.clone_table(src, dst)  # dst v0 (the clone entry)
    txn.append(_kv(spark, 100, 110, 3.0), dst)  # dst v1
    pre = sorted(map(tuple, txn.read_table(spark, dst).collect()))
    cpv = txn.checkpoint(dst)
    removed = txn.cleanup_log(dst)
    assert removed, "cloned table must actually clean"
    assert sorted(map(tuple, txn.read_table(spark, dst).collect())) == pre
    assert txn.read_table(spark, dst, version=cpv).count() == len(pre)
    txn.delete_where(spark, dst, "k < 10")
    txn.compact(spark, dst)
    txn.vacuum(dst, retain_versions=1)
    assert txn.read_table(spark, dst).count() == len(pre) - 10
    # physical independence survives the clone entry's deletion
    assert txn.read_table(spark, src).count() == 100


def test_cleanup_gate_refuses_stale_checkpoint_for_evolution(
    spark, tmp_path
):
    """A legacy checkpoint missing the physical-schema snapshot must
    refuse to clean an evolved table — deleting the stamping commit
    with no checkpoint copy would leave path-encoded columns untyped."""
    import json

    path = str(tmp_path / "pe")
    txn.append(
        spark.createDataFrame([(1, "01")], "k long, b string"), path
    )
    txn.set_partitioning(spark, path, ["b"])
    cpv = txn.checkpoint(path)
    cp_file = os.path.join(
        path, "_txnlog", f"{cpv:020d}.checkpoint.json"
    )
    doc = json.loads(open(cp_file).read())
    doc.pop("physicalSchemaJson", None)
    open(cp_file, "w").write(json.dumps(doc))
    with pytest.raises(ValueError, match="predates metadata snapshots"):
        txn.cleanup_log(path)
    # fresh commit + fresh checkpoint unblocks (same recovery as the
    # constraints/stats gate)
    txn.append(
        spark.createDataFrame([(2, "02")], "k long, b string"), path
    )
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    assert dict(txn.read_table(spark, path).dtypes)["b"] == "string"


def test_widened_table_cleans_and_keeps_wide_reads(spark, tmp_path):
    """Type widening state is checkpoint-snapshotted: after cleanup the
    mixed narrow/wide footers still read under the wide schema, in
    Spark and in the independent DuckDB planner."""
    path = str(tmp_path / "widened")
    txn.append(
        spark.range(0, 5)
        .select(
            F.col("id").cast("int").alias("k"),
            F.lit(1.5).cast("float").alias("v"),
        )
        .coalesce(1),
        path,
    )
    txn.append(
        spark.range(5, 9)
        .select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(2.5).cast("double").alias("v"),
        )
        .coalesce(1),
        path,
        merge_schema=True,
    )
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    got = txn.read_table(spark, path)
    assert dict(got.dtypes) == {"k": "bigint", "v": "double"}
    assert got.count() == 9
    # widening rules still enforce post-cleanup: narrowing refused
    with pytest.raises(ValueError):
        txn.append(
            spark.range(9, 10).select(
                F.col("id").cast("int").alias("k"),
                F.lit(0.5).cast("float").alias("v"),
            ),
            path,
        )
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_snapshot_duckdb,
    )
    import pyarrow as pa

    tbl = read_snapshot_duckdb(path)
    assert tbl.schema.field("k").type == pa.int64()
    assert tbl.num_rows == 9
    # a full compact normalizes the files; a second clean then follows
    txn.compact(spark, path)
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    assert txn.read_table(spark, path).count() == 9


def test_cleanup_requires_checkpoint(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 5), path)
    with pytest.raises(ValueError, match="requires a checkpoint"):
        txn.cleanup_log(path)


def test_vacuum_composes_after_cleanup(spark, cleaned):
    path, _, pre_rows, _ = cleaned
    txn.delete_where(spark, path, "k >= 250", mode="cow")
    txn.vacuum(path, retain_versions=1, orphan_grace_secs=0)
    assert txn.read_table(spark, path).count() == 250


def test_maintain_table_log_retention_knob(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(6):
        txn.append(_kv(spark, i * 10, (i + 1) * 10), path)
    report = txn.maintain_table(
        spark, path, checkpoint_every=2, log_retention=True
    )
    assert "checkpoint" in report and "cleanup_log" in report
    assert txn.read_table(spark, path).count() == 60
    # a second tick is a near-no-op
    again = txn.maintain_table(
        spark, path, checkpoint_every=2, log_retention=True
    )
    assert "cleanup_log" not in again


def test_second_cleanup_advances_the_horizon(spark, cleaned):
    path, cpv, _, _ = cleaned
    txn.append(_kv(spark, 3000, 3010), path)
    txn.append(_kv(spark, 3010, 3020), path)
    cpv2 = txn.checkpoint(path)
    removed = txn.cleanup_log(path)
    assert removed
    assert txn._retention_horizon(path) == cpv2
    with pytest.raises(ValueError, match="retention horizon"):
        txn.read_table(spark, path, version=cpv)
    assert txn.read_table(spark, path).count() == 320


def test_vacuum_with_generous_retention_clamps_to_horizon(spark, cleaned):
    """retain_versions larger than the replayable window must not make
    vacuum crash on sub-horizon replays — it clamps and keeps all
    replayable snapshots' files."""
    path, cpv, pre_rows, _ = cleaned
    removed = txn.vacuum(path, retain_versions=100, orphan_grace_secs=0)
    assert removed == []  # everything replayable is retained
    assert txn.read_table(spark, path).count() == len(pre_rows)


def test_constraint_state_survives_cleanup_and_still_enforces(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 20), path)
    txn.set_constraint(spark, path, "v_nonneg", "v >= 0")
    txn.append(_kv(spark, 20, 30), path)
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    assert txn.constraints(path) == {"v_nonneg": "v >= 0"}
    with pytest.raises(txn.ConstraintViolation):
        txn.append(_kv(spark, 100, 105, val=-1.0), path)
    txn.append(_kv(spark, 100, 105, val=2.0), path)  # valid rows land
    assert txn.read_table(spark, path).count() == 35


def test_generated_column_state_survives_cleanup(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10).withColumn("v2", F.expr("v * 2")), path)
    txn.set_generated_column(spark, path, "v2", "v * 2")
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    assert txn.generated_columns(path) == {"v2": "v * 2"}
    # post-cleanup appends without the column still get it computed
    txn.append(_kv(spark, 100, 102), path)
    rows = txn.read_table(spark, path).filter("k >= 100").collect()
    assert rows and all(r.v2 == r.v * 2 for r in rows)


def test_column_mapping_survives_cleanup(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 25), path)
    txn.rename_column(spark, path, "v", "score")
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    got = txn.read_table(spark, path)
    assert sorted(got.columns) == ["k", "score"]
    # DML by the logical name still routes to the physical column
    txn.update_where(spark, path, {"score": "99.0"}, "k = 3")
    assert (
        txn.read_table(spark, path).filter("k = 3").first().score == 99.0
    )
    # and the independent DuckDB planner still serves logical names
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_snapshot_duckdb,
    )

    tbl = read_snapshot_duckdb(path)
    assert sorted(tbl.column_names) == ["k", "score"]


# ---------------------------------------------------------------------------
# ADVICE r8: second-cycle correctness — a LATER checkpoint must not shadow
# the horizon anchor, metadata gates must cover constraints/generated/stats,
# and the horizon marker must be crash-atomic
# ---------------------------------------------------------------------------


def test_second_cleanup_cycle_reads_and_vacuums(spark, cleaned):
    """ADVICE r8 high #1: after cleanup + more commits + a NEWER
    checkpoint, every version in [horizon, newest_cp) must still
    replay from the horizon-anchor checkpoint — read_table(version=)
    and vacuum both walk that range."""
    path, cpv, pre_rows, _ = cleaned
    txn.append(_kv(spark, 1000, 1010, 9.0), path)  # v cpv+1
    txn.append(_kv(spark, 2000, 2010, 8.0), path)  # v cpv+2
    cpv2 = txn.checkpoint(path)
    assert cpv2 > cpv
    # versions between the two checkpoints replay from the OLDER anchor
    assert txn.read_table(spark, path, version=cpv).count() == len(pre_rows)
    assert (
        txn.read_table(spark, path, version=cpv + 1).count()
        == len(pre_rows) + 10
    )
    # the documented maintain + vacuum flow survives its second cycle
    removed = txn.vacuum(path, retain_versions=3)
    assert isinstance(removed, list)
    assert txn.read_table(spark, path).count() == len(pre_rows) + 20
    # and a second cleanup advances the horizon to the newer checkpoint
    txn.cleanup_log(path)
    assert txn._retention_horizon(path) == cpv2
    assert txn.read_table(spark, path, version=cpv2).count() == len(pre_rows) + 20


def test_cleanup_gate_covers_constraints_generated_stats(spark, tmp_path):
    """ADVICE r8 medium #3: a checkpoint missing the constraints/
    generated/stats snapshots (legacy format) must refuse cleanup —
    otherwise enforcement silently vanishes after the log is gone."""
    import json

    path = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 50), path)
    txn.set_constraint(spark, path, "v_pos", "v >= 0")
    txn.append(_kv(spark, 50, 60), path)
    cpv = txn.checkpoint(path)
    log = os.path.join(path, "_txnlog")
    cp_file = os.path.join(log, f"{cpv:020d}.checkpoint.json")
    doc = json.loads(open(cp_file).read())
    for k in ("constraints", "generated", "statsCols", "stats"):
        doc.pop(k, None)
    open(cp_file, "w").write(json.dumps(doc))
    with pytest.raises(ValueError, match="predates metadata snapshots"):
        txn.cleanup_log(path)
    # constraint state intact because nothing was deleted
    assert txn.constraints(path) == {"v_pos": "v >= 0"}
    # a NEW commit + fresh checkpoint (put_if_absent can't upgrade the
    # same version) unblocks cleanup
    txn.append(_kv(spark, 60, 70), path)
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    assert txn.constraints(path) == {"v_pos": "v >= 0"}


def test_retention_marker_is_versioned_and_max_wins(spark, cleaned):
    """ADVICE r8 low #4: the marker is written BEFORE entries are
    deleted under a fresh versioned name — no delete-then-put window.
    Stale markers from interrupted advances coexist; max wins."""
    import json

    path, cpv, _, _ = cleaned
    log = os.path.join(path, "_txnlog")
    markers = [n for n in os.listdir(log) if n.startswith("_retention")]
    assert markers == [f"_retention.{cpv:020d}.json"]
    # a leftover stale marker (crash before prune) must not lower the horizon
    open(os.path.join(log, "_retention.json"), "w").write(
        json.dumps({"horizon": 1})
    )
    assert txn._retention_horizon(path) == cpv


def test_compacted_evolved_table_cleans_and_duckdb_reads(spark, tmp_path):
    """The full lifecycle a 100 TB table would actually live: evolve the
    partition spec, let a FULL compact migrate the layout physically,
    clean the log — then the independent DuckDB planner (zero Spark)
    must still serve the snapshot, reading the physical-schema authority
    from the checkpoint."""
    from wikistream_lakehouse_spark.lakehouse.interop import (
        read_snapshot_duckdb,
    )

    path = str(tmp_path / "pe")
    txn.append(
        spark.createDataFrame(
            [(1, "01"), (2, "02"), (3, "03")], "k long, b string"
        ).coalesce(1),
        path,
    )
    txn.set_partitioning(spark, path, ["b"])
    txn.append(
        spark.createDataFrame([(4, "04")], "k long, b string"), path
    )
    txn.compact(spark, path)  # migrates every file to the b= layout
    txn.checkpoint(path)
    assert txn.cleanup_log(path)
    got_spark = sorted(
        map(tuple, txn.read_table(spark, path).collect())
    )
    tbl = read_snapshot_duckdb(path)
    got_duck = sorted(
        zip(
            tbl.column("k").to_pylist(),
            tbl.column("b").to_pylist(),
        )
    )
    assert got_spark == got_duck == [(1, "01"), (2, "02"), (3, "03"), (4, "04")]
    # the value "01" survived as a STRING in both engines
    assert all(isinstance(b, str) for _k, b in got_duck)
