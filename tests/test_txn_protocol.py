"""Protocol feature gating (the Delta reader/writer-features contract):
commits stamp the capabilities they RELY on; an engine that lacks a
reader feature refuses to read (misinterpreting, e.g. ignoring a
deletion vector, would silently return wrong rows), an engine that
lacks a writer feature refuses to write (a blind write could violate an
invariant it can't see) but may still read. Checkpoints carry the
feature union so the gate stays O(commits since checkpoint)."""

from __future__ import annotations

import json
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


def _commit_raw(t, version, entry):
    path = os.path.join(t, "_txnlog", f"{version:020d}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(entry, f)


def test_feature_stamps_land_in_commits(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    txn.delete_where(spark, t, "k = 1", mode="mor")
    txn.set_constraint(spark, t, "pos", "k >= 0")
    entries = [
        txn._load_entry(t, v) for v in txn._committed_versions(t)
    ]
    assert "readerFeatures" not in (entries[0] or {})  # plain append
    assert entries[1]["readerFeatures"] == ["deletionVectors"]
    assert entries[2]["writerFeatures"] == ["checkConstraints"]
    assert txn.writer_features(t) == {"deletionVectors", "checkConstraints"}


def test_unknown_reader_feature_refuses_reads_loudly(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    _commit_raw(
        t, 1,
        {"op": "future_op", "add": [], "remove": [], "partitionBy": [],
         "ts": 0.0, "readerFeatures": ["rowLineageV9"]},
    )
    with pytest.raises(txn.ProtocolError, match="rowLineageV9"):
        txn.read_table(spark, t)
    with pytest.raises(txn.ProtocolError):
        txn.append(_kv(spark, 10, 20), t)  # writers can't misread either


def test_unknown_writer_feature_blocks_writes_allows_reads(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    _commit_raw(
        t, 1,
        {"op": "set_policy", "add": [], "remove": [], "partitionBy": [],
         "ts": 0.0, "writerFeatures": ["retentionPolicyV2"]},
    )
    # reads stay fine: the unknown invariant doesn't change row content
    assert txn.read_table(spark, t).count() == 10
    for write in (
        lambda: txn.append(_kv(spark, 10, 20), t),
        lambda: txn.delete_where(spark, t, "k = 1"),
        lambda: txn.delete_where(spark, t, "k = 1", mode="mor"),
        lambda: txn.update_where(spark, t, {"v": "v + 1"}, "k = 2"),
        lambda: txn.merge_on_read_upsert(spark, t, _kv(spark, 0, 1), ["k"]),
        lambda: txn.transactional_upsert(spark, t, _kv(spark, 0, 1), ["k"]),
        lambda: txn.compact(spark, t, target_file_bytes=1),
        lambda: txn.restore(t, version=0),
        lambda: txn.set_constraint(spark, t, "c", "k >= 0"),
        lambda: txn.set_generated_column(spark, t, "v", "k * 2.0"),
    ):
        with pytest.raises(txn.ProtocolError, match="retentionPolicyV2"):
            write()


def test_unknown_writer_feature_blocks_maintenance_too(spark, tmp_path):
    # vacuum/cleanup_log are DESTRUCTIVE writer-side ops: a feature like
    # 'tags' exists precisely to stop an unaware engine's maintenance
    # pass from deleting pinned files — so they must gate like writes
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    txn.checkpoint(t)
    _commit_raw(
        t, 1,
        {"op": "set_policy", "add": [], "remove": [], "partitionBy": [],
         "ts": 0.0, "writerFeatures": ["retentionPolicyV2"]},
    )
    with pytest.raises(txn.ProtocolError, match="retentionPolicyV2"):
        txn.vacuum(t, retain_versions=1)
    with pytest.raises(txn.ProtocolError, match="retentionPolicyV2"):
        txn.cleanup_log(t)
    assert txn.read_table(spark, t).count() == 10  # nothing was deleted


def test_checkpoint_carries_feature_union(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 10), t)
    txn.delete_where(spark, t, "k = 1", mode="mor")
    txn.checkpoint(t)
    cp = txn._latest_checkpoint(t)
    assert "deletionVectors" in cp[3]
    # the union survives even though the gate only scans past the
    # checkpoint afterwards
    txn.append(_kv(spark, 10, 20), t)
    assert "deletionVectors" in txn.writer_features(t)
