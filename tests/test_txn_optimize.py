"""Partition-scoped OPTIMIZE (compact WHERE), vacuum dry-run, and
table_detail: the operational surface for tending a 100 TB table —
compact yesterday's partition without touching the other 10⁴, audit a
vacuum before it deletes, read the table's shape from metadata alone."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    compact,
    current_version,
    delete_where,
    history,
    read_table,
    table_detail,
    vacuum,
    _replay_state,
)


@pytest.fixture()
def parted(spark, tmp_path):
    """Two hive partitions, several small files each (3 appends)."""
    t = str(tmp_path / "t")
    for i in range(3):
        df = spark.createDataFrame(
            [(i * 10 + j, f"d{j % 2 + 1}") for j in range(4)],
            "k long, ds string",
        )
        append(df, t, partition_by=["ds"])
    return t


def _files_for(t, ds):
    files, _ = _replay_state(t, current_version(t))
    return sorted(f for f in files if f"ds={ds}" in f)


def test_scoped_compact_touches_only_the_named_partition(spark, parted):
    before_d1 = _files_for(parted, "d1")
    before_d2 = _files_for(parted, "d2")
    assert len(before_d1) >= 3 and len(before_d2) >= 3  # 3 appends, >=1 file each
    rows_before = sorted(r.k for r in read_table(spark, parted).collect())

    v = compact(spark, parted, partitions={"ds": "d1"})
    assert v is not None
    after_d1 = _files_for(parted, "d1")
    after_d2 = _files_for(parted, "d2")
    # d1 merged into one file; d2's files keep their EXACT paths
    assert len(after_d1) == 1 and not set(after_d1) & set(before_d1)
    assert after_d2 == before_d2
    assert sorted(r.k for r in read_table(spark, parted).collect()) == rows_before
    assert history(parted)[-1]["meta"]["partitions"] == {"ds": "d1"}


def test_scoped_compact_applies_dvs_but_keeps_other_partitions_vectors(
    spark, parted
):
    delete_where(spark, parted, "k = 1", mode="mor")  # a d2 row (1 % 2 + 1)
    delete_where(spark, parted, "k = 2", mode="mor")  # a d1 row
    compact(spark, parted, partitions={"ds": "d1"})
    # the d1 vector's live targets were all rewritten → it retires with
    # the scoped pass (ADVICE r5: stale fully-applied DVs used to stay
    # active forever, taxing every read); the d2 vector must survive
    _files, dvs = _replay_state(parted, current_version(parted))
    assert len(dvs) == 1  # only the live d2 vector remains
    got = sorted(r.k for r in read_table(spark, parted).collect())
    assert 1 not in got and 2 not in got
    # a FULL pass retires everything
    compact(spark, parted, target_file_bytes=1)
    assert _replay_state(parted, current_version(parted))[1] == []
    assert sorted(r.k for r in read_table(spark, parted).collect()) == got


def test_scoped_compact_refuses_non_partition_columns(spark, parted):
    with pytest.raises(ValueError, match="non-partition"):
        compact(spark, parted, partitions={"k": "1"})


def test_vacuum_dry_run_deletes_nothing(spark, parted):
    compact(spark, parted)  # retire the original 6 files
    for i in range(3):
        append(
            spark.createDataFrame([(100 + i, "d1")], "k long, ds string"),
            parted,
            partition_by=["ds"],
        )
    would = vacuum(parted, retain_versions=1, orphan_grace_secs=10**9, dry_run=True)
    assert would  # the retired pre-compact files
    assert all(os.path.exists(os.path.join(parted, f)) for f in would)
    did = vacuum(parted, retain_versions=1, orphan_grace_secs=10**9)
    assert did == would
    assert not any(os.path.exists(os.path.join(parted, f)) for f in did)


def test_table_detail_reads_shape_from_metadata(spark, parted):
    delete_where(spark, parted, "k = 0", mode="mor")
    d = table_detail(parted)
    assert d["version"] == current_version(parted)
    assert d["num_files"] == len(_replay_state(parted, d["version"])[0])
    assert d["size_bytes"] > 0
    assert d["partition_by"] == ["ds"]
    assert d["num_deletion_vectors"] == 1
    assert d["constraints"] == {}
    assert d["schema_evolved"] is False
    assert d["num_commits"] == 4


def test_maintain_table_policy(spark, tmp_path):
    """maintain_table applies the measured maintenance policy: compacts
    away fragmentation + DV debt, checkpoints a long log, and is a
    no-op when the table is already tended."""
    from wikistream_lakehouse_spark.lakehouse.txn import (
        append as _append,
        delete_where as _delete,
        maintain_table,
        table_detail,
    )

    t = str(tmp_path / "t")
    for i in range(12):  # 12 tiny appends → fragmentation + long log
        _append(
            spark.createDataFrame([(i, float(i))], "k long, v double"), t
        )
    for i in range(5):  # DV debt past the default threshold of 4
        _delete(spark, t, f"k = {i}", mode="mor")
    report = maintain_table(spark, t, vacuum_retain_versions=1)
    assert set(report) == {"compact", "checkpoint", "vacuum"}
    d = table_detail(t)
    assert d["num_deletion_vectors"] == 0  # compact purged the vectors
    assert d["num_files"] <= 2
    assert d["checkpoint_version"] is not None
    assert sorted(r.k for r in read_table(spark, t).collect()) == list(
        range(5, 12)
    )
    # already tended: nothing to do
    assert maintain_table(spark, t) == {}
