"""Iceberg-style partition evolution (``txn.set_partitioning``): a
metadata-only commit changes the partition spec for future writes;
reads union per-layout groups correctly, DML/CDF operate on the mixed
set, ``replace_partitions`` refuses until a full compact migrates the
layout, and the commit stamps the ``partitionEvolution`` reader
feature."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("bucket"),
            (F.col("id") * 1.5).alias("v"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def t(spark, tmp_path):
    p = str(tmp_path / "t")
    txn.append(_df(spark, 0, 100), p)  # flat layout
    return p


def _layouts(p):
    return {txn._file_layout(f) for f in txn._replay(p, txn.current_version(p))}


def test_evolve_flat_to_partitioned_reads_union(spark, t):
    v = txn.set_partitioning(spark, t, ["bucket"])
    assert v == 1
    txn.append(_df(spark, 100, 200), t)
    # old files stay flat, new files are hive-encoded
    assert _layouts(t) == {(), ("bucket",)}
    df = txn.read_table(spark, t)
    assert df.count() == 200
    # a partition-column filter is correct across BOTH layouts
    got = sorted(r.k for r in df.filter("bucket = '1'").select("k").collect())
    assert got == [k for k in range(200) if k % 4 == 1]
    # non-partition columns survive the union with their values
    assert df.filter("k = 150").first().v == 225.0


def test_validation_and_noop(spark, t):
    with pytest.raises(ValueError, match="not in table schema"):
        txn.set_partitioning(spark, t, ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        txn.set_partitioning(spark, t, ["bucket", "bucket"])
    v = txn.set_partitioning(spark, t, ["bucket"])
    # same spec again: no new commit
    assert txn.set_partitioning(spark, t, ["bucket"]) == v
    assert txn.current_version(t) == v


def test_reader_feature_stamped_and_time_travel(spark, t):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 130), t)
    assert "partitionEvolution" in txn.writer_features(t)
    # pre-evolution snapshot reads exactly the flat files
    assert txn.read_table(spark, t, version=0).count() == 100
    assert txn.read_table(spark, t).count() == 130


def test_replace_partitions_refuses_then_compact_migrates(spark, t):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 140), t)
    repl = _df(spark, 0, 8).withColumn("v", F.lit(0.0))
    with pytest.raises(ValueError, match="full compact"):
        txn.replace_partitions(spark, t, repl)
    # a FULL compact rewrites everything under the current spec
    txn.compact(spark, t, target_file_bytes=1 << 40)
    assert _layouts(t) == {("bucket",)}
    assert txn.read_table(spark, t).count() == 140
    # and replace_partitions now works (replaces all 4 buckets' files)
    txn.replace_partitions(spark, t, repl)
    df = txn.read_table(spark, t)
    assert df.count() == 8 and df.agg(F.sum("v")).first()[0] == 0.0


def test_dml_on_mixed_layouts(spark, t):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 200), t)
    # CoW delete touches rows in both layouts
    txn.delete_where(spark, t, "k % 10 = 0")
    assert txn.read_table(spark, t).count() == 180
    # MoR delete: DV positions address files of either layout
    txn.delete_where(spark, t, "k IN (3, 103)", mode="mor")
    df = txn.read_table(spark, t)
    assert df.count() == 178 and df.filter("k IN (3, 103)").count() == 0
    # UPDATE rewrites matching files of both layouts
    txn.update_where(spark, t, {"v": "v + 1000"}, "k IN (7, 107)")
    vals = {
        r.k: r.v
        for r in txn.read_table(spark, t)
        .filter("k IN (7, 107)")
        .collect()
    }
    assert vals == {7: 1010.5, 107: 1160.5}


def test_unpartition_and_three_layout_union(spark, t):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 150), t)
    txn.set_partitioning(spark, t, [])  # un-partition future writes
    txn.append(_df(spark, 150, 175), t)
    assert _layouts(t) == {(), ("bucket",)}
    df = txn.read_table(spark, t)
    assert df.count() == 175
    assert df.filter("bucket = '2'").count() == sum(
        1 for k in range(175) if k % 4 == 2
    )


def test_cdf_spans_partition_evolution(spark, t):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 120), t)
    cdf = txn.table_changes_cdf(spark, t, -1, txn.current_version(t))
    assert cdf.count() == 120
    assert set(
        r._commit_version for r in cdf.select("_commit_version").distinct().collect()
    ) == {0, 2}


def test_evolution_composes_with_column_mapping(spark, t):
    txn.rename_column(spark, t, "bucket", "grp")
    txn.set_partitioning(spark, t, ["grp"])  # logical name post-rename
    txn.append(
        _df(spark, 100, 120).withColumnRenamed("bucket", "grp"), t
    )
    df = txn.read_table(spark, t)
    assert df.count() == 120
    assert "grp" in df.columns and "bucket" not in df.columns
    assert df.filter("grp = '3'").count() == sum(
        1 for k in range(120) if k % 4 == 3
    )


def test_set_partitioning_requires_existing_table(spark, tmp_path):
    with pytest.raises(ValueError, match="first write"):
        txn.set_partitioning(spark, str(tmp_path / "nope"), ["k"])


def test_restore_rolls_partition_spec_back(spark, t):
    """RESTORE to a pre-evolution version restores the spec WITH the
    data (the column-mapping precedent): post-restore writes land under
    the restored layout, not the rolled-back-over one."""
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 120), t)
    txn.restore(t, version=0)
    assert txn._current_partitioning(t) == []
    txn.append(_df(spark, 200, 210), t)
    assert _layouts(t) == {()}  # restored files + new append: all flat
    df = txn.read_table(spark, t)
    assert df.count() == 110
    # ...and restoring FORWARD to the evolved state brings the spec back
    txn.restore(t, version=2)
    assert txn._current_partitioning(t) == ["bucket"]
    assert txn.read_table(spark, t).count() == 120


def test_clone_preserves_mixed_layout(spark, t, tmp_path):
    txn.set_partitioning(spark, t, ["bucket"])
    txn.append(_df(spark, 100, 150), t)
    dst = str(tmp_path / "clone")
    txn.clone_table(t, dst)
    assert txn.read_table(spark, dst).count() == 150
    assert txn.read_table(spark, dst).filter("bucket = '0'").count() == sum(
        1 for k in range(150) if k % 4 == 0
    )
    # the clone evolved independently: its current spec is the source's
    assert txn._current_partitioning(dst) == ["bucket"]


# --------------------------------------------------------------------------
# Type widening × partition evolution (ADVICE r7 high): composing the two
# features in EITHER order must keep the table readable — the pinned wide
# read schema is augmented per mixed-layout read with the path-encoded
# columns it omits, typed from the set_partitioning schema stamp.
# --------------------------------------------------------------------------


def _idf(spark, lo, hi, ktype):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").cast(ktype).alias("k"),
            (F.col("id") % 4).cast("string").alias("bucket"),
            (F.col("id") * 1.5).alias("v"),
        )
        .coalesce(1)
    )


def test_widening_append_after_evolution_keeps_reads_green(spark, tmp_path):
    """append → set_partitioning → widening append → read (the exact
    ADVICE r7 repro). The old-layout group stores ``bucket`` in footers;
    the wide-schema pin must not drop it."""
    p = str(tmp_path / "t")
    txn.append(_idf(spark, 0, 40, "int"), p)  # flat, k:int
    txn.set_partitioning(spark, p, ["bucket"])
    txn.append(_idf(spark, 40, 80, "bigint"), p, merge_schema=True)
    df = txn.read_table(spark, p)
    assert df.count() == 80
    assert dict(df.dtypes)["k"] == "bigint"
    assert dict(df.dtypes)["bucket"] == "string"
    # partition-column predicate correct across BOTH layouts
    got = sorted(r.k for r in df.filter("bucket = '2'").select("k").collect())
    assert got == [k for k in range(80) if k % 4 == 2]
    # old-layout row values survive (not null-filled)
    assert df.filter("k = 10").first().v == 15.0


def test_evolution_after_widening_keeps_reads_green(spark, tmp_path):
    """Reverse order: widen first (stamp excludes the then-current spec
    column ``ds``), then evolve to ``bucket`` — new files store ``ds``
    as DATA while the stamp omits it."""
    p = str(tmp_path / "t")
    base = _idf(spark, 0, 40, "int").withColumn(
        "ds", (F.col("k") % 2).cast("string")
    )
    txn.append(base, p, partition_by=["ds"])
    widened = _idf(spark, 40, 80, "bigint").withColumn(
        "ds", (F.col("k") % 2).cast("string")
    )
    txn.append(widened, p, merge_schema=True)
    txn.set_partitioning(spark, p, ["bucket"])
    more = _idf(spark, 80, 120, "bigint").withColumn(
        "ds", (F.col("k") % 2).cast("string")
    )
    txn.append(more, p, merge_schema=True)
    df = txn.read_table(spark, p)
    assert df.count() == 120
    assert dict(df.dtypes)["k"] == "bigint"
    # ds readable from BOTH path (old layout) and footer (new layout)
    assert df.filter("ds = '1'").count() == 60
    assert df.filter("bucket = '3' AND k >= 80").count() == sum(
        1 for k in range(80, 120) if k % 4 == 3
    )
    # time travel to the pre-evolution widened snapshot still works
    assert txn.read_table(spark, p, version=1).count() == 80


def test_widened_mixed_layout_dml_and_compact(spark, tmp_path):
    """DELETE on the widened mixed set, then a full compact migrates
    the layout and normalizes types."""
    p = str(tmp_path / "t")
    txn.append(_idf(spark, 0, 40, "int"), p)
    txn.set_partitioning(spark, p, ["bucket"])
    txn.append(_idf(spark, 40, 80, "bigint"), p, merge_schema=True)
    txn.delete_where(spark, p, "k < 10")
    df = txn.read_table(spark, p)
    assert df.count() == 70
    txn.compact(spark, p)
    df2 = txn.read_table(spark, p)
    assert df2.count() == 70
    assert dict(df2.dtypes)["k"] == "bigint"
    assert _layouts(p) == {("bucket",)}
