"""DuckDB reads the txn table format with no Spark in the plan path —
an INDEPENDENT engine re-deriving every snapshot from the commit log
(lakehouse/interop.py). Each test writes through the Spark txn engine,
then diffs DuckDB's rows against txn.read_table's: two implementations
of the same open format must agree bit-for-bit on logical content."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.interop import (
    duckdb_snapshot_sql,
    read_snapshot_duckdb,
    register_duckdb_view,
)


def _spark_rows(spark, path, version=None, store=None):
    df = txn.read_table(spark, path, version=version, store=store)
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def _duck_rows(path, version=None, store=None):
    tbl = read_snapshot_duckdb(path, version=version, store=store)
    cols = sorted(tbl.column_names)
    pydict = tbl.to_pydict()
    n = tbl.num_rows
    return cols, sorted(
        (tuple(pydict[c][i] for c in cols) for i in range(n)), key=repr
    )


def _assert_same(spark, path, version=None, store=None):
    scols, srows = _spark_rows(spark, path, version, store)
    dcols, drows = _duck_rows(path, version, store)
    assert dcols == scols
    assert drows == srows


def _frame(spark, lo, hi, val):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(float(val)).alias("v")
    )


def test_plain_appends_match(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 100, 1.0), path)
    txn.append(_frame(spark, 100, 150, 2.0), path)
    _assert_same(spark, path)


def test_mor_deletes_apply_via_dv_anti_join(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 200, 1.0), path)
    txn.delete_where(spark, path, "k % 3 = 0", mode="mor")
    txn.delete_where(spark, path, "k % 7 = 1", mode="mor")  # stacked DVs
    assert txn._replay_state(path, txn.current_version(path))[1], (
        "test must exercise active deletion vectors"
    )
    _assert_same(spark, path)
    _, drows = _duck_rows(path)
    ks = {r[0] for r in drows}
    assert not any(k % 3 == 0 or k % 7 == 1 for k in ks)


def test_time_travel_matches_every_version(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 50, 1.0), path)
    txn.append(_frame(spark, 50, 80, 2.0), path)
    txn.delete_where(spark, path, "k < 10", mode="mor")
    txn.compact(spark, path)
    for v in range(txn.current_version(path) + 1):
        _assert_same(spark, path, version=v)


def test_column_mapping_serves_logical_names(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 30, 1.0), path)
    txn.rename_column(spark, path, "v", "score")
    _assert_same(spark, path)
    cols, _ = _duck_rows(path)
    assert cols == ["k", "score"]
    # historical version still serves the OLD name
    cols0, _ = _duck_rows(path, version=0)
    assert cols0 == ["k", "v"]


def test_dropped_column_excluded(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(
        spark.range(0, 20).select(
            F.col("id").alias("k"),
            F.lit(1.0).alias("v"),
            F.lit("x").alias("tag"),
        ),
        path,
    )
    txn.drop_column(spark, path, "tag")
    _assert_same(spark, path)
    cols, _ = _duck_rows(path)
    assert cols == ["k", "v"]


def test_type_widening_casts_to_wide_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(
        spark.range(0, 10).select(
            F.col("id").cast("int").alias("k"),
            F.lit(1.5).cast("float").alias("v"),
        ),
        path,
    )
    txn.append(
        spark.range(10, 20).select(
            F.col("id").cast("bigint").alias("k"),
            F.lit(2.5).cast("double").alias("v"),
        ),
        path,
        merge_schema=True,
    )
    _assert_same(spark, path)
    tbl = read_snapshot_duckdb(path)
    import pyarrow as pa

    assert tbl.schema.field("k").type == pa.int64()
    assert tbl.schema.field("v").type == pa.float64()


def test_column_set_evolution_unions_stamps(spark, tmp_path):
    """A merge_schema append ADDING a column: the stamp union must keep
    the early-only column a newest-stamp-only reader would drop."""
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)
    txn.append(
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.lit(2.0).alias("v"),
            F.lit("new").alias("extra"),
        ),
        path,
        merge_schema=True,
    )
    _assert_same(spark, path)
    cols, rows = _duck_rows(path)
    assert cols == ["extra", "k", "v"]
    assert {r[0] for r in rows} == {None, "new"}


def test_partitioned_table_numeric_looking_string_stays_string(
    spark, tmp_path
):
    """Path-encoded partition values like ds='01' must come back as the
    STAMPED string type, not DuckDB/hive inference."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "01"), (2, "02"), (3, "01")], "k long, ds string"
    )
    txn.append(df, path, partition_by=["ds"])
    txn.delete_where(spark, path, "k = 2", mode="mor")
    _assert_same(spark, path)
    _, rows = _duck_rows(path)
    assert all(isinstance(r[0], str) for r in rows)  # ds sorted first
    assert {r[0] for r in rows} == {"01"}


def test_partition_evolution_mixed_layout_refused_then_ok_after_compact(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, b string"),
        path,
    )
    txn.set_partitioning(spark, path, ["b"])
    txn.append(
        spark.createDataFrame([(3, "a")], "k long, b string"),
        path,
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="compact"):
        duckdb_snapshot_sql(path)
    txn.compact(spark, path)
    _assert_same(spark, path)


def test_cow_lifecycle_with_checkpoint_and_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 60, 1.0), path)
    txn.update_where(spark, path, {"v": "9.0"}, "k < 5")
    txn.delete_where(spark, path, "k >= 55", mode="cow")
    txn.checkpoint(path)
    txn.append(_frame(spark, 100, 110, 3.0), path)
    txn.vacuum(path, retain_versions=1, orphan_grace_secs=0)
    _assert_same(spark, path)


def test_object_store_substrate(spark, tmp_path, monkeypatch):
    """The interop planner sees the same (byte-backed) object data
    plane and a MemoryLogStore log the Spark engine wrote through."""
    monkeypatch.setattr(txn, "DEFAULT_DATA_STORE", txn.ObjectDataStore())
    store = txn.MemoryLogStore()
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 40, 1.0), path, store=store)
    txn.delete_where(spark, path, "k % 2 = 0", mode="mor", store=store)
    _assert_same(spark, path, store=store)


def test_register_view_is_snapshot_pinned(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 25, 1.0), path)
    con = duckdb.connect()
    try:
        register_duckdb_view(con, "snap", path)
        txn.append(_frame(spark, 25, 50, 2.0), path)  # after the pin
        assert con.execute("SELECT count(*) FROM snap").fetchone()[0] == 25
        register_duckdb_view(con, "snap", path)  # re-pin follows HEAD
        assert con.execute("SELECT count(*) FROM snap").fetchone()[0] == 50
    finally:
        con.close()


def test_empty_table_after_full_delete_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)
    txn.delete_where(spark, path, "k >= 0", mode="cow")
    cols, rows = _duck_rows(path)
    assert cols == ["k", "v"] and rows == []


def test_unknown_reader_feature_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 5, 1.0), path)
    v = txn._next_claim(path)
    entry = txn._entry("append", [], [], [], None)
    entry["readerFeatures"] = ["futureFeatureX"]
    assert txn._try_commit(path, v, entry)
    with pytest.raises(txn.ProtocolError, match="futureFeatureX"):
        duckdb_snapshot_sql(path)


# ---- symlink-format manifests (external Hive/Presto/Athena readers) ----
from wikistream_lakehouse_spark.lakehouse.interop import (  # noqa: E402
    generate_symlink_manifest,
)


def _manifest_files(root):
    import os

    out = {}
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, root)
            out[rel] = open(p).read().splitlines()
    return out


def test_manifest_lists_exactly_the_active_files(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 40, 1.0), path)
    txn.append(_frame(spark, 40, 60, 2.0), path)
    txn.compact(spark, path)
    listed = generate_symlink_manifest(path)
    active = {
        str(tmp_path / "t" / f)
        for f in txn._replay(path, txn.current_version(path))
    }
    assert set(listed) == {"manifest"}
    assert set(listed["manifest"]) == active
    on_disk = _manifest_files(str(tmp_path / "t" / "_symlink_format_manifest"))
    assert on_disk == {k: v for k, v in listed.items()}
    # an external engine over the manifest sees the logical table
    con = duckdb.connect()
    try:
        files = ", ".join("'" + f + "'" for f in listed["manifest"])
        got = sorted(
            con.execute(f"SELECT k, v FROM read_parquet([{files}])")
            .fetchall(),
            key=repr,
        )
    finally:
        con.close()
    _, srows = _spark_rows(spark, path)
    assert got == srows


def test_partitioned_manifest_per_partition_and_stale_removed(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "k long, ds string"
    )
    txn.append(df, path, partition_by=["ds"])
    listed = generate_symlink_manifest(path)
    assert set(listed) == {"ds=a/manifest", "ds=b/manifest"}
    # replace one partition; regenerate: the other's manifest refreshes,
    # nothing stale survives the rewrite
    txn.replace_partitions(
        spark,
        path,
        spark.createDataFrame([(9, "b")], "k long, ds string"),
        partition_by=["ds"],
    )
    listed2 = generate_symlink_manifest(path)
    assert set(listed2) == {"ds=a/manifest", "ds=b/manifest"}
    assert listed2["ds=a/manifest"] == listed["ds=a/manifest"]
    assert listed2["ds=b/manifest"] != listed["ds=b/manifest"]
    on_disk = _manifest_files(str(tmp_path / "t" / "_symlink_format_manifest"))
    assert set(on_disk) == set(listed2)


def test_manifest_refuses_dvs_until_compact_purges(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 30, 1.0), path)
    txn.delete_where(spark, path, "k < 5", mode="mor")
    with pytest.raises(ValueError, match="deletion vector"):
        generate_symlink_manifest(path)
    txn.compact(spark, path)  # PURGE applies + retires the vectors
    listed = generate_symlink_manifest(path)
    assert listed["manifest"]


def test_manifest_refuses_column_mapping_and_widening(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)
    txn.rename_column(spark, path, "v", "score")
    with pytest.raises(ValueError, match="column mapping"):
        generate_symlink_manifest(path)

    path2 = str(tmp_path / "t2")
    txn.append(
        spark.range(0, 5).select(F.col("id").cast("int").alias("k")), path2
    )
    txn.append(
        spark.range(5, 9).select(F.col("id").cast("bigint").alias("k")),
        path2,
        merge_schema=True,
    )
    with pytest.raises(ValueError, match="widening"):
        generate_symlink_manifest(path2)


def test_manifest_time_travel_version(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)
    txn.append(_frame(spark, 10, 20, 2.0), path)
    v0 = generate_symlink_manifest(path, version=0)
    head = generate_symlink_manifest(path)
    assert set(v0["manifest"]) < set(head["manifest"])


# ---------------------------------------------------------------------------
# Change feed (VERDICT r9 next #6): DuckDB plans CHANGES(t, a, b) deltas
# with no Spark — second-engine verification of the CDC surface, diffed
# against txn.table_changes_cdf across appends / DV deletes / MoR merges.
# ---------------------------------------------------------------------------

from wikistream_lakehouse_spark.lakehouse.interop import (  # noqa: E402
    duckdb_changes_sql,
    read_changes_duckdb,
)


def _spark_changes(spark, path, lo, hi=None, store=None):
    df = txn.table_changes_cdf(spark, path, lo, hi, store=store)
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(r[c] for c in cols) for r in df.collect()), key=repr
    )


def _duck_changes(path, lo, hi=None, store=None):
    tbl = read_changes_duckdb(path, lo, hi, store=store)
    cols = sorted(tbl.column_names)
    pydict = tbl.to_pydict()
    return cols, sorted(
        (tuple(pydict[c][i] for c in cols) for i in range(tbl.num_rows)),
        key=repr,
    )


def _assert_changes_same(spark, path, lo, hi=None, store=None):
    scols, srows = _spark_changes(spark, path, lo, hi, store)
    dcols, drows = _duck_changes(path, lo, hi, store)
    assert dcols == scols
    assert drows == srows


def test_changes_feed_appends_and_dv_deletes_match_engine(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 60, 1.0), path)  # v0
    txn.append(_frame(spark, 60, 90, 2.0), path)  # v1: inserts
    txn.delete_where(spark, path, "k % 5 = 0", mode="mor")  # v2: DV deletes
    txn.append(_frame(spark, 90, 100, 3.0), path)  # v3: inserts
    # every sub-range agrees with the Spark reader
    for lo, hi in ((0, None), (0, 2), (1, 3), (2, 2), (-1, 1)):
        _assert_changes_same(spark, path, lo, hi)
    # content spot-check: v2's arm is delete images of the k%5 rows
    _, drows = _duck_changes(path, 1, 2)
    cols, _ = _duck_changes(path, 1, 2)
    by = {c: i for i, c in enumerate(cols)}
    assert drows and all(r[by["_change_type"]] == "delete" for r in drows)
    assert all(r[by["k"]] % 5 == 0 for r in drows)


def test_changes_feed_mor_merge_delete_insert_pairs(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 40, 1.0), path)  # v0
    src = _frame(spark, 30, 50, 9.0)  # updates 30..39, inserts 40..49
    txn.merge_on_read_upsert(spark, path, src, ["k"])  # v1
    _assert_changes_same(spark, path, 0)
    cols, drows = _duck_changes(path, 0, 1)
    by = {c: i for i, c in enumerate(cols)}
    # an UPDATE appears as its natural delete+insert pair
    deletes = {r[by["k"]] for r in drows if r[by["_change_type"]] == "delete"}
    inserts = {r[by["k"]] for r in drows if r[by["_change_type"]] == "insert"}
    assert deletes == set(range(30, 40))
    assert inserts == set(range(30, 50))


def test_changes_feed_refusals_match_engine(spark, tmp_path):
    """Both engines refuse the SAME non-recoverable ranges — the plan
    (and its refusals) is shared via txn._changes_plan."""
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 30, 1.0), path)  # v0
    txn.delete_where(spark, path, "k < 5", mode="cow")  # v1: file-removing
    with pytest.raises(ValueError, match="not recoverable"):
        txn.table_changes_cdf(spark, path, 0).collect()
    with pytest.raises(ValueError, match="not recoverable"):
        duckdb_changes_sql(path, 0)
    # a range past the CoW commit is fine in both
    txn.append(_frame(spark, 100, 110, 4.0), path)  # v2
    _assert_changes_same(spark, path, 1)


def test_changes_feed_empty_range_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)
    cols, rows = _duck_changes(path, 0, 0)
    assert rows == []
    assert set(cols) == {"k", "v", "_change_type", "_commit_version"}


def test_changes_feed_spans_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    txn.append(_frame(spark, 0, 10, 1.0), path)  # v0: (k, v)
    wide = _frame(spark, 10, 20, 2.0).withColumn("tag", F.lit("x"))
    txn.append(wide, path, merge_schema=True)  # v1: adds tag
    _assert_changes_same(spark, path, -1)
    cols, drows = _duck_changes(path, -1)
    by = {c: i for i, c in enumerate(cols)}
    # pre-evolution rows null-fill the new column, like a snapshot read
    v0 = [r for r in drows if r[by["_commit_version"]] == 0]
    assert v0 and all(r[by["tag"]] is None for r in v0)


def test_tag_names_resolve_for_foreign_reads(spark, tmp_path):
    """A tagged snapshot is readable by DuckDB BY NAME (r11): the tag
    map lives in the commit log, so the engine-free planner resolves it
    exactly like the Spark reader — the audit pin is open-format."""
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, "a")], "k long, s string"), t
    )
    txn.create_tag(t, "audit")
    txn.append(
        spark.createDataFrame([(2, "b")], "k long, s string"), t
    )
    _assert_same(spark, t, version="audit")
    assert len(_duck_rows(t, version="audit")[1]) == 1
    assert len(_duck_rows(t)[1]) == 2
    with pytest.raises(ValueError, match="no tag"):
        _duck_rows(t, version="ghost")
