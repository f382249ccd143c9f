"""Type widening under schema evolution (VERDICT r6 next-round #8):
``merge_schema=True`` appends may WIDEN column types along the safe
lattice (int→bigint, smallint→int/bigint, tinyint→…, float→double),
the Delta ``typeWidening`` feature analogue. Data files keep their
original physical types forever; the log carries the union read schema
and readers promote at scan time (Spark's parquet reader upcasts
int32→int64 / float→double under an explicit wider schema — probed
empirically; plain mergeSchema CRASHES on such mixes, which is why
widened commits carry the ``typeWidening`` READER feature stamp).
Under test: widened appends readable across the boundary, narrow
late-arriving appends absorbed, CDF spanning the widening, time travel
preserving old types, restore/clone carrying the stamp, compact
normalizing, and narrowing/incompatible changes refused."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _ints(spark, lo, hi, ktype):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").cast(ktype).alias("k"),
            (F.col("id") * 1.5).cast("float").alias("v"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def t(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_ints(spark, 0, 10, "int"), t)
    return t


def test_widening_append_promotes_reads_without_rewriting(spark, t):
    files_before = txn._replay(t, txn.current_version(t))
    wide = spark.range(10, 20).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.5).cast("double").alias("v"),
    )
    txn.append(wide, t, merge_schema=True)
    df = txn.read_table(spark, t)
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "k": "bigint", "v": "double",
    }
    assert df.count() == 20 and df.filter("k = 5").first().v == 7.5
    # the old file's physical footer is untouched (metadata-only)
    sch = pq.read_schema(os.path.join(t, files_before[0]))
    assert str(sch.field("k").type) == "int32"
    # the commit is feature-stamped: a widening-blind engine must refuse
    e = txn._load_entry(t, txn.current_version(t))
    assert "typeWidening" in e["readerFeatures"]


def test_narrow_late_appends_are_absorbed(spark, t):
    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)  # widen
    # a narrow CDC-style append AFTER widening still lands (its file
    # stores int32; reads promote)
    txn.append(_ints(spark, 20, 30, "int"), t, merge_schema=True)
    df = txn.read_table(spark, t)
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert df.count() == 30
    # DML through the widened table
    txn.delete_where(spark, t, "k = 25")
    assert txn.read_table(spark, t).count() == 29


def test_time_travel_preserves_old_types_and_cdf_spans_widening(spark, t):
    v_narrow = txn.current_version(t)
    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)
    old = txn.read_table(spark, t, version=v_narrow)
    assert old.schema["k"].dataType.simpleString() == "int"
    assert old.count() == 10
    cdf = txn.table_changes_cdf(spark, t, v_narrow)
    assert cdf.filter("_change_type = 'insert'").count() == 10


def test_widening_plus_column_add_compose(spark, t):
    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)
    extra = spark.range(20, 25).select(
        F.col("id").cast("long").alias("k"),
        (F.col("id") * 1.5).cast("double").alias("v"),
        F.lit("x").alias("tag"),
    )
    txn.append(extra, t, merge_schema=True)  # column add on widened table
    df = txn.read_table(spark, t)
    assert set(df.columns) == {"k", "v", "tag"}
    assert df.filter("tag IS NULL").count() == 20  # null-filled old rows
    assert df.schema["k"].dataType.simpleString() == "bigint"


def test_compact_normalizes_and_clears_the_flag(spark, t):
    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)
    assert txn._wide_schema(t) is not None
    txn.compact(spark, t, target_file_bytes=1 << 40)
    assert txn._wide_schema(t) is None  # full rewrite resets
    newest = txn._replay(t, txn.current_version(t))[0]
    sch = pq.read_schema(os.path.join(t, newest))
    assert str(sch.field("k").type) == "int64"  # physically widened now
    assert txn.read_table(spark, t).count() == 20


def test_restore_and_clone_carry_the_wide_schema(spark, t, tmp_path):
    v_narrow = txn.current_version(t)
    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)
    v_wide = txn.current_version(t)
    d = str(tmp_path / "clone")
    txn.clone_table(t, d)
    cdf = txn.read_table(spark, d)
    assert cdf.schema["k"].dataType.simpleString() == "bigint"
    assert cdf.count() == 20
    # restore to the narrow version: old types come back...
    txn.restore(t, version=v_narrow)
    assert txn.read_table(spark, t).schema["k"].dataType.simpleString() == "int"
    # ...and restoring forward to the widened version re-carries the stamp
    txn.restore(t, version=v_wide)
    df = txn.read_table(spark, t)
    assert df.schema["k"].dataType.simpleString() == "bigint"
    assert df.count() == 20


def test_incompatible_and_strict_changes_still_refused(spark, t):
    # string vs int is not widening
    bad = spark.range(3).select(
        F.col("id").cast("string").alias("k"), F.lit(1.0).cast("float").alias("v")
    )
    with pytest.raises(ValueError, match="WIDEN"):
        txn.append(bad, t, merge_schema=True)
    # strict mode (merge_schema=False) refuses even a widening change
    with pytest.raises(ValueError, match="mismatch"):
        txn.append(_ints(spark, 0, 3, "bigint"), t)


def test_merge_and_stats_work_through_widening(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.set_stats_columns(t, ["k"])
    txn.append(_ints(spark, 0, 100, "int"), t)
    txn.append(_ints(spark, 100, 200, "bigint"), t, merge_schema=True)
    src = spark.createDataFrame([(150, -1.0)], "k long, v float")
    txn.merge_on_read_upsert(spark, t, src, keys=["k"])
    rows = {r.k: r.v for r in txn.read_table(spark, t).collect()}
    assert rows[150] == -1.0 and len(rows) == 200


def test_mor_merge_and_scoped_compact_do_not_reset_evolution(
    spark, tmp_path
):
    """Latent-bug regression (found implementing widening): an op named
    'merge'/'compact' only resets schema-evolution/widening replay when
    it actually rematerialized the WHOLE table. A merge-on-read merge
    adds files without removing any, and a scoped OPTIMIZE…WHERE leaves
    unscoped files untouched — after either, mixed-schema files are
    still active and reads must stay in union mode."""
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([("a", 1, 1.0)], "ds string, k long, v double"),
        t,
        partition_by=["ds"],
    )
    txn.append(
        spark.createDataFrame(
            [("b", 2, 2.0, "x")], "ds string, k long, v double, tag string"
        ),
        t,
        merge_schema=True,
    )
    assert txn._is_evolved(t)
    # MoR merge (add-only commit, op 'merge') must NOT clear the flag
    txn.merge_on_read_upsert(
        spark,
        t,
        spark.createDataFrame(
            [("a", 1, -1.0, "y")], "ds string, k long, v double, tag string"
        ),
        keys=["ds", "k"],
    )
    assert txn._is_evolved(t)
    df = txn.read_table(spark, t)
    assert set(df.columns) == {"ds", "k", "v", "tag"}
    assert df.count() == 2 and df.filter("v = -1.0").first().tag == "y"
    # scoped compact of one partition must NOT clear it either
    txn.compact(spark, t, partitions={"ds": "a"}, target_file_bytes=1)
    assert txn._is_evolved(t)
    assert set(txn.read_table(spark, t).columns) == {"ds", "k", "v", "tag"}
    # a FULL compact does clear it
    txn.compact(spark, t, target_file_bytes=1 << 40)
    assert not txn._is_evolved(t)


def test_stream_source_widens_mixed_batches(spark, t, tmp_path):
    """The txn_table streaming source on a widened table delivers every
    batch at the union read schema — narrow files' int32/float columns
    are cast per Arrow batch, so the sink sees one stable schema."""
    from wikistream_lakehouse_spark.streaming.txn_source import (
        register_txn_source,
    )

    txn.append(_ints(spark, 10, 20, "bigint"), t, merge_schema=True)
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .load(t)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.schema["k"].dataType.simpleString() == "bigint"
    assert out.count() == 20 and out.filter("k = 5").count() == 1


# --------------------------------------------------------------------------
# Decimal widening (VERDICT r7 next #4): precision/scale-up across all
# three parquet physical encodings, same typeWidening gate, composition
# with CDF / time travel / compact, narrowing still refused.
# --------------------------------------------------------------------------


def _money(spark, lo, hi, dectype):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") + 0.25).cast(dectype).alias("price"),
        )
        .coalesce(1)
    )


def test_decimal_precision_and_scale_widening(spark, tmp_path):
    """decimal(10,2) -> decimal(20,4): crosses the int64->binary
    physical class AND scales up; old rows rescale losslessly, time
    travel keeps the narrow type, CDF spans the boundary, compact
    normalizes."""
    from decimal import Decimal

    t = str(tmp_path / "t")
    txn.append(_money(spark, 0, 10, "decimal(10,2)"), t)
    txn.append(_money(spark, 10, 20, "decimal(20,4)"), t, merge_schema=True)
    df = txn.read_table(spark, t)
    assert dict(df.dtypes)["price"] == "decimal(20,4)"
    assert df.count() == 20
    assert df.filter("k = 3").first().price == Decimal("3.2500")
    # time travel: the pre-widening snapshot keeps decimal(10,2)
    old = txn.read_table(spark, t, version=0)
    assert dict(old.dtypes)["price"] == "decimal(10,2)"
    assert old.first().price is not None
    # CDF across the widening delivers both eras at the union type
    cdf = txn.table_changes_cdf(spark, t, -1)
    assert cdf.count() == 20
    # a narrow LATE append is absorbed (rescaled at read)
    txn.append(_money(spark, 20, 25, "decimal(10,2)"), t, merge_schema=True)
    df2 = txn.read_table(spark, t)
    assert df2.count() == 25 and dict(df2.dtypes)["price"] == "decimal(20,4)"
    assert df2.filter("k = 22").first().price == Decimal("22.2500")
    # compact normalizes every file to the wide type and clears the flag
    txn.compact(spark, t)
    df3 = txn.read_table(spark, t)
    assert dict(df3.dtypes)["price"] == "decimal(20,4)"
    assert txn._wide_schema(t) is None
    assert df3.count() == 25


def test_decimal_narrower_absorbed_cross_shrink_refused(spark, tmp_path):
    from decimal import Decimal

    t = str(tmp_path / "t")
    txn.append(_money(spark, 0, 10, "decimal(12,4)"), t)
    # a NARROWER append is absorbed (the table's own type is the wider
    # one — same contract as the int lattice's narrow-late-append)
    txn.append(_money(spark, 10, 20, "decimal(10,4)"), t, merge_schema=True)
    df = txn.read_table(spark, t)
    assert dict(df.dtypes)["price"] == "decimal(12,4)"
    assert df.filter("k = 15").first().price == Decimal("15.2500")
    # integral-digit shrink disguised as a precision bump: (12,4) has 8
    # integral digits, (13,6) only 7 — neither widens to the other
    with pytest.raises(ValueError, match="WIDEN"):
        txn.append(
            _money(spark, 10, 20, "decimal(13,6)"), t, merge_schema=True
        )
    # strict mode refuses even a legal widening
    with pytest.raises(ValueError, match="mismatch"):
        txn.append(_money(spark, 20, 30, "decimal(14,4)"), t)


def test_decimal_widening_gated_by_reader_feature(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_money(spark, 0, 5, "decimal(10,2)"), t)
    txn.append(_money(spark, 5, 10, "decimal(12,2)"), t, merge_schema=True)
    assert "typeWidening" in txn.writer_features(t)


def test_date_widens_to_timestamp_ntz_but_not_ltz(spark, tmp_path):
    """VERDICT r8 next #5: date → timestamp_ntz joins the lattice
    (probed: the vectorized parquet reader promotes DATE footers to
    midnight NTZ timestamps under an explicit wider schema — Delta's
    typeWidening includes exactly the no-time-zone form); date →
    zoned timestamp stays REFUSED (the reader raises
    PARQUET_COLUMN_DATA_TYPE_MISMATCH, and the value would be
    zone-reinterpreted even if it didn't)."""
    t = str(tmp_path / "t")
    txn.append(
        spark.sql(
            "SELECT id AS k, DATE_ADD(DATE'2024-03-01', CAST(id AS INT)) AS d "
            "FROM range(5)"
        ).coalesce(1),
        t,
    )
    wide = spark.sql(
        "SELECT id + 5 AS k, "
        "TIMESTAMP_NTZ'2024-04-01 12:30:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS d "
        "FROM range(3)"
    ).coalesce(1)
    txn.append(wide, t, merge_schema=True)
    df = txn.read_table(spark, t)
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["d"] == "timestamp_ntz"
    rows = {r.k: r.d for r in df.collect()}
    assert len(rows) == 8
    import datetime

    # old date files read back as midnight NTZ timestamps, value-exact
    assert rows[2] == datetime.datetime(2024, 3, 3, 0, 0)
    assert rows[5] == datetime.datetime(2024, 4, 1, 12, 30)
    # old snapshots keep the narrow date type (time travel)
    old = txn.read_table(spark, t, version=0)
    assert {f.name: f.dataType.simpleString() for f in old.schema.fields}[
        "d"
    ] == "date"
    # zoned timestamp does NOT widen from date: refused, not corrupted
    t2 = str(tmp_path / "t2")
    txn.append(
        spark.sql("SELECT 1 AS k, DATE'2024-03-01' AS d").coalesce(1), t2
    )
    ltz = spark.sql("SELECT 2 AS k, TIMESTAMP'2024-03-01 10:00:00' AS d")
    with pytest.raises(ValueError, match="ADD columns or\\s+WIDEN"):
        txn.append(ltz, t2, merge_schema=True)
