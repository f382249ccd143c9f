"""Data skipping: the manifest prunes files, results stay exact, and a
Z-ordered layout prunes on BOTH clustered dimensions while a
single-column sort only prunes its leader."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.skipping import (
    collect_file_stats,
    prune_files,
    skipping_scan,
)
from wikistream_lakehouse_spark.lakehouse.zorder import write_zordered
from wikistream_lakehouse_spark.tables import table


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("skip")
    e = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    zpath = str(base / "zorder")
    tpath = str(base / "ts_sorted")
    write_zordered(e, zpath, ["user_id", "ts"], num_files=16)
    e.repartitionByRange(16, "ts").sortWithinPartitions("ts").write.parquet(tpath)
    return e, zpath, tpath


def _mid_ranges(e):
    """A selective box in the middle of both domains (~1/16 each dim)."""
    b = e.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min(F.col("ts").cast("double")).alias("tlo"),
        F.max(F.col("ts").cast("double")).alias("thi"),
    ).first()
    uspan, tspan = b.uhi - b.ulo, b.thi - b.tlo
    return {
        "user_id": (b.ulo + 0.50 * uspan, b.ulo + 0.5625 * uspan),
        "ts": (b.tlo + 0.50 * tspan, b.tlo + 0.5625 * tspan),
    }


def test_manifest_matches_footers(spark, layouts):
    _e, zpath, _t = layouts
    stats = collect_file_stats(spark, zpath, ["user_id", "ts"])
    pdf = stats.toPandas()
    assert len(pdf) >= 4  # one row per file
    assert pdf.n_rows.sum() == spark.read.parquet(zpath).count()
    # envelopes must cover the actual per-file extremes
    actual = (
        spark.read.parquet(zpath)
        .withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(
            F.min("user_id").alias("lo"),
            F.max("user_id").alias("hi"),
            F.count("*").alias("n"),
        )
        .toPandas()
    )
    merged = actual.merge(
        pdf.assign(file="file:" + pdf.file), on="file", validate="1:1"
    )
    assert (merged.user_id_min <= merged.lo).all()
    assert (merged.user_id_max >= merged.hi).all()
    assert (merged.n == merged.n_rows).all()


def test_skipping_scan_is_exact_and_prunes(spark, layouts):
    e, zpath, _t = layouts
    ranges = _mid_ranges(e)
    stats = collect_file_stats(spark, zpath, ["user_id", "ts"])
    df, kept, total = skipping_scan(spark, stats, ranges, cast={"ts": "double"})
    # exactness: same rows as a full scan with the same predicates
    (ulo, uhi), (tlo, thi) = ranges["user_id"], ranges["ts"]
    truth = (
        spark.read.parquet(zpath)
        .filter(F.col("user_id").between(ulo, uhi))
        .filter(F.col("ts").cast("double").between(tlo, thi))
    )
    assert df.count() == truth.count()
    assert (
        df.agg(F.sum(F.hash("event_id", "user_id"))).first()[0]
        == truth.agg(F.sum(F.hash("event_id", "user_id"))).first()[0]
    )
    # and it actually skips: the box covers ~1/16 × 1/16 of the domain
    assert kept < total


def test_perfect_pruning_returns_empty_frame(spark, layouts):
    """A predicate outside every file's envelope is the SUCCESS case:
    zero files scanned, empty result, schema intact — not an error."""
    e, zpath, _t = layouts
    hi = e.agg(F.max("user_id")).first()[0]
    stats = collect_file_stats(spark, zpath, ["user_id"])
    ranges = {"user_id": (hi + 1000, hi + 2000)}
    kept, total = prune_files(stats, ranges)
    assert kept == [] and total > 0
    df, n_read, n_total = skipping_scan(spark, stats, ranges)
    assert n_read == 0 and n_total == total
    assert df.count() == 0
    assert set(df.columns) == {"event_id", "user_id", "ts"}


def test_zorder_prunes_both_dims_single_sort_does_not(spark, layouts):
    e, zpath, tpath = layouts
    ranges = _mid_ranges(e)
    z_stats = collect_file_stats(spark, zpath, ["user_id", "ts"])
    t_stats = collect_file_stats(spark, tpath, ["user_id", "ts"])

    # user_id-only predicate: z-layout skips files; ts-sorted cannot
    # (every ts-sorted file spans the full user_id domain)
    uonly = {"user_id": ranges["user_id"]}
    z_kept, z_total = prune_files(z_stats, uonly)
    t_kept, t_total = prune_files(t_stats, uonly)
    assert len(z_kept) < z_total
    assert len(t_kept) == t_total

    # both-dims predicate: pruning is monotone (adding a predicate never
    # keeps more files) and the box prunes well below the file count.
    # NOTE deliberately NOT asserted: z_both <= t_both — a single-column
    # sort is optimal for predicates on its own leader; Z-order's win is
    # the uonly case above plus never degenerating on either dimension.
    z_both, _ = prune_files(z_stats, ranges)
    assert len(z_both) <= len(z_kept)
    assert len(z_both) < z_total // 2


def test_persisted_manifest_prunes_without_full_collect(
    spark, layouts, tmp_path, monkeypatch
):
    """Planning against a persisted manifest materializes only the
    SURVIVING file paths on the driver — at ~10^6 files a whole-manifest
    collect per planned scan is the bottleneck the persisted table
    exists to remove."""
    from unittest.mock import patch

    from wikistream_lakehouse_spark.lakehouse.skipping import (
        load_manifest,
        persist_manifest,
    )

    e, zpath, _t = layouts
    ranges = _mid_ranges(e)
    mpath = str(tmp_path / "manifest")
    persist_manifest(collect_file_stats(spark, zpath, ["user_id", "ts"]), mpath)
    manifest = load_manifest(spark, mpath)

    collected_sizes = []
    # patch the CONCRETE DataFrame class (pyspark 4 splits the abstract
    # base from pyspark.sql.classic; the base's attribute is shadowed)
    df_cls = type(manifest)
    real_collect = df_cls.collect

    def spy_collect(self):
        rows = real_collect(self)
        collected_sizes.append(len(rows))
        return rows

    with patch.object(df_cls, "collect", spy_collect):
        kept, total = prune_files(manifest, ranges)
    assert 0 < len(kept) < total
    # every driver materialization during planning is survivor-sized,
    # never manifest-sized
    assert collected_sizes and max(collected_sizes) <= len(kept)

    # the persisted-manifest plan answers match the in-memory manifest
    fresh_kept, fresh_total = prune_files(
        collect_file_stats(spark, zpath, ["user_id", "ts"]), ranges
    )
    assert (kept, total) == (fresh_kept, fresh_total)


def test_skipping_scan_keeps_hive_partition_columns(spark, sf_dir, tmp_path):
    """Reading a pruned file SUBSET from a hive-partitioned table must
    not silently drop the k=v directory columns — basePath keeps the
    scan schema identical to a whole-table read."""
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int"))
    )
    tpath = str(tmp_path / "hive")
    (
        e.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.partitionBy("bucket")
        .parquet(tpath)
    )
    stats = collect_file_stats(spark, tpath, ["user_id"])
    lo = e.agg(F.min("user_id")).first()[0]
    ranges = {"user_id": (float(lo), float(lo) + 10.0)}
    df, kept, total = skipping_scan(spark, stats, ranges, base_path=tpath)
    assert kept < total
    assert set(df.columns) == set(spark.read.parquet(tpath).columns)
    assert df.filter(F.col("bucket").isNull()).count() == 0


def test_collect_file_stats_rejects_partition_column(spark, sf_dir, tmp_path):
    """Partition columns live in directory names, not parquet footers —
    asking the footer scan for one must fail loudly, not KeyError."""
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .withColumn("bucket", F.pmod(F.col("user_id"), F.lit(4)).cast("int"))
    )
    tpath = str(tmp_path / "hive_err")
    e.write.partitionBy("bucket").parquet(tpath)
    with pytest.raises(Exception, match="partition columns"):
        collect_file_stats(spark, tpath, ["bucket"]).collect()
