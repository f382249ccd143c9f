"""Data skipping on transactional snapshots (skipping.txn_skipping_scan):
the full OPTIMIZE-ZORDER-then-prune loop on one table — append,
`compact(zorder_by=[x, y])`, then a multi-column range scan that reads a
strict subset of the active files, returns exactly the full-scan rows,
and never touches files retired by earlier versions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.skipping import txn_skipping_scan
from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    compact,
    current_version,
    read_table,
)


@pytest.fixture()
def zordered(spark, tmp_path):
    """A txn table with x/y scattered across appends, then z-ordered into
    multiple files so both columns' per-file envelopes are tight."""
    t = str(tmp_path / "t")
    n = 4096
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            # bit-interleave-friendly uniform grid, shuffled by hash so
            # the PRE-compact layout is clustered in neither column
            F.pmod(F.xxhash64("id"), F.lit(64)).cast("double").alias("x"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(64)).cast("double").alias("y"),
        )
    )
    for i in range(4):
        append(df.filter(F.pmod("k", F.lit(4)) == i), t)
    compact(spark, t, target_file_bytes=8 * 1024, zorder_by=["x", "y"])
    return t


def test_zordered_txn_scan_prunes_files_and_matches_full_scan(spark, zordered):
    ranges = {"x": (0.0, 7.0), "y": (0.0, 7.0)}
    df, n_read, n_total = txn_skipping_scan(spark, zordered, ranges)
    assert n_total > 4  # compaction produced a multi-file layout
    assert 0 < n_read < n_total  # pruning actually skipped files
    expected = read_table(spark, zordered).filter(
        (F.col("x") >= 0) & (F.col("x") <= 7) & (F.col("y") >= 0) & (F.col("y") <= 7)
    )
    assert sorted(r.k for r in df.collect()) == sorted(
        r.k for r in expected.collect()
    )


def test_scan_ignores_retired_files(spark, zordered):
    """The pre-compact appends' files are still on disk (time travel),
    but the scan's universe is the ACTIVE snapshot only."""
    _, _, n_total = txn_skipping_scan(spark, zordered, {"x": (0.0, 63.0)})
    from wikistream_lakehouse_spark.lakehouse.txn import _replay

    active = _replay(zordered, current_version(zordered))
    assert n_total == len(active)


def test_scan_time_travels(spark, tmp_path):
    t = str(tmp_path / "t")
    append(
        spark.createDataFrame([(1, 10.0)], "k long, x double"), t
    )
    append(
        spark.createDataFrame([(2, 20.0)], "k long, x double"), t
    )
    df_now, _, total_now = txn_skipping_scan(spark, t, {"x": (0.0, 100.0)})
    df_v0, _, total_v0 = txn_skipping_scan(
        spark, t, {"x": (0.0, 100.0)}, version=0
    )
    assert {r.k for r in df_now.collect()} == {1, 2}
    assert {r.k for r in df_v0.collect()} == {1}
    assert total_v0 < total_now


def test_perfect_pruning_returns_empty_with_schema(spark, zordered):
    df, n_read, _ = txn_skipping_scan(spark, zordered, {"x": (1e6, 2e6)})
    assert n_read == 0
    assert df.count() == 0
    assert {"k", "x", "y"} <= set(df.columns)
