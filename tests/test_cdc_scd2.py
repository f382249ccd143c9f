"""SCD Type 2 CDC apply (streaming/cdc_apply.py): history splicing
under out-of-order arrival, tombstone versions, as-of range reads, and
streaming replay identity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.streaming.cdc_apply import (
    SCD2_CURRENT,
    SCD2_END,
    SCD2_START,
    _apply_batch_scd2,
    _scd2_versions,
    apply_changes_scd2,
    scd2_as_of,
    scd2_current,
)

SCHEMA = "k long, v string, seq long, op string"


def _apply(spark, table, rows):
    batch = spark.createDataFrame(rows, SCHEMA)
    versions = _scd2_versions(batch, ["k"], "seq", "op = 'D'", ("op",))
    return _apply_batch_scd2(versions, table, ["k"])


def _history(spark, table):
    return {
        (r.k, r[SCD2_START]): (r.v, r[SCD2_END], r[SCD2_CURRENT])
        for r in txn.read_table(spark, table).collect()
    }


def test_scd2_in_order_history_ranges(spark, tmp_path):
    table = str(tmp_path / "t")
    _apply(spark, table, [(1, "a", 10, "U"), (2, "x", 10, "U")])
    _apply(spark, table, [(1, "b", 20, "U")])
    _apply(spark, table, [(1, "c", 30, "U")])
    hist = _history(spark, table)
    assert hist[(1, 10)] == ("a", 20, False)
    assert hist[(1, 20)] == ("b", 30, False)
    assert hist[(1, 30)] == ("c", None, True)
    assert hist[(2, 10)] == ("x", None, True)
    cur = {r.k: r.v for r in scd2_current(spark, table).collect()}
    assert cur == {1: "c", 2: "x"}


def test_scd2_out_of_order_version_splices_into_place(spark, tmp_path):
    table = str(tmp_path / "t")
    _apply(spark, table, [(1, "a", 10, "U"), (1, "c", 30, "U")])
    # middle version arrives LAST — ranges must re-knit around it
    _apply(spark, table, [(1, "b", 20, "U")])
    hist = _history(spark, table)
    assert hist[(1, 10)] == ("a", 20, False)
    assert hist[(1, 20)] == ("b", 30, False)
    assert hist[(1, 30)] == ("c", None, True)
    # as-of reads resolve through the spliced ranges
    assert scd2_as_of(spark, table, 15).collect()[0].v == "a"
    assert scd2_as_of(spark, table, 20).collect()[0].v == "b"
    assert scd2_as_of(spark, table, 99).collect()[0].v == "c"


def test_scd2_delete_is_a_tombstone_version(spark, tmp_path):
    table = str(tmp_path / "t")
    _apply(spark, table, [(1, "a", 10, "U")])
    _apply(spark, table, [(1, None, 20, "D")])
    _apply(spark, table, [(1, "reborn", 30, "U")])
    # the deleted span [20, 30) reads as no row; before and after exist
    assert scd2_as_of(spark, table, 15).count() == 1
    assert scd2_as_of(spark, table, 25).count() == 0
    assert scd2_as_of(spark, table, 35).collect()[0].v == "reborn"
    cur = scd2_current(spark, table).collect()
    assert [(r.k, r.v) for r in cur] == [(1, "reborn")]
    # key dead at head: current view empty for it
    _apply(spark, table, [(2, "x", 10, "U")])
    _apply(spark, table, [(2, None, 20, "D")])
    assert {r.k for r in scd2_current(spark, table).collect()} == {1}


def test_scd2_within_batch_multiple_versions_all_kept(spark, tmp_path):
    table = str(tmp_path / "t")
    # unlike Type 1, one batch carrying three changes for a key yields
    # THREE history rows
    _apply(
        spark,
        table,
        [(1, "a", 10, "U"), (1, "b", 20, "U"), (1, "c", 30, "U")],
    )
    hist = _history(spark, table)
    assert len(hist) == 3
    assert hist[(1, 20)] == ("b", 30, False)


def test_scd2_untouched_keys_not_rewritten(spark, tmp_path):
    """The fold only rewrites touched keys' rows: an update to key 1
    must not touch key 2's history (O(delta) contract — the MoR commit
    kills only probed rows)."""
    table = str(tmp_path / "t")
    _apply(spark, table, [(1, "a", 10, "U"), (2, "x", 10, "U")])
    v_before = txn.current_version(table)
    _apply(spark, table, [(1, "b", 20, "U")])
    # key 2's row survives with its original range
    hist = _history(spark, table)
    assert hist[(2, 10)] == ("x", None, True)
    # exactly one new commit, and its change-feed delete images touch
    # only key 1 (the spliced key), not key 2
    v_after = txn.current_version(table)
    assert v_after == v_before + 1
    cdf = txn.table_changes_cdf(spark, table, v_after - 1, v_after)
    deleted_keys = {
        r.k for r in cdf.filter(F.col("_change_type") == "delete").collect()
    }
    assert deleted_keys == {1}


def test_scd2_streaming_replay_commits_nothing(spark, tmp_path):
    src, table = tmp_path / "src", str(tmp_path / "t")

    def write_file(rows, mtime, n):
        sub = os.path.join(str(src), f"b{n}")
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(sub)
        for root, _d, fs in os.walk(sub):
            for f in fs:
                os.utime(os.path.join(root, f), (mtime, mtime))
        os.utime(sub, (mtime, mtime))

    write_file([(1, "a", 10, "U"), (2, "x", 10, "U")], 1_000, 0)
    write_file([(1, "b", 20, "U"), (2, None, 30, "D")], 2_000, 1)

    def run(ckpt):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(os.path.join(str(src), "*"))
        )
        q = apply_changes_scd2(
            stream,
            table,
            keys=["k"],
            sequence_by="seq",
            checkpoint=str(tmp_path / ckpt),
            apply_as_delete="op = 'D'",
            except_columns=("op",),
            available_now=True,
        )
        q.awaitTermination(300)

    run("ck1")
    hist_before = _history(spark, table)
    v_before = txn.current_version(table)
    assert {r.k for r in scd2_current(spark, table).collect()} == {1}
    assert hist_before[(1, 10)] == ("a", 20, False)
    # lost checkpoint → full replay with identical ids + content: the
    # commit-log identity recognizes every batch, zero new commits
    run("ck2")
    assert txn.current_version(table) == v_before
    assert _history(spark, table) == hist_before
