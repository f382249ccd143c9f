"""Streaming a txn table's change feed through the Python Data Source
API (streaming/txn_source.py): versions are offsets, so a stream
delivers each appended row exactly once — across restarts from the same
checkpoint — skips compactions, and fails loudly on mutating commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    compact,
    delete_where,
)
from wikistream_lakehouse_spark.streaming.txn_source import (
    TxnTableDataSource,
    TxnTableStreamReader,
    register_txn_source,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _drain(spark, table, ckpt, out_dir):
    """One availableNow pulse into a fault-tolerant parquet sink;
    returns the sink's CUMULATIVE rows as a list (duplicates visible)."""
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .load(table)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted((r.k, r.v) for r in spark.read.parquet(out_dir).collect())


def test_stream_delivers_appends_exactly_once_across_restarts(spark, tmp_path):
    t = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    append(_df(spark, [(1, "a"), (2, "b")]), t)
    append(_df(spark, [(3, "c")]), t)
    assert _drain(spark, t, ckpt, out) == [(1, "a"), (2, "b"), (3, "c")]

    # new appends + a compaction in between; restart from the SAME
    # checkpoint → exactly the new rows arrive, no replay of the
    # compacted (already-delivered) data and no duplicates
    append(_df(spark, [(4, "d")]), t)
    compact(spark, t, target_file_bytes=1 << 40)
    append(_df(spark, [(5, "e")]), t)
    got = _drain(spark, t, ckpt, out)
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


def test_stream_fails_loudly_on_mutating_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a"), (2, "b")]), t)
    _drain(spark, t, str(tmp_path / "ck"), str(tmp_path / "out"))
    delete_where(spark, t, "k = 1")
    append(_df(spark, [(9, "z")]), t)
    from pyspark.errors.exceptions.captured import StreamingQueryException

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
    with pytest.raises(StreamingQueryException, match="content-changing"):
        q.awaitTermination(300)


def test_partitioned_table_streams_with_path_values(spark, tmp_path):
    """Hive-partitioned tables stream: path-encoded columns materialize
    per batch from the directory values (round-7; previously refused).
    The numeric-looking string value must come back as the STRING it
    was written as (type from the value scan: '7' and 'x' mix → string),
    and a hive-escaped value must decode."""
    t = str(tmp_path / "pt")
    append(
        spark.createDataFrame(
            [(1, "7"), (2, "x"), (3, "a b")], "k long, ds string"
        ),
        t,
        partition_by=["ds"],
    )
    append(
        spark.createDataFrame([(4, "7")], "k long, ds string"),
        t,
        partition_by=["ds"],
    )
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
    assert out.schema["ds"].dataType.simpleString() == "string"
    got = {(r.k, r.ds) for r in out.collect()}
    assert got == {(1, "7"), (2, "x"), (3, "a b"), (4, "7")}


def test_partitioned_stream_infers_numeric_partition_type(spark, tmp_path):
    """All-numeric directory values with no log-stamped authority infer
    long — matching what a batch read_table of the same table infers."""
    t = str(tmp_path / "pn")
    append(
        spark.createDataFrame([(1, 10), (2, 20)], "k long, b long"),
        t,
        partition_by=["b"],
    )
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
    assert out.schema["b"].dataType.simpleString() == "bigint"
    assert {(r.k, r.b) for r in out.collect()} == {(1, 10), (2, 20)}


def test_stream_feeds_windowed_aggregation(spark, tmp_path):
    """The source composes with ordinary streaming ops: a grouped count
    over the change feed in update mode."""
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "x"), (2, "x"), (3, "y")]), t)
    append(_df(spark, [(4, "x")]), t)
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .load(t)
        .groupBy("v")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("txs_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {r.v: r.n for r in spark.sql("SELECT * FROM txs_agg").collect()}
    assert got == {"x": 3, "y": 1}


# --- CDF mode: streams row-level change images -----------------------------


def _drain_cdf(spark, table, ckpt, out_dir):
    """One availableNow pulse of the CDF stream into a parquet sink;
    returns cumulative (k, v, _change_type, _commit_version) rows."""
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .option("cdf", "true")
        .load(table)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(
        (r.k, r.v, r._change_type, r._commit_version)
        for r in spark.read.parquet(out_dir).collect()
    )


def test_cdf_stream_delivers_delete_images(spark, tmp_path):
    """Deletion-vector deletes STREAM (instead of failing the query):
    each killed row arrives as a delete image stamped with its commit
    version, reconstructed executor-side from the untouched data file."""
    t = str(tmp_path / "t")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append(_df(spark, [(1, "a"), (2, "b")]), t)  # v0
    assert _drain_cdf(spark, t, ckpt, out) == [
        (1, "a", "insert", 0),
        (2, "b", "insert", 0),
    ]
    delete_where(spark, t, "k = 2", mode="mor")  # v1
    append(_df(spark, [(3, "c")]), t)  # v2
    got = _drain_cdf(spark, t, ckpt, out)
    assert got == [
        (1, "a", "insert", 0),
        (2, "b", "delete", 1),
        (2, "b", "insert", 0),
        (3, "c", "insert", 2),
    ]
    # restart with nothing new: exactly-once, no replay
    assert _drain_cdf(spark, t, ckpt, out) == got


def test_cdf_stream_still_refuses_cow_mutations(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a")]), t)
    delete_where(spark, t, "k = 1")  # copy-on-write: delta unrecoverable
    register_txn_source(spark)
    q = (
        spark.readStream.format("txn_table")
        .option("cdf", "true")
        .load(t)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="content-changing"):
        q.awaitTermination(300)


def test_plain_stream_error_hints_at_cdf_for_dv_deletes(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a"), (2, "b")]), t)
    delete_where(spark, t, "k = 1", mode="mor")
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
    with pytest.raises(StreamingQueryException, match="cdf"):
        q.awaitTermination(300)


def test_cdf_stream_skips_noop_merge_commit(spark, tmp_path):
    """A non-removing commit with neither add nor dvAdd (the empty-batch
    'merge' cdc_replicate_sink can produce) is a no-op the CDF stream
    skips — not a content-changing error that wedges it forever
    (ADVICE r5)."""
    from wikistream_lakehouse_spark.lakehouse import txn

    t = str(tmp_path / "t")
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    append(_df(spark, [(1, "a")]), t)  # v0
    e = txn._entry("merge", [], [], [], {"note": "empty CDC batch"})
    assert txn._try_commit(t, 1, e)  # v1: the no-op shape, verbatim
    append(_df(spark, [(2, "b")]), t)  # v2
    assert _drain_cdf(spark, t, ckpt, out) == [
        (1, "a", "insert", 0),
        (2, "b", "insert", 2),
    ]


def test_cdf_planner_reports_vacuumed_sidecar_not_pyarrow_crash(
    spark, tmp_path
):
    """A vacuumed DV sidecar inside the streamed range surfaces as the
    friendly retention ValueError, not a raw pyarrow FileNotFoundError
    (ADVICE r5)."""
    from wikistream_lakehouse_spark.lakehouse.txn import compact as _compact
    from wikistream_lakehouse_spark.lakehouse.txn import vacuum

    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a"), (2, "b")]), t)  # v0
    delete_where(spark, t, "k = 2", mode="mor")  # v1: dvAdd
    _compact(spark, t, target_file_bytes=1 << 40)  # v2: retires the DV
    vacuum(t, retain_versions=1, orphan_grace_secs=0)  # sidecar reclaimed
    reader = TxnTableStreamReader(t, cdf=True)
    with pytest.raises(ValueError, match="vacuumed"):
        reader.partitions({"version": 0}, {"version": 1})


def test_max_commits_per_batch_bounds_catchup(spark, tmp_path):
    """maxCommitsPerBatch (the maxFilesPerTrigger analogue at commit
    grain): a fresh consumer of a many-commit table advances at most N
    commits per planned batch instead of one giant catch-up batch —
    every row still arrives, across several bounded batches."""
    t = str(tmp_path / "t")
    for i in range(5):  # v0..v4
        append(_df(spark, [(i, f"v{i}")]), t)
    reader = TxnTableStreamReader(t, max_commits_per_batch=2)
    start = reader.initialOffset()
    assert start == {"version": -1}
    seen = start["version"]
    batches = []
    while True:
        end = reader.latestOffset()
        if end["version"] == seen:
            break
        parts = reader.partitions({"version": seen}, end)
        batches.append((seen, end["version"], len(parts)))
        seen = end["version"]
    # 5 commits at ≤2/batch → 3 batches, not one giant one
    assert [b[:2] for b in batches] == [(-1, 1), (1, 3), (3, 4)]
    # option plumbing: the format string form builds the same reader
    src = TxnTableDataSource({"path": t, "maxcommitsperbatch": "2"})
    assert src.streamReader(None).max_commits == 2
