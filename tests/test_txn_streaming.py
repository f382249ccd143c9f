"""Exactly-once streaming appends into the transactional table
(streaming/pipeline.txn_append_sink + lakehouse/txn.py): batch commits
carry (app_id, batch_id) identity, and replays — the at-least-once case
foreachBatch exposes — are recognized in the commit log and skipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import committed_meta, snapshot
from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.pipeline import txn_append_sink
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream

from tests.test_streaming import wiki_event, write_ndjson

N_FILES, ROWS = 4, 25


def _run_stream(spark, src, table, ckpt):
    stream = file_replay_stream(spark, str(src), WIKI_EVENT_SCHEMA)
    q = txn_append_sink(
        stream, str(table), str(ckpt), app_id="soak-app", available_now=True
    )
    q.awaitTermination(300)


def test_stream_appends_land_with_batch_identity(spark, tmp_path):
    src = tmp_path / "src"
    for f in range(N_FILES):
        write_ndjson(
            src / f"part-{f}.ndjson",
            [wiki_event(f * ROWS + i) for i in range(ROWS)],
        )
    table = tmp_path / "table"
    _run_stream(spark, src, table, tmp_path / "ckpt")

    got = snapshot(spark, str(table))
    assert got.count() == N_FILES * ROWS
    assert got.select("id").distinct().count() == N_FILES * ROWS
    metas = [m for m in committed_meta(str(table)) if m]
    assert all(m["app_id"] == "soak-app" for m in metas)
    assert len({m["batch_id"] for m in metas}) == len(metas)


def test_full_replay_after_lost_checkpoint_is_deduped(spark, tmp_path):
    """The hard exactly-once case: the streaming CHECKPOINT is lost, so
    Spark re-runs every batch from scratch with the same batch ids. The
    commit log is the second line of defense — every replayed batch is
    recognized and skipped, row counts unchanged."""
    src = tmp_path / "src"
    for f in range(N_FILES):
        write_ndjson(
            src / f"part-{f}.ndjson",
            [wiki_event(f * ROWS + i) for i in range(ROWS)],
        )
    table = tmp_path / "table"
    _run_stream(spark, src, table, tmp_path / "ckpt1")
    before = snapshot(spark, str(table)).count()
    n_commits = len(committed_meta(str(table)))

    # checkpoint gone → same files, same deterministic batch split, same ids
    _run_stream(spark, src, table, tmp_path / "ckpt2")
    assert snapshot(spark, str(table)).count() == before
    assert len(committed_meta(str(table))) == n_commits  # zero new commits


def test_checkpoint_reset_over_new_data_refuses_silent_drop(spark, tmp_path):
    """ADVICE r4 medium: after a checkpoint RESET, batch ids restart at
    0 — if the source now holds DIFFERENT data, (app_id, batch_id) alone
    would classify the new batch 0 as a replay and silently drop it.
    The content fingerprint must turn that into a loud failure telling
    the operator to use a fresh app_id."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    src = tmp_path / "src"
    write_ndjson(src / "part-0.ndjson", [wiki_event(i) for i in range(ROWS)])
    table = tmp_path / "table"
    _run_stream(spark, src, table, tmp_path / "ckpt1")
    before = snapshot(spark, str(table)).count()

    # new data arrives AND the checkpoint is reset: batch 0 ≠ old batch 0
    write_ndjson(
        src / "part-0.ndjson",
        [wiki_event(1000 + i) for i in range(ROWS)],
    )
    with pytest.raises(StreamingQueryException, match="fresh app_id"):
        _run_stream(spark, src, table, tmp_path / "ckpt2")
    # nothing was dropped INTO the table either — state unchanged
    assert snapshot(spark, str(table)).count() == before

    # the documented fix works: a fresh app_id lands the new data
    stream = file_replay_stream(spark, str(src), WIKI_EVENT_SCHEMA)
    q = txn_append_sink(
        stream,
        str(table),
        str(tmp_path / "ckpt3"),
        app_id="soak-app-reset2",
        available_now=True,
    )
    q.awaitTermination(300)
    assert snapshot(spark, str(table)).count() == before + ROWS


def test_new_data_still_appends_after_replay(spark, tmp_path):
    """Dedup must not turn into a write-once table: batches with UNSEEN
    ids keep landing."""
    src = tmp_path / "src"
    write_ndjson(src / "part-0.ndjson", [wiki_event(i) for i in range(ROWS)])
    table = tmp_path / "table"
    _run_stream(spark, src, table, tmp_path / "ckpt")
    assert snapshot(spark, str(table)).count() == ROWS

    # more files arrive; SAME checkpoint continues the batch-id sequence
    write_ndjson(
        src / "part-1.ndjson", [wiki_event(ROWS + i) for i in range(ROWS)]
    )
    _run_stream(spark, src, table, tmp_path / "ckpt")
    got = snapshot(spark, str(table))
    assert got.count() == 2 * ROWS
    assert got.agg(F.max("id")).first()[0] == 2 * ROWS - 1


def test_stream_auto_checkpoints_the_commit_log(spark, tmp_path):
    """Long-running streams must not grow the log replay unboundedly:
    every checkpoint_every-th commit writes a log checkpoint, invisible
    to results."""
    from wikistream_lakehouse_spark.lakehouse.txn import _latest_checkpoint

    src = tmp_path / "src"
    for f in range(6):
        write_ndjson(
            src / f"part-{f}.ndjson", [wiki_event(f * 5 + i) for i in range(5)]
        )
    table = tmp_path / "table"
    stream = file_replay_stream(spark, str(src), WIKI_EVENT_SCHEMA)
    q = txn_append_sink(
        stream,
        str(table),
        str(tmp_path / "ckpt"),
        app_id="auto-cp",
        available_now=True,
        checkpoint_every=2,
    )
    q.awaitTermination(300)
    cp = _latest_checkpoint(str(table))
    assert cp is not None and cp[0] >= 2
    assert snapshot(spark, str(table)).count() == 30


def test_streaming_ingest_allocates_identity(spark, tmp_path):
    """Identity columns compose with the streaming append sink (r11):
    the table declares a GENERATED ALWAYS AS IDENTITY column the events
    don't carry, and every micro-batch's txn.append allocates it —
    unique across batches because the claim-pinned commit loop
    serializes allocators exactly as it does for batch writers."""
    from wikistream_lakehouse_spark.lakehouse.txn import set_identity_column

    src = tmp_path / "src"
    for f in range(N_FILES):
        write_ndjson(
            src / f"part-{f}.ndjson",
            [wiki_event(f * ROWS + i) for i in range(ROWS)],
        )
    table = tmp_path / "table"
    set_identity_column(spark, str(table), "row_id")
    _run_stream(spark, src, table, tmp_path / "ckpt")

    got = snapshot(spark, str(table))
    n = got.count()
    assert n == N_FILES * ROWS
    assert got.select("row_id").distinct().count() == n
    assert got.agg(F.min("row_id")).first()[0] >= 1
