"""Structured-streaming tests (SURVEY.md §5.4): file-replay micro-batches,
malformed-drop, checkpointed exactly-once restart, watermarked dedup and
windows, foreachBatch gold merge, and the wiki pipeline end-to-end."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.lakehouse.txn import read_table
from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.pipeline import (
    dedup_within_watermark,
    gold_merge_sink,
    session_window_counts,
    windowed_counts,
)
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream
from wikistream_lakehouse_spark.streaming.wiki_pipeline import (
    curate_wiki_silver,
    daily_editor_aggregate,
    ingest_wiki_stream,
    serve_daily_editors,
)

BASE_TS = 1_705_300_000  # 2024-01-15 UTC


def wiki_event(i: int, user: str = "alice", bot: bool | None = None, ts: int | None = None):
    return {
        "id": i,
        "type": "edit",
        "title": f"Page_{i % 5}",
        "user": user,
        "bot": bot,
        "timestamp": ts or (BASE_TS + i * 60),
        "comment": "c",
        "minor": None,  # producer default-fill target (P2)
    }


def write_ndjson(path, records):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def wiki_dirs(tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    return {
        "src": src,
        "bronze": str(tmp_path / "bronze"),
        "silver": str(tmp_path / "silver"),
        "serving": str(tmp_path / "serving"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_wiki_pipeline_end_to_end(spark, wiki_dirs):
    """§3.1-3.3 in one run: replay → bronze → silver → serving MERGE,
    including the null-safe bot filter and minor default-fill."""
    write_ndjson(
        wiki_dirs["src"] / "batch1.json",
        [wiki_event(i) for i in range(50)]
        + [wiki_event(100 + i, user="robot", bot=True) for i in range(10)],
    )
    write_ndjson(
        wiki_dirs["src"] / "batch2.json",
        [wiki_event(200 + i, user="bob") for i in range(30)],
    )
    q = ingest_wiki_stream(
        spark, str(wiki_dirs["src"]), wiki_dirs["bronze"], wiki_dirs["ckpt"]
    )
    q.awaitTermination(120)
    bronze = spark.read.parquet(wiki_dirs["bronze"])
    assert bronze.count() == 90
    assert bronze.filter(F.col("minor").isNull()).count() == 0  # P2 default-fill
    assert "ds" in bronze.columns  # processing-date partition (T5)

    curate_wiki_silver(spark, wiki_dirs["bronze"], wiki_dirs["silver"])
    silver = read_table(spark, wiki_dirs["silver"])  # silver is txn now
    assert silver.count() == 90
    assert {r.dd for r in silver.select("dd").distinct().collect()} == {15}

    serve_daily_editors(
        spark, wiki_dirs["silver"], wiki_dirs["serving"], ds="2024-01-15"
    )
    serving = {
        r.username: r.edits
        for r in read_table(spark, wiki_dirs["serving"]).collect()
    }
    assert serving == {"alice": 50, "bob": 30}  # bots excluded (P5)

    # idempotency: rerun curation + serving → identical state
    curate_wiki_silver(spark, wiki_dirs["bronze"], wiki_dirs["silver"])
    serve_daily_editors(
        spark, wiki_dirs["silver"], wiki_dirs["serving"], ds="2024-01-15"
    )
    assert read_table(spark, wiki_dirs["silver"]).count() == 90
    serving2 = {
        r.username: r.edits
        for r in read_table(spark, wiki_dirs["serving"]).collect()
    }
    assert serving2 == serving


def test_checkpoint_restart_exactly_once(spark, wiki_dirs):
    """T2 upgrade: restart from checkpoint ingests only new files — old
    micro-batches are not re-emitted (no at-least-once duplicates)."""
    write_ndjson(wiki_dirs["src"] / "b1.json", [wiki_event(i) for i in range(20)])
    q = ingest_wiki_stream(
        spark, str(wiki_dirs["src"]), wiki_dirs["bronze"], wiki_dirs["ckpt"]
    )
    q.awaitTermination(120)
    assert spark.read.parquet(wiki_dirs["bronze"]).count() == 20

    write_ndjson(wiki_dirs["src"] / "b2.json", [wiki_event(100 + i) for i in range(15)])
    q2 = ingest_wiki_stream(
        spark, str(wiki_dirs["src"]), wiki_dirs["bronze"], wiki_dirs["ckpt"]
    )
    q2.awaitTermination(120)
    out = spark.read.parquet(wiki_dirs["bronze"])
    assert out.count() == 35  # 20 + 15, no replays
    assert out.select("id").distinct().count() == 35


def test_malformed_lines_dropped(spark, tmp_path):
    """P4/S5: unparseable lines are skipped, not fatal — the consumer's
    json.loads-or-skip (kafka/wiki-s3-consumer.py:93-95)."""
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "mixed.json", "w") as f:
        f.write(json.dumps(wiki_event(1)) + "\n")
        f.write("this is not json at all{{{\n")
        f.write(json.dumps(wiki_event(2)) + "\n")
    stream = file_replay_stream(spark, str(src), WIKI_EVENT_SCHEMA)
    q = (
        stream.writeStream.format("memory")
        .queryName("malformed_t")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM malformed_t WHERE id IS NOT NULL").collect()
    assert {r.id for r in rows} == {1, 2}


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _event_rows(n, dup_every=None):
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "ts": f"2024-01-15T10:{i % 60:02d}:00.000Z",
                "user_id": i % 3,
            }
        )
        if dup_every and i % dup_every == 0:
            rows.append(rows[-1])  # at-least-once redelivery
    return rows


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """X1: duplicates within the watermark horizon are dropped → exactly
    one row per event_id despite redelivery."""
    src = tmp_path / "src"
    write_ndjson(src / "a.json", _event_rows(40, dup_every=4))
    stream = file_replay_stream(spark, str(src), EVENTS_SCHEMA)
    deduped = dedup_within_watermark(stream, key="event_id", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_t").collect()
    assert len(got) == 40
    assert len({r.event_id for r in got}) == 40


def test_streaming_windows_match_batch(spark, tmp_path):
    """X6: streaming watermarked tumbling counts == the batch aggregation
    over the same data (batch certifies streaming)."""
    src = tmp_path / "src"
    rows = _event_rows(50)
    write_ndjson(src / "a.json", rows[:25])
    write_ndjson(src / "b.json", rows[25:])
    stream = file_replay_stream(spark, str(src), EVENTS_SCHEMA)
    agg = windowed_counts(
        stream, window_len="10 minutes", watermark="1 hour", group_cols=("user_id",)
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    streaming = {
        (r.window_start, r.user_id): r.n_events
        for r in spark.sql("SELECT * FROM win_t").collect()
    }
    batch_df = spark.read.schema(EVENTS_SCHEMA).json(str(src))
    batch = {
        (r.w.start, r.user_id): r.n
        for r in batch_df.groupBy(F.window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streaming == batch


def test_gold_merge_sink_converges_to_batch_truth(spark, tmp_path):
    """K5-streaming: foreachBatch MERGE over micro-batches ends at the
    same serving state a single batch aggregation would produce."""
    src = tmp_path / "src"
    rows = _event_rows(60)
    write_ndjson(src / "a.json", rows[:30])
    write_ndjson(src / "b.json", rows[30:])
    stream = file_replay_stream(spark, str(src), EVENTS_SCHEMA)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    serving = str(tmp_path / "serving")
    q = gold_merge_sink(
        agg, serving, str(tmp_path / "ck"), keys=["user_id"], available_now=True
    )
    q.awaitTermination(120)
    got = {r.user_id: r.n_events for r in read_table(spark, serving).collect()}
    truth_df = spark.read.schema(EVENTS_SCHEMA).json(str(src))
    truth = {
        r.user_id: r.n
        for r in truth_df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == truth


def _ordered_files(src, batches):
    """Write one NDJSON file per micro-batch with strictly increasing
    mtimes so the file source replays them in this exact order."""
    import os
    import time

    base = time.time() - 1000
    for i, rows in enumerate(batches):
        p = src / f"{i:03d}.json"
        write_ndjson(p, rows)
        os.utime(p, (base + i * 10, base + i * 10))


def _session_rows(tag: str):
    def ev(event_id, hhmm, user):
        return {
            "event_id": event_id,
            "ts": f"2024-01-15T{hhmm}:00.000Z",
            "user_id": user,
        }

    return ev


def _run_sessions(spark, tmp_path, batches, name):
    src = tmp_path / "src"
    _ordered_files(src, batches)
    stream = file_replay_stream(spark, str(src), EVENTS_SCHEMA)
    agg = session_window_counts(stream, gap="10 minutes", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.user_id, r.session_start.strftime("%H:%M"), r.session_end.strftime("%H:%M")): r.n_events
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


def test_session_window_late_within_watermark_merges(spark, tmp_path):
    """X6 hard part (a): a late event INSIDE the watermark must join the
    open session it falls into — extending the session end."""
    ev = _session_rows("merge")
    batches = [
        # batch 0: user 1 session [10:00, 10:15); watermark → 10:00
        [ev(1, "10:00", 1), ev(2, "10:05", 1), ev(3, "10:30", 8)],
        # batch 1: late 10:08 ≥ watermark 10:00 → accepted, merges,
        # session becomes [10:00, 10:18)
        [ev(4, "10:08", 1)],
        # batch 2: advance watermark past session end → finalize + emit
        [ev(5, "12:00", 8)],
    ]
    got = _run_sessions(spark, tmp_path, batches, "sess_merge")
    assert got[(1, "10:00", "10:18")] == 3
    assert not any(u == 1 and k != "10:00" for (u, k, _), _n in got.items())


def test_session_window_late_beyond_watermark_dropped(spark, tmp_path):
    """X6 hard part (b): a late event BEYOND the watermark is dropped
    from session state — it neither merges nor opens a session."""
    ev = _session_rows("drop")
    batches = [
        # batch 0: user 1 session [10:00, 10:15); 11:00 event → the
        # eviction watermark becomes 10:30 at commit
        [ev(1, "10:00", 1), ev(2, "10:05", 1), ev(3, "11:00", 8)],
        # batch 1: spacer — Spark's LATE-EVENT watermark lags one batch
        # behind the eviction watermark; this batch promotes 10:30 into
        # the late-event filter
        [ev(4, "11:01", 8)],
        # batch 2: 10:07 < late-event watermark 10:30 → dropped entirely
        [ev(5, "10:07", 1)],
        # batch 3: flush
        [ev(6, "12:00", 8)],
    ]
    got = _run_sessions(spark, tmp_path, batches, "sess_drop")
    assert got[(1, "10:00", "10:15")] == 2  # late event did NOT merge
    user1_sessions = [k for k in got if k[0] == 1]
    assert user1_sessions == [(1, "10:00", "10:15")]  # and opened nothing


def test_gold_merge_sink_version_col_keeps_latest(spark, tmp_path):
    """K5-streaming determinism: a micro-batch carrying SEVERAL rows per
    key (non-aggregate upstream / replay) must resolve to the row with
    the greatest version_col — not an arbitrary dropDuplicates pick."""
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ver", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    write_ndjson(
        src / "a.json",
        [
            {"user_id": 1, "ver": 1, "score": 0.1},
            {"user_id": 1, "ver": 3, "score": 0.9},
            {"user_id": 1, "ver": 2, "score": 0.5},
            {"user_id": 2, "ver": 7, "score": 0.7},
        ],
    )
    stream = file_replay_stream(spark, str(src), schema)
    serving = str(tmp_path / "serving")
    q = gold_merge_sink(
        stream,
        serving,
        str(tmp_path / "ck"),
        keys=["user_id"],
        available_now=True,
        version_col="ver",
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.ver, r.score) for r in read_table(spark, serving).collect()}
    assert got == {1: (3, 0.9), 2: (7, 0.7)}


def test_stateful_sessionization(spark, tmp_path):
    """Custom applyInPandasWithState sessionizer: sessions close on
    event-time gaps (in-batch splits and watermark timeouts) with custom
    per-session state (distinct event types)."""
    from wikistream_lakehouse_spark.streaming.stateful import sessionize_with_state

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = tmp_path / "src"
    # user 7: session A (3 events, 2 types), 2h gap, session B (2 events)
    write_ndjson(
        src / "a.json",
        [
            {"event_id": 1, "ts": "2024-01-15T10:00:00.000Z", "user_id": 7,
             "event_type": "click", "value": 1.0},
            {"event_id": 2, "ts": "2024-01-15T10:10:00.000Z", "user_id": 7,
             "event_type": "view", "value": 2.0},
            {"event_id": 3, "ts": "2024-01-15T10:20:00.000Z", "user_id": 7,
             "event_type": "click", "value": 3.0},
            {"event_id": 4, "ts": "2024-01-15T12:30:00.000Z", "user_id": 7,
             "event_type": "purchase", "value": 10.0},
            {"event_id": 5, "ts": "2024-01-15T12:40:00.000Z", "user_id": 7,
             "event_type": "purchase", "value": 20.0},
        ],
    )
    stream = file_replay_stream(spark, str(src), schema)
    sessions = sessionize_with_state(stream, gap_secs=1800)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        spark.sql("SELECT * FROM sess_t").collect(), key=lambda r: r.session_start
    )
    # session A closed by the in-batch 2h gap; session B still open in state
    assert len(rows) >= 1
    a = rows[0]
    assert a.user_id == 7
    assert a.n_events == 3
    assert a.total_value == 6.0
    assert a.n_event_types == 2
    assert a.session_start.isoformat().startswith("2024-01-15T10:00:00")
    assert a.session_end.isoformat().startswith("2024-01-15T10:50:00")  # +30min


def test_run_daily_batch_is_one_idempotent_call(spark, wiki_dirs, tmp_path):
    """The reference's 5-task Airflow DAG as one function: bronze -> silver
    -> gold -> serving, convergent under re-runs (retry safety lives in
    the jobs, not the scheduler)."""
    from wikistream_lakehouse_spark.streaming.wiki_pipeline import run_daily_batch

    write_ndjson(
        wiki_dirs["src"] / "b1.json",
        [wiki_event(i) for i in range(40)]
        + [wiki_event(100 + i, user="bot9000", bot=True) for i in range(5)],
    )
    q = ingest_wiki_stream(
        spark, str(wiki_dirs["src"]), wiki_dirs["bronze"], wiki_dirs["ckpt"]
    )
    q.awaitTermination(120)
    gold = str(tmp_path / "gold")
    for _ in range(2):  # run twice: the whole chain must converge
        run_daily_batch(
            spark, wiki_dirs["bronze"], wiki_dirs["silver"], gold,
            wiki_dirs["serving"], ds="2024-01-15",
        )
    assert read_table(spark, wiki_dirs["silver"]).count() == 45
    gold_rows = read_table(spark, gold)
    assert gold_rows.filter(F.col("title").isNull()).count() == 0
    assert gold_rows.agg(F.sum("edits")).collect()[0][0] == 45  # gold keeps bots
    serving = {
        r.username: r.edits
        for r in read_table(spark, wiki_dirs["serving"]).collect()
    }
    assert serving == {"alice": 40}  # serving excludes bots (P5)


def test_windowed_agg_state_survives_restart(spark, tmp_path):
    """Stateful window counts continue correctly across a stop/restart:
    post-restart totals equal a batch aggregation over everything seen."""
    src = tmp_path / "src"
    rows = _event_rows(40)
    write_ndjson(src / "a.json", rows[:20])

    def run_round():
        stream = file_replay_stream(spark, str(src), EVENTS_SCHEMA)
        agg = windowed_counts(stream, window_len="10 minutes", watermark="1 hour")
        q = (
            agg.writeStream.format("memory")
            .queryName("win_restart_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(120)

    run_round()  # first 20 events
    write_ndjson(src / "b.json", rows[20:])
    run_round()  # restart from checkpoint, sees only the new file
    streaming = {
        r.window_start: r.n_events
        for r in spark.sql("SELECT * FROM win_restart_t").collect()
    }
    batch_df = spark.read.schema(EVENTS_SCHEMA).json(str(src))
    batch = {
        r.w.start: r.n
        for r in batch_df.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert streaming == batch  # no double counting, no lost state


def test_streaming_silver_matches_batch_curation(spark, wiki_dirs, tmp_path):
    """Streaming silver (bronze dir -> event-time partitions, checkpointed)
    produces the same rows and partition layout as the batch curator."""
    from wikistream_lakehouse_spark.streaming.pipeline import streaming_silver

    write_ndjson(wiki_dirs["src"] / "b1.json", [wiki_event(i) for i in range(30)])
    q = ingest_wiki_stream(
        spark, str(wiki_dirs["src"]), wiki_dirs["bronze"], wiki_dirs["ckpt"]
    )
    q.awaitTermination(120)
    # ts derives from epoch-seconds `timestamp` inside
    # derive_event_time_columns (the epoch-long branch)
    raw_schema = spark.read.parquet(wiki_dirs["bronze"]).drop("ds").schema
    sq = streaming_silver(
        spark,
        wiki_dirs["bronze"],
        str(tmp_path / "silver_stream"),
        str(tmp_path / "ck2"),
        schema=raw_schema,
        ts_col="timestamp",
        available_now=True,
    )
    sq.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "silver_stream"))
    assert out.count() == 30
    assert {(r.yyyy, r.mm, r.dd) for r in out.select("yyyy", "mm", "dd").distinct().collect()} == {
        (2024, 1, 15)
    }


def test_txn_append_sink_expectations(spark, tmp_path):
    """The bronze-ingest form of the quality gates: violating rows are
    dropped before the append (and before the replay fingerprint, so a
    replay dedups on the cleaned content); counts land in commit meta."""
    import os

    from wikistream_lakehouse_spark.lakehouse import txn
    from wikistream_lakehouse_spark.streaming.cdc_apply import (
        expectation_metrics,
    )
    from wikistream_lakehouse_spark.streaming.pipeline import txn_append_sink

    src = tmp_path / "src"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "ok"), (2, None), (3, "ok")], "k long, v string"
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema("k long, v string")
        .parquet(os.path.join(str(src), "*"))
    )
    q = txn_append_sink(
        stream,
        str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        app_id="ingest-exp",
        available_now=True,
        expectations={"v_present": "v IS NOT NULL"},
    )
    q.awaitTermination(300)
    rows = {r.k for r in txn.read_table(spark, str(tmp_path / "t")).collect()}
    assert rows == {1, 3}
    m = expectation_metrics(str(tmp_path / "t"))
    assert m and m[0]["checks"]["v_present"]["violations"] == 1


def test_txn_append_sink_expectation_actions_and_restart(spark, tmp_path):
    """drop/warn/fail actions e2e + metrics readback across a RESTART
    (VERDICT r9 next #7): batch 0 mixes good/violating rows, batch 1
    (after restart, same checkpoint) violates entirely — the
    all-dropped batch still lands in the exactly-once ledger with its
    violation counts (ADVICE r9 low #4), and quality history replays
    from the commit log alone."""
    import os

    from wikistream_lakehouse_spark.lakehouse import txn
    from wikistream_lakehouse_spark.streaming.cdc_apply import (
        ExpectationViolation,
        expectation_metrics,
    )
    from wikistream_lakehouse_spark.streaming.pipeline import txn_append_sink

    src = tmp_path / "src"
    os.makedirs(src)
    exps = {
        "k_positive": ("k > 0", "drop"),
        "v_short": ("length(v) <= 3", "warn"),
    }

    def run():
        stream = (
            spark.readStream.schema("k long, v string")
            .parquet(os.path.join(str(src), "*"))
        )
        q = txn_append_sink(
            stream,
            str(tmp_path / "t"),
            checkpoint=str(tmp_path / "ck"),
            app_id="exp-restart",
            available_now=True,
            expectations=exps,
        )
        q.awaitTermination(300)

    spark.createDataFrame(
        [(1, "ok"), (-2, "bad"), (3, "loooong")], "k long, v string"
    ).coalesce(1).write.parquet(str(src / "b0"))
    run()
    # drop removed k=-2; warn KEPT the long row but counted it
    assert {r.k for r in txn.read_table(spark, str(tmp_path / "t")).collect()} == {1, 3}

    # restart the stream: a fully-violating batch arrives
    spark.createDataFrame(
        [(-7, "x"), (-8, "y")], "k long, v string"
    ).coalesce(1).write.parquet(str(src / "b1"))
    run()
    tbl = txn.read_table(spark, str(tmp_path / "t"))
    assert {r.k for r in tbl.collect()} == {1, 3}  # nothing landed...
    m = expectation_metrics(str(tmp_path / "t"))
    # ...but BOTH batches' metrics live in the commit log
    assert len(m) == 2
    assert m[0]["checks"]["k_positive"]["violations"] == 1
    assert m[0]["checks"]["v_short"]["violations"] == 1
    assert m[1]["rows_in"] == 2
    assert m[1]["checks"]["k_positive"]["violations"] == 2
    # and the all-dropped batch is in the exactly-once ledger: a replay
    # of batch 1 (fresh checkpoint misses it... simulate via meta scan)
    ledger = [
        (mm.get("app_id"), mm.get("batch_id"))
        for mm in txn.committed_meta(str(tmp_path / "t"))
    ]
    assert ledger.count(("exp-restart", 1)) == 1

    # fail action: the stream refuses the batch instead of landing it
    spark.createDataFrame([(9, "zz")], "k long, v string").coalesce(
        1
    ).write.parquet(str(src / "b2"))
    stream = (
        spark.readStream.schema("k long, v string")
        .parquet(os.path.join(str(src), "*"))
    )
    q = txn_append_sink(
        stream,
        str(tmp_path / "t"),
        checkpoint=str(tmp_path / "ck"),
        app_id="exp-restart",
        available_now=True,
        expectations={"never_nine": ("k <> 9", "fail")},
    )
    with pytest.raises(Exception) as ei:
        q.awaitTermination(300)
    assert "never_nine" in str(ei.value) or isinstance(
        ei.value.__cause__, ExpectationViolation
    )
    assert {r.k for r in txn.read_table(spark, str(tmp_path / "t")).collect()} == {1, 3}


def test_streaming_silver_drop_expectations(spark, tmp_path):
    """The curation stream takes drop-action gates inline in its plan;
    warn/fail are refused (no commit log to stamp metrics into)."""
    import os

    from wikistream_lakehouse_spark.streaming.pipeline import streaming_silver

    bronze = tmp_path / "bronze"
    spark.createDataFrame(
        [
            (1705312800, "good", False),
            (1705312801, None, False),
            (1705312802, "bot", True),
        ],
        "`timestamp` long, title string, bot boolean",
    ).coalesce(1).write.parquet(str(bronze))
    schema = spark.read.parquet(str(bronze)).schema
    q = streaming_silver(
        spark,
        str(bronze),
        str(tmp_path / "silver"),
        str(tmp_path / "ck"),
        schema=schema,
        ts_col="timestamp",
        available_now=True,
        expectations={
            "has_title": "title IS NOT NULL",
            # the reference's hygiene filter shape: NULL bot passes
            "not_bot": "coalesce(bot, false) = false",
        },
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "silver"))
    assert [r.title for r in out.collect()] == ["good"]
    with pytest.raises(ValueError, match="warn/fail"):
        streaming_silver(
            spark,
            str(bronze),
            str(tmp_path / "s2"),
            str(tmp_path / "ck2"),
            schema=schema,
            ts_col="timestamp",
            available_now=True,
            expectations={"x": ("title IS NOT NULL", "fail")},
        )
