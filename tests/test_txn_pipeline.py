"""The wiki pipeline with EVERY zone on the transactional substrate
(VERDICT r4 next-round #2): stream → txn bronze (exactly-once,
ds-partitioned) → txn silver (atomic replace of event-day partitions) →
txn gold (atomic ds replace) → txn serving (optimistic MERGE). The whole
DAG is re-runnable, every commit is atomic, and the history is
inspectable end-to-end — the engine-native form of the reference's
idempotent serving upsert (upsert_athena_aggregates.py:95-110), with
atomicity the reference delegates to Athena/Postgres held natively.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    compact,
    current_version,
    history,
    read_table,
)
from wikistream_lakehouse_spark.streaming.wiki_pipeline import (
    ingest_wiki_stream_txn,
    run_daily_batch_txn,
)

from tests.test_streaming import wiki_event, write_ndjson


def test_wiki_pipeline_fully_transactional(spark, tmp_path):
    src = tmp_path / "src"
    write_ndjson(
        src / "b1.json",
        [wiki_event(i) for i in range(40)]
        + [wiki_event(100 + i, user="bot9000", bot=True) for i in range(5)],
    )
    write_ndjson(
        src / "b2.json", [wiki_event(200 + i, user="bob") for i in range(30)]
    )
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    serving = str(tmp_path / "serving")

    q = ingest_wiki_stream_txn(spark, str(src), bronze, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    bronze_df = read_table(spark, bronze)
    assert bronze_df.count() == 75
    assert "ds" in bronze_df.columns  # processing-date partitioned (T5)
    assert bronze_df.filter(F.col("minor").isNull()).count() == 0  # P2

    for _ in range(2):  # the whole chain must converge under re-runs
        run_daily_batch_txn(spark, bronze, silver, gold, serving, ds="2024-01-15")

    silver_df = read_table(spark, silver)
    assert silver_df.count() == 75
    assert {(r.yyyy, r.mm, r.dd) for r in silver_df.select("yyyy", "mm", "dd").distinct().collect()} == {
        (2024, 1, 15)
    }
    gold_df = read_table(spark, gold)
    assert gold_df.agg(F.sum("edits")).first()[0] == 75  # gold keeps bots
    serving_state = {
        r.username: r.edits for r in read_table(spark, serving).collect()
    }
    assert serving_state == {"alice": 40, "bob": 30}  # bots excluded (P5)

    # every zone carries an atomic, inspectable history
    assert [h["op"] for h in history(silver)] == ["replace_partitions"] * 2
    assert [h["op"] for h in history(gold)] == ["replace_partitions"] * 2
    assert [h["op"] for h in history(serving)] == ["merge"] * 2
    # bronze commits carry the streaming identity + fingerprint
    bronze_meta = [h["meta"] for h in history(bronze) if h["meta"]]
    assert all(m["app_id"] == "wiki-bronze" for m in bronze_meta)
    assert all("fingerprint" in m for m in bronze_meta)

    # first-run state is time-travelable even after the re-run
    assert read_table(spark, serving, version=0).count() == 2


def test_txn_bronze_survives_compaction_and_replay(spark, tmp_path):
    """The operational combination: compact the txn bronze, then replay
    the stream with a lost checkpoint — rows unchanged (fingerprint
    dedup) and the compacted layout holds."""
    src = tmp_path / "src"
    for f in range(4):
        write_ndjson(
            src / f"part-{f}.json",
            [wiki_event(f * 25 + i) for i in range(25)],
        )
    bronze = str(tmp_path / "bronze")
    q = ingest_wiki_stream_txn(spark, str(src), bronze, str(tmp_path / "ck1"))
    q.awaitTermination(300)
    assert read_table(spark, bronze).count() == 100
    v_compacted = compact(spark, bronze)
    assert v_compacted is not None

    # lost checkpoint → full replay → every batch recognized and skipped
    q2 = ingest_wiki_stream_txn(spark, str(src), bronze, str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    assert read_table(spark, bronze).count() == 100
    assert current_version(bronze) == v_compacted  # zero new commits
