"""Streaming corpus ingestion e2e: replayed document micro-batches →
exact dedup → quality filter → mixture sample → parquet sink, equal to
the batch decision on the same input."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.lakehouse.corpus import quality_features
from wikistream_lakehouse_spark.operators.sampling import stratified_sample
from wikistream_lakehouse_spark.streaming.corpus_stream import corpus_ingest_stream
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream
from wikistream_lakehouse_spark.tables import table

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

MIX = {"en": 0.9, "de": 0.6}


def _doc_batches(spark, sf_dir, src):
    docs = [r.asDict() for r in table(spark, sf_dir, "documents").collect()]
    half = len(docs) // 2
    # batch 2 replays five batch-1 docs: the stream must drop them
    batches = [docs[:half], docs[half:] + docs[:5]]
    base = time.time() - 1000
    for i, rows in enumerate(batches):
        p = src / f"{i:03d}.json"
        with open(p, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))
    return docs


def test_corpus_ingest_stream_matches_batch_decision(spark, sf_dir, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    _doc_batches(spark, sf_dir, src)

    stream = file_replay_stream(spark, str(src), DOC_SCHEMA, max_files_per_trigger=1)
    out = corpus_ingest_stream(stream, mixture=MIX, mixture_default=0.1)
    sink = str(tmp_path / "corpus_bronze")
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )

    got = spark.read.parquet(sink)
    # batch truth: same predicates over the deduped input
    batch = stratified_sample(
        quality_features(table(spark, sf_dir, "documents")).filter("quality_ok"),
        "doc_id",
        "lang",
        MIX,
        0.1,
    )
    expect_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    got_ids = [r.doc_id for r in got.select("doc_id").collect()]
    assert len(got_ids) == len(set(got_ids)), "replayed docs not deduped"
    assert set(got_ids) == expect_ids
    # quality features travel with the kept rows
    assert {"n_tokens", "ttr", "sw_ratio"} <= set(got.columns)
    assert "quality_reason" not in got.columns

    # restart with no new files: checkpoint makes it a no-op (exactly-once)
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert spark.read.parquet(sink).count() == len(expect_ids)


def test_corpus_ingest_stream_rejects_unknown_dedup(spark, sf_dir, tmp_path):
    import pytest

    stream = file_replay_stream(spark, str(tmp_path), DOC_SCHEMA)
    with pytest.raises(ValueError, match="dedup"):
        corpus_ingest_stream(stream, dedup="fuzzy")
