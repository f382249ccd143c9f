"""Explicit schemas for the engine.

The reference infers schema everywhere (``spark.read.json`` with no schema,
glue/job_wiki_curate.py:32; Glue crawler re-inference, dag/wiki_pipeline_dag.py:69-73).
Inference on a stream is slow and non-deterministic, so the engine declares
the event record explicitly (SURVEY.md §1.2) and keeps inference as an opt-in
for raw exploration.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The 8-field wiki change record the reference producer projects out of the
#: SSE payload (kafka/wiki-producer.py:81-90).
WIKI_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),  # change id; Kafka key
        T.StructField("type", T.StringType(), True),  # edit/new/log/categorize
        T.StructField("title", T.StringType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("bot", T.BooleanType(), True),  # null-safe read downstream
        T.StructField("timestamp", T.LongType(), True),  # epoch seconds
        T.StructField("comment", T.StringType(), True),
        T.StructField("minor", T.BooleanType(), True),  # producer defaults False
    ]
)

#: Curated (silver) record = event record + derived event-time columns
#: (glue/job_wiki_curate.py:35-41).
WIKI_CURATED_SCHEMA = T.StructType(
    list(WIKI_EVENT_SCHEMA.fields)
    + [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("yyyy", T.IntegerType(), True),
        T.StructField("mm", T.IntegerType(), True),
        T.StructField("dd", T.IntegerType(), True),
    ]
)

#: Synthetic events-table props payload (FIXTURES.md: `{"k": <int>}`) — the
#: stand-in for un-projected SSE extras; parsed with an explicit schema via
#: from_json rather than get_json_object when the full struct is needed.
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType(), True)])

#: Multimodal column convention (SURVEY.md §2.9 X5): payload bytes are an
#: opaque BinaryType column accompanied by a typed metadata struct; decode /
#: feature-extraction runs as Arrow-batched UDFs over mapInPandas.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), True),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/wav/...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), True),
    ]
)
