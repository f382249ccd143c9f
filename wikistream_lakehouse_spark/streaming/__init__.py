"""Structured Streaming layer (SURVEY.md §2.7, §7 M3): sources, decode,
bronze sink, watermarked stateful transforms, foreachBatch serving merge.

The reference's three streaming processes (SSE producer, Kafka,
S3-writing consumer — kafka/wiki-producer.py, kafka/wiki-s3-consumer.py)
collapse into one checkpointed query per hop; delivery guarantees upgrade
from at-least-once (auto-commit consumer, wiki-s3-consumer.py:66) to
effectively-exactly-once via checkpointed offsets + idempotent sinks.
"""
