"""Chunking operator invariants (operators/chunking.py): full coverage
(every character/token lands in ≥1 chunk), correct overlap, dense
chunk ids, and plan shape (no shuffle — chunking is a map-side row
multiplier)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.chunking import (
    chunk_by_chars,
    chunk_by_tokens,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "a" * 10),          # shorter than one chunk
        (2, "b" * 256),         # exactly one chunk
        (3, "c" * 257),         # one char spills into a second window
        (4, "x" * 1000),
        (5, ""),                # dropped
        (6, "word " * 200),     # token-heavy
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_chunks_cover_everything(spark, docs):
    out = chunk_by_chars(docs, chunk_size=256, overlap=64).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 5 not in by_doc  # empty doc produces no chunks
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk == "a" * 10
    # 256 chars, stride 192: starts 0 and 192 both lie inside the text,
    # so an exact-size doc still gets a short suffix window (same rule
    # as the oracle: ceil(len/stride) windows)
    assert len(by_doc[2]) == 2
    assert len(by_doc[3]) == 2  # 257 chars, stride 192 → starts 0, 192
    # reconstruction: stride-aligned prefixes of each chunk re-tile the doc
    for doc_id, text in [(2, "b" * 256), (3, "c" * 257), (4, "x" * 1000)]:
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        rebuilt = "".join(
            c.chunk if i == len(chunks) - 1 else c.chunk[:192]
            for i, c in enumerate(chunks)
        )
        assert rebuilt == text
        # consecutive chunks agree on their 64-char overlap
        for a, b in zip(chunks, chunks[1:]):
            assert a.chunk[192:] == b.chunk[: len(a.chunk) - 192]
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))


def test_token_chunks_cover_everything(spark, docs):
    out = chunk_by_tokens(docs, chunk_tokens=64, overlap=16).collect()
    six = sorted((r for r in out if r.doc_id == 6), key=lambda r: r.chunk_id)
    # 200 tokens, stride 48 → ceil(200/48) = 5 windows
    assert [r.chunk_id for r in six] == [0, 1, 2, 3, 4]
    # starts 0,48,96,144,192 over 200 tokens: the last two windows
    # are truncated to the remaining 56 and 8 tokens
    assert [r.n_tokens for r in six] == [64, 64, 64, 56, 8]
    assert all(set(r.chunk.split(" ")) == {"word"} for r in six)


def test_chunking_has_no_shuffle(spark, docs):
    from wikistream_lakehouse_spark.operators.scale import exchange_count

    assert exchange_count(chunk_by_chars(docs)) == 0
    assert exchange_count(chunk_by_tokens(docs)) == 0


def test_rejects_bad_overlap(spark, docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_chars(docs, chunk_size=100, overlap=100)
    with pytest.raises(ValueError, match="overlap"):
        chunk_by_tokens(docs, chunk_tokens=10, overlap=-1)
