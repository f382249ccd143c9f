"""Sequence packing invariants: exactly-once assignment, budget respected,
oversize isolation, determinism — the guarantees the rows-only
`sequence_packing` query relies on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import whitespace_token_count
from wikistream_lakehouse_spark.operators.packing import pack_sequences, pack_stats
from wikistream_lakehouse_spark.tables import table

MAX_TOKENS = 64  # small budget so the fixture yields multi-doc packs AND oversize docs


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return table(spark, sf_dir, "documents").withColumn(
        "n_tokens", whitespace_token_count(F.col("text"))
    )


def test_every_doc_packed_exactly_once(docs):
    assigned = pack_sequences(docs, max_tokens=MAX_TOKENS, n_buckets=8)
    n = docs.count()
    assert assigned.count() == n
    assert assigned.select("doc_id").distinct().count() == n


def test_budget_respected_and_oversize_isolated(docs):
    assigned = pack_sequences(docs, max_tokens=MAX_TOKENS, n_buckets=8)
    stats = pack_stats(assigned, max_tokens=MAX_TOKENS)
    over_budget = stats.filter((~F.col("oversize")) & (F.col("pack_tokens") > MAX_TOKENS))
    assert over_budget.count() == 0
    # oversize docs: flagged iff n_tokens > budget, and alone in their pack
    oversize_docs = assigned.filter("oversize")
    assert oversize_docs.count() == docs.filter(f"n_tokens > {MAX_TOKENS}").count() > 0
    solo = stats.filter("oversize")
    assert solo.filter("n_docs != 1").count() == 0


def test_packing_is_deterministic(docs):
    a = sorted(map(tuple, pack_sequences(docs, max_tokens=MAX_TOKENS, n_buckets=8).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(
                docs.repartition(13), max_tokens=MAX_TOKENS, n_buckets=8
            ).collect(),
        )
    )
    assert a == b  # stable under physical repartitioning


def test_packing_actually_packs(docs):
    """FFD should beat one-doc-per-sequence by a wide margin."""
    assigned = pack_sequences(docs, max_tokens=MAX_TOKENS, n_buckets=8)
    n_docs = assigned.filter("NOT oversize").count()
    n_packs = assigned.filter("NOT oversize").select("pack_id").distinct().count()
    assert n_packs < n_docs  # multi-doc packs exist
    fill = (
        pack_stats(assigned, MAX_TOKENS)
        .filter("NOT oversize")
        .agg(F.avg("fill_ratio"))
        .first()[0]
    )
    assert fill > 0.6


def test_rejects_nonpositive_budget(docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, max_tokens=0)
