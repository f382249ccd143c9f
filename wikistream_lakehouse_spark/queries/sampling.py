"""Corpus sampling / training-layout queries (LLM-pipeline surface,
SURVEY §6 extensions): deterministic train/val/test split, language-
mixture sampling, global training-order shuffle, and sequence packing.

All sampling decisions key on portable md5 prefixes (operators/
sampling.py) so the DuckDB oracle reproduces them bit-for-bit — the
approximation-free way to certify a sampler.  Reference parity: the
reference has no sampling layer; this is the extension surface the
survey scopes for pretraining pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import whitespace_token_count
from wikistream_lakehouse_spark.operators.packing import pack_sequences, pack_stats
from wikistream_lakehouse_spark.operators.sampling import (
    hash_split,
    sample_case_sql,
    split_case_sql,
    stratified_sample,
    training_order,
)
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table

_SPLITS = {"train": 0.90, "val": 0.05, "test": 0.05}
#: Mixture weights: upsample en, keep half the de, thin the long tail.
_MIX = {"en": 0.80, "de": 0.50, "fr": 0.25, "es": 0.10}
_MIX_DEFAULT = 0.05


@register(
    "corpus_train_split",
    oracle=f"""
        SELECT doc_id, lang,
               {split_case_sql("doc_id", _SPLITS)} AS split
        FROM documents
        ORDER BY doc_id
    """,
    tags=("sampling", "pipeline", "extra"),
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment per document.

    Pure row-local hash predicate — no shuffle, no sampling state, and a
    document never changes split as the corpus grows (eval-set hygiene
    at 100 TB).  Certified exactly: the oracle reproduces the same md5
    thresholds, so every one of the N assignments must match.
    """
    d = table(spark, sf_dir, "documents")
    return hash_split(d, "doc_id", _SPLITS).select("doc_id", "lang", "split").orderBy("doc_id")


@register(
    "corpus_mixture_sample",
    oracle=f"""
        SELECT doc_id, lang
        FROM documents
        WHERE {sample_case_sql("doc_id", "lang", _MIX, _MIX_DEFAULT)}
        ORDER BY doc_id
    """,
    tags=("sampling", "pipeline", "mixture", "extra"),
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture sampling: keep a per-language deterministic
    fraction (80% en, 50% de, 25% fr, 10% es, 5% rest) — the data-mixing
    step of a pretraining pipeline as one scan -> filter, no shuffle.
    """
    d = table(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "doc_id", "lang", _MIX, _MIX_DEFAULT)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@register(
    "training_order_shuffle",
    oracle="""
        SELECT doc_id,
               substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 8)
                   AS shuffle_key
        FROM documents
        ORDER BY shuffle_key, doc_id
    """,
    tags=("sampling", "pipeline", "shuffle", "extra"),
)
def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training order, epoch-seeded.

    The scale path is ``repartitionByRange(shuffle_key)`` + sort within
    partitions — a distributed total order (no single-task global sort);
    each output partition is one training shard.  The oracle recomputes
    the identical keys, certifying the order end-to-end.
    """
    d = table(spark, sf_dir, "documents")
    return training_order(d, "doc_id", seed="epoch0").select("doc_id", "shuffle_key")


@register(
    "sequence_packing",
    oracle=None,  # greedy first-fit is iterative per bucket — not ANSI-SQL;
    # invariants (every doc exactly once, budget respected, determinism)
    # are pinned by tests/test_packing.py
    tags=("sampling", "pipeline", "packing", "pandas-udf"),
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token training sequences (first-fit-
    decreasing per hash bucket, Arrow-batched applyInPandas) and report
    per-pack utilization.  See operators/packing.py for the scale shape.
    """
    d = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", whitespace_token_count(F.col("text"))
    )
    assignments = pack_sequences(d, max_tokens=512, n_buckets=32)
    return pack_stats(assignments, max_tokens=512).orderBy("pack_id")
