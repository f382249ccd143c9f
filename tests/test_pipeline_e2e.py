"""Whole-pipeline invariant: raw documents → quality+dedup corpus →
train/val/test split → training order → packed sequences, with every
token accounted for exactly once at every stage and the entire chain
deterministic under re-run.

The subsystem tests pin each stage alone; this composes them the way a
training run actually consumes the engine — the invariant that matters
operationally is that NO stage silently drops or duplicates data when
fed by the previous stage's real output rather than a fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import whitespace_token_count
from wikistream_lakehouse_spark.lakehouse.corpus import build_training_corpus
from wikistream_lakehouse_spark.operators.packing import pack_sequences
from wikistream_lakehouse_spark.operators.sampling import hash_split, training_order
from wikistream_lakehouse_spark.queries.dedup import ngram_jaccard_pairs
from wikistream_lakehouse_spark.tables import table

MAX_TOKENS = 256
FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _run_chain(spark, sf_dir, out):
    docs = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    build_training_corpus(docs, pairs, out)
    corpus = spark.read.parquet(f"{out}/corpus")
    split = hash_split(corpus, "doc_id", FRACTIONS)
    train = split.filter(F.col("split") == "train")
    ordered = training_order(train, "doc_id", seed="epoch0")
    sized = ordered.select(
        "doc_id", whitespace_token_count(F.col("text")).alias("n_tokens")
    )
    packs = pack_sequences(sized, max_tokens=MAX_TOKENS)
    return corpus, split, train, packs


def test_tokens_survive_every_stage_exactly_once(spark, sf_dir, tmp_path):
    corpus, split, train, packs = _run_chain(spark, sf_dir, str(tmp_path / "g"))

    # split partitions the corpus exactly (no loss, no duplication)
    n_corpus = corpus.count()
    split_counts = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert sum(split_counts.values()) == n_corpus
    assert set(split_counts) <= set(FRACTIONS)

    # every train doc is packed exactly once
    n_train = train.count()
    assert packs.count() == n_train
    assert packs.select("doc_id").distinct().count() == n_train

    # token accounting: pack totals == train totals, budget respected
    train_tokens = (
        train.select(whitespace_token_count(F.col("text")).alias("t"))
        .agg(F.sum("t"))
        .first()[0]
    )
    assert packs.agg(F.sum("n_tokens")).first()[0] == train_tokens
    per_pack = (
        packs.filter(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_tokens").alias("t"))
    )
    assert per_pack.filter(F.col("t") > MAX_TOKENS).count() == 0


def test_whole_chain_is_deterministic(spark, sf_dir, tmp_path):
    _c1, _s1, _t1, packs1 = _run_chain(spark, sf_dir, str(tmp_path / "a"))
    _c2, _s2, _t2, packs2 = _run_chain(spark, sf_dir, str(tmp_path / "b"))
    a = sorted(tuple(r) for r in packs1.collect())
    b = sorted(tuple(r) for r in packs2.collect())
    assert a == b
