"""Sampling operators: deterministic split / mixture / shuffle — oracle
parity plus the properties the oracle can't see (growth stability, no
global sort, range-partitioned order)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.sampling import (
    fraction_threshold,
    hash_split,
    stratified_sample,
    training_order,
)
from wikistream_lakehouse_spark.queries.registry import REGISTRY, all_queries
from wikistream_lakehouse_spark.tables import table
from tests.conftest import assert_matches_oracle


def test_fraction_threshold_boundaries():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(0.5) == "80000000"
    assert fraction_threshold(1.0) == "g"  # sorts after every hex prefix
    with pytest.raises(ValueError):
        fraction_threshold(1.5)


def test_sampling_queries_match_oracle(spark, sf_dir):
    all_queries()
    for name in ("corpus_train_split", "corpus_mixture_sample", "training_order_shuffle"):
        q = REGISTRY[name]
        assert_matches_oracle(q.build(spark, sf_dir), q.oracle, sf_dir)


def test_split_covers_everyone_and_roughly_proportional(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    n = d.count()
    split = hash_split(d, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
    sizes = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n
    # md5 is uniform; at n=100 allow a generous tolerance
    assert sizes.get("train", 0) / n > 0.75


def test_split_is_stable_under_corpus_growth(spark, sf_dir):
    """A document's split must not depend on which other docs are present."""
    d = table(spark, sf_dir, "documents")
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    full = {r["doc_id"]: r["split"] for r in hash_split(d, "doc_id", fr).select("doc_id", "split").collect()}
    subset = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.filter("doc_id % 3 = 0"), "doc_id", fr).select("doc_id", "split").collect()
    }
    for doc_id, s in subset.items():
        assert full[doc_id] == s


def test_split_rejects_bad_fractions(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(d, "doc_id", {"train": 0.5, "val": 0.1})


def test_stratified_sample_keeps_only_listed_generously(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    kept = stratified_sample(d, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0)
    langs = {r["lang"] for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert kept.count() == d.filter("lang = 'en'").count()  # frac 1.0 keeps all


def test_training_order_is_range_partitioned_total_order(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    ordered = training_order(d, "doc_id", seed="epoch0", num_shards=4)
    # no single-task global Sort: the physical plan must not contain a
    # global `Sort [.. ASC], true` over one partition — range exchange instead
    plan = ordered._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    parts = ordered.select("shuffle_key").rdd.glom().map(lambda p: [r[0] for r in p]).collect()
    non_empty = [p for p in parts if p]
    assert len(non_empty) > 1  # actually distributed
    for p in non_empty:
        assert p == sorted(p)  # sorted within partition
    flat = [k for p in non_empty for k in p]
    assert flat == sorted(flat)  # partitions are ranges -> global total order
    # epoch reseed produces a different order
    other = training_order(d, "doc_id", seed="epoch1", num_shards=4)
    k0 = [r[0] for r in ordered.select("shuffle_key").collect()]
    k1 = [r[0] for r in other.select("shuffle_key").collect()]
    assert k0 != k1
    # same docs either way
    assert ordered.count() == d.count()
