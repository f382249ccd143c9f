"""Mutation proofs for the ◇-query typed invariants (VERDICT r8 wrong
#2 / next #3): each rows-only query's ``check`` must FAIL on a frame
that is structurally plausible but semantically garbage — otherwise the
oracle sweep's rows-only leg is vacuous. One targeted mutation per
query: the real frame passes, the mutated frame raises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.queries import all_queries

QUERIES = all_queries()

# name → mutation(df) producing a same-schema garbage frame
MUTATIONS = {
    # ordering convention broken (id_a > id_b)
    "minhash_near_dups": lambda df: df.select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "jaccard"
    ),
    # hamming pushed outside the radius
    "simhash_near_dups": lambda df: df.withColumn(
        "hamming_dist", F.col("hamming_dist") + F.lit(10)
    ),
    # components no longer min-rooted
    "dedup_canonical_docs_lsh": lambda df: df.withColumn(
        "component", F.col("doc_id") + F.lit(1)
    ),
    # keep/dup_of verdict inverted
    "semantic_dedup_keep": lambda df: df.withColumn("keep", ~F.col("keep")),
    # size no longer matches the payload
    "media_features": lambda df: df.withColumn(
        "size_bytes", F.col("size_bytes") + F.lit(1)
    ),
    # frame count no longer matches payload geometry
    "media_frame_samples": lambda df: df.withColumn(
        "n_sampled_frames", F.col("n_sampled_frames") + F.lit(1)
    ),
    # sketch estimate 10× off the exact count
    "approx_distinct_profile": lambda df: df.withColumn(
        "approx_users", F.col("approx_users") * F.lit(10)
    ),
    # conservation broken: one pack silently dropped
    "sequence_packing": lambda df: df.limit(max(df.count() - 1, 0)),
    # self-pairs in the top-k (and recall collapses)
    "ann_lsh_topk": lambda df: df.withColumn(
        "neighbor_id", F.col("query_id")
    ),
    "ann_ivf_topk": lambda df: df.withColumn(
        "neighbor_id", F.col("query_id")
    ),
    "ann_pq_topk": lambda df: df.withColumn(
        "neighbor_id", F.col("query_id")
    ),
    "ann_ivf_pq_topk": lambda df: df.withColumn(
        "neighbor_id", F.col("query_id")
    ),
    # language_id_ngram graduated to an oracle-backed ✦ query in r11
    # (text.py:128) — the DuckDB recomputation is the stronger gate, so
    # it leaves the rows-only mutation corpus
}

ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


def test_every_rows_only_query_has_check_and_mutation():
    assert set(ROWS_ONLY) == set(MUTATIONS), (
        "every ◇ query needs both a check (registry) and a mutation proof"
    )
    for n in ROWS_ONLY:
        assert QUERIES[n].check is not None


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_check_rejects_mutated_frame(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    with pytest.raises(AssertionError):
        q.check(MUTATIONS[name](df), spark, sf_dir)
