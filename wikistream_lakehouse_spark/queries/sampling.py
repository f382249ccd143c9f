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
from wikistream_lakehouse_spark.queries import checks
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
    check=checks.packing_check(max_tokens=512),
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


@register(
    "sequence_packing_accounting",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                    AS BIGINT) AS n_tokens,
               CAST(CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)),
                                        1, 8) AS BIGINT) % 32 AS BIGINT)
                   AS bucket,
               len(list_filter(string_split(text, ' '), x -> x != '')) > 512
                   AS oversize
        FROM documents
        ORDER BY doc_id
    """,
    tags=("sampling", "pipeline", "packing", "pandas-udf", "extra"),
)
def sequence_packing_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing operator's doc-level accounting, oracle-certified
    (VERDICT r10 #1): every column of ``pack_sequences``'s output that is
    deterministic REGARDLESS of first-fit choices — exactly-once doc
    membership, token fidelity, md5-mod bucket routing (recovered from
    the emitted pack_id, so the operator's own routing is what's
    checked), and the oversize flag. DuckDB recomputes all four from the
    raw documents; only the in-bucket pack NUMBERING (iterative FFD)
    stays outside SQL, and that is pinned by tests/test_packing.py's
    budget/determinism invariants."""
    d = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", whitespace_token_count(F.col("text"))
    )
    assignments = pack_sequences(d, max_tokens=512, n_buckets=32)
    return (
        assignments.select(
            "doc_id",
            "n_tokens",
            F.split(F.col("pack_id"), "/").getItem(0).cast("long").alias("bucket"),
            "oversize",
        )
        .orderBy("doc_id")
    )


@register(
    "leakage_safe_split",
    oracle=f"""
        WITH RECURSIVE sh AS (
            SELECT doc_id,
                   list_distinct([array_to_string(t[i:i+2], ' ')
                                  FOR i IN generate_series(1, len(t) - 2)]) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x != '') AS t
                  FROM documents
                  WHERE doc_id < 300)
            WHERE len(t) >= 3
        ), pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / len(list_distinct(list_concat(a.s, b.s))) >= 0.02
        ), edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ), reach AS (
            SELECT src AS node, dst AS r FROM edges
            UNION
            SELECT reach.node, edges.dst
            FROM reach JOIN edges ON reach.r = edges.src
        ), comp AS (
            SELECT node, least(node, min(r)) AS component
            FROM reach GROUP BY node
        ), labeled AS (
            SELECT d.doc_id,
                   coalesce(comp.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
        )
        SELECT doc_id, component,
               {split_case_sql("component", _SPLITS)} AS split
        FROM labeled
        ORDER BY doc_id
    """,
    tags=("sampling", "dedup", "pipeline", "extra"),
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split WITHOUT near-duplicate leakage: hashing the
    raw doc_id would scatter a duplicate cluster across splits — the
    classic eval-contamination bug (a test document's near-copy sits in
    train). Here the split key is the document's near-dup CLUSTER label
    (exact-Jaccard pairs → connected components, the same deterministic
    face dedup_canonical_docs certifies), so every member of a cluster
    lands in the SAME split, and singletons hash exactly as before.
    Still deterministic and growth-stable; the oracle recomputes the
    components with a recursive CTE and the identical md5 thresholds, so
    all N assignments must match."""
    from wikistream_lakehouse_spark.operators.components import (
        canonical_documents,
    )
    from wikistream_lakehouse_spark.functions.text import shingles, tokens

    d = table(spark, sf_dir, "documents")
    bounded = d.filter(F.col("doc_id") < 300)
    sh = (
        bounded.withColumn("s", shingles(tokens(F.col("text")), k=3))
        .filter(F.size("s") > 0)
        .select("doc_id", "s")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    jacc = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jacc >= 0.02)
        .select("id_a", "id_b")
    )
    comp = canonical_documents(d, pairs, max_iterations=64)
    return (
        hash_split(comp, "component", _SPLITS)
        .select("doc_id", "component", "split")
        .orderBy("doc_id")
    )


@register(
    "fixed_count_per_lang_sample",
    oracle="""
        SELECT doc_id, lang, pick
        FROM (
            SELECT doc_id, lang,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('fix:' || CAST(doc_id AS VARCHAR)), doc_id
                   ) AS BIGINT) AS pick
            FROM documents
        )
        WHERE pick <= 20
        ORDER BY lang, pick
    """,
    tags=("sampling", "pipeline", "extra"),
)
def fixed_count_per_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-N-per-stratum sampling (the eval-set builder): the first
    20 documents per language in deterministic md5 order — unlike a
    fractional sample, the output size per stratum is pinned, and
    unlike ``ORDER BY random()`` it is reproducible across runs and
    engines. One hash-partitioned window per stratum; rank ≤ N prunes
    with WindowGroupLimit before the sort materializes the tail."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("fix:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, F.col("doc_id"))
    return (
        d.select(
            "doc_id", "lang",
            F.row_number().over(w).cast("long").alias("pick"),
        )
        .filter(F.col("pick") <= 20)
        .orderBy("lang", "pick")
    )
