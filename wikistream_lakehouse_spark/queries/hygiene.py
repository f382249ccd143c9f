"""Corpus-hygiene queries: the filters a pretraining-data pipeline runs
between raw crawl and training shards — repetition profiling
(Gopher-style), PII scrubbing, benchmark-contamination detection, and
the composed stage funnel.

All of them are pure Catalyst expressions (explode / arrays_zip /
regexp_*) — no UDFs — and each carries a DuckDB oracle, so they are
✦-verified like the rest of the text family.

The shingle pipeline mirrors operators/minhash.py's exploded form
(measured 10.2s→3s vs array lambdas) but emits the shingle STRING
(concat_ws) instead of xxhash64: these queries are cross-engine
certified, and DuckDB has no xxhash64 — string equality sidesteps any
hash-collision caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import tokens
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


def string_shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, sh) — one row per word-k-gram STRING per document.

    Delegates the alignment to operators/minhash.shingle_structs (the
    same map-side arrays_zip pipeline the hash family uses — one
    implementation), emitting ``concat_ws(' ', w0..wk-1)`` for
    engine-portable equality.
    """
    from wikistream_lakehouse_spark.operators.minhash import shingle_structs

    out = shingle_structs(df, text_col, id_col, k).select(
        F.col(id_col),
        F.concat_ws(" ", *[F.col(f"s.w{i}") for i in range(k)]).alias("sh"),
    )
    return out.distinct() if distinct else out


# --- Gopher-style repetition profile ----------------------------------------
@register(
    "doc_repetition_profile",
    oracle="""
        WITH toks AS (
            SELECT d.doc_id, t.term
            FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(term)
            WHERE t.term <> ''
        ),
        tc AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        tok_stats AS (
            SELECT doc_id,
                   CAST(SUM(c) AS DOUBLE) AS n_tok,
                   CAST(MAX(c) AS DOUBLE) AS top_c,
                   CAST(COUNT(*) AS DOUBLE) AS n_dist
            FROM tc GROUP BY 1
        ),
        sh AS (
            SELECT doc_id,
                   [array_to_string(t[i:i+2], ' ')
                    FOR i IN generate_series(1, len(t) - 2)] AS s
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x != '') AS t
                  FROM documents)
            WHERE len(t) >= 3
        ),
        sh_stats AS (
            SELECT doc_id,
                   CAST(len(s) AS DOUBLE) AS n3,
                   CAST(len(list_distinct(s)) AS DOUBLE) AS nd3
            FROM sh
        )
        SELECT ts.doc_id,
               CAST(ts.n_tok AS BIGINT) AS n_tokens,
               ROUND(1 - ts.n_dist / ts.n_tok, 4) AS dup_token_ratio,
               ROUND(ts.top_c / ts.n_tok, 4) AS top_token_share,
               ROUND(COALESCE(1 - ss.nd3 / ss.n3, 0.0), 4) AS dup_3gram_ratio
        FROM tok_stats ts LEFT JOIN sh_stats ss ON ss.doc_id = ts.doc_id
        ORDER BY ts.doc_id
    """,
    tags=("hygiene", "extra"),
)
def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule repetition metrics per document: duplicate-token
    ratio, most-frequent-token share, duplicate-3-gram ratio. High
    values mark boilerplate/spam for the corpus filter.

    Scale shape: both passes are explode → two-level hash aggregate
    keyed by doc_id (map-side combine collapses each doc's tokens to
    its term counts before any shuffle); the token and shingle profiles
    join on doc_id — co-partitioned, one exchange each, no windows."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tc = toks.groupBy("doc_id", "term").agg(F.count("*").alias("c"))
    tok_stats = tc.groupBy("doc_id").agg(
        F.sum("c").cast("double").alias("n_tok"),
        F.max("c").cast("double").alias("top_c"),
        F.count("*").cast("double").alias("n_dist"),
    )
    sh = string_shingles(d, k=3, distinct=False)
    sh_stats = sh.groupBy(F.col("doc_id").alias("s_doc_id")).agg(
        F.count("*").cast("double").alias("n3"),
        F.countDistinct("sh").cast("double").alias("nd3"),
    )
    return (
        tok_stats.join(sh_stats, tok_stats.doc_id == F.col("s_doc_id"), "left")
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.round(1 - F.col("n_dist") / F.col("n_tok"), 4).alias(
                "dup_token_ratio"
            ),
            F.round(F.col("top_c") / F.col("n_tok"), 4).alias("top_token_share"),
            F.round(
                F.coalesce(1 - F.col("nd3") / F.col("n3"), F.lit(0.0)), 4
            ).alias("dup_3gram_ratio"),
        )
        .orderBy("doc_id")
    )


# --- PII scrubbing -----------------------------------------------------------
_EMAIL = "[a-z0-9.]+@[a-z0-9.]+"
_PHONE = r"\+\d-\d{3}-\d{4}"


@register(
    "pii_scrub_profile",
    oracle=f"""
        WITH seeded AS (
            SELECT doc_id,
                   text || ' contact user' || doc_id ||
                   '@mail.example.com or +1-555-' ||
                   lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text2
            FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(text2, '{_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text2, '{_PHONE}')) AS BIGINT)
                   AS n_phones,
               CAST(length(
                   regexp_replace(
                       regexp_replace(text2, '{_EMAIL}', '<EMAIL>', 'g'),
                       '{_PHONE}', '<PHONE>', 'g')
               ) AS BIGINT) AS scrubbed_len
        FROM seeded
        ORDER BY doc_id
    """,
    tags=("hygiene", "extra"),
)
def pii_scrub_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: redact emails and phone numbers, report match
    counts and post-scrub length. The fixture corpus is synthetic
    word-soup, so deterministic PII is seeded per doc first — the
    point under test is the scrub expressions themselves (regexp_count
    / chained global regexp_replace, all codegen JVM-side; both
    patterns are RE2-compatible so the DuckDB oracle certifies the
    redaction byte-for-byte via the length)."""
    d = table(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(text2, _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(text2, F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(text2, F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.length(scrubbed).cast("long").alias("scrubbed_len"),
    ).orderBy("doc_id")


# --- Benchmark contamination -------------------------------------------------
@register(
    "benchmark_contamination",
    oracle="""
        WITH sh AS (
            SELECT doc_id, UNNEST(list_distinct(
                       [array_to_string(t[i:i+2], ' ')
                        FOR i IN generate_series(1, len(t) - 2)])) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x != '') AS t
                  FROM documents)
            WHERE len(t) >= 3
        )
        SELECT c.doc_id,
               CAST(COUNT(DISTINCT c.s) AS BIGINT) AS n_shared_shingles,
               CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
        FROM sh c
        JOIN sh e ON c.s = e.s
        WHERE c.doc_id >= 20 AND e.doc_id < 20
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("hygiene", "extra"),
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: corpus documents sharing any word-3-gram
    with a held-out eval set (here: doc_id < 20 stands in for the
    benchmark), with how many shingles and how many eval docs they
    touch.

    Scale shape: eval sets are small by construction, so the eval
    shingle side is BROADCAST — the corpus shingle stream never
    shuffles; contamination detection rides map-side on the same
    explode the dedup pipeline already runs. (A benchmark too large to
    broadcast would bucket-join on the shingle key instead.)"""
    d = table(spark, sf_dir, "documents")
    # corpus side stays distinct=False: its duplicates are collapsed by the
    # final countDistinct anyway, and skipping the dedup saves a full
    # shuffle of the corpus shingle stream (the dominant cost at scale)
    corpus = string_shingles(d.filter(F.col("doc_id") >= 20), k=3, distinct=False)
    eval_sh = (
        string_shingles(d.filter(F.col("doc_id") < 20), k=3)
        .select(F.col("doc_id").alias("eval_doc"), F.col("sh").alias("es"))
    )
    return (
        corpus.join(F.broadcast(eval_sh), corpus.sh == eval_sh.es)
        .groupBy("doc_id")
        .agg(
            F.countDistinct("sh").cast("long").alias("n_shared_shingles"),
            F.countDistinct("eval_doc").cast("long").alias("n_eval_docs"),
        )
        .orderBy("doc_id")
    )


# --- The corpus funnel: every hygiene stage in one report -------------------
_SW_SQL = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "corpus_funnel",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), feat AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS ttr,
                   CAST(len(list_filter(toks,
                        x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS swr
            FROM t
        ), kept AS (
            SELECT doc_id, array_to_string(toks, ' ') AS norm
            FROM feat
            WHERE n BETWEEN 20 AND 2000 AND ttr >= 0.20
              AND coalesce(swr, 1.0) <= 0.5
        ), keepers AS (
            SELECT norm, MIN(doc_id) AS doc_id FROM kept GROUP BY 1
        ), sh AS (
            SELECT doc_id, UNNEST(list_distinct(
                       [array_to_string(t2[i:i+2], ' ')
                        FOR i IN generate_series(1, len(t2) - 2)])) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x != '') AS t2
                  FROM documents)
            WHERE len(t2) >= 3
        ), contaminated AS (
            SELECT DISTINCT c.doc_id
            FROM sh c JOIN sh e ON c.s = e.s
            WHERE c.doc_id >= 20 AND e.doc_id < 20
        )
        SELECT '00_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        UNION ALL
        SELECT '01_quality', CAST(COUNT(*) AS BIGINT) FROM kept
        UNION ALL
        SELECT '02_exact_dedup', CAST(COUNT(DISTINCT norm) AS BIGINT) FROM kept
        UNION ALL
        SELECT '03_decontaminated', CAST(COUNT(*) AS BIGINT)
        FROM keepers k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM contaminated)
        ORDER BY stage
    """,
    tags=("hygiene", "extra"),
)
def corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole hygiene pipeline as one auditable report: document
    counts surviving each stage — raw → quality filter → exact dedup
    (fingerprint keepers) → benchmark decontamination. This is the
    number a data lead reads before a training run.

    Composition notes: the quality predicate is corpus_quality_filter's,
    the dedup grouping is doc_fingerprints' (the oracle certifies the
    fingerprint grouping against exact normalized text — a 64-bit
    collision would mismatch stage 02), and the contamination set is
    benchmark_contamination's. Each stage is an aggregate-only pass;
    the four 1-row results union into the report — nothing wide ever
    sits in one task."""
    from wikistream_lakehouse_spark.functions.text import (
        rolling_fingerprint,
        stopword_ratio,
        type_token_ratio,
    )

    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    feat = d.select(
        "doc_id",
        F.col("text"),
        F.size(toks).cast("long").alias("n_tokens"),
        type_token_ratio(toks).alias("ttr"),
        stopword_ratio(toks).alias("sw_ratio"),
    )
    kept = feat.filter(
        F.col("n_tokens").between(20, 2000)
        & (F.col("ttr") >= 0.20)
        & (F.coalesce("sw_ratio", F.lit(1.0)) <= 0.5)
    ).select("doc_id", rolling_fingerprint(tokens(F.col("text"))).alias("fp"))
    keepers = kept.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # distinct=False: the .distinct() on doc_id below dedups anyway, and
    # the corpus shingle stream skips a full shuffle
    corpus_sh = string_shingles(d.filter(F.col("doc_id") >= 20), k=3, distinct=False)
    eval_sh = string_shingles(d.filter(F.col("doc_id") < 20), k=3).select(
        F.col("sh").alias("es")
    )
    contaminated = (
        corpus_sh.join(F.broadcast(eval_sh), corpus_sh.sh == F.col("es"))
        .select("doc_id")
        .distinct()
    )
    decon = keepers.join(contaminated, "doc_id", "left_anti")

    def stage(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(F.count(F.lit(1)).cast("long").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("00_raw", d)
        .unionAll(stage("01_quality", kept))
        .unionAll(
            kept.agg(F.countDistinct("fp").cast("long").alias("n_docs")).select(
                F.lit("02_exact_dedup").alias("stage"), "n_docs"
            )
        )
        .unionAll(stage("03_decontaminated", decon))
        .orderBy("stage")
    )
