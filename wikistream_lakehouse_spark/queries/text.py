"""Text-analysis queries (SURVEY.md §2.9 X4) over the documents table:
quality profiling, token counting, language stats, heuristic language ID,
document fingerprinting. All hot-path math is JVM-side (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import (
    avg_token_len,
    rolling_fingerprint,
    stopword_ratio,
    subword_token_estimate,
    tokens,
    type_token_ratio,
    whitespace_token_count,
)
from wikistream_lakehouse_spark.operators.langid import (
    build_language_profiles,
    explode_grams,
    predict_language,
)
from wikistream_lakehouse_spark.queries import checks
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table

_SW_SQL = "['the', 'a', 'of', 'and', 'to', 'in']"


@register(
    "text_quality_profile",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum')
                          AS DOUBLE) / len(toks), 4) AS avg_token_len,
               ROUND(CAST(len(list_filter(toks,
                          x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                     / len(toks), 6) AS stopword_ratio,
               ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
                   AS type_token_ratio
        FROM t
        WHERE len(toks) > 0 AND doc_id < 300
        ORDER BY doc_id
    """,
    tags=("X4", "text"),
)
def text_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: token count, mean token length,
    stopword ratio, lexical diversity — the standard pretraining-filter
    feature set, one scan, zero UDFs."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = tokens(F.col("text"))
    return (
        d.withColumn("toks", toks)
        .filter(F.size("toks") > 0)
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            F.round(avg_token_len(F.col("toks")), 4).alias("avg_token_len"),
            F.round(stopword_ratio(F.col("toks")), 6).alias("stopword_ratio"),
            F.round(type_token_ratio(F.col("toks")), 6).alias("type_token_ratio"),
        )
        .orderBy("doc_id")
    )


@register(
    "token_counts",
    oracle="""
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
                    AS BIGINT) AS ws_tokens,
               CAST(ceil(len(text) / 4.0) AS BIGINT) AS subword_est,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
        ORDER BY doc_id
    """,
    tags=("X4", "text"),
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and the BPE-ish
    chars/4 estimate — the budget arithmetic of every LLM data pipeline."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        subword_token_estimate(F.col("text")).alias("subword_est"),
        F.length("text").cast("long").alias("n_chars"),
    ).orderBy("doc_id")


@register(
    "lang_source_stats",
    oracle="""
        SELECT lang, count(*) AS n_docs,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
        ORDER BY lang
    """,
    tags=("X4", "text"),
)
def lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition by language: doc counts, source diversity, size."""
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


@register(
    "language_id_ngram",
    # the classifier is HEURISTIC but fully DETERMINISTIC (explicit
    # tie-breaks at both row_number sites), so the whole pipeline —
    # distinct char bigrams, top-20-by-df profiles, overlap argmax —
    # is ANSI-SQL-recomputable; rows-only since r1 only by oversight
    # (VERDICT r10: shrink the driver-unverifiable surface)
    oracle="""
        WITH grams AS (
            SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 2) AS g
            FROM (SELECT doc_id, text,
                         unnest(generate_series(1, length(text) - 1)) AS i
                  FROM documents) u
        ), labeled AS (
            SELECT g.doc_id, d.lang AS profile_lang, g.g
            FROM grams g JOIN documents d USING (doc_id)
        ), df_counts AS (
            SELECT profile_lang, g, count(*) AS df
            FROM labeled GROUP BY 1, 2
        ), prof AS (
            SELECT profile_lang, g
            FROM (SELECT profile_lang, g,
                         row_number() OVER (PARTITION BY profile_lang
                                            ORDER BY df DESC, g) AS rk
                  FROM df_counts)
            WHERE rk <= 20
        ), ovl AS (
            SELECT gr.doc_id, p.profile_lang, count(*) AS overlap
            FROM grams gr JOIN prof p USING (g)
            GROUP BY 1, 2
        ), universe AS (
            SELECT d.doc_id, p.profile_lang
            FROM documents d
            CROSS JOIN (SELECT DISTINCT profile_lang FROM prof) p
        ), scored AS (
            SELECT u.doc_id, u.profile_lang,
                   COALESCE(o.overlap, 0) AS overlap
            FROM universe u LEFT JOIN ovl o
                ON u.doc_id = o.doc_id
               AND u.profile_lang = o.profile_lang
        ), picked AS (
            SELECT doc_id, profile_lang AS predicted_lang
            FROM (SELECT doc_id, profile_lang,
                         row_number() OVER (
                             PARTITION BY doc_id
                             ORDER BY overlap DESC, profile_lang) AS rk
                  FROM scored)
            WHERE rk = 1
        )
        SELECT d.doc_id, d.lang, p.predicted_lang,
               d.lang = p.predicted_lang AS correct
        FROM documents d JOIN picked p USING (doc_id)
        ORDER BY d.doc_id
    """,
    tags=("X4", "text", "langid"),
    check=checks.langid_check,
)
def language_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language ID (operators/langid.py): per-language
    profiles (tiny aggregate, broadcast) + overlap scoring — the corpus is
    scanned twice, never shuffled on raw text. The synthetic corpus shares
    one vocabulary across langs, so accuracy here is chance by
    construction; unit tests exercise real script signal."""
    from pyspark import StorageLevel

    d = table(spark, sf_dir, "documents")
    # one n-gram pass shared by both stages; MEMORY_AND_DISK so a corpus
    # bigger than executor memory spills instead of recomputing (or OOM)
    grams = explode_grams(d).persist(StorageLevel.MEMORY_AND_DISK)
    profiles = build_language_profiles(d, grams=grams)
    preds = predict_language(d, profiles, grams=grams)
    return (
        d.select("doc_id", "lang")
        .join(preds, "doc_id")
        .select(
            "doc_id",
            "lang",
            "predicted_lang",
            (F.col("lang") == F.col("predicted_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_fingerprints",
    oracle="""
        WITH t AS (
            SELECT doc_id,
                   array_to_string(
                       list_filter(string_split(text, ' '), x -> x != ''),
                       ' ') AS norm
            FROM documents
        ), g AS (
            SELECT norm, CAST(count(*) AS BIGINT) AS n_docs,
                   min(doc_id) AS keeper_doc
            FROM t GROUP BY 1
        )
        SELECT t.doc_id, g.n_docs, g.keeper_doc
        FROM t JOIN g USING (norm)
        ORDER BY doc_id
    """,
    tags=("X4", "text", "fingerprint"),
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprints → exact-duplicate groups:
    fingerprint collisions are exact-dup candidates at zero text-comparison
    cost (group by the 8-byte key instead of shuffling full text).

    The hash VALUES are engine-specific (xxhash64-based), so the oracle
    certifies the GROUP STRUCTURE instead: per-doc (n_docs, keeper_doc)
    must equal DuckDB's grouping by exact normalized token sequence — a
    64-bit-hash collision would surface as a mismatch here."""
    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", rolling_fingerprint(tokens(F.col("text"))).alias("fingerprint")
    )
    groups = fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keeper_doc")
    )
    return fp.join(groups, "fingerprint").select(
        "doc_id", "n_docs", "keeper_doc"
    ).orderBy("doc_id")


@register(
    "corpus_quality_filter",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x != '') AS toks
            FROM documents
        ), feat AS (
            SELECT doc_id, lang,
                   len(toks) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS ttr,
                   CAST(len(list_filter(toks,
                        x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
                       / NULLIF(len(toks), 0) AS sw_ratio
            FROM t
        )
        SELECT doc_id, lang,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               (n_tokens BETWEEN 20 AND 2000
                AND ttr >= 0.20 AND coalesce(sw_ratio, 1.0) <= 0.5) AS keep,
               CASE WHEN n_tokens < 20 THEN 'too_short'
                    WHEN n_tokens > 2000 THEN 'too_long'
                    WHEN ttr < 0.20 THEN 'low_diversity'
                    WHEN coalesce(sw_ratio, 1.0) > 0.5 THEN 'stopword_heavy'
                    ELSE 'ok' END AS reason
        FROM feat
        ORDER BY doc_id
    """,
    tags=("X4", "text", "filter"),
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining-corpus filter: length window, lexical
    diversity floor, stopword-density ceiling → keep flag + first-failing
    reason. One scan, all codegen; the keep column is what the corpus
    writer partitions on at 100 TB."""
    d = table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    feat = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_tokens"),
        type_token_ratio(toks).alias("ttr"),
        stopword_ratio(toks).alias("sw_ratio"),
    )
    keep = (
        F.col("n_tokens").between(20, 2000)
        & (F.col("ttr") >= 0.20)
        & (F.coalesce("sw_ratio", F.lit(1.0)) <= 0.5)
    )
    reason = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("n_tokens") > 2000, "too_long")
        .when(F.col("ttr") < 0.20, "low_diversity")
        .when(F.coalesce("sw_ratio", F.lit(1.0)) > 0.5, "stopword_heavy")
        .otherwise("ok")
    )
    return feat.select(
        "doc_id", "lang", "n_tokens", keep.alias("keep"), reason.alias("reason")
    ).orderBy("doc_id")


# --- Keyword search: BM25 ranking over an inverted-index shape --------------
@register(
    "keyword_search_bm25",
    oracle="""
        WITH toks AS (
            SELECT d.doc_id, t.term
            FROM documents d,
                 UNNEST(string_split(d.text, ' ')) AS t(term)
            WHERE t.term <> ''
        ),
        dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
               FROM toks GROUP BY 1),
        corpus AS (SELECT AVG(dl.dl) AS avgdl,
                          (SELECT COUNT(*) FROM documents) AS n_docs
                   FROM dl),
        tf AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
               FROM toks
               WHERE term IN ('spark', 'hash', 'merge')
               GROUP BY 1, 2),
        dfreq AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
                  FROM tf GROUP BY 1)
        SELECT tf.doc_id,
               ROUND(SUM(
                   LN((corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / corpus.avgdl))
               ), 4) AS bm25
        FROM tf
        JOIN dl ON dl.doc_id = tf.doc_id
        JOIN dfreq ON dfreq.term = tf.term
        CROSS JOIN corpus
        GROUP BY 1
        ORDER BY bm25 DESC, tf.doc_id
        LIMIT 20
    """,
    tags=("search", "extra"),
)
def keyword_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search (k1=1.2, b=0.75) as one declarative plan —
    the inverted-index shape without materializing an index: tokenize →
    per-doc length, query-term tf, per-term df, corpus scalars → score.

    Scale shape: the token explode is scanned ONCE per role; document
    frequency and the avgdl/N corpus stats are tiny aggregates broadcast
    back; the per-doc score join keys on doc_id so tf and dl co-shuffle.
    Non-query terms are dropped BEFORE the tf aggregate — the only
    full-width pass is the doc-length count, which an index would also
    have to store. Top-k is TakeOrderedAndProject, never a global sort."""
    d = table(spark, sf_dir, "documents")
    query_terms = ["spark", "hash", "merge"]
    k1, b = 1.2, 0.75
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    corpus = dl.agg(F.avg("dl").alias("avgdl")).crossJoin(
        d.agg(F.count("*").alias("n_docs"))
    )
    tf = (
        toks.filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy(F.col("term").alias("f_term")).agg(
        F.count("*").cast("double").alias("df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    score = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfreq), tf.term == F.col("f_term"))
        .join(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(20)
    )


# --- Corpus vocabulary: top-k term frequencies minus stopwords --------------
@register(
    "term_frequency_topk",
    oracle="""
        SELECT t.term,
               CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs
        FROM documents d,
             UNNEST(string_split(d.text, ' ')) AS t(term)
        WHERE t.term <> ''
          AND t.term NOT IN ('the', 'a', 'of', 'and', 'to', 'in')
        GROUP BY 1
        ORDER BY n_occurrences DESC, term
        LIMIT 25
    """,
    tags=("search", "extra"),
)
def term_frequency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary profile: the 25 most frequent non-stopword
    terms with occurrence and document counts. explode → one grouped
    aggregate (map-side partial combine collapses the token stream
    before the shuffle — term cardinality, not token count, crosses
    the wire) → TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    stop = ["the", "a", "of", "and", "to", "in"]
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter((F.col("term") != "") & ~F.col("term").isin(stop))
        .groupBy("term")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "term")
        .limit(25)
    )


@register(
    "doc_char_chunks",
    oracle="""
        WITH w AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, CAST(floor((length(text)-1)/192) AS BIGINT)
                   )) AS i
            FROM documents
            WHERE doc_id < 200 AND length(text) > 0
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               substring(text, CAST(i*192 AS INT)+1, 256) AS chunk,
               CAST(length(substring(text, CAST(i*192 AS INT)+1, 256))
                    AS BIGINT) AS chunk_chars
        FROM w
        ORDER BY doc_id, chunk_id
    """,
    tags=("X4", "chunking", "extra"),
)
def doc_char_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking, character granularity: 256-char windows
    with 64 overlap (stride 192). sequence → posexplode → substring is
    a map-side row multiplier — no shuffle, no UDF — so chunking a
    100 TB corpus inherits the scan's partitioning unchanged
    (operators/chunking.chunk_by_chars)."""
    from wikistream_lakehouse_spark.operators.chunking import chunk_by_chars

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return chunk_by_chars(
        d.select("doc_id", "text"), chunk_size=256, overlap=64
    ).orderBy("doc_id", "chunk_id")


@register(
    "doc_token_chunks",
    oracle=r"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               x -> x != '') AS toks
            FROM documents WHERE doc_id < 200
        ), w AS (
            SELECT doc_id, toks,
                   unnest(generate_series(
                       0, CAST(floor((len(toks)-1)/48) AS BIGINT)
                   )) AS i
            FROM t WHERE len(toks) > 0
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               array_to_string(
                   toks[CAST(i*48 AS BIGINT)+1 : CAST(i*48+64 AS BIGINT)],
                   ' ') AS chunk,
               CAST(len(toks[CAST(i*48 AS BIGINT)+1
                             : CAST(i*48+64 AS BIGINT)]) AS BIGINT)
                   AS n_tokens
        FROM w
        ORDER BY doc_id, chunk_id
    """,
    tags=("X4", "chunking", "extra"),
)
def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking, token granularity: 64-token windows
    with 16 overlap (stride 48), whitespace tokens re-joined with single
    spaces — the tokenizer-budget approximation X4's token ops use
    (operators/chunking.chunk_by_tokens)."""
    from wikistream_lakehouse_spark.operators.chunking import chunk_by_tokens

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return chunk_by_tokens(
        d.select("doc_id", "text"), chunk_tokens=64, overlap=16
    ).orderBy("doc_id", "chunk_id")


@register(
    "chunk_dedup_stats",
    oracle="""
        WITH w AS (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, CAST(floor((length(text)-1)/192) AS BIGINT)
                   )) AS i
            FROM documents WHERE length(text) > 0
        ), c AS (
            SELECT doc_id,
                   substring(text, CAST(i*192 AS INT)+1, 256) AS chunk
            FROM w
        ), per AS (
            SELECT chunk, count(*) AS n FROM c GROUP BY chunk
        )
        SELECT CAST(sum(n) AS BIGINT) AS n_chunks,
               CAST(count(*) AS BIGINT) AS n_unique,
               ROUND(1.0 - count(*) / CAST(sum(n) AS DOUBLE), 6)
                   AS dup_ratio,
               CAST(max(n) AS BIGINT) AS max_copies
        FROM per
    """,
    tags=("X1", "X4", "chunking", "extra"),
)
def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed pipeline step: chunk the corpus (256-char windows,
    stride 192 — operators/chunking.chunk_by_chars), then exact-dedup
    at CHUNK granularity and profile the duplication — the pretraining
    dedup decision usually happens on chunks, not whole documents
    (boilerplate repeats at sub-document scale). One explode + one
    hash-aggregate + one global fold: the chunk text never crosses a
    shuffle more than once, and the per-chunk counts collapse map-side
    before the final single-row aggregate."""
    from wikistream_lakehouse_spark.operators.chunking import chunk_by_chars

    d = table(spark, sf_dir, "documents")
    chunks = chunk_by_chars(
        d.select("doc_id", "text"), chunk_size=256, overlap=64
    )
    per = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("n"))
    return per.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.count(F.lit(1)) / F.sum("n").cast("double"), 6
        ).alias("dup_ratio"),
        F.max("n").cast("long").alias("max_copies"),
    )


# --- X4: unigram language-model scoring (perplexity-filter stage) -----------
@register(
    "unigram_logprob_score",
    oracle="""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '), x -> x != ''))
                       AS tok
            FROM documents
        ), freq AS (
            SELECT tok, CAST(count(*) AS DOUBLE) AS n FROM toks GROUP BY 1
        ), tot AS (
            SELECT CAST(count(*) AS DOUBLE) AS t FROM toks
        )
        SELECT toks.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(LN(freq.n / tot.t)), 4) AS avg_logprob
        FROM toks JOIN freq ON toks.tok = freq.tok CROSS JOIN tot
        GROUP BY toks.doc_id
        ORDER BY toks.doc_id
    """,
    tags=("X4", "text", "quality", "extra"),
)
def unigram_logprob_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log-probability under the corpus's
    own token distribution — the perplexity-filter stage of corpus QA
    (a document full of corpus-rare tokens scores low; boilerplate
    scores high). Two hash aggregations and one token-keyed join: the
    token frequency table is itself an aggregate (vocabulary-sized, not
    corpus-sized), the global count is a 1-row broadcast, and the score
    is a delta-friendly avg — the same plan at any corpus size. Exact
    oracle (both engines compute identical LN ratios; 4dp rounding
    absorbs accumulation order)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("t"))
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("n") / F.col("t"))), 4).alias(
                "avg_logprob"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "heavy_hitter_tokens",
    oracle="""
        WITH toks AS (
            SELECT t.term
            FROM documents d,
                 UNNEST(string_split(d.text, ' ')) AS t(term)
            WHERE t.term <> ''
        ),
        tot AS (SELECT COUNT(*) AS n FROM toks)
        SELECT term AS item,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               ROUND(COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6)
                   AS share
        FROM toks
        GROUP BY term
        HAVING COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot) > 0.004
        ORDER BY item
    """,
    tags=("X4", "sketch", "heavyhitters"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens above a 0.4% corpus share, found by the bounded-memory
    two-scan heavy-hitters pattern (operators/heavyhitters.py): a
    per-partition Misra-Gries sketch proposes a guaranteed-superset
    candidate list (≤ k·partitions rows, any corpus size), one exact
    broadcast-pruned recount verifies — so the answer EQUALS the plain
    GROUP BY oracle while never shuffling the full token vocabulary.
    The shape term_frequency_topk needs when key cardinality itself is
    the bottleneck."""
    from wikistream_lakehouse_spark.operators.heavyhitters import (
        heavy_hitters,
    )

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return heavy_hitters(toks, "tok", min_share=0.004).orderBy("item")
