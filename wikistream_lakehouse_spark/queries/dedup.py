"""Deduplication operators (SURVEY.md §2.9 X1/X2) as registered queries.

Exact dedup is the engine answer to the reference's at-least-once delivery
(kafka/wiki-s3-consumer.py:66 — duplicates are *expected*; the keyed Kafka
design anticipates "compaction downstream", kafka/wiki-producer.py:92).
Near-dedup (MinHash-LSH, SimHash, n-gram Jaccard) is the LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import shingles, tokens
from wikistream_lakehouse_spark.operators.minhash import minhash_near_duplicates
from wikistream_lakehouse_spark.operators.simhash import simhash_near_duplicates
from wikistream_lakehouse_spark.queries import checks
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


# --- X1: exact keyed dedup over an at-least-once stream --------------------
@register(
    "dedup_exact_events",
    oracle="""
        WITH doubled AS (
            SELECT event_id, event_type, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events
            UNION ALL
            SELECT event_id, event_type, user_id, CAST(ts AS TIMESTAMP) AS ts
            FROM events
        )
        SELECT event_id, event_type, user_id FROM (
            SELECT event_id, event_type, user_id,
                   row_number() OVER (
                       PARTITION BY event_id ORDER BY ts DESC) AS rk
            FROM doubled
        ) WHERE rk = 1
        ORDER BY event_id
    """,
    tags=("X1", "dedup"),
)
def dedup_exact_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep exactly one row per event_id from a redelivered stream (the
    input is unioned with itself to simulate at-least-once duplicates).
    Keyed window dedup — the batch form of dropDuplicatesWithinWatermark;
    one shuffle on the dedup key, state bounded per key."""
    e = table(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "ts")
    doubled = e.unionAll(e)
    w = Window.partitionBy("event_id").orderBy(F.desc("ts"))
    return (
        doubled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("event_id", "event_type", "user_id")
        .orderBy("event_id")
    )


# --- X2 (exact oracle form): n-gram Jaccard similarity ---------------------
@register(
    "ngram_jaccard_pairs",
    oracle="""
        WITH sh AS (
            SELECT doc_id,
                   list_distinct([array_to_string(t[i:i+2], ' ')
                                  FOR i IN generate_series(1, len(t) - 2)]) AS s
            FROM (SELECT doc_id,
                         list_filter(string_split(text, ' '), x -> x != '') AS t
                  FROM documents
                  WHERE doc_id < 150)
            WHERE len(t) >= 3
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / len(list_distinct(list_concat(a.s, b.s))) >= 0.2
        ORDER BY id_a, id_b
    """,
    tags=("X2", "dedup"),
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over a bounded doc subset — the ground
    truth the LSH variants approximate, and the ✦-verifiable face of X2.
    (The all-pairs join is intentionally bounded to doc_id<150; at corpus
    scale the LSH operators below replace it.)"""
    d = table(spark, sf_dir, "documents", fanout=True).filter(F.col("doc_id") < 150)
    sh = (
        d.withColumn("s", shingles(tokens(F.col("text")), k=3))
        .filter(F.size("s") > 0)
        .select("doc_id", "s")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    inter = F.size(F.array_intersect("sa", "sb")).cast("double")
    union = F.size(F.array_union("sa", "sb"))
    jacc = inter / union
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(jacc >= 0.2)
        .select("id_a", "id_b", F.round(jacc, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# --- X2 (exact oracle form): the LSH BAND path with pinned LCG hashes -------
# Portable minhash: shingle → md5-prefix bigint (the same cross-engine hash
# convention sampling.py certifies) → H linear-congruential min-hashes
# `min((a_i·(h % p) + b_i) % p)` with PINNED (a_i, b_i, p) — plain 64-bit
# arithmetic both engines compute bit-identically (a_i, h%p < 2³¹ so the
# product stays under 2⁶²). The signature feeds the REAL
# ``lsh_candidate_pairs`` (operators/minhash.py:130) — banding, the
# max_bucket degenerate guard, and the bucket self-join all run the
# production code — while DuckDB recomputes the same signatures and joins
# docs equal on a full band slice. Only the xxhash64-seeded signature of
# the ◇ corpus form stays driver-unverifiable after this.
_MB_P = 2147483647  # 2³¹ − 1, prime
_MB_H, _MB_BANDS = 16, 4
_MB_A = [(1103515245 * (i + 1) + 12345) % _MB_P for i in range(_MB_H)]
_MB_B = [(2654435761 * (i + 7)) % _MB_P for i in range(_MB_H)]

_MB_MINS_SQL = ",\n                   ".join(
    f"MIN(({_MB_A[i]} * hm + {_MB_B[i]}) % {_MB_P}) AS mh_{i}"
    for i in range(_MB_H)
)
_MB_BAND_ROWS = _MB_H // _MB_BANDS
_MB_BANDS_SQL = "\n            UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, {ks} FROM sig".format(
        b=b,
        ks=", ".join(
            f"mh_{b * _MB_BAND_ROWS + i} AS k{i}"
            for i in range(_MB_BAND_ROWS)
        ),
    )
    for b in range(_MB_BANDS)
)
_MB_KEYS = [f"k{i}" for i in range(_MB_BAND_ROWS)]


@register(
    "minhash_bands_exact",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ), sh AS (
            SELECT doc_id,
                   unnest([array_to_string(t[i:i+2], ' ')
                           FOR i IN generate_series(1, len(t) - 2)]) AS s
            FROM t WHERE len(t) >= 3
        ), hs AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
                        % {_MB_P} AS BIGINT) AS hm
            FROM sh
        ), sig AS (
            SELECT doc_id,
                   {_MB_MINS_SQL}
            FROM hs GROUP BY doc_id
        ), banded AS (
            {_MB_BANDS_SQL}
        ), bounded AS (
            SELECT * FROM (
                SELECT doc_id, band_id, {", ".join(_MB_KEYS)},
                       COUNT(*) OVER (
                           PARTITION BY band_id, {", ".join(_MB_KEYS)}
                       ) AS bucket_n
                FROM banded
            ) WHERE bucket_n <= 200
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bounded a JOIN bounded b
          ON a.band_id = b.band_id
         AND {" AND ".join(f"a.{k} = b.{k}" for k in _MB_KEYS)}
         AND a.doc_id < b.doc_id
        ORDER BY id_a, id_b
    """,
    tags=("X2", "dedup", "lsh", "extra"),
)
def minhash_bands_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash BAND path, driver-certified (VERDICT r11 #2): pinned
    LCG hash functions make the signature SQL-recomputable, and the
    banding/bucket-guard/self-join stage is the REAL
    ``lsh_candidate_pairs`` — a candidate pair appears iff two docs
    agree on every minhash of some band (xxhash64 band-hash equality ≡
    band-slice equality modulo a ~2⁻⁶⁴ collision), which is exactly the
    join the oracle performs on the recomputed signatures."""
    from wikistream_lakehouse_spark.operators.minhash import (
        lsh_candidate_pairs,
        shingle_structs,
    )

    d = table(spark, sf_dir, "documents")
    k = 3
    s = F.concat_ws(" ", *[F.col(f"s.w{i}") for i in range(k)])
    hm = (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(_MB_P)
    )
    hs = shingle_structs(d, "text", "doc_id", k).select(
        F.col("doc_id"), hm.alias("hm")
    )
    mins = [
        F.min((F.lit(_MB_A[i]) * F.col("hm") + F.lit(_MB_B[i])) % _MB_P).alias(
            f"mh_{i}"
        )
        for i in range(_MB_H)
    ]
    sig = (
        hs.groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[f"mh_{i}" for i in range(_MB_H)]).alias("minhash"),
        )
    )
    return lsh_candidate_pairs(
        sig, "doc_id", n_hashes=_MB_H, n_bands=_MB_BANDS, max_bucket=200
    ).orderBy("id_a", "id_b")


# --- X2 (exact oracle form): the SimHash pigeonhole band path ---------------
# Portable 60-bit SimHash: per-token md5-prefix hash (the same cross-engine
# convention as minhash_bands_exact), bitwise majority vote, then the REAL
# ``simhash_candidate_pairs`` (operators/simhash.py) runs the chunk-banding
# bucket join and Hamming verification. DuckDB recomputes the identical
# signature with 60 CASE-vote sums and re-derives the pairs from the same
# pigeonhole chunks, so bucket routing AND the bit_count(xor) verification
# are value-checked end-to-end; only the xxhash64 seeding of the ◇ corpus
# form stays driver-unverifiable.
_SB_BITS = 60
_SB_CHUNKS = 4  # max_hamming=3 → smallest divisor of 60 above 3
_SB_VOTES_SQL = ",\n                   ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{j}"
    for j in range(_SB_BITS)
)
_SB_SIG_SQL = " + ".join(
    f"(CASE WHEN v_{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(_SB_BITS)
)
_SB_CHUNK_BITS = _SB_BITS // _SB_CHUNKS
_SB_MASK = (1 << _SB_CHUNK_BITS) - 1
_SB_BANDS_SQL = "\n            UNION ALL ".join(
    f"SELECT doc_id, simhash, {c} AS chunk_id, "
    f"(simhash >> {c * _SB_CHUNK_BITS}) & {_SB_MASK} AS chunk_val FROM sig"
    for c in range(_SB_CHUNKS)
)


@register(
    "simhash_bands_exact",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ), tok AS (
            SELECT doc_id, unnest(t) AS w
            FROM t WHERE len(t) >= 1
        ), hs AS (
            SELECT doc_id,
                   CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)
                        AS BIGINT) AS h
            FROM tok
        ), votes AS (
            SELECT doc_id,
                   {_SB_VOTES_SQL}
            FROM hs GROUP BY doc_id
        ), sig AS (
            SELECT doc_id, {_SB_SIG_SQL} AS simhash
            FROM votes
        ), banded AS (
            {_SB_BANDS_SQL}
        ), bounded AS (
            SELECT * FROM (
                SELECT doc_id, simhash, chunk_id, chunk_val,
                       COUNT(*) OVER (
                           PARTITION BY chunk_id, chunk_val
                       ) AS bucket_n
                FROM banded
            ) WHERE bucket_n <= 200
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT)
                   AS hamming_dist
        FROM bounded a JOIN bounded b
          ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val
         AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ORDER BY id_a, id_b
    """,
    tags=("X2", "dedup", "simhash", "extra"),
)
def simhash_bands_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash band path, driver-certified (the simhash twin of
    minhash_bands_exact): a portable md5-prefix token hash makes the
    60-bit majority-vote signature SQL-recomputable, and the chunk
    banding + max_bucket degenerate guard + bucket join + Hamming(≤3)
    verification is the REAL ``simhash_candidate_pairs`` (the oracle's
    ``bounded`` CTE mirrors the guard, same shape as the minhash
    face's). Empty-token documents are excluded on both sides (the ◇
    corpus form keeps them; here they'd all share the all-zero
    signature, the exact degenerate bucket the guard caps)."""
    from wikistream_lakehouse_spark.operators.simhash import (
        N_BITS,
        simhash_candidate_pairs,
    )

    d = table(spark, sf_dir, "documents")
    ex = (
        d.select(F.col("doc_id"), tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 1)
        .select("doc_id", F.explode("t").alias("w"))
        .withColumn(
            "h", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long")
        )
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(N_BITS)
    ]
    agg = ex.groupBy("doc_id").agg(*votes)
    sig_expr = F.lit(0).cast("long")
    for j in range(N_BITS):
        sig_expr = sig_expr + F.when(
            F.col(f"v_{j}") > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    sig = agg.select("doc_id", sig_expr.alias("simhash"))
    return (
        simhash_candidate_pairs(sig, "doc_id", max_hamming=3, max_bucket=200)
        .select(
            "id_a", "id_b", F.col("hamming_dist").cast("int").alias("hamming_dist")
        )
        .orderBy("id_a", "id_b")
    )


# --- X2: MinHash-LSH near-dup at corpus scale (rows-only ◇) ----------------
@register(
    "minhash_near_dups",
    oracle=None,  # hash-function-specific candidates; verified in unit tests
    tags=("X2", "dedup", "lsh"),
    check=checks.minhash_pairs_check(threshold=0.35),
)
def minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 hashes)+LSH(8 bands) candidate generation with exact
    Jaccard verification ≥0.35 over the full documents table. Unit tests
    assert recall/precision against the exact pairwise ground truth."""
    d = table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        d, text_col="text", id_col="doc_id", threshold=0.35
    ).orderBy("id_a", "id_b")


# --- X2: SimHash near-dup (rows-only ◇) ------------------------------------
@register(
    "simhash_near_dups",
    oracle=None,
    tags=("X2", "dedup", "simhash"),
    check=checks.simhash_pairs_check(max_hamming=3),
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs with Hamming ≤ 3 via chunk banding
    (pigeonhole-exact recall at that radius)."""
    d = table(spark, sf_dir, "documents")
    return simhash_near_duplicates(d, text_col="text", id_col="doc_id").orderBy(
        "id_a", "id_b"
    )


# --- X2 decision step: near-dup clusters → canonical keepers ---------------
@register(
    "dedup_canonical_docs",
    oracle="""
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
        )
        SELECT d.doc_id,
               coalesce(comp.component, d.doc_id) AS component,
               (coalesce(comp.component, d.doc_id) = d.doc_id) AS is_canonical
        FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
        ORDER BY d.doc_id
    """,
    tags=("X2", "dedup", "components"),
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-dedup decision over a DETERMINISTIC pair list: exact
    word-3-gram Jaccard pairs (bounded doc subset, same face as
    ngram_jaccard_pairs) → connected components (iterative min-label
    propagation, operators/components.py) → one canonical keeper per
    duplicate cluster. The DuckDB oracle recomputes the components with a
    recursive transitive-closure CTE — certifying the label-propagation
    loop end-to-end. The LSH-driven scale form of the same composition is
    dedup_canonical_docs_lsh (◇)."""
    from wikistream_lakehouse_spark.operators.components import canonical_documents

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
    # the low threshold builds long chains: diameter here exceeds the
    # default cap, and the loop exits as soon as labels stop changing
    return canonical_documents(d, pairs, max_iterations=64).orderBy("doc_id")


# --- X2 decision step at corpus scale: LSH pairs → keepers (◇) --------------
@register(
    "dedup_canonical_docs_lsh",
    oracle=None,  # built on hash-specific LSH pairs; structure pinned in tests
    tags=("X2", "dedup", "components", "lsh"),
    check=checks.canonical_docs_check,
)
def dedup_canonical_docs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of dedup_canonical_docs: MinHash-LSH candidate
    pairs (bucketed, never all-pairs) → connected components → canonical
    keepers. Hash-specific pair set → rows-only; the composition logic is
    oracle-certified via dedup_canonical_docs and the LSH recall via
    minhash unit tests."""
    from wikistream_lakehouse_spark.operators.components import canonical_documents

    d = table(spark, sf_dir, "documents")
    pairs = minhash_near_duplicates(d, threshold=0.5)
    return canonical_documents(d, pairs).orderBy("doc_id")


# --- X2/X3 composed: embedding-cosine near-dup → canonical keepers ----------
@register(
    "dedup_canonical_embeddings",
    oracle="""
        WITH RECURSIVE v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings WHERE vec_id < 300
        ), pairs AS (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.e, b.e) >= 0.3
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
        )
        SELECT v.vec_id,
               coalesce(comp.component, v.vec_id) AS component,
               (coalesce(comp.component, v.vec_id) = v.vec_id) AS is_canonical
        FROM v LEFT JOIN comp ON v.vec_id = comp.node
        ORDER BY v.vec_id
    """,
    tags=("X2", "X3", "dedup", "embeddings", "extra"),
)
def dedup_canonical_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dedup end-to-end: exact cosine pairs over a
    bounded subset (the certifiable face; ann_candidates LSH buckets are
    the corpus-scale pair source for the same predicate) → connected
    components → one canonical keeper per cluster. The oracle recomputes
    the whole flow, components included, via a recursive CTE."""
    from wikistream_lakehouse_spark.functions.vectors import cosine
    from wikistream_lakehouse_spark.operators.components import canonical_documents

    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(cosine(F.col("ea"), F.col("eb")) >= 0.3)
        .select("id_a", "id_b")
    )
    return canonical_documents(e, pairs, id_col="vec_id", max_iterations=64).orderBy(
        "vec_id"
    )


# --- X2/X3: SemDeDup assignment stage, oracle-certified (✦) -----------------
@register(
    "semantic_dedup_assignments",
    oracle="""
        WITH c AS (SELECT vec_id AS cluster,
                          CAST(embedding AS DOUBLE[]) AS cv
                   FROM embeddings WHERE vec_id < 8),
             v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
                   FROM embeddings),
             scored AS (
                SELECT v.vec_id, c.cluster,
                       list_cosine_similarity(v.ev, c.cv) AS cos,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY list_cosine_similarity(v.ev, c.cv) DESC,
                                    c.cluster) AS rk
                FROM v CROSS JOIN c
             )
        SELECT vec_id, CAST(cluster AS BIGINT) AS cluster,
               ROUND(cos, 6) AS centroid_sim
        FROM scored WHERE rk = 1
        ORDER BY vec_id
    """,
    tags=("X2", "X3", "dedup", "embeddings", "semdedup", "extra"),
)
def semantic_dedup_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's cluster-assignment stage with PINNED centroids,
    oracle-certified (VERDICT r10 #1): the centroids are the unit-
    normalized embeddings of vec_id < 8 — a set DuckDB can read off the
    same table — and assignment runs through the REAL operator
    (``_assign_pandas``'s per-batch ‖c‖² − 2·v·c argmin, the exact code
    semantic_dedup/ivf use), which over unit centroids equals
    argmax-cosine. DuckDB recomputes argmax list_cosine_similarity with
    the same lowest-id tie-break, so every row's cluster label and
    rounded centroid cosine must match; only k-means TRAINING (the
    Lloyd iterations producing centroids) stays rows-only, pinned by
    tests/test_semdedup.py."""
    import numpy as np

    from wikistream_lakehouse_spark.functions.vectors import cosine
    from wikistream_lakehouse_spark.operators.ivf import _assign_pandas

    e = table(spark, sf_dir, "embeddings")
    crows = (
        e.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )  # 8 rows — bounded by construction
    cents = np.array([r["embedding"] for r in crows], dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1)
    norms[norms == 0.0] = 1.0
    unit = cents / norms[:, None]

    assign = _assign_pandas(e, "vec_id", "embedding", unit, n_probe=1).select(
        "vec_id", "cluster"
    )
    # cluster index i IS centroid vec_id i (centroid rows ordered by id),
    # so the centroid vectors join back from the table itself — cosine is
    # scale-invariant, raw centroid vectors give the same similarity.
    cent_df = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cluster"), F.col("embedding").alias("cvec")
    )
    return (
        e.select("vec_id", "embedding")
        .join(assign, "vec_id")
        .join(F.broadcast(cent_df), "cluster")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.round(cosine(F.col("embedding"), F.col("cvec")), 6).alias(
                "centroid_sim"
            ),
        )
        .orderBy("vec_id")
    )


# --- X2/X3: SemDeDup semantic dedup over embeddings (rows-only ◇) ----------
@register(
    "semantic_dedup_keep",
    oracle=None,  # k-means assignment is not ANSI-SQL-expressible;
    # keep-set invariants + determinism pinned in tests/test_semdedup.py
    tags=("X2", "X3", "dedup", "embeddings", "semdedup"),
    check=checks.semdedup_check(k=8, threshold=0.35),
)
def semantic_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means semantic clusters over the
    embedding collection, then a greedy within-cluster prune keeping a
    maximal pairwise-dissimilar set (cosine < 0.35, farthest-from-centroid
    priority). Returns every vector's verdict: cluster, rounded centroid
    cosine, keep flag, and for dropped rows the kept duplicate that
    covered them. Deterministic end-to-end (seeded id-ordered sampling,
    RNG-free init, total in-shard priority order)."""
    from wikistream_lakehouse_spark.operators.semdedup import semantic_dedup

    e = table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, id_col="vec_id", vec_col="embedding", k=8, threshold=0.35, seed=7
    ).orderBy("vec_id")


# --- X2 (span level): exact substring dedup — duplicated k-token spans ------
# The suffix-array exact-substring signal of Lee et al. 2022
# (arXiv:2107.06499) re-expressed as a k-gram hash aggregate; see
# operators/spans.py for the scale design. k=8 over the synthetic corpus
# (prod default is 50); md5 span hashes are the cross-engine convention
# the minhash band face already certifies.
_SPAN_K = 8


@register(
    "dup_span_stats",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ), sp AS (
            SELECT doc_id,
                   md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS span_hash
            FROM t, unnest(generate_series(
                     1, greatest(len(t) - {_SPAN_K - 1}, 0))) AS u(i)
        )
        SELECT span_hash,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM sp
        GROUP BY span_hash
        HAVING count(DISTINCT doc_id) >= 2
        ORDER BY span_hash
    """,
    tags=("X2", "dedup", "spans"),
)
def dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 8-token span that recurs verbatim in >= 2 distinct documents,
    with its document and occurrence counts — the discovery face of
    exact-substring dedup. One linear span explode, one hash-aggregate."""
    from wikistream_lakehouse_spark.operators.spans import (
        duplicated_spans,
        positional_span_hashes,
    )

    d = table(spark, sf_dir, "documents", fanout=True)
    sp = positional_span_hashes(d, k=_SPAN_K)
    return duplicated_spans(sp).orderBy("span_hash")


@register(
    "substring_dup_coverage",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ), sp AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS span_hash
            FROM t, unnest(generate_series(
                     1, greatest(len(t) - {_SPAN_K - 1}, 0))) AS u(i)
        ), dup AS (
            SELECT span_hash FROM sp
            GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
        ), m AS (
            SELECT doc_id, pos FROM sp
            WHERE span_hash IN (SELECT span_hash FROM dup)
        ), isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(
                            max(pos + {_SPAN_K - 1}) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM m
        ), isl2 AS (
            SELECT doc_id, pos,
                   sum(new_island) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS island
            FROM isl
        ), per AS (
            SELECT doc_id, island,
                   max(pos + {_SPAN_K - 1}) - min(pos) + 1 AS island_tokens
            FROM isl2 GROUP BY doc_id, island
        ), cov AS (
            SELECT doc_id, CAST(sum(island_tokens) AS BIGINT) AS dup_tokens
            FROM per GROUP BY doc_id
        )
        SELECT c.doc_id,
               CAST(len(t.t) AS BIGINT) AS total_tokens,
               c.dup_tokens,
               ROUND(CAST(c.dup_tokens AS DOUBLE) / len(t.t), 6) AS coverage
        FROM cov c JOIN t ON c.doc_id = t.doc_id
        ORDER BY c.doc_id
    """,
    tags=("X2", "dedup", "spans"),
)
def substring_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-token coverage from cross-document 8-token
    spans, overlaps merged (gaps-and-islands) so a shared L-token run
    counts L tokens once. The decision face of exact-substring dedup: a
    coverage threshold here is the Lee-et-al drop/trim criterion."""
    from wikistream_lakehouse_spark.operators.spans import (
        duplicated_span_coverage,
    )

    d = table(spark, sf_dir, "documents", fanout=True)
    return duplicated_span_coverage(d, k=_SPAN_K).orderBy("doc_id")


@register(
    "span_dedup_filter",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x != '') AS t
            FROM documents
        ), sp AS (
            SELECT doc_id, i AS pos,
                   md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' ')) AS span_hash
            FROM t, unnest(generate_series(
                     1, greatest(len(t) - {_SPAN_K - 1}, 0))) AS u(i)
        ), dup AS (
            SELECT span_hash FROM sp
            GROUP BY span_hash HAVING count(DISTINCT doc_id) >= 2
        ), m AS (
            SELECT doc_id, pos FROM sp
            WHERE span_hash IN (SELECT span_hash FROM dup)
        ), isl AS (
            SELECT doc_id, pos,
                   CASE WHEN pos > coalesce(
                            max(pos + {_SPAN_K - 1}) OVER (
                                PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM m
        ), isl2 AS (
            SELECT doc_id, pos,
                   sum(new_island) OVER (
                       PARTITION BY doc_id ORDER BY pos) AS island
            FROM isl
        ), per AS (
            SELECT doc_id, island,
                   max(pos + {_SPAN_K - 1}) - min(pos) + 1 AS island_tokens
            FROM isl2 GROUP BY doc_id, island
        ), cov AS (
            SELECT doc_id, sum(island_tokens) AS dup_tokens
            FROM per GROUP BY doc_id
        ), scored AS (
            SELECT t.doc_id,
                   CAST(len(t.t) AS BIGINT) AS n_tokens,
                   CAST(coalesce(cov.dup_tokens, 0) AS BIGINT) AS dup_tokens,
                   CASE WHEN len(t.t) > 0
                        THEN CAST(coalesce(cov.dup_tokens, 0) AS DOUBLE)
                             / len(t.t)
                        ELSE 0.0 END AS cov_raw
            FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
        )
        SELECT doc_id, n_tokens, dup_tokens,
               ROUND(cov_raw, 6) AS coverage,
               (cov_raw < 0.8) AS keep,
               CASE WHEN cov_raw >= 0.99 THEN 'near_copy'
                    WHEN cov_raw >= 0.8 THEN 'dup_heavy'
                    ELSE 'ok' END AS reason
        FROM scored
        ORDER BY doc_id
    """,
    tags=("X2", "dedup", "spans", "filter"),
)
def span_dedup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision step of exact-substring dedup over the WHOLE corpus:
    every document scored with its duplicated-token coverage and a
    keep/drop verdict (drop at >= 0.8 coverage; >= 0.99 flags a near
    copy — exact-dedup territory). The keep column is what the corpus
    writer partitions on, same contract as corpus_quality_filter."""
    from wikistream_lakehouse_spark.operators.spans import (
        duplicated_span_islands,
    )

    d = table(spark, sf_dir, "documents", fanout=True)
    # islands directly (not duplicated_span_coverage): the per-doc totals
    # live on the alldocs side of the LEFT join below already, so the
    # coverage face's inner totals join would tokenize the corpus a third
    # time for columns this query re-derives anyway.
    cov = duplicated_span_islands(d, k=_SPAN_K).select("doc_id", "dup_tokens")
    alldocs = d.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    dup = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
    cov_raw = F.when(
        F.col("n_tokens") > 0, dup / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    return (
        alldocs.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            dup.alias("dup_tokens"),
            F.round(cov_raw, 6).alias("coverage"),
            (cov_raw < 0.8).alias("keep"),
            F.when(cov_raw >= 0.99, "near_copy")
            .when(cov_raw >= 0.8, "dup_heavy")
            .otherwise("ok")
            .alias("reason"),
        )
        .orderBy("doc_id")
    )
