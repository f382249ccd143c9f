"""SimHash near-duplicate detection (X2 variant) — JVM-side expressions.

60-bit SimHash: per-token xxhash64, bitwise weighted-majority vote across
tokens → one long per document. Near-dups = small Hamming distance,
found via chunk-banding (pigeonhole: two signatures within Hamming d must
agree exactly on at least one of d+1 chunks) — the same bucket-join scale
shape as MinHash-LSH, no pairwise scan.

60 bits (not 64) keeps every shift/accumulate inside a signed long under
Spark 4's ANSI arithmetic, and divides evenly into 4 chunks of 15 bits.
Bit positions are compile-time Python ints (shiftright/shiftleft take
literal bit counts), so the signature unrolls into a fixed codegen'd
expression tree — no Python at row time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import tokens

N_BITS = 60
_CHUNK_CHOICES = (2, 3, 4, 5, 6, 10, 12, 15, 20, 30, 60)  # divisors of 60


def add_simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Append `simhash` (long): majority vote over token-hash bits.

    Explode + flat aggregate (one `sum(bit_j ? 1 : -1)` column per bit)
    instead of nested array lambdas — the aggregate columns stay inside
    whole-stage codegen with map-side partial combine (same measured
    ~50× win as the minhash signature; see operators/minhash.py)."""
    ex = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(N_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(N_BITS):
        sig = sig + F.when(F.col(f"v_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return df.join(agg.select(F.col(id_col), sig.alias("simhash")), id_col)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two long signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))


def _chunk_banded(sig: DataFrame, max_hamming: int) -> DataFrame:
    """(doc, simhash, chunk_id, chunk_val) — one row per pigeonhole
    chunk. Shared by the candidate join and ``simhash_band_stats`` so
    the two can never disagree about what a bucket is (the same split
    as minhash's ``_banded``)."""
    n_chunks = next((c for c in _CHUNK_CHOICES if c > max_hamming), None)
    if n_chunks is None:
        raise ValueError(f"max_hamming {max_hamming} >= {N_BITS} is meaningless")
    bits = N_BITS // n_chunks
    mask = (1 << bits) - 1
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_id"),
                F.shiftright(F.col("simhash"), c * bits)
                .bitwiseAND(F.lit(mask))
                .alias("chunk_val"),
            )
            for c in range(n_chunks)
        ]
    )
    return sig.select("doc", "simhash", F.explode(chunks).alias("ch")).select(
        "doc", "simhash", "ch.chunk_id", "ch.chunk_val"
    )


def simhash_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """The banding/pairing stage over an EXISTING ``(id, simhash)``
    frame: chunk-band the signature, bucket-join, verify Hamming.
    Split out of ``simhash_near_duplicates`` so a SQL-recomputable
    signature (portable md5-based hashing, queries/dedup.py
    ``simhash_bands_exact``) can drive the REAL pigeonhole path through
    the correctness driver, the same pattern as minhash's
    ``lsh_candidate_pairs``. Returns (id_a, id_b, hamming_dist).

    Degenerate-bucket guard (the simhash twin of minhash.py's
    ``max_bucket``, VERDICT r12 #1): a hot (chunk_id, chunk_val) bucket
    — boilerplate or near-empty docs collapsing onto one 15-bit chunk,
    e.g. the all-zero signature of token-less documents — would make
    the self-join O(bucket²) at corpus scale. Buckets above
    ``max_bucket`` are dropped before the join; the recall trade is
    explicit: a pair within the radius is lost ONLY if EVERY chunk the
    two signatures agree on is capped, and a >max_bucket chunk
    collision means a boilerplate cohort that exact fingerprint dedup
    (dedup_exact / doc_fingerprints) already groups wholesale."""
    if id_col != "doc":
        sig = sig.select(F.col(id_col).alias("doc"), "simhash")
    banded = _chunk_banded(sig, max_hamming)
    # window count rides the same hash-partitioning the self-join
    # needs — no extra job/broadcast (same shape as minhash.py:135)
    from pyspark.sql import Window

    wb = Window.partitionBy("chunk_id", "chunk_val")
    bounded = banded.withColumn(
        "bucket_n", F.count(F.lit(1)).over(wb)
    ).filter(F.col("bucket_n") <= max_bucket)
    left = bounded.select(
        "chunk_id",
        "chunk_val",
        F.col("doc").alias("id_a"),
        F.col("simhash").alias("sig_a"),
    )
    right = bounded.select(
        "chunk_id",
        "chunk_val",
        F.col("doc").alias("id_b"),
        F.col("simhash").alias("sig_b"),
    )
    return (
        left.join(right, ["chunk_id", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            hamming(F.col("sig_a"), F.col("sig_b")).alias("hamming_dist"),
        )
        .distinct()
        .filter(F.col("hamming_dist") <= max_hamming)
    )


def simhash_band_stats(
    sig: DataFrame,
    id_col: str = "doc",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """One-row work metric for the chunk-band join — the simhash twin
    of minhash's ``lsh_band_stats`` (SCALING.md's stable number behind
    the noisy wall-clock): deterministic in (data, hash params), so two
    captures on the same corpus must agree exactly.

    Columns: n_docs, n_buckets, max_bucket_size, capped_buckets
    (buckets over ``max_bucket`` that the guard drops), raw_pairs_kept /
    raw_pairs_dropped (Σ n·(n−1)/2 over kept / capped buckets — the
    join fan-out the executors actually pay, pre-distinct)."""
    if id_col != "doc":
        sig = sig.select(F.col(id_col).alias("doc"), "simhash")
    occ = (
        _chunk_banded(sig, max_hamming)
        .groupBy("chunk_id", "chunk_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    kept = F.col("n") <= max_bucket
    return occ.agg(
        F.sum(F.when(F.col("chunk_id") == 0, F.col("n")).otherwise(0)).alias(
            "n_docs"
        ),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket_size"),
        F.sum(F.when(~kept, 1).otherwise(0)).alias("capped_buckets"),
        F.sum(F.when(kept, pairs).otherwise(0)).alias("raw_pairs_kept"),
        F.sum(F.when(~kept, pairs).otherwise(0)).alias("raw_pairs_dropped"),
    )


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via chunk-banding.

    The chunk count is the smallest divisor of N_BITS exceeding max_hamming
    — pigeonhole then guarantees exact recall at that radius (two
    signatures within Hamming d agree on ≥1 of d+1 chunks), EXCEPT for
    pairs whose every agreeing chunk sits in a >``max_bucket`` bucket
    (the degenerate-bucket guard's explicit trade — see
    ``simhash_candidate_pairs``). Returns (id_a, id_b, hamming_dist).
    """
    sig = add_simhash(df, text_col, id_col).select(
        F.col(id_col).alias("doc"), "simhash"
    )
    return simhash_candidate_pairs(sig, "doc", max_hamming, max_bucket)
