"""MinHash + LSH near-duplicate detection, 100% JVM-side (X2).

Pipeline: tokens → k-shingles → H minhash values (xxhash64 with H seeds)
→ b bands of r rows → band-hash bucket join → candidate pairs → exact
shingle-Jaccard verification.

Implementation note (measured, not guessed): computing the signature as
nested higher-order lambdas (transform over seeds × array_min over
shingles) runs interpreted per element — 60s+ at sf0.1. The shape used
here explodes shingles and computes the H minimums as flat hash-aggregate
columns (`min(xxhash64(lit(i), sh))`), which stays inside whole-stage
codegen and runs the same arithmetic ~50× faster. Same trick as map-side
partial aggregation: the explode never shuffles raw shingles — only the
(doc, H longs) signature rows move.

Scale design (the reason this beats pairwise at 100 TB):
  * Signature = one explode + one hash aggregate keyed by doc_id.
  * The only other shuffle is the band-bucket self-join: join fan-out is
    O(bucket collisions), not O(n²); a `max_bucket` guard drops degenerate
    boilerplate buckets (they belong to exact-dedup by fingerprint).
  * Verification re-joins shingle arrays only for candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import shingles, tokens


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    hashed: bool = True,
) -> DataFrame:
    """(id, shingle_set) — distinct word k-gram shingles per document.

    `hashed=True` (default) stores each shingle as its xxhash64 long
    instead of the string: the verification join then shuffles 8-byte
    arrays instead of full text shingles (~10× smaller at corpus scale),
    and set intersection/union compare longs. Exactness is modulo 64-bit
    hash collisions (~n²/2⁶⁵ — negligible against a 0.xx threshold).
    """
    sh = shingles(tokens(F.col(text_col)), k=k_shingle)
    if hashed:
        sh = F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))
    return df.select(F.col(id_col), sh.alias("shingle_set"))


def minhash_signatures(
    sh: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
) -> DataFrame:
    """(id, minhash array<long>[n_hashes]) from a shingle_sets frame.

    Explode + flat aggregate: every `min(xxhash64(lit(i), sh))` is a
    codegen'd aggregate column with map-side partial combine.
    """
    ex = sh.select(F.col(id_col), F.explode("shingle_set").alias("sh"))
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    agg = ex.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(n_hashes)]).alias("minhash"),
    )


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    n_bands: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signature and self-join buckets → candidate pairs
    (id_a < id_b, distinct). Expects (id, minhash) from minhash_signatures."""
    rows = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.element_at("minhash", b * rows + i + 1) for i in range(rows)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    banded = (
        sig.select(F.col(id_col).alias("doc"), F.explode(bands).alias("band"))
        .select("doc", "band.band_id", "band.band_hash")
        .persist()  # referenced 3×: bucket sizes + both join sides
    )
    # degenerate-bucket guard: identical boilerplate can collapse huge doc
    # counts into one bucket → quadratic pair blowup; cap and let exact
    # dedup (fingerprint grouping) own those groups.
    bucket_sizes = banded.groupBy("band_id", "band_hash").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    bounded = banded.join(
        F.broadcast(bucket_sizes.filter(F.col("bucket_n") > max_bucket)),
        ["band_id", "band_hash"],
        "left_anti",
    )
    left = bounded.select("band_id", "band_hash", F.col("doc").alias("id_a"))
    right = bounded.select("band_id", "band_hash", F.col("doc").alias("id_b"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(
    pairs: DataFrame,
    sh: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs; keep >= threshold.

    Joins the (small) candidate set back to the shingle arrays — the O(n²)
    comparison never happens, only O(candidates).
    """
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle_set").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle_set").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jacc = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jaccard", F.round(jacc, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """End-to-end near-dup pairs: signature → LSH candidates → verified
    Jaccard ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sh = shingle_sets(df, text_col, id_col, k_shingle, hashed=True).persist()
    sig = minhash_signatures(sh, id_col, n_hashes)
    cands = lsh_candidate_pairs(sig, id_col, n_hashes, n_bands)
    return verify_jaccard(cands, sh, id_col, threshold)


def add_minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    n_hashes: int = 32,
) -> DataFrame:
    """Back-compat convenience: original frame + shingle_set + minhash."""
    sh = shingle_sets(df, text_col, id_col, k_shingle)
    sig = minhash_signatures(sh, id_col, n_hashes)
    return df.join(sh, id_col).join(sig, id_col)
