"""MinHash + LSH near-duplicate detection, 100% JVM-side (X2).

Pipeline: tokens → k-shingle hashes → H minhash values (xxhash64 with H
seeds) → b bands of r rows → band-hash bucket join → candidate pairs →
exact Jaccard verification by shingle join-counting.

Implementation note (measured, not guessed — twice): array-valued
higher-order expressions (transform/aggregate/array_intersect) evaluate
interpreted per element, so BOTH the signature and the shingling are
computed on an *exploded* relational form instead:

  * shingles: posexplode(tokens) + lead() window → xxhash64(w0..wk-1) —
    whole-stage codegen, one shuffle keyed by doc.
  * signatures: groupBy(doc) with H flat `min(xxhash64(seed, sh))`
    aggregate columns — codegen + map-side partial combine.
  * verification: candidate-pair ∩-size by joining the two docs' shingle
    rows on the hash and counting; |A∪B| = |A|+|B|−|A∩B|. No arrays move
    through any shuffle at all.

Measured at sf0.1: 10.2s (array form) → ~3s (exploded form), same output.

Scale design (the reason this beats pairwise at 100 TB):
  * Every stage is scan → explode → hash-aggregate / bucket join; the
    band join's fan-out is O(bucket collisions), not O(n²), and a
    `max_bucket` guard drops degenerate boilerplate buckets (those belong
    to exact fingerprint dedup).
  * Shingles are 8-byte hashes end-to-end (exact modulo 64-bit collisions,
    ~n²/2⁶⁵ — negligible against any 0.xx threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import tokens


def exploded_shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """(id, sh) — one row per word-k-gram hash per document.

    Shingle alignment is arrays_zip of the token array with its own
    k−1 shifted slices (slice/arrays_zip are native expressions, no
    lambdas) — a pure map-side pipeline, unlike a lead()-window
    formulation, and 2× faster measured at sf0.1.

    `distinct=False` skips the dedup shuffle — correct wherever the
    consumer is duplicate-insensitive (the minhash `min` is); set-exact
    consumers (Jaccard counting) need distinct=True.

    Documents shorter than k tokens yield no rows (no shingle exists).
    """
    out = shingle_structs(df, text_col, id_col, k_shingle).select(
        F.col(id_col),
        F.xxhash64(*[F.col(f"s.w{i}") for i in range(k_shingle)]).alias("sh"),
    )
    return out.distinct() if distinct else out


def shingle_structs(
    df: DataFrame, text_col: str, id_col: str, k_shingle: int
) -> DataFrame:
    """(id, s) — one row per word-k-gram, ``s`` the arrays_zip struct of
    k aligned token slices (fields ``w0..w{k-1}``).

    The shared alignment pipeline behind both shingle emitters: the
    xxhash64 form above (engine-internal: minhash/simhash/LSH) and the
    concat_ws string form (queries/hygiene.py — cross-engine oracles,
    DuckDB has no xxhash64). One implementation, so a fix to the
    slice/null-filter alignment can never diverge between them.
    """
    a = tokens(F.col(text_col))
    shifted = [a] + [
        F.slice(a, i + 1, F.greatest(F.size(a) - i, F.lit(0)))
        for i in range(1, k_shingle)
    ]
    z = F.arrays_zip(*[s.alias(f"w{i}") for i, s in enumerate(shifted)])
    last = f"w{k_shingle - 1}"
    return df.select(F.col(id_col), F.explode(z).alias("s")).filter(
        F.col(f"s.{last}").isNotNull()
    )


def minhash_signatures(
    ex: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
) -> DataFrame:
    """(id, minhash array<long>[n_hashes]) from exploded shingle hashes."""
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("sh"))).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    agg = ex.groupBy(id_col).agg(*mins)
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"mh_{i}") for i in range(n_hashes)]).alias("minhash"),
    )


def _banded(
    sig: DataFrame, id_col: str, n_hashes: int, n_bands: int
) -> DataFrame:
    """(doc, band_id, band_hash) — one row per (document, band). Shared
    by the candidate join and the work-metric stats so the two can never
    disagree about what a bucket is."""
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
    return sig.select(
        F.col(id_col).alias("doc"), F.explode(bands).alias("band")
    ).select("doc", "band.band_id", "band.band_hash")


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    n_bands: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """Band the signature and self-join buckets → candidate pairs
    (id_a < id_b, distinct). Expects (id, minhash) from minhash_signatures."""
    banded = _banded(sig, id_col, n_hashes, n_bands)
    # degenerate-bucket guard: identical boilerplate can collapse huge doc
    # counts into one bucket → quadratic pair blowup; cap and let exact
    # dedup (fingerprint grouping) own those groups. Window count rides the
    # same hash-partitioning the self-join needs — no extra job/broadcast.
    from pyspark.sql import Window

    wb = Window.partitionBy("band_id", "band_hash")
    bounded = banded.withColumn("bucket_n", F.count(F.lit(1)).over(wb)).filter(
        F.col("bucket_n") <= max_bucket
    )
    left = bounded.select("band_id", "band_hash", F.col("doc").alias("id_a"))
    right = bounded.select("band_id", "band_hash", F.col("doc").alias("id_b"))
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_band_stats(
    sig: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 32,
    n_bands: int = 8,
    max_bucket: int = 200,
) -> DataFrame:
    """One-row work metric for the band join — the STABLE number behind
    the noisy wall-clock ratio SCALING.md tracks (VERDICT r7 next #6).

    Deterministic function of (data, hash params): xxhash64 is seeded
    and data-dependent only, so two captures on the same corpus MUST
    agree exactly; a changed ``raw_pairs_kept`` between captures means
    the workload changed, a changed wall-clock alone means host noise.

    Columns: n_docs, n_buckets, max_bucket_size, capped_buckets (buckets
    over ``max_bucket`` that the guard drops), raw_pairs_kept /
    raw_pairs_dropped (Σ n·(n−1)/2 over kept / capped buckets — the join
    fan-out the executors actually pay, pre-distinct).
    """
    occ = _banded(sig, id_col, n_hashes, n_bands).groupBy(
        "band_id", "band_hash"
    ).agg(F.count(F.lit(1)).alias("n"))
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    kept = F.col("n") <= max_bucket
    return occ.agg(
        F.sum(F.when(F.col("band_id") == 0, F.col("n")).otherwise(0)).alias("n_docs"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket_size"),
        F.sum(F.when(~kept, 1).otherwise(0)).alias("capped_buckets"),
        F.sum(F.when(kept, pairs).otherwise(0)).alias("raw_pairs_kept"),
        F.sum(F.when(~kept, pairs).otherwise(0)).alias("raw_pairs_dropped"),
    )


def verify_jaccard(
    pairs: DataFrame,
    ex: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Exact shingle Jaccard for candidate pairs via join-counting.

    |A∩B| = count of shingle hashes present in both docs of a pair;
    |A∪B| = |A|+|B|−|A∩B|. Only candidate pairs are ever compared, and
    only candidate *docs'* shingles are deduped (ex may carry duplicates).
    """
    pairs = pairs.persist()  # referenced twice (∩ probe + size join)
    cand_docs = (
        pairs.select(F.col("id_a").alias(id_col))
        .union(pairs.select("id_b"))
        .distinct()
    )
    ex = ex.join(F.broadcast(cand_docs), id_col, "left_semi").distinct().persist()
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a_sh = ex.select(F.col(id_col).alias("id_a"), "sh")
    b_sh = ex.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        pairs.join(a_sh, "id_a")
        .join(b_sh, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sized = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna({"n_inter": 0})
        .join(sizes.withColumnsRenamed({id_col: "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "n_sh": "n_b"}), "id_b")
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    jacc = F.when(union > 0, F.col("n_inter") / union).otherwise(F.lit(0.0))
    return (
        sized.withColumn("jaccard", F.round(jacc, 6))
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
    """End-to-end near-dup pairs: shingle hashes → signature → LSH
    candidates → verified Jaccard ≥ threshold. Returns (id_a, id_b,
    jaccard)."""
    ex = exploded_shingle_hashes(
        df, text_col, id_col, k_shingle, distinct=False
    ).persist()
    # signature frame is tiny (n_docs × H longs) and feeds both band-join
    # sides — persisting it collapses the job graph
    sig = minhash_signatures(ex, id_col, n_hashes).persist()
    cands = lsh_candidate_pairs(sig, id_col, n_hashes, n_bands)
    return verify_jaccard(cands, ex, id_col, threshold)
