"""Product quantization (PQ) — the memory-compression ANN path beside
hyperplane LSH (functions/vectors.py) and IVF (operators/ivf.py).

PQ splits a dim-D vector into M subvectors and quantizes each against
its own K-centroid codebook: a vector becomes M small codes (one byte
each at K=256). A 64-float embedding (256 B) compresses to M=8 bytes —
32×. Search uses **asymmetric distance computation** (ADC): the query
stays exact; per subspace a K-entry lookup table of
‖q_m − codebook[m][j]‖² is precomputed, and a candidate's approximate
distance is M table lookups summed — no vector math per candidate.

Spark-first shape:
  * **train** on a bounded deterministic sample, driver-side numpy —
    the codebooks are (M × K × D/M) floats, a few KB; the same
    farthest-point + Lloyd trainer as IVF's quantizer, per subspace
    (FAISS trains PQ on a sample the same way).
  * **encode** the collection ONCE with one Arrow-batched argmin per
    subspace (mapInPandas, codebooks a closure constant) — a write-side
    job whose output is M bytes/row, small enough to CACHE datasets
    whose raw embeddings never fit: at 100 TB of fp32 embeddings the
    code table is ~3 TB and the scan for every query hits it, not the
    vectors.
  * **search**: the query-side tables are (n_queries × M × K) floats
    broadcast in the closure; scoring is a numpy gather+sum per Arrow
    batch, then per-query top-k via TakeOrderedAndProject-shaped
    window. Optionally re-rank the PQ top-c candidates with exact
    cosine against the raw vectors (only c rows per query re-read).

Determinism: the sample, init, and iteration count are RNG-free (same
devices as operators/ivf.py), so codes and rankings are identical
across runs and partitionings.

Reference parity: none — ANN infrastructure the task brief adds as
first-class for training-data pipelines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.ivf import (
    _farthest_point_init,
    _local_lloyd,
)


def train_pq_codebooks(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    k: int = 16,
    sample_size: int | None = None,
    seed: int | None = None,
) -> np.ndarray:
    """Per-subspace k-means codebooks; returns (m, k, dim/m) float64.

    The training sample is the ``sample_size`` (default max(1024, 64·k))
    lowest rows by id — or by md5(seed‖id) when ``seed`` is given — the
    same bounded deterministic device as ``train_ivf_centroids``; each
    subspace is then farthest-point-initialized and Lloyd-refined with
    driver numpy over that sample. Raises if the vector dim is not a
    multiple of ``m``."""
    if sample_size is None:
        sample_size = max(1024, 64 * k)
    if seed is None:
        order = [F.col(id_col)]
    else:
        order = [
            F.md5(F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))),
            F.col(id_col),
        ]
    rows = df.select(id_col, vec_col).orderBy(*order).limit(sample_size).collect()
    sample = np.array([r[vec_col] for r in rows], dtype=np.float64)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for i in range(m):
        sub = np.ascontiguousarray(sample[:, i * dsub : (i + 1) * dsub])
        cents = _farthest_point_init(sub, k)
        books[i] = _local_lloyd(sub, cents, iters=8)
    return books


def encode_pq(
    df: DataFrame, id_col: str, vec_col: str, codebooks: np.ndarray
) -> DataFrame:
    """(id, codes): each vector's per-subspace nearest-centroid indices
    — one argmin matmul per subspace per Arrow batch. ``codes`` is an
    array<int> of length m (values < k, byte-sized at k ≤ 256)."""
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _k, dsub = books.shape
    book_sq = np.einsum("mkd,mkd->mk", books, books)  # ‖c‖² per subspace

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(vecs), m), dtype=np.int32)
            for i in range(m):
                sub = vecs[:, i * dsub : (i + 1) * dsub]
                # argmin ‖v−c‖² = argmin ‖c‖² − 2·v·c
                scores = book_sq[i][None, :] - 2.0 * (sub @ books[i].T)
                codes[:, i] = np.argmin(scores, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        compute, schema=f"{id_col} long, codes array<int>"
    )


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    codebooks: np.ndarray,
    top_k: int = 5,
    candidate_filter=None,
) -> DataFrame:
    """(query_id, neighbor_id, adist, rk): approximate top-k by PQ
    L2 distance over the ENCODED collection — the raw vectors are never
    read. ADC tables for every query ((n_q, m, k) floats) ride in the
    task closure; per-candidate cost is m gathers + a sum, vectorized
    over each Arrow batch × all queries at once.

    ``candidate_filter`` (optional Column over query_id/neighbor_id) is
    applied before ranking — the hook IVF-style composition uses to
    restrict scoring to an inverted-list candidate set."""
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, dsub = books.shape
    qrows = queries.select(query_id_col, vec_col).collect()
    qids = np.array([r[query_id_col] for r in qrows], dtype=np.int64)
    qvecs = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    # tables[q, i, j] = ‖query_q's subvector i − codebook[i][j]‖²
    n_q, k = len(qids), books.shape[1]
    tables = np.empty((n_q, m, k), dtype=np.float64)
    for i in range(m):
        diff = qvecs[:, None, i * dsub : (i + 1) * dsub] - books[i][None, :, :]
        tables[:, i, :] = np.einsum("qkd,qkd->qk", diff, diff)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            c = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            n = len(ids)
            # adist[q, n] = Σ_i tables[q, i, c[n, i]] — m gathers, no
            # per-candidate vector math (the ADC payoff)
            adist = np.zeros((n_q, n), dtype=np.float64)
            for i in range(m):
                adist += tables[:, i, :][:, c[:, i]]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, n),
                    "neighbor_id": np.tile(ids, n_q),
                    "adist": adist.reshape(-1),
                }
            )

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, adist double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    if candidate_filter is not None:
        scored = scored.filter(candidate_filter)
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .orderBy("query_id", "rk")
    )


def pq_topk_rerank(
    collection: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    codebooks: np.ndarray,
    top_k: int = 5,
    n_candidates: int = 25,
    cosine_fn=None,
    candidate_filter=None,
) -> DataFrame:
    """PQ shortlist → exact cosine re-rank: ADC selects ``n_candidates``
    per query from the code table; only those rows' raw vectors are
    joined back and scored exactly. (query_id, neighbor_id, cos, rk)."""
    from wikistream_lakehouse_spark.functions.vectors import cosine

    cosine_fn = cosine_fn or cosine
    codes = encode_pq(collection, id_col, vec_col, codebooks)
    cand = pq_topk(
        codes, queries, id_col, vec_col, query_id_col, codebooks,
        top_k=n_candidates, candidate_filter=candidate_filter,
    ).select("query_id", "neighbor_id")
    qv = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    cv = collection.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_fn(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .orderBy("query_id", "rk")
    )
