"""Semantic deduplication over an embedding column (SemDeDup-style).

Near-duplicate *pruning* by meaning, not text: k-means the collection
into semantic clusters, then within each cluster greedily keep a maximal
set of mutually-dissimilar vectors (pairwise cosine < threshold) and map
every dropped vector to the kept duplicate that covered it. This is the
operator a pretraining corpus pipeline runs after exact/MinHash dedup:
Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication" (arXiv:2303.09540) — public method, original
implementation.

Spark-first shape:
  * clustering reuses the IVF quantizer (operators/ivf.py): deterministic
    farthest-point init + distributed Lloyd; only (k × dim) doubles reach
    the driver.
  * assignment is one BLAS matmul per Arrow batch (mapInPandas, centroids
    a closure constant), then the pairwise stage runs per cluster under
    ``groupBy(cluster, shard).applyInPandas`` — each task sees one
    bounded member set, O(m·kept·dim) vectorized numpy, never a global
    cross join.
  * scale guard: per-cluster cost is quadratic in member count, so
    oversized clusters are split into deterministic sub-shards of at most
    ``max_cluster`` members (``id % n_shards``). Dedup then applies
    within a shard only — bounded task cost at any skew, at a small
    recall cost on clusters that overflow (documented: at corpus scale
    you raise k so E[m] = N/k stays inside ``max_cluster``; the shard cap
    is the backstop, not the design point).
  * determinism end-to-end: seeded id-ordered sampling, RNG-free init,
    fixed iteration counts, and a total priority order inside each shard
    (distance-to-centroid DESC, id ASC — the paper's keep-the-outliers
    rule, which retains the most diverse member of every duplicate
    neighborhood). Same inputs → byte-identical keep set on every run
    and partitioning.

Reference anchor: none — the reference has no semantic dedup (its
hygiene stops at bot filtering, upsert_athena_aggregates.py:39-50);
this extends the engine's dedup family (exact, MinHash, SimHash) with
the embedding-space member required for training-data curation.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.ivf import (
    _assign_pandas,
    train_ivf_centroids,
)


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.95,
    seed: int | None = 0,
    n_iters: int = 2,
    max_cluster: int = 4096,
) -> DataFrame:
    """Label every row keep/drop by within-cluster cosine near-duplication.

    Returns (id_col, cluster, centroid_sim, keep, dup_of):
      * ``cluster``      — nearest-centroid assignment (L2, = cosine on
                           the normalized vectors the quantizer sees).
      * ``centroid_sim`` — cosine(vector, own centroid), rounded to 6dp.
      * ``keep``         — True for the greedy maximal dissimilar set.
      * ``dup_of``       — for dropped rows, the id of the kept row that
                           covered it (first cover in priority order);
                           null for kept rows.

    Greedy rule per (cluster, shard): visit members by priority
    (centroid_sim ASC — farthest-from-centroid first, id ASC tie-break);
    keep a member iff its cosine to every already-kept member is
    < ``threshold``. Kept rows are therefore pairwise < threshold, and
    every dropped row certifies a kept near-duplicate ≥ threshold —
    the two invariants tests/test_semdedup.py pins.
    """
    import pandas as pd

    centroids = train_ivf_centroids(
        df, id_col, vec_col, k=k, n_iters=n_iters, seed=seed
    )
    norms = np.linalg.norm(centroids, axis=1)
    norms[norms == 0.0] = 1.0
    unit_cents = centroids / norms[:, None]

    assign = _assign_pandas(df, id_col, vec_col, centroids, n_probe=1).select(
        id_col, "cluster"
    )
    members = df.select(id_col, vec_col).join(assign, id_col)

    # Shard oversized clusters: n_shards = ceil(size / max_cluster), a
    # log-free hash-agg + broadcast join (k rows), shard = id mod n.
    sizes = members.groupBy("cluster").agg(F.count(F.lit(1)).alias("_sz"))
    members = (
        members.join(F.broadcast(sizes), "cluster")
        .withColumn(
            "_nsh", F.ceil(F.col("_sz") / F.lit(max_cluster)).cast("long")
        )
        .withColumn("shard", F.pmod(F.col(id_col).cast("long"), F.col("_nsh")))
        .drop("_sz", "_nsh")
    )

    def dedup_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        cluster = int(pdf["cluster"].iloc[0])
        vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        vn = np.linalg.norm(vecs, axis=1)
        vn[vn == 0.0] = 1.0
        unit = vecs / vn[:, None]
        csim = np.round(unit @ unit_cents[cluster], 6)
        ids = pdf[id_col].to_numpy()
        order = np.lexsort((ids, csim))  # centroid_sim ASC, id ASC
        kept_rows: list[int] = []  # indices into `unit`, in keep order
        keep = np.zeros(len(pdf), dtype=bool)
        dup_of = np.full(len(pdf), -1, dtype=np.int64)
        for i in order:
            if kept_rows:
                sims = unit[kept_rows] @ unit[i]
                hit = np.nonzero(sims >= threshold)[0]
                if len(hit):
                    dup_of[i] = ids[kept_rows[int(hit[0])]]
                    continue
            keep[i] = True
            kept_rows.append(int(i))
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.int64(cluster),
                "centroid_sim": csim,
                "keep": keep,
                "dup_of": pd.array(
                    [None if d < 0 else int(d) for d in dup_of], dtype="Int64"
                ),
            }
        )

    return members.groupBy("cluster", "shard").applyInPandas(
        dedup_group,
        schema=(
            f"{id_col} long, cluster long, centroid_sim double, "
            "keep boolean, dup_of long"
        ),
    )


def semdedup_survivors(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """The kept rows of ``semantic_dedup`` joined back to the input —
    the corpus a training pipeline would actually write out."""
    labels = semantic_dedup(df, id_col=id_col, vec_col=vec_col, **kwargs)
    return df.join(
        labels.filter(F.col("keep")).select(id_col, "cluster", "centroid_sim"),
        id_col,
    )
