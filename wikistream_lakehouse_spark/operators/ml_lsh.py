"""MLlib LSH integrations (X2/X3 scale paths named in SURVEY.md §2.9):
`MinHashLSH` for near-dup similarity joins and
`BucketedRandomProjectionLSH` for ANN — wrapped so callers stay in plain
DataFrame land (array columns in, pair/neighbor frames out).

These coexist with the hand-rolled operators (operators/minhash.py,
functions/vectors.py) deliberately: the custom forms are transparent and
tunable; the MLlib forms are the battle-tested library path. Tests
cross-check them against each other.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, CountVectorizer, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import shingles, tokens


def minhash_lsh_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hash_tables: int = 8,
    max_jaccard_distance: float = 0.65,
) -> DataFrame:
    """Near-dup pairs via pyspark.ml MinHashLSH over shingle count-vectors.

    Returns (id_a, id_b, jaccard_distance) with id_a < id_b. Note MLlib's
    distance = 1 − Jaccard, so max_jaccard_distance=0.65 ≈ jaccard ≥ 0.35.
    """
    sh = df.select(
        F.col(id_col), shingles(tokens(F.col(text_col)), k=k_shingle).alias("sh")
    ).filter(F.size("sh") > 0)
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(sh)
    feats = model.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42
    )
    lsh_model = lsh.fit(feats)
    pairs = lsh_model.approxSimilarityJoin(
        feats, feats, max_jaccard_distance, distCol="jaccard_distance"
    )
    return (
        pairs.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def brp_lsh_neighbors(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
) -> DataFrame:
    """ANN via BucketedRandomProjectionLSH (euclidean): top-k neighbors per
    query id. Returns (query_id, neighbor_id, euclid_dist, rk).

    Euclidean on L2-normalized vectors orders identically to cosine, so
    results are comparable with the cosine brute-force baseline after
    normalization by the caller (tests do this).
    """
    feats = df.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(feats)
    out = []
    for qid in query_ids:
        qvec = feats.filter(F.col(id_col) == qid).head()
        if qvec is None:
            continue
        nn = model.approxNearestNeighbors(
            feats.filter(F.col(id_col) != qid), qvec.features, k, distCol="euclid_dist"
        )
        out.append(
            nn.select(
                F.lit(qid).alias("query_id"),
                F.col(id_col).alias("neighbor_id"),
                F.round("euclid_dist", 6).alias("euclid_dist"),
            )
        )
    if not out:
        raise ValueError("no query ids found in the dataset")
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("euclid_dist", "neighbor_id")
    return res.withColumn("rk", F.row_number().over(w).cast("long")).orderBy(
        "query_id", "rk"
    )
