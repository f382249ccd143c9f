"""Vector math over ArrayType(FloatType) embedding columns — JVM-side
higher-order expressions (SURVEY.md §2.9 X3).

All math is done in double after casting: float32 accumulation order
differs between engines, and doubles keep the error below comparison
rounding. No UDFs — zip_with/aggregate compile to codegen'd loops.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    """Squared L2 norm (double)."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(sq_norm(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def hyperplane_buckets(
    df,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int,
    n_planes: int,
    seed: int = 42,
):
    """Multi-table random-hyperplane LSH buckets: (id, t, bucket) rows.

    Gaussian planes are generated once (deterministic seed), shipped as a
    broadcast (t, p, i, coord) frame of n_tables·n_planes·dim rows, and the
    signs are computed as explode + broadcast-join + two hash aggregates —
    all codegen'd. (A per-row nested-lambda signature expression evaluates
    interpreted and measured ~10× slower; see operators/minhash.py for the
    same lesson.) The plane frame is a few KB even for 64 tables × 16
    planes × 4096 dims — broadcast cost is nil at any executor count.
    """
    import numpy as np

    spark = df.sparkSession
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    rows = [
        (t, p, i, float(planes[t, p, i]))
        for t in range(n_tables)
        for p in range(n_planes)
        for i in range(dim)
    ]
    plane_df = spark.createDataFrame(rows, "t int, p int, i int, coord double")
    ex = df.select(F.col(id_col), F.posexplode(vec_col).alias("i", "x"))
    dots = (
        ex.join(F.broadcast(plane_df), "i")
        .groupBy(id_col, "t", "p")
        .agg(F.sum(F.col("x").cast("double") * F.col("coord")).alias("d"))
    )
    return dots.groupBy(id_col, "t").agg(
        F.sum(
            F.when(F.col("d") >= 0, F.pow(F.lit(2.0), F.col("p"))).otherwise(0.0)
        )
        .cast("long")
        .alias("bucket")
    )


def hyperplane_buckets_pandas(
    df,
    id_col: str,
    vec_col: str,
    dim: int,
    n_tables: int,
    n_planes: int,
    seed: int = 42,
):
    """Same (id, t, bucket) contract as hyperplane_buckets, computed as one
    BLAS matmul per Arrow batch via mapInPandas.

    This is the idiomatic shape for dense linear algebra in PySpark: the
    (dim × L·k) plane matrix is a closure constant regenerated on each
    executor from the seed (a few KB of RNG work, no broadcast), each batch
    does `vectors @ planes` in one vectorized call, and only (id, t,
    bucket) longs come back. Identical output to the join-based form
    (asserted in tests); ~an order of magnitude faster on wide embeddings.
    """
    import numpy as np
    import pandas as pd

    weights = 1 << np.arange(n_planes)  # bit p → 2^p, matching the JVM form

    def compute(batches):
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_planes, dim))
        flat = planes.reshape(n_tables * n_planes, dim).T  # (dim, L·k)
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (vecs @ flat) >= 0  # (batch, L·k)
            buckets = (
                signs.reshape(len(pdf), n_tables, n_planes) * weights
            ).sum(axis=2)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "t": np.tile(np.arange(n_tables), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        compute, schema=f"{id_col} long, t int, bucket long"
    )
