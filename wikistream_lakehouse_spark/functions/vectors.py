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


def hyperplane_signature(a: Column, dim: int, n_planes: int, seed: int = 42) -> Column:
    """Random-hyperplane LSH signature (sign-of-dot bits → one long).

    Plane coordinates are derived deterministically JVM-side:
    coord(p, i) = xxhash64(seed, p, i) scaled to [-1, 1] — every executor
    computes identical planes with no broadcast of plane matrices, which is
    what makes this shippable to 1000 executors with zero driver state.
    """
    two63 = 9.223372036854776e18
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def bit(p: Column) -> Column:
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        coords = F.transform(
            idx, lambda i: F.xxhash64(F.lit(seed), p, i).cast("double") / F.lit(two63)
        )
        d = F.aggregate(
            F.zip_with(a, coords, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(d >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")

    return F.aggregate(
        F.transform(planes, bit),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
