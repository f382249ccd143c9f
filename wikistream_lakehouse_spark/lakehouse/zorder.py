"""Z-order clustering: lay out a table along a space-filling curve so
parquet min/max statistics prune files for MULTI-column predicates.

Range-sorting by one column makes its per-file ranges tight but leaves
every other column's ranges spanning the whole domain.  Interleaving
the bits of several columns' normalized ranks (the Z-value / Morton
code) gives every participating column partially-tight file ranges —
the layout Delta's ``OPTIMIZE ... ZORDER BY`` and friends use for
row-group skipping at lake scale.

Implementation is pure Catalyst expressions:

  1. one aggregate pass collects (min, max) per z-column — two scalars
     each, a legitimate driver-side reduce;
  2. each column maps to a ``bits``-wide integer rank
     ``(v - min) / (max - min) * (2^bits - 1)`` (nulls rank 0 — they
     cluster together at the curve origin);
  3. the Z-value interleaves the rank bits with shift/or column
     expressions (unrolled in Python, executed codegen'd JVM-side);
  4. ``repartitionByRange(z)`` + sort-within-partitions + write — a
     distributed total order along the curve, no single-task sort.

Bit depth: the default (16 per column, 15 at 4 columns) bounds the
unrolled expression at ≤62 or-terms; deeper than the per-file
cardinality at any realistic file count, so extra depth only costs
expression size.

Reference parity: none (the reference has no layout management at
all); this extends the OPTIMIZE-style compaction (lakehouse/compact.py)
with the multi-dimensional case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.tscompat import epoch_seconds


def _rank_expr(val: Column, lo, hi, bits: int) -> Column:
    """Normalized integer rank in [0, 2^bits) over a double-domain expr.

    ``val`` is already normalized to double (tscompat.epoch_seconds for
    timestamp columns — NTZ-safe; plain cast for numerics), so ``lo``/``hi``
    are plain floats and the literals need no type gymnastics.
    """
    span = F.lit(hi).cast("double") - F.lit(lo).cast("double")
    frac = F.when(
        val.isNull() | (span <= 0), F.lit(0.0)
    ).otherwise((val - F.lit(lo).cast("double")) / span)
    max_rank = (1 << bits) - 1
    return F.least(
        (frac * max_rank).cast("long"), F.lit(max_rank).cast("long")
    )


def zvalue(df: DataFrame, cols: list[str], bits: int | None = None) -> Column:
    """The Morton code column for ``cols`` (bit-interleaved ranks).

    Requires one collect of 2·len(cols) scalars for the min/max frame —
    call on the frame you are about to write. ``bits`` defaults to the
    deepest per-column depth that fits a signed long at this arity
    (16 for 1-3 columns, 15 for 4), so every documented arity works
    without tuning.
    """
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    if bits is None:
        bits = min(16, 62 // len(cols))
    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must fit in a signed long")
    # Normalize every z-column to the double domain FIRST (epoch seconds
    # for timestamp columns, NTZ-safe) so bounds collect as plain floats
    # and the rank math is uniform regardless of declared zone form.
    vals = {c: epoch_seconds(df, c) for c in cols}
    aggs = []
    for c in cols:
        aggs += [F.min(vals[c]).alias(f"lo_{c}"), F.max(vals[c]).alias(f"hi_{c}")]
    bounds = df.agg(*aggs).first()
    ranks = [
        _rank_expr(vals[c], bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits)
        for c in cols
    ]
    # interleave: output bit (i*n + j) takes bit i of rank j
    z = F.lit(0).cast("long")
    n = len(cols)
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of ``cols``.

    Each output file covers a contiguous curve segment, so its min/max
    footer stats are tight in every z-column at once — multi-predicate
    scans skip most files instead of just the sort-leader's.
    """
    z = zvalue(df, cols, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
