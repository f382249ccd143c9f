"""Distributed EXACT quantiles — scalable replacement for Spark's
built-in `percentile` aggregate.

Spark's exact `percentile` is an ObjectHashAggregate that buffers EVERY
value of a group in executor memory; with few groups over a 100 TB fact
table that is a guaranteed OOM (the reference's Athena engine has the
same failure mode on exact percentiles over raw history). This operator
computes the identical interpolated quantiles (quantile_cont semantics,
matching Spark `percentile` and DuckDB `quantile_cont`) with bounded
memory:

  1. ``repartitionByRange(group_cols…, value)`` — a parallel global sort
     per group; per-partition sorting is Spark's external (spillable)
     sort, never an in-memory array of the group.
  2. ``row_number`` per (partition, group) — bounded window state.
  3. Per-(partition, group) counts → cumulative offsets via a window
     running sum over that tiny frame (P × G rows; P = shuffle
     partitions, cluster-bounded; the window partitions by group, so
     its state is O(P) per group) → global rank = offset + local rank.
  4. For each requested prob q: target position pos = q·(n-1)+1; the two
     bracketing ranks ⌊pos⌋/⌈pos⌉ per group form a tiny "needed" frame
     (one row per rank side) that is broadcast back and EQUI-joined on
     (group, rank); matching rows interpolate
     v_lo + frac·(v_hi − v_lo) — the same formula Spark's
     Percentile.scala and DuckDB's quantile_cont evaluate.

Every stage is a scan, a ranged shuffle, a bounded window, or a
broadcast join — nothing holds a whole group anywhere.
"""

from __future__ import annotations

import functools
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    probs: Sequence[float],
) -> DataFrame:
    """(group_cols…, q, quantile) — exact interpolated quantile of
    ``value_col`` per group for each probability in ``probs``.

    NULL values are ignored (SQL aggregate semantics); groups whose
    values are all NULL are absent from the output.
    """
    group_cols = list(group_cols)
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = F.col(value_col)

    base = df.select(*group_cols, value_col).filter(v.isNotNull())
    ranged = base.repartitionByRange(n_parts, *group_cols, value_col).withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid", *group_cols).orderBy(value_col)
    local = ranged.withColumn("lrn", F.row_number().over(local_w))

    counts = ranged.groupBy("pid", *group_cols).agg(F.count(F.lit(1)).alias("cnt"))
    # running sum of earlier partitions' counts per group: a window over
    # the P×G count frame replaces the r1-r10 triangular self-join —
    # same offsets, one pass instead of an O(P²·G) join, and the window
    # state is the partial sum alone (bounded by construction)
    off_w = (
        Window.partitionBy(*group_cols)
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        *group_cols,
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("offset"),
    )
    # offsets is P×G rows — broadcast EXPLICITLY so the big windowed side
    # is never re-shuffled by (pid, group) when size estimates go wrong
    # (guide §3.1: hint when a side is provably bounded).
    ranked = local.join(F.broadcast(offsets), ["pid", *group_cols]).withColumn(
        "rn", (F.col("offset") + F.col("lrn")).cast("long")
    )

    totals = counts.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    # One row per bracketing rank (side lo/hi), so the probe below is a
    # pure EQUI join on (group, rn) — the r11-r13 form joined on
    # (rn == klo OR rn == khi), a disjunction that degrades the broadcast
    # join to per-row predicate evaluation over every input row.
    needed = (
        totals.select(
            *group_cols,
            "n",
            F.explode(F.array(*[F.lit(float(q)) for q in probs])).alias("q"),
        )
        .withColumn("pos", F.col("q") * (F.col("n") - 1) + 1)
        .withColumn("klo", F.floor("pos").cast("long"))
        .withColumn("khi", F.ceil("pos").cast("long"))
        .withColumn("frac", F.col("pos") - F.col("klo"))
        .select(
            *group_cols,
            "q",
            "frac",
            F.explode(
                F.array(
                    F.struct(
                        F.col("klo").alias("rn_t"), F.lit("lo").alias("side")
                    ),
                    F.struct(
                        F.col("khi").alias("rn_t"), F.lit("hi").alias("side")
                    ),
                )
            ).alias("nk"),
        )
        .select(*group_cols, "q", "frac", F.col("nk.rn_t"), F.col("nk.side"))
    )

    hit_cond = functools.reduce(
        operator.and_,
        [ranked[g].eqNullSafe(needed[g]) for g in group_cols],
        F.col("rn") == needed["rn_t"],
    )
    hits = ranked.join(F.broadcast(needed), hit_cond).drop(
        *(needed[g] for g in group_cols)
    )
    return (
        hits.groupBy(*group_cols, "q", "frac")
        .agg(
            F.min(F.when(F.col("side") == "lo", v)).alias("vlo"),
            F.max(F.when(F.col("side") == "hi", v)).alias("vhi"),
        )
        .select(
            *group_cols,
            "q",
            (F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo"))).alias(
                "quantile"
            ),
        )
    )
