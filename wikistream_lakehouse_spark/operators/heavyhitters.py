"""Heavy hitters at corpus scale: Misra-Gries mergeable summaries +
an exact verification pass.

The two-scan pattern a 100 TB frequency question actually runs:

  1. **Candidate generation** — one scan; each partition folds its
     stream through a k-counter Misra-Gries summary (Arrow batches,
     state carried across a partition's batches inside ``mapInPandas``)
     and emits ≤ k (item, weight) rows. Summaries are mergeable
     (Agarwal et al., "Mergeable Summaries", PODS'12 — public result):
     a hash-agg SUM of the per-partition summaries undercounts any
     item by at most N/(k+1) total, and an item absent from every
     summary has true count ≤ N/(k+1). With k = ceil(1/s), the
     candidate set is a guaranteed SUPERSET of every item with share
     > s — never more than k × partitions rows, whatever N is.
  2. **Exact verification** — one more scan counting ONLY the
     candidates (broadcast semi-join against the bounded candidate
     list), then the share filter. False positives from step 1 die
     here, so the final answer is EXACT — which is why the registry
     query carries a plain GROUP BY oracle despite being sketch-driven.

Step 1's summary content depends on partitioning/arrival order (any
MG implementation's does); step 2 makes the OUTPUT deterministic.

Reference anchor: the reference's top-N serving aggregates — the
daily CTAS group-by-count shape (dag/wiki_pipeline_dag.py:29-39) and
the per-day editor counts (upsert_athena_aggregates.py:39-50) — are
computed exactly; this is the bounded-memory form those shapes need
when the group-by key cardinality itself won't fit a shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition k-counter Misra-Gries summaries, hash-agg merged:
    (item, weight_lower) with weight_lower ≥ true_count − N/(k+1) and
    every item of true count > N/(k+1) present. ≤ k rows per input
    partition reach the merge."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")

    def summarize(batches):
        # weighted MG: fold each Arrow batch's value_counts (C-speed)
        # into the counter map, then decrement-all by the minimum until
        # ≤ k counters remain. Every unit of per-item undercount
        # coincides with ≥ (k+1) units of total decremented mass, so
        # undercount ≤ N/(k+1) — the same bound as the per-row form at
        # a fraction of the Python cost.
        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[col].dropna().value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            while len(counters) > k:
                m = min(counters.values())
                counters = {i: c - m for i, c in counters.items() if c > m}
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "weight": list(counters.values())}
            )

    summaries = df.select(F.col(col).alias(col)).mapInPandas(
        summarize, schema="item string, weight long"
    )
    return summaries.groupBy("item").agg(F.sum("weight").alias("weight"))


def heavy_hitters(
    df: DataFrame, col: str, min_share: float
) -> DataFrame:
    """Items whose EXACT share of non-null ``col`` values exceeds
    ``min_share`` — sketch-pruned, exactly verified. Returns
    (item, cnt, share) with exact values; output is deterministic and
    equal to the plain GROUP BY answer, at bounded-memory cost."""
    if not (0.0 < min_share < 1.0):
        raise ValueError(f"min_share must be in (0, 1), got {min_share}")
    k = max(1, int(1.0 / min_share))
    vals = df.select(F.col(col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    cands = mg_candidates(vals, "item", k).select("item")
    # exact second pass over candidates only: the broadcast semi-join
    # prunes the shuffle to ≤ k × partitions distinct keys
    counted = (
        vals.join(F.broadcast(cands), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = vals.count()
    return (
        counted.withColumn(
            "share", F.col("cnt") / F.lit(float(total))
        )
        .filter(F.col("share") > min_share)
        .select("item", "cnt", F.round("share", 6).alias("share"))
    )
