"""Sequence packing: assign documents to fixed-token-budget training
sequences ("packs") so short documents share a context window instead
of wasting it on padding.

The algorithm is greedy first-fit-decreasing *within a hash bucket*:

  1. bucket every doc by a deterministic hash of its id (``n_buckets``
     buckets — one Arrow group each);
  2. inside each bucket, sort by token count descending and first-fit
     into packs of at most ``max_tokens``.

Packing is deliberately NOT global: at 100 TB a globally-optimal bin
packing would serialize the corpus through one task for zero modeling
benefit — production pipelines pack per shard exactly like this.  The
plan is one hash-partition shuffle (groupBy bucket) + an Arrow-batched
``applyInPandas``; no state crosses buckets, so buckets scale out
linearly and bucket count is the knob that keeps each group in memory
(docs/bucket ~= corpus/n_buckets).

Documents longer than ``max_tokens`` get a pack of their own with
``oversize = true`` — the caller decides whether to chunk or drop them;
silently truncating here would corrupt token accounting upstream.

Determinism: bucket assignment is md5-based (portable, repartition-
stable — see operators/sampling.py) and the in-bucket sort breaks token
ties by doc id, so the same corpus always yields the same packs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.operators.sampling import hash_key

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("pack_id", T.StringType(), False),
        T.StructField("oversize", T.BooleanType(), False),
    ]
)


def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """First-fit-decreasing over one bucket (plain pandas, Arrow batch)."""
    bucket = pdf["bucket"].iloc[0]
    max_tokens = int(pdf["max_tokens"].iloc[0])
    ordered = pdf.sort_values(
        ["n_tokens", "doc_id"], ascending=[False, True]
    ).itertuples(index=False)
    # packs: list of [remaining_budget]; assignment per doc
    remaining: list[int] = []
    rows = []
    for doc in ordered:
        n = int(doc.n_tokens)
        if n > max_tokens:
            rows.append((int(doc.doc_id), n, f"{bucket}/oversize-{doc.doc_id}", True))
            continue
        # first-fit: linear scan is fine — packs/bucket is small by design
        for i, rem in enumerate(remaining):
            if rem >= n:
                remaining[i] = rem - n
                rows.append((int(doc.doc_id), n, f"{bucket}/{i}", False))
                break
        else:
            remaining.append(max_tokens - n)
            rows.append((int(doc.doc_id), n, f"{bucket}/{len(remaining) - 1}", False))
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "pack_id", "oversize"])


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Per-document pack assignment: (doc_id, n_tokens, pack_id, oversize).

    ``docs`` needs ``id_col`` and a precomputed ``token_col`` (from
    functions/text.py counters) — packing never re-tokenizes.
    """
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    prepared = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        # md5-prefix mod n_buckets: deterministic + portable (conv is JVM-side)
        (F.conv(hash_key(F.col(id_col), "pack:"), 16, 10).cast("long") % n_buckets)
        .cast("int")
        .alias("bucket"),
        F.lit(max_tokens).alias("max_tokens"),
    )
    return prepared.groupBy("bucket").applyInPandas(_pack_bucket, schema=_SCHEMA)


def pack_stats(assignments: DataFrame, max_tokens: int) -> DataFrame:
    """Per-pack utilization summary: docs, tokens, fill ratio."""
    return assignments.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.max(F.col("oversize").cast("int")).cast("boolean").alias("oversize"),
        F.round(F.sum("n_tokens") / F.lit(float(max_tokens)), 4).alias("fill_ratio"),
    )
