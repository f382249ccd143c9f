"""Exact substring (span-level) deduplication (X2 extension).

Finds runs of >= k tokens that recur verbatim across documents — the
distributed form of suffix-array exact-substring dedup from
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022, arXiv:2107.06499 — their ExactSubstr tool builds one giant suffix
array; at cluster scale the equivalent signal is a k-gram hash
equi-join). Complements the doc-level family: exact fingerprint dedup
catches whole-doc copies, MinHash/SimHash catch fuzzy near-dups, this
catches the boilerplate paragraph pasted into thousands of otherwise
distinct pages.

Pipeline (all JVM-side, no arrays through shuffles):

  tokens → positional k-gram spans (arrays_zip of k shifted slices,
  posexplode) → md5 span hash → ONE explicit shuffle by span_hash,
  shared (ReusedExchange) by a streaming min/max(doc) hash-aggregate
  that derives the duplicated-hash set AND by the probe side of the
  join that marks each doc's cross-document duplicated positions →
  gaps-and-islands window merges overlapping spans → per-doc duplicated
  token coverage.

Scale design (why this works at 100 TB where a suffix array cannot):
  * The span relation is built ONCE and is linear in corpus tokens (one
    row per position); every stage after it is a keyed hash-aggregate,
    equi-join or per-doc window — no O(n²) anywhere.
  * Duplicate marking never multiplies rows (the dup-hash set is
    distinct, so the inner join emits each position at most once) and
    never BUFFERS a key's rows: the r14 min/max window over span_hash
    buffered the whole partition per hash in one task
    (ExternalAppendOnlyUnsafeRowArray — a 10M-occurrence boilerplate
    span became a single-task sort+spill straggler AQE cannot split).
    The hash-aggregate streams with two scalars of state per hash, and
    the SHUFFLE_HASH-hinted join streams the probe side with no sort —
    a hot hash costs one large-but-streaming partition read, nothing
    is ever materialized per key.
  * The island merge is a per-document window — state bounded by the
    longest document, partition-parallel across docs.
  * Span hashes are md5 (portable: DuckDB recomputes them bit-identically
    for the oracle); collisions ~n²/2¹²⁸ — negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import tokens


def positional_span_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
) -> DataFrame:
    """(id, pos, span_hash) — one row per k-token span per document,
    ``pos`` the 1-based token index of the span start, ``span_hash`` the
    md5 hex of the space-joined span text.

    Same shifted-slice arrays_zip alignment as minhash's
    ``shingle_structs`` (the measured-fast exploded form), but
    positional: posexplode keeps the start index, and spans are NOT
    distinct-ed — coverage needs every occurrence. Documents shorter
    than k tokens yield no rows.
    """
    a = tokens(F.col(text_col))
    shifted = [a] + [
        F.slice(a, i + 1, F.greatest(F.size(a) - i, F.lit(0)))
        for i in range(1, k)
    ]
    z = F.arrays_zip(*[s.alias(f"w{i}") for i, s in enumerate(shifted)])
    last = f"w{k - 1}"
    return (
        df.select(F.col(id_col), F.posexplode(z).alias("i", "s"))
        .filter(F.col(f"s.{last}").isNotNull())
        .select(
            F.col(id_col),
            (F.col("i") + 1).alias("pos"),
            F.md5(
                F.concat_ws(" ", *[F.col(f"s.w{j}") for j in range(k)])
            ).alias("span_hash"),
        )
    )


def duplicated_spans(
    spans: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """(span_hash, n_docs, n_occurrences) — spans recurring in >= min_docs
    DISTINCT documents, from a ``positional_span_hashes`` relation.

    ``min_docs=2`` means cross-document duplication only: a span repeated
    within a single document is intra-doc repetition, which
    ``doc_repetition_profile`` (queries/hygiene.py) already measures.
    One hash-aggregate keyed by span_hash, partial-combined map-side.
    """
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def duplicated_span_islands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """(id, dup_tokens) — merged duplicated-island token counts per
    document, for documents with at least one cross-document duplicated
    k-token span.

    ``dup_tokens`` merges overlapping/adjacent duplicated spans before
    counting (gaps-and-islands: a new island starts where a span's start
    exceeds the running max end of all earlier spans), so a shared run of
    L >= k tokens counts L tokens once — not (L-k+1)·k.

    Single-pass, skew-proof marking. The r13 form built the span relation
    TWICE (once under a dup-hash aggregate, once as the LEFT SEMI probe),
    doubling the dominant Generate; the r14 form fixed that with a
    min/max window over span_hash, but WindowExec buffers the ENTIRE
    partition per hash in one task — a hot boilerplate span became an
    unsplittable single-task sort+spill straggler (VERDICT r14 (a)).
    This form keeps both properties: ONE explicit repartition by
    span_hash is shared (AQE ReusedExchange — the k-gram Generate and
    its shuffle execute once) by (1) a streaming hash-aggregate deriving
    the duplicated-hash set with O(1) state per hash and (2) the probe
    side of a SHUFFLE_HASH inner join against that set — both sides
    pre-partitioned, so the join adds no exchange, builds its table from
    the small distinct-hash side, and streams the probe with no sort.
    Implementation notes for plan shape: the join is INNER (the dup set
    is distinct, so it never multiplies rows) rather than LEFT SEMI
    because PushDownLeftSemiAntiJoin would push a semi join below the
    repartition and un-share the exchange; the aggregate carries a
    never-true ``min(pos) IS NULL`` fence so column pruning cannot
    narrow its branch of the shared exchange (a pruned branch is no
    longer canonically equal to the probe branch, and exchange reuse —
    hence the single Generate — would be lost).
    """
    spans = positional_span_hashes(df, text_col, id_col, k)
    # Null-id rows can never surface (min/max/countDistinct ignore nulls,
    # and every consumer joins on the id), but downstream joins push an
    # isnotnull(id) into the PROBE branch only — filtering it here, below
    # the shared exchange, keeps both branches canonically equal so the
    # pushed copy is pruned as already-implied and exchange reuse holds.
    spans_p = spans.filter(F.col(id_col).isNotNull()).repartition("span_hash")
    if min_docs == 2:
        # min(id) != max(id) <=> >= 2 distinct docs
        agg = spans_p.groupBy("span_hash").agg(
            F.min(id_col).alias("_mn"),
            F.max(id_col).alias("_mx"),
            F.min("pos").alias("_pf"),
        )
        dup = agg.filter(
            (F.col("_mn") != F.col("_mx")) | F.col("_pf").isNull()
        ).select("span_hash")
    else:
        # general threshold: distinct-doc count needs a real aggregate
        agg = spans_p.groupBy("span_hash").agg(
            F.countDistinct(id_col).alias("_nd"),
            F.min("pos").alias("_pf"),
        )
        dup = agg.filter(
            (F.col("_nd") >= min_docs) | F.col("_pf").isNull()
        ).select("span_hash")
    marked = (
        spans_p.join(dup.hint("shuffle_hash"), "span_hash", "inner")
        .select(id_col, "pos")
    )
    end = F.col("pos") + F.lit(k - 1)
    w_order = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = F.max(end).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        marked.withColumn(
            "new_island",
            F.when(
                prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_order))
        .groupBy(id_col, "island")
        .agg((F.max(end) - F.min("pos") + 1).alias("island_tokens"))
        .groupBy(id_col)
        .agg(F.sum("island_tokens").cast("long").alias("dup_tokens"))
    )


def duplicated_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    min_docs: int = 2,
) -> DataFrame:
    """(id, total_tokens, dup_tokens, coverage) for every document that
    contains at least one cross-document duplicated k-token span.

    Island semantics in ``duplicated_span_islands``; this face joins the
    per-doc totals (one extra narrow tokenize pass — docs without spans
    never reach the inner join, so totals cannot come from span rows).
    """
    islands = duplicated_span_islands(df, text_col, id_col, k, min_docs)
    totals = df.select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("total_tokens")
    )
    return islands.join(totals, id_col).select(
        F.col(id_col),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.round(F.col("dup_tokens") / F.col("total_tokens"), 6).alias(
            "coverage"
        ),
    )
