"""Exact substring (span-level) dedup semantics (operators/spans.py).

Crafted corpus pins the contract: cross-document spans only, overlap
merge (a shared L-token run counts L tokens, not (L-k+1)*k), intra-doc
repetition excluded at min_docs=2, short docs yield no spans.
"""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.operators.spans import (
    duplicated_span_coverage,
    duplicated_spans,
    positional_span_hashes,
)

P = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
Q = "one two three four five six"  # 6 tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # A and B share the 10-token run P (plus unique context).
        (0, f"ua1 ua2 ua3 ua4 ua5 {P} ua6 ua7 ua8 ua9"),
        (1, f"ub1 ub2 {P} ub3 ub4 ub5 ub6 ub7 ub8 ub9 ub10"),
        # C is entirely unique.
        (2, "uc1 uc2 uc3 uc4 uc5 uc6 uc7 uc8 uc9 uc10 uc11 uc12"),
        # D repeats Q twice WITHIN itself only — intra-doc, not flagged.
        (3, f"ud1 {Q} ud2 ud3 ud4 ud5 ud6 {Q} ud7"),
        # E and F share two DISJOINT runs (P and Q, far apart).
        (4, f"{P} ue1 ue2 ue3 ue4 ue5 ue6 ue7 ue8 {Q}"),
        (5, f"{Q} uf1 uf2 uf3 uf4 uf5 uf6 uf7 uf8 {P}"),
        # G is shorter than k tokens — no spans at all.
        (6, "ug1 ug2"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_positional_hashes_shape(docs):
    sp = positional_span_hashes(docs, k=4).collect()
    by_doc = {}
    for r in sp:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    # 19 tokens in doc 0 -> 16 spans of 4, positions 1..16
    assert sorted(by_doc[0]) == list(range(1, 17))
    # doc 6 has 2 tokens < k -> no spans
    assert 6 not in by_doc


def test_cross_doc_only(docs):
    dup = duplicated_spans(positional_span_hashes(docs, k=4)).collect()
    assert all(r.n_docs >= 2 for r in dup)
    # Q appears twice in doc 3 AND in docs 4/5 -> its spans are
    # cross-doc (3 docs) with 4 occurrences each.
    q_rows = [r for r in dup if r.n_docs == 3]
    assert len(q_rows) == 3  # 6-token run -> 3 spans of k=4
    assert all(r.n_occurrences == 4 for r in q_rows)


def test_intra_doc_excluded(spark):
    solo = spark.createDataFrame(
        [(0, f"x1 {Q} x2 x3 x4 x5 {Q} x6"), (1, "y1 y2 y3 y4 y5 y6 y7")],
        "doc_id int, text string",
    )
    dup = duplicated_spans(positional_span_hashes(solo, k=4)).collect()
    assert dup == []  # repeated only within one document
    cov = duplicated_span_coverage(solo, k=4).collect()
    assert cov == []


def test_coverage_merges_overlaps(docs):
    cov = {r.doc_id: r for r in duplicated_span_coverage(docs, k=4).collect()}
    # Docs 0/1: exactly the shared 10-token run P (7 overlapping spans
    # of 4 merge into one 10-token island, NOT 7*4=28).
    assert cov[0].dup_tokens == 10 and cov[0].total_tokens == 19
    assert cov[1].dup_tokens == 10 and cov[1].total_tokens == 20
    assert cov[0].coverage == round(10 / 19, 6)
    # Unique doc absent; short doc absent.
    assert 2 not in cov and 6 not in cov
    # Doc 3's Q runs became cross-doc via docs 4/5: two disjoint
    # 6-token islands.
    assert cov[3].dup_tokens == 12
    # Docs 4/5: P (10) + Q (6) disjoint islands = 16 each.
    assert cov[4].dup_tokens == 16 and cov[5].dup_tokens == 16
    assert cov[4].total_tokens == 24


def test_coverage_schema(docs):
    df = duplicated_span_coverage(docs, k=4)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "total_tokens", "dup_tokens", "coverage",
    ]
    kinds = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert kinds["total_tokens"] == "bigint"
    assert kinds["dup_tokens"] == "bigint"
    assert kinds["coverage"] == "double"


def test_window_marking_equals_semijoin_marking(docs):
    """Single-pass marking equivalence: the shared-exchange aggregate +
    inner-join path (r15, min_docs=2) must mark exactly the rows the
    reference aggregate + LEFT SEMI implementation (r13) marks."""
    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.operators.spans import (
        duplicated_span_islands,
        duplicated_spans,
    )

    fast = duplicated_span_islands(docs, k=4, min_docs=2).orderBy("doc_id")
    # force the general (aggregate + semi join) branch with the same
    # effective threshold by filtering duplicated_spans at min_docs=2
    spans = positional_span_hashes(docs, k=4)
    dup = duplicated_spans(spans, min_docs=2).select("span_hash")
    k = 4
    from pyspark.sql import Window

    marked = spans.join(dup, "span_hash", "left_semi").select("doc_id", "pos")
    end = F.col("pos") + F.lit(k - 1)
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    slow = (
        marked.withColumn(
            "ni", F.when(prev.isNull() | (F.col("pos") > prev), 1).otherwise(0)
        )
        .withColumn("isl", F.sum("ni").over(w))
        .groupBy("doc_id", "isl")
        .agg((F.max(end) - F.min("pos") + 1).alias("it"))
        .groupBy("doc_id")
        .agg(F.sum("it").cast("long").alias("dup_tokens"))
        .orderBy("doc_id")
    )
    assert fast.collect() == slow.collect()


def test_coverage_plan_has_single_generate(docs):
    """The r13 form built the span relation twice (two Generate subtrees
    over the corpus). The r15 marking shares ONE explicit span_hash
    exchange between the dup-set aggregate and the join probe; the
    static plan therefore textually repeats the Generate subtree under
    two canonically-equal exchanges, and the proof of single execution
    is the FINAL adaptive plan: AQE exchange reuse must leave exactly
    one executed Generate (guide §7.2 — judge the executed plan, not
    the static one)."""
    df = duplicated_span_coverage(docs, k=4)
    df.collect()  # drive THIS DataFrame's QueryExecution to its final plan
    final = (
        df._jdf.queryExecution()  # noqa: SLF001
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "isFinalPlan=true" in final, final[:500]
    assert final.count("ReusedExchange") == 1, final[:2000]
    assert final.count("Generate ") == 1, final[:2000]


def test_hot_span_marking_streams(spark):
    """Skew-proofing (VERDICT r14 (a)): a span present in EVERY document
    (the hot boilerplate case) must not route through any operator that
    buffers the hot hash's rows in one task. The r14 min/max window over
    span_hash buffered the whole partition (WindowExec); the r15 plan
    must show NO sort or window keyed by span_hash — only a streaming
    hash-aggregate and a shuffled-hash join — and still produce exact
    coverage."""
    hot = "h1 h2 h3 h4"  # the 4-token span shared by every doc
    rows = [(i, f"u{i}a u{i}b {hot} u{i}c") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    df = duplicated_span_coverage(docs, k=4)
    got = {r.doc_id: r.dup_tokens for r in df.collect()}
    assert got == {i: 4 for i in range(200)}
    final = (
        df._jdf.queryExecution()  # noqa: SLF001
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # the marking must stream: no sort and no window partitioned by the
    # span hash anywhere in the executed plan (the only Sort/Window
    # allowed is the per-doc islands merge, keyed by doc_id)
    for line in final.splitlines():
        if "span_hash" in line:
            assert "Sort [span_hash" not in line, line
            assert not line.strip().startswith("Window"), line
    assert "ShuffledHashJoin" in final, final[:2000]
