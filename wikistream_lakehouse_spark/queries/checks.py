"""Typed invariants for rows-only (◇) queries (VERDICT r8 wrong #2 /
next #3): approximate or hash-specific operators have no ANSI-SQL
oracle, so the oracle sweep used to assert only ``count() >= 0`` — a
check that would pass a query regressed to garbage. Every ◇ query now
registers a ``check(df, spark, sf_dir)`` invariant from this module:
recall floors against an exact frame computed here (ANN, MinHash-LSH),
conservation sums (packing), schema + value bounds (media), label
universe (langid), referential keep-set integrity (dedup). Each check
is cheap relative to the query and FAILS on a shuffled/garbage frame
(proven by mutation in tests/test_query_checks.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.tables import table


def _rows(df: DataFrame) -> list:
    return df.collect()


# --------------------------------------------------------------------------
# ANN recall floors vs the exact brute-force top-k (computed here, cached)
# --------------------------------------------------------------------------

_EXACT_TOPK_CACHE: dict[tuple[str, int, int], dict[int, set]] = {}


def _exact_topk(spark: SparkSession, sf_dir: str) -> "dict[int, set]":
    """query_id → exact cosine top-k neighbor set, brute force — the
    ground truth every ANN variant's recall is measured against."""
    from pyspark.sql import Window

    from wikistream_lakehouse_spark.functions.vectors import cosine
    from wikistream_lakehouse_spark.queries.similarity import N_QUERIES, TOP_K

    key = (sf_dir, N_QUERIES, TOP_K)
    hit = _EXACT_TOPK_CACHE.get(key)
    if hit is not None:
        return hit
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    exact = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .collect()
    )
    out: dict[int, set] = {}
    for r in exact:
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    _EXACT_TOPK_CACHE[key] = out
    return out


def ann_topk_check(recall_floor: float):
    """Structure + recall: (query_id, neighbor_id, cos, rk) frames must
    rank real cosines (∈[-1,1], descending per query, rk contiguous
    from 1, no self-pairs/dup neighbors) and recover at least
    ``recall_floor`` of the exact brute-force top-k, micro-averaged."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        from wikistream_lakehouse_spark.queries.similarity import TOP_K

        assert set(df.columns) == {"query_id", "neighbor_id", "cos", "rk"}
        per_q: dict[int, list] = {}
        for r in _rows(df):
            assert r.query_id != r.neighbor_id, "self-pair in top-k"
            assert -1.000001 <= r.cos <= 1.000001, f"cosine {r.cos} out of range"
            assert 1 <= r.rk <= TOP_K, f"rank {r.rk} outside [1,{TOP_K}]"
            per_q.setdefault(r.query_id, []).append(r)
        exact = _exact_topk(spark, sf_dir)
        assert set(per_q) <= set(exact), "unknown query_id in results"
        hits = total = 0
        for q, neigh in exact.items():
            rs = sorted(per_q.get(q, []), key=lambda r: r.rk)
            assert [r.rk for r in rs] == list(range(1, len(rs) + 1)), (
                f"ranks not contiguous for query {q}"
            )
            assert all(
                rs[i].cos >= rs[i + 1].cos for i in range(len(rs) - 1)
            ), f"cos not descending for query {q}"
            got = {r.neighbor_id for r in rs}
            assert len(got) == len(rs), f"duplicate neighbor for query {q}"
            hits += len(got & neigh)
            total += len(neigh)
        recall = hits / total if total else 1.0
        assert recall >= recall_floor, (
            f"ANN recall {recall:.3f} below floor {recall_floor}"
        )

    return check


# --------------------------------------------------------------------------
# Dedup family
# --------------------------------------------------------------------------


def minhash_pairs_check(
    threshold: float = 0.35,
    high_sim: float = 0.8,
    recall_floor: float = 0.9,
    probe_limit: int = 150,
):
    """Independent re-derivation on the bounded id<probe_limit face:
    every returned pair's jaccard must equal the exact all-pairs value
    (no minhash, no LSH — only the shingle definition shared), no false
    positives, and the HIGH-similarity truth pairs (≥ ``high_sim``,
    where b=8/r=4 capture ≈ 1-(1-0.8⁴)⁸ ≈ 0.985) must be recalled at
    ≥ ``recall_floor`` — the same contract the unit test certifies."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        from wikistream_lakehouse_spark.operators.minhash import (
            exploded_shingle_hashes,
            verify_jaccard,
        )

        assert set(df.columns) == {"id_a", "id_b", "jaccard"}
        got = {(r.id_a, r.id_b): r.jaccard for r in _rows(df)}
        for (a, b), j in got.items():
            assert a < b, f"pair ({a},{b}) not id-ordered"
            assert threshold <= j <= 1.0, f"jaccard {j} outside [{threshold},1]"
        # exact ground truth on the bounded face: every ordered id pair
        # is a candidate, so verify_jaccard returns the TRUE pair set
        d = table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < probe_limit
        )
        ids = d.select(F.col("doc_id").alias("id_a"))
        all_pairs = ids.crossJoin(
            ids.select(F.col("id_a").alias("id_b"))
        ).filter(F.col("id_a") < F.col("id_b"))
        ex = exploded_shingle_hashes(d, "text", "doc_id", 3, distinct=True)
        truth = {
            (r.id_a, r.id_b): r.jaccard
            for r in verify_jaccard(all_pairs, ex, "doc_id", threshold).collect()
        }
        bounded_got = {
            p for p in got if p[0] < probe_limit and p[1] < probe_limit
        }
        # precision on the face: every returned pair must be truly >= t
        assert bounded_got <= set(truth), (
            f"false positives: {sorted(bounded_got - set(truth))[:5]}"
        )
        for p in bounded_got:
            assert abs(got[p] - truth[p]) < 1e-6, (
                f"jaccard mismatch on {p}: {got[p]} vs exact {truth[p]}"
            )
        high = {p for p, j in truth.items() if j >= high_sim}
        if high:
            recall = len(high & bounded_got) / len(high)
            assert recall >= recall_floor, (
                f"LSH recall {recall:.3f} on jaccard≥{high_sim} pairs "
                f"below floor {recall_floor}"
            )

    return check


def simhash_pairs_check(
    max_hamming: int = 3, max_bucket: int = 200, probe_limit: int = 200
):
    """(id_a, id_b, hamming_dist): id-ordered distinct pairs over real
    document ids with Hamming inside the radius, every returned distance
    equal to the recomputed signature Hamming, and the degenerate-bucket
    guard's conservation accounting (VERDICT r12 #1): pairs dropped only
    via capped buckets, and on the id<probe_limit face every in-radius
    truth pair is either returned or explained by the cap (all its
    agreeing chunks sit in >max_bucket buckets of the FULL corpus)."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        from wikistream_lakehouse_spark.operators.simhash import (
            _CHUNK_CHOICES,
            N_BITS,
            add_simhash,
            simhash_band_stats,
        )

        assert set(df.columns) == {"id_a", "id_b", "hamming_dist"}
        rows = _rows(df)
        seen: dict[tuple, int] = {}
        for r in rows:
            assert r.id_a < r.id_b, f"pair ({r.id_a},{r.id_b}) not ordered"
            assert 0 <= r.hamming_dist <= max_hamming, (
                f"hamming {r.hamming_dist} outside [0,{max_hamming}]"
            )
            assert (r.id_a, r.id_b) not in seen, "duplicate pair"
            seen[(r.id_a, r.id_b)] = r.hamming_dist
        d = table(spark, sf_dir, "documents")
        sigs = {
            r.doc_id: r.simhash
            for r in add_simhash(d).select("doc_id", "simhash").collect()
        }
        # exact value check: every returned distance matches the
        # independently recomputed signatures
        for (a, b), hd in seen.items():
            assert a in sigs and b in sigs, f"unknown ids ({a},{b})"
            true_hd = (sigs[a] ^ sigs[b]).bit_count()
            assert hd == true_hd, (
                f"hamming mismatch on ({a},{b}): {hd} vs exact {true_hd}"
            )
        # conservation accounting against the shared banding
        sig_df = spark.createDataFrame(
            [(i, s) for i, s in sigs.items()], "doc long, simhash long"
        )
        stats = (
            simhash_band_stats(sig_df, "doc", max_hamming, max_bucket)
            .collect()[0]
            .asDict()
        )
        assert stats["n_docs"] == len(sigs)
        assert len(seen) <= stats["raw_pairs_kept"], (
            f"{len(seen)} pairs from {stats['raw_pairs_kept']} kept "
            "bucket slots — join emitted pairs no kept bucket holds"
        )
        assert stats["raw_pairs_dropped"] == 0 or stats["capped_buckets"] > 0
        # pigeonhole recall with the cap's explicit carve-out: capped
        # bucket keys computed over the FULL corpus (the guard is global)
        n_chunks = next(c for c in _CHUNK_CHOICES if c > max_hamming)
        bits = N_BITS // n_chunks
        mask = (1 << bits) - 1

        def chunks(s: int) -> list:
            return [(c, (s >> (c * bits)) & mask) for c in range(n_chunks)]

        occ: dict[tuple, int] = {}
        for s in sigs.values():
            for key in chunks(s):
                occ[key] = occ.get(key, 0) + 1
        capped = {k for k, n in occ.items() if n > max_bucket}
        probe = sorted(i for i in sigs if i < probe_limit)
        for ai, a in enumerate(probe):
            for b in probe[ai + 1:]:
                hd = (sigs[a] ^ sigs[b]).bit_count()
                if hd > max_hamming or (a, b) in seen:
                    continue
                agree = {
                    ka for ka, kb in zip(chunks(sigs[a]), chunks(sigs[b]))
                    if ka == kb
                }
                assert agree and agree <= capped, (
                    f"missed pair ({a},{b}) hd={hd} not explained by the "
                    f"cap: uncapped agreeing chunks {sorted(agree - capped)}"
                )

    return check


def canonical_docs_check(df: DataFrame, spark: SparkSession, sf_dir: str):
    """(doc_id, component, is_canonical): a partition of ALL documents
    into min-id-rooted components — every doc exactly once, component
    ≤ doc_id, the root row present and flagged, flag consistent."""
    assert set(df.columns) == {"doc_id", "component", "is_canonical"}
    rows = _rows(df)
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs, f"{len(rows)} rows for {n_docs} documents"
    by_id = {r.doc_id: r for r in rows}
    assert len(by_id) == n_docs, "duplicate doc_id"
    for r in rows:
        assert r.component <= r.doc_id, (
            f"component {r.component} > member {r.doc_id} (not min-rooted)"
        )
        assert r.is_canonical == (r.doc_id == r.component)
        root = by_id.get(r.component)
        assert root is not None and root.component == r.component, (
            f"component root {r.component} missing or re-rooted"
        )


def semdedup_check(k: int = 8, threshold: float = 0.35):
    """(vec_id, cluster, centroid_sim, keep, dup_of): a verdict for
    every vector — keep XOR dup_of, dup_of points at a KEPT row in the
    same cluster, cluster ids in range, cosines in range."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        assert set(df.columns) == {
            "vec_id", "cluster", "centroid_sim", "keep", "dup_of",
        }
        rows = _rows(df)
        n = table(spark, sf_dir, "embeddings").count()
        assert len(rows) == n, f"{len(rows)} verdicts for {n} vectors"
        by_id = {r.vec_id: r for r in rows}
        assert len(by_id) == n, "duplicate vec_id"
        for r in rows:
            assert 0 <= r.cluster < k, f"cluster {r.cluster} outside [0,{k})"
            assert -1.000001 <= r.centroid_sim <= 1.000001
            if r.keep:
                assert r.dup_of is None, f"kept {r.vec_id} has dup_of"
            else:
                cover = by_id.get(r.dup_of)
                assert cover is not None, f"dup_of {r.dup_of} unknown"
                assert cover.keep, f"{r.vec_id} covered by dropped {r.dup_of}"
                assert cover.cluster == r.cluster, "cover in another cluster"

    return check


# --------------------------------------------------------------------------
# Multimodal
# --------------------------------------------------------------------------


def media_features_check(df: DataFrame, spark: SparkSession, sf_dir: str):
    """Schema + byte-level bounds, and size_bytes re-derived from the
    source payloads (utf-8 text length) row-by-row."""
    assert set(df.columns) == {
        "doc_id", "media_type", "size_bytes", "byte_mean", "byte_entropy",
        "decoded",
    }
    truth = {
        r.doc_id: (r.nb, r.mt)
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.octet_length(F.encode("text", "utf-8")).alias("nb"),
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("mt"),
        )
        .collect()
    }
    rows = _rows(df)
    assert len(rows) == len(truth), f"{len(rows)} rows for {len(truth)} docs"
    for r in rows:
        nb, mt = truth[r.doc_id]
        assert r.size_bytes == nb, (
            f"doc {r.doc_id}: size_bytes {r.size_bytes} != payload {nb}"
        )
        assert r.media_type == mt
        assert 0.0 <= r.byte_mean <= 255.0
        assert 0.0 <= r.byte_entropy <= 8.0
        # decoded=True marks the deterministic FAKE codec path (the real
        # codec is a gated NotImplementedError in this container)
        assert r.decoded is True, f"doc {r.doc_id}: decoded={r.decoded}"


def media_frames_check(
    df: DataFrame, spark: SparkSession, sf_dir: str,
    stride: int = 4, frame_bytes: int = 256,
):
    """Per-video frame counts re-derived from payload geometry:
    n_sampled == ceil(ceil(bytes/frame_bytes)/stride) exactly."""
    assert set(df.columns) == {"doc_id", "n_sampled_frames", "avg_frame_mean"}
    truth = {
        r.doc_id: r.nb
        for r in table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 300) & (F.col("doc_id") % 3 == 2))
        .select(
            "doc_id", F.octet_length(F.encode("text", "utf-8")).alias("nb")
        )
        .collect()
    }
    rows = _rows(df)
    assert len(rows) == len(truth), f"{len(rows)} rows for {len(truth)} videos"
    for r in rows:
        nb = truth[r.doc_id]
        n_frames = max(1, math.ceil(nb / frame_bytes))
        expect = math.ceil(n_frames / stride)
        assert r.n_sampled_frames == expect, (
            f"doc {r.doc_id}: {r.n_sampled_frames} frames, expected {expect}"
        )
        assert 0.0 <= r.avg_frame_mean <= 255.0


# --------------------------------------------------------------------------
# Aggregates / sampling / text
# --------------------------------------------------------------------------


def approx_distinct_check(rel_err: float = 0.10):
    """HLL++/percentile sketches vs exact values recomputed here:
    approx_users within ±rel_err of exact distinct, median between the
    group's min and max."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        assert set(df.columns) == {
            "event_type", "approx_users", "approx_median_value",
        }
        exact = {
            r.event_type: (r.n, r.lo, r.hi)
            for r in table(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("n"),
                F.min("value").alias("lo"),
                F.max("value").alias("hi"),
            )
            .collect()
        }
        rows = _rows(df)
        assert {r.event_type for r in rows} == set(exact), "group set differs"
        assert len(rows) == len(exact), "duplicate group rows"
        for r in rows:
            n, lo, hi = exact[r.event_type]
            assert abs(r.approx_users - n) <= max(2.0, rel_err * n), (
                f"{r.event_type}: approx {r.approx_users} vs exact {n}"
            )
            assert lo <= r.approx_median_value <= hi, (
                f"{r.event_type}: median {r.approx_median_value} "
                f"outside [{lo},{hi}]"
            )

    return check


def packing_check(max_tokens: int = 512):
    """Conservation: Σ n_docs over packs == packable docs, Σ pack_tokens
    == their total token mass; per-pack budget respected unless the
    pack is a flagged single-doc oversize; fill_ratio consistent."""

    def check(df: DataFrame, spark: SparkSession, sf_dir: str) -> None:
        from wikistream_lakehouse_spark.functions.text import (
            whitespace_token_count,
        )

        assert set(df.columns) == {
            "pack_id", "n_docs", "pack_tokens", "oversize", "fill_ratio",
        }
        totals = (
            table(spark, sf_dir, "documents")
            .select(whitespace_token_count(F.col("text")).alias("n_tokens"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            )
            .collect()[0]
        )
        rows = _rows(df)
        assert len({r.pack_id for r in rows}) == len(rows), "duplicate pack"
        assert sum(r.n_docs for r in rows) == totals.n_docs, (
            "doc conservation broken: "
            f"{sum(r.n_docs for r in rows)} packed vs {totals.n_docs} input"
        )
        assert sum(r.pack_tokens for r in rows) == totals.n_tokens, (
            "token conservation broken"
        )
        for r in rows:
            assert r.n_docs >= 1
            if r.oversize:
                assert r.n_docs == 1 and r.pack_tokens > max_tokens, (
                    f"pack {r.pack_id}: oversize flag on a multi-doc or "
                    "in-budget pack"
                )
            else:
                assert r.pack_tokens <= max_tokens, (
                    f"pack {r.pack_id}: {r.pack_tokens} > budget {max_tokens}"
                )
            # Spark's round() is HALF_UP, Python's is banker's — compare
            # against the unrounded ratio at the rounding granularity
            assert abs(r.fill_ratio - r.pack_tokens / max_tokens) < 1e-4, (
                f"pack {r.pack_id}: fill_ratio {r.fill_ratio} inconsistent"
            )

    return check


def langid_check(df: DataFrame, spark: SparkSession, sf_dir: str):
    """Every document classified exactly once, predictions drawn from
    the corpus label universe, the correct flag consistent."""
    assert set(df.columns) == {"doc_id", "lang", "predicted_lang", "correct"}
    truth = {
        r.doc_id: r.lang
        for r in table(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .collect()
    }
    labels = set(truth.values())
    rows = _rows(df)
    assert len(rows) == len(truth), f"{len(rows)} rows for {len(truth)} docs"
    seen = set()
    for r in rows:
        assert r.doc_id not in seen, "duplicate doc_id"
        seen.add(r.doc_id)
        assert r.lang == truth[r.doc_id], f"doc {r.doc_id}: wrong true lang"
        assert r.predicted_lang in labels, (
            f"predicted label {r.predicted_lang!r} outside universe {labels}"
        )
        assert r.correct == (r.lang == r.predicted_lang)
