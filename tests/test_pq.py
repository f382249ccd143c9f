"""Product quantization (operators/pq.py): codebook determinism, ADC
correctness against hand-computable exact distances, recall on data
with real cluster structure, and the compression contract (codes are m
small ints — the representation that fits 100 TB of embeddings into a
~3 TB scan)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.pq import (
    encode_pq,
    pq_topk,
    pq_topk_rerank,
    train_pq_codebooks,
)

M, K, TOP_K = 8, 16, 5


@pytest.fixture(scope="module")
def lattice(spark):
    """All 16 combinations of 4 well-separated subvector values in 2
    subspaces of dim 2 — a dataset a (m=2, k=4) codebook can represent
    EXACTLY, making PQ distance equal true distance."""
    opts = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0), (10.0, 10.0)]
    rows = [
        (i, [*a, *b])
        for i, (a, b) in enumerate(itertools.product(opts, opts))
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, {i: v for i, v in rows}


def test_codebooks_shape_and_determinism(lattice):
    df, _ = lattice
    b1 = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    b2 = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    assert b1.shape == (2, 4, 2)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(df, "vec_id", "embedding", m=3)


def test_encode_codes_are_valid_and_deterministic(lattice):
    df, _ = lattice
    books = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    c1 = {r.vec_id: list(r.codes) for r in encode_pq(df, "vec_id", "embedding", books).collect()}
    c2 = {r.vec_id: list(r.codes) for r in encode_pq(df, "vec_id", "embedding", books).collect()}
    assert c1 == c2
    assert all(len(v) == 2 and all(0 <= x < 4 for x in v) for v in c1.values())
    # 16 distinct vectors on a 4×4 lattice → 16 distinct code pairs
    assert len({tuple(v) for v in c1.values()}) == 16


def test_adc_distance_is_exact_on_representable_data(spark, lattice):
    """When the codebook represents every vector exactly, the
    'approximate' distance IS the true squared L2 — certifying the
    table-lookup math end to end."""
    df, vecs = lattice
    books = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    codes = encode_pq(df, "vec_id", "embedding", books)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = pq_topk(
        codes, q, "vec_id", "embedding", "query_id", books, top_k=16
    ).collect()
    for r in got:
        qv = np.array(vecs[r.query_id])
        nv = np.array(vecs[r.neighbor_id])
        assert r.adist == pytest.approx(float(((qv - nv) ** 2).sum()), abs=1e-6)


@pytest.fixture(scope="module")
def clustered(spark):
    """Same generator as the IVF ≥0.85 certification: 16 well-separated
    unit centers, noise norm ~0.5 — the shape real embedding corpora
    have (tests/test_ivf_index.py::test_recall_certified_on_clustered_data)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = centers[np.arange(512) % 16] + (0.5 / np.sqrt(64)) * rng.normal(
        size=(512, 64)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    e = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(512)],
        "vec_id long, embedding array<float>",
    )
    # exact cosine top-k ground truth, computed in numpy (512×512 is tiny)
    sims = pts @ pts.T
    np.fill_diagonal(sims, -np.inf)
    truth = {
        q: set(np.argsort(-sims[q], kind="stable")[:TOP_K].tolist())
        for q in range(20)
    }
    return e, truth


def _mean_recall(res, truth):
    got: dict[int, set] = {}
    for r in res:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    return sum(
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ) / len(truth)


def test_pq_recall_on_clustered_data(spark, clustered):
    """PQ's contract is the SHORTLIST: compressed-domain ranking puts
    the true neighbors inside a small candidate set, and exact re-rank
    recovers them. Calibration (numpy reference sweep on this data):
    raw recall@5 rises with the bit budget — 0.20 at (m=8,k=16), 0.70
    at (m=8,k=256), 0.84 at (m=16,k=256) — but truth-in-top-50 is 1.00
    even at the SMALLEST codebook; asserting raw@5 at small k would
    test the data's noise floor, not the operator."""
    e, truth = clustered
    q = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # shortlist + exact re-rank at the small codebook: certified ≥ 0.95
    # because the 50-candidate shortlist contains the whole truth set
    books = train_pq_codebooks(e, "vec_id", "embedding", m=M, k=K)
    rr = pq_topk_rerank(
        e, q, "vec_id", "embedding", "query_id", books,
        top_k=TOP_K, n_candidates=50,
    )
    assert _mean_recall(rr.collect(), truth) >= 0.95
    # raw ADC at a production bit budget (8 bits/subspace): ≥ 0.6
    books256 = train_pq_codebooks(e, "vec_id", "embedding", m=M, k=256)
    codes256 = encode_pq(e, "vec_id", "embedding", books256)
    raw = pq_topk(
        codes256, q, "vec_id", "embedding", "query_id", books256, top_k=TOP_K
    )
    assert _mean_recall(raw.collect(), truth) >= 0.6
    # widening the shortlist to the whole collection IS brute force
    full = pq_topk_rerank(
        e, q, "vec_id", "embedding", "query_id", books,
        top_k=TOP_K, n_candidates=512,
    )
    assert _mean_recall(full.collect(), truth) == pytest.approx(1.0)


def test_fixture_embeddings_roundtrip(spark, sf_dir):
    """Smoke on the real fixture table: codes are m ints < k for every
    row — the 32× compression contract (64 floats → 8 bytes at k=256)."""
    from wikistream_lakehouse_spark.tables import table

    e = table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(e, "vec_id", "embedding", m=M, k=K)
    codes = encode_pq(e, "vec_id", "embedding", books)
    stats = codes.select(
        F.count("*").alias("n"),
        F.min(F.size("codes")).alias("lo"),
        F.max(F.size("codes")).alias("hi"),
        F.max(F.array_max("codes")).alias("cmax"),
        F.min(F.array_min("codes")).alias("cmin"),
    ).first()
    assert stats.n == e.count()
    assert stats.lo == stats.hi == M
    assert 0 <= stats.cmin and stats.cmax < K


def test_grid_face_has_no_midpoint_ties(spark, sf_dir):
    """Determinism precondition of the pq/ivfpq_adc_rerank_exact oracle
    faces (queries/similarity.py): encode_pq's argmin over the 0.1-step
    grid codebook and DuckDB's round(x·10)/10 agree everywhere EXCEPT on
    coordinates exactly halfway between grid points (argmin keeps the
    lower grid value, SQL round goes away from zero). Pin that the
    fixture embeddings contain no such coordinate and stay inside the
    unclamped [-1, 1] grid range, so the faces stay engine-deterministic
    for good."""
    from wikistream_lakehouse_spark.tables import table

    e = table(spark, sf_dir, "embeddings")
    x = F.explode(F.col("embedding").cast("array<double>")).alias("x")
    stats = (
        e.select(x)
        .select(
            F.max(F.abs(F.col("x"))).alias("amax"),
            F.sum(
                (F.abs(F.col("x") * 10 - F.floor(F.col("x") * 10) - 0.5) == 0)
                .cast("long")
            ).alias("ties"),
        )
        .first()
    )
    assert stats.amax <= 1.0, "grid face would clamp — revisit the oracle"
    assert stats.ties == 0, "exact 0.05-midpoint coordinate in fixtures"


def test_pq_topk_candidate_filter_restricts_and_composes(spark, lattice):
    """candidate_filter (the IVF-composition hook): scoring restricted to
    a mod-bucket rule must (a) only emit in-bucket pairs and (b) equal
    the unfiltered ranking recomputed over the allowed subset."""
    df, _ = lattice
    books = train_pq_codebooks(df, "vec_id", "embedding", m=2, k=4)
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    codes = encode_pq(df, "vec_id", "embedding", books)
    flt = F.col("neighbor_id") % 2 == F.col("query_id") % 2
    got = pq_topk(
        codes, q, "vec_id", "embedding", "query_id", books, top_k=3,
        candidate_filter=flt,
    ).collect()
    assert got, "filtered top-k came back empty"
    assert all(r.neighbor_id % 2 == r.query_id % 2 for r in got)
    # recompute from the unfiltered scoring: drop out-of-bucket rows,
    # re-rank, take 3 — must be identical
    full = pq_topk(
        codes, q, "vec_id", "embedding", "query_id", books, top_k=16
    ).collect()
    expect = {}
    for r in sorted(full, key=lambda r: (r.query_id, r.rk)):
        if r.neighbor_id % 2 == r.query_id % 2:
            expect.setdefault(r.query_id, []).append(r.neighbor_id)
    got_ids = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rk)):
        got_ids.setdefault(r.query_id, []).append(r.neighbor_id)
    assert got_ids == {qid: ids[:3] for qid, ids in expect.items()}
