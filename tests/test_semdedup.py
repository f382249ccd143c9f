"""SemDeDup semantic dedup: keep-set invariants, determinism, planted
duplicates, and the oversized-cluster shard guard.

The operator has no ANSI-SQL oracle (k-means assignment), so these tests
ARE its correctness contract: the greedy guarantees are re-derived
exactly from the operator's outputs with independent numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.semdedup import (
    semantic_dedup,
    semdedup_survivors,
)
from wikistream_lakehouse_spark.tables import table

K, THRESHOLD, SEED = 8, 0.35, 7


@pytest.fixture(scope="module")
def labeled(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    rows = semantic_dedup(
        e, "vec_id", "embedding", k=K, threshold=THRESHOLD, seed=SEED
    ).collect()
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in e.select("vec_id", "embedding").collect()
    }
    unit = {
        i: v / (np.linalg.norm(v) or 1.0) for i, v in vecs.items()
    }
    return rows, unit


def test_every_row_labeled_exactly_once(spark, sf_dir, labeled):
    rows, _ = labeled
    e = table(spark, sf_dir, "embeddings")
    assert sorted(r.vec_id for r in rows) == sorted(
        r.vec_id for r in e.select("vec_id").collect()
    )


def test_kept_set_pairwise_below_threshold(labeled):
    """Within each cluster, kept rows are mutually dissimilar."""
    rows, unit = labeled
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        if r.keep:
            by_cluster.setdefault(r.cluster, []).append(r.vec_id)
    checked = 0
    for members in by_cluster.values():
        m = np.stack([unit[i] for i in members])
        sims = m @ m.T
        np.fill_diagonal(sims, 0.0)
        assert sims.max(initial=0.0) < THRESHOLD
        checked += len(members)
    assert checked > 0


def test_dropped_rows_certify_a_kept_near_duplicate(labeled):
    """Every dropped row's dup_of is a KEPT row in the SAME cluster with
    cosine >= threshold — the duplicate that covered it."""
    rows, unit = labeled
    kept = {(r.vec_id): r for r in rows if r.keep}
    dropped = [r for r in rows if not r.keep]
    assert dropped, "threshold chosen so the corpus actually prunes"
    for r in dropped:
        assert r.dup_of is not None
        cover = kept[r.dup_of]
        assert cover.cluster == r.cluster
        assert float(unit[r.vec_id] @ unit[r.dup_of]) >= THRESHOLD


def test_priority_rule_farthest_from_centroid_wins(labeled):
    """A dropped row's cover has priority over it: strictly smaller
    centroid_sim, or equal centroid_sim with a smaller id."""
    rows, _ = labeled
    info = {r.vec_id: r for r in rows}
    for r in rows:
        if r.keep:
            continue
        cover = info[r.dup_of]
        assert (cover.centroid_sim, cover.vec_id) < (r.centroid_sim, r.vec_id)


def test_deterministic_across_runs(spark, sf_dir, labeled):
    rows, _ = labeled
    e = table(spark, sf_dir, "embeddings")
    again = semantic_dedup(
        e.repartition(7), "vec_id", "embedding", k=K, threshold=THRESHOLD, seed=SEED
    ).collect()
    key = lambda r: r.vec_id  # noqa: E731
    assert sorted(map(tuple, again), key=lambda t: t[0]) == sorted(
        map(tuple, rows), key=lambda t: t[0]
    )


def test_planted_exact_duplicates_keep_one_survivor(spark):
    """Exact duplicate vectors always share a cluster; exactly one per
    duplicate group survives and the others point at it."""
    base = np.eye(4, dtype=np.float64)
    rows = []
    vid = 0
    for g in range(4):  # 4 groups x 5 exact copies
        for _ in range(5):
            rows.append((vid, (base[g] + 0.001 * g).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, "vec_id", "embedding", k=4, threshold=0.999, seed=1
    ).collect()
    kept = [r for r in out if r.keep]
    assert len(kept) == 4
    for r in out:
        if not r.keep:
            assert r.dup_of in {k.vec_id for k in kept}


def test_shard_guard_bounds_group_size_and_stays_deterministic(spark):
    """With max_cluster below the natural cluster size, groups split by
    id mod n_shards; output is still one verdict per row, deterministic,
    and kept rows within a (cluster, shard) stay pairwise-dissimilar."""
    rng = np.random.RandomState(3)
    vecs = rng.randn(240, 8)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(240)],
        "vec_id long, embedding array<double>",
    )
    a = semantic_dedup(
        df, "vec_id", "embedding", k=2, threshold=0.6, seed=2, max_cluster=50
    ).collect()
    b = semantic_dedup(
        df.repartition(5), "vec_id", "embedding",
        k=2, threshold=0.6, seed=2, max_cluster=50,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 240 and len({r.vec_id for r in a}) == 240


def test_survivors_join_returns_original_columns(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    surv = semdedup_survivors(
        e, "vec_id", "embedding", k=K, threshold=THRESHOLD, seed=SEED
    )
    assert set(surv.columns) == {
        "vec_id", "embedding", "label", "cluster", "centroid_sim"
    }
    n_all = e.count()
    n_surv = surv.count()
    assert 0 < n_surv < n_all
