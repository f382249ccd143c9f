"""Property-based spot checks (SURVEY.md §5.5, hypothesis): invariants
over randomized event batches — count conservation bronze→silver, dedup
idempotence, partition-sum consistency, MERGE convergence, minhash
estimate error bounds."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.silver import derive_event_time_columns

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime(2024, 1, 30, 22, 0, 0, tzinfo=timezone.utc)  # near a day boundary

event_batches = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # event_id (dups possible)
        st.integers(min_value=-3600 * 40, max_value=3600 * 40),  # ±40h around BASE
        st.one_of(st.none(), st.integers(min_value=0, max_value=5)),  # user
        st.sampled_from(["click", "view", "error"]),
    ),
    min_size=1,
    max_size=60,
)


def _df(spark, batch):
    rows = [
        (eid, BASE + timedelta(seconds=off), user, etype)
        for eid, off, user, etype in batch
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


@given(batch=event_batches)
@settings(**SETTINGS)
def test_event_time_derivation_conserves_rows_and_homes_correctly(spark, batch):
    """No row lost or re-dated by curation: count preserved, yyyy/mm/dd
    always equal the row's own event timestamp — across day boundaries,
    null users, duplicate ids."""
    df = _df(spark, batch)
    curated = derive_event_time_columns(df, "ts")
    assert curated.count() == len(batch)
    mismatch = curated.filter(
        (F.year("ts") != F.col("yyyy"))
        | (F.month("ts") != F.col("mm"))
        | (F.dayofmonth("ts") != F.col("dd"))
    ).count()
    assert mismatch == 0


@given(batch=event_batches)
@settings(**SETTINGS)
def test_dedup_idempotent_and_keyed(spark, batch):
    """dropDuplicates on the key: applying twice equals once; output keys
    are exactly the distinct input keys."""
    df = _df(spark, batch)
    once = df.dropDuplicates(["event_id"])
    twice = once.dropDuplicates(["event_id"])
    assert once.count() == twice.count()
    assert once.count() == df.select("event_id").distinct().count()


@given(batch=event_batches)
@settings(**SETTINGS)
def test_daily_counts_partition_sum_consistent(spark, batch):
    """Per-day counts sum to the total — the aggregation invariant behind
    every daily gold table."""
    df = _df(spark, batch)
    per_day = df.groupBy(F.to_date("ts").alias("d")).count()
    assert per_day.agg(F.sum("count")).collect()[0][0] == len(batch)


@given(
    target=st.dictionaries(
        st.integers(0, 20), st.integers(0, 100), min_size=1, max_size=10
    ),
    source=st.dictionaries(
        st.integers(0, 20), st.integers(0, 100), min_size=1, max_size=10
    ),
)
@settings(**SETTINGS)
def test_merge_converges_to_source_over_target(spark, tmp_path_factory, target, source):
    """MERGE state law: result = source ∪ (target − source-keys); applying
    the same merge again changes nothing."""
    from wikistream_lakehouse_spark.lakehouse.merge import upsert_parquet

    path = str(tmp_path_factory.mktemp("merge") / "t")
    tdf = spark.createDataFrame(list(target.items()), "k long, v long")
    sdf = spark.createDataFrame(list(source.items()), "k long, v long")
    upsert_parquet(spark, path, tdf, keys=["k"])
    upsert_parquet(spark, path, sdf, keys=["k"])
    expected = {**target, **source}
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == expected
    upsert_parquet(spark, path, sdf, keys=["k"])
    assert {r.k: r.v for r in spark.read.parquet(path).collect()} == expected


@given(
    a=st.lists(st.sampled_from("abcdefgh"), min_size=8, max_size=40),
    b=st.lists(st.sampled_from("abcdefgh"), min_size=8, max_size=40),
)
@settings(**SETTINGS)
def test_minhash_estimates_jaccard(spark, a, b):
    """Signature agreement ≈ true shingle Jaccard within 4σ of the
    binomial bound for 32 hashes (σ = √(j(1−j)/32) ≤ 0.0884)."""
    from wikistream_lakehouse_spark.operators.minhash import (
        exploded_shingle_hashes,
        minhash_signatures,
    )

    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id long, text string"
    )
    ex = exploded_shingle_hashes(df)
    rows = {1: set(), 2: set()}
    for r in ex.collect():
        rows[r.doc_id].add(r.sh)
    if not rows[1] or not rows[2]:
        return
    true_j = len(rows[1] & rows[2]) / len(rows[1] | rows[2])
    sigs = {r.doc_id: r.minhash for r in minhash_signatures(ex).collect()}
    est = sum(1 for x, y in zip(sigs[1], sigs[2]) if x == y) / 32
    assert abs(est - true_j) <= 4 * 0.0884 + 1e-9


@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=25
    ),
)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join law: for every left row, the matched right row is the one
    with max(right_ts) among right_ts <= left_ts in the same key — checked
    against a brute-force join+argmax reference."""
    from wikistream_lakehouse_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(lefts)],
        "lid long, k long, lts timestamp",
    )
    rdf = spark.createDataFrame(
        [(1000 + i, k, BASE + timedelta(seconds=s)) for i, (k, s) in enumerate(rights)],
        "rid long, k long, rts timestamp",
    )
    got = {
        r.lid: r.rts
        for r in asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts").collect()
    }
    brute = (
        ldf.join(rdf.withColumnRenamed("k", "k2"),
                 (F.col("k") == F.col("k2")) & (F.col("rts") <= F.col("lts")), "left")
        .groupBy("lid")
        .agg(F.max("rts").alias("best_rts"))
    )
    expected = {r.lid: r.best_rts for r in brute.collect()}
    assert got == expected


# --- sequence packing: invariants over random token-count batches -----------

pack_batches = st.lists(
    st.integers(min_value=1, max_value=900),  # token counts incl. oversize
    min_size=1,
    max_size=80,
)


@given(counts=pack_batches, budget=st.sampled_from([64, 128, 512]))
@settings(**SETTINGS)
def test_pack_bucket_invariants(counts, budget):
    """The per-bucket packer (pure pandas, the unit under applyInPandas):
    every doc assigned exactly once, budget never exceeded, oversize iff
    doc alone exceeds budget, and FFD never uses more packs than docs."""
    import pandas as pd

    from wikistream_lakehouse_spark.operators.packing import _pack_bucket

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(counts)),
            "n_tokens": counts,
            "bucket": 7,
            "max_tokens": budget,
        }
    )
    out = _pack_bucket(pdf)
    assert sorted(out["doc_id"]) == list(range(len(counts)))
    regular = out[~out["oversize"]]
    if len(regular):
        assert regular.groupby("pack_id")["n_tokens"].sum().max() <= budget
    for row in out.itertuples():
        assert row.oversize == (counts[row.doc_id] > budget)
    n_packs = out["pack_id"].nunique()
    assert n_packs <= len(counts)
    # lower bound: can't beat ceil(total/budget) for non-oversize docs
    total = int(regular["n_tokens"].sum())
    if total:
        assert regular["pack_id"].nunique() >= -(-total // budget)


@given(
    fracs=st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False), min_size=2, max_size=5
    )
)
@settings(**SETTINGS)
def test_hash_split_thresholds_monotone(fracs):
    """Cumulative split thresholds are strictly ordered hex strings —
    the CASE arms can never shadow each other."""
    from wikistream_lakehouse_spark.operators.sampling import fraction_threshold

    total = sum(fracs)
    cum, prev = 0.0, ""
    for f in fracs[:-1]:
        cum += f / total
        thr = fraction_threshold(min(cum, 1.0))
        assert thr > prev
        prev = thr


# --- span-level exact-substring dedup vs brute force ------------------------
_SPAN_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]

span_corpora = st.lists(
    st.lists(st.sampled_from(_SPAN_VOCAB), min_size=0, max_size=12),
    min_size=2,
    max_size=6,
)


def _ref_span_coverage(token_docs, k):
    """Brute force: union of covered token indices per doc — equals the
    islands sum exactly iff the merge is correct."""
    owners: dict[tuple, set] = {}
    for i, t in enumerate(token_docs):
        for p in range(len(t) - k + 1):
            owners.setdefault(tuple(t[p : p + k]), set()).add(i)
    out = {}
    for i, t in enumerate(token_docs):
        covered = set()
        for p in range(len(t) - k + 1):
            if len(owners[tuple(t[p : p + k])]) >= 2:
                covered.update(range(p, p + k))
        if covered:
            out[i] = (len(t), len(covered))
    return out


@given(corpus=span_corpora)
@settings(**SETTINGS)
def test_span_coverage_matches_brute_force(spark, corpus):
    """Distributed islands-merged coverage equals the brute-force union
    of covered token positions, on tiny-vocab corpora engineered to hit
    overlapping, adjacent, nested, and intra-doc-only span collisions."""
    from wikistream_lakehouse_spark.operators.spans import (
        duplicated_span_coverage,
    )

    k = 3
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(corpus)],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.total_tokens, r.dup_tokens)
        for r in duplicated_span_coverage(df, k=k).collect()
    }
    assert got == _ref_span_coverage(corpus, k)
