"""Quality tests for the approximate / non-oracle operators (the ◇ side of
SURVEY.md §2.9): recall vs exact ground truth, determinism, and mechanism
tests on constructed inputs where the fixture data carries no signal."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import shingles, tokens
from wikistream_lakehouse_spark.functions.vectors import cosine
from wikistream_lakehouse_spark.operators.langid import (
    build_language_profiles,
    predict_language,
)
from wikistream_lakehouse_spark.operators.minhash import minhash_near_duplicates
from wikistream_lakehouse_spark.operators.simhash import add_simhash, simhash_near_duplicates
from wikistream_lakehouse_spark.queries.similarity import N_QUERIES, TOP_K, ann_candidates
from wikistream_lakehouse_spark.tables import table


def _exact_jaccard_pairs(spark, sf_dir, threshold):
    d = table(spark, sf_dir, "documents")
    sh = (
        d.withColumn("s", shingles(tokens(F.col("text")), k=3))
        .filter(F.size("s") > 0)
        .select("doc_id", "s")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    jacc = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", jacc)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def test_minhash_recall_and_precision(spark, sf_dir):
    """High-similarity pairs (jaccard >= 0.8) must be found by LSH with
    b=8,r=4 (capture prob ≈ 1-(1-0.8^4)^8 ≈ 0.985 per pair); reported
    pairs are exact-verified so precision vs its threshold is 1.0."""
    truth = {
        (r.id_a, r.id_b)
        for r in _exact_jaccard_pairs(spark, sf_dir, 0.8).collect()
    }
    assert len(truth) >= 3, "fixture corpus should contain near-dups"
    found = minhash_near_duplicates(
        table(spark, sf_dir, "documents"), threshold=0.35
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in found.collect()}
    hit = sum(1 for p in truth if p in got)
    assert hit / len(truth) >= 0.9, f"recall {hit}/{len(truth)} too low"
    assert all(j >= 0.35 for j in got.values())


def test_lsh_band_stats_deterministic_and_consistent(spark, sf_dir):
    """The band-join work metric (VERDICT r7 next #6) is a pure function
    of (corpus, hash params): two independent computations must agree
    EXACTLY, and its raw kept-pair count must upper-bound the distinct
    candidate-pair count the join actually emits. This is the invariant
    that lets SCALING.md treat candidate volume as the stable metric
    behind the noisy band-join wall-clock ratio."""
    from wikistream_lakehouse_spark.operators.minhash import (
        exploded_shingle_hashes,
        lsh_band_stats,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = table(spark, sf_dir, "documents")
    ex = exploded_shingle_hashes(d, "text", "doc_id", distinct=False)
    sig = minhash_signatures(ex, "doc_id")
    s1 = lsh_band_stats(sig).collect()[0].asDict()
    s2 = lsh_band_stats(sig).collect()[0].asDict()
    assert s1 == s2, "work metric must be capture-invariant"
    n_docs = d.filter(F.size(tokens(F.col("text"))) >= 3).count()
    assert s1["n_docs"] == n_docs  # band 0 counts every shingled doc once
    assert s1["max_bucket_size"] <= n_docs
    distinct_pairs = lsh_candidate_pairs(sig).count()
    # kept raw pairs (Σ n·(n−1)/2 over uncapped buckets, all 8 bands)
    # bound the distinct pairs the join emits after dedup
    assert 0 < distinct_pairs <= s1["raw_pairs_kept"]
    assert s1["raw_pairs_dropped"] == 0 or s1["capped_buckets"] > 0


def test_simhash_identical_docs_have_zero_distance(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy cat again and again"),
        (4, "completely different text about spark shuffles and partitions"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.hamming_dist
        for r in simhash_near_duplicates(df, max_hamming=10).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical → distance 0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0  # near-dup → small distance
    assert (1, 4) not in pairs  # unrelated → beyond radius


def test_simhash_degenerate_bucket_guard(spark):
    """The max_bucket guard (VERDICT r12 #1, the simhash twin of
    minhash's): a boilerplate cohort larger than the cap collapses onto
    shared chunk buckets — the guard drops those buckets BEFORE the
    self-join (no O(bucket\u00b2) blowup), losing exactly the pairs whose
    every agreeing chunk is capped, while pairs with an uncapped
    agreeing chunk keep pigeonhole-exact recall."""
    from wikistream_lakehouse_spark.operators.simhash import (
        add_simhash,
        simhash_band_stats,
        simhash_candidate_pairs,
    )

    boiler = [(i, "identical boilerplate text repeated across the corpus")
              for i in range(20)]
    rows = boiler + [
        (100, "the quick brown fox jumps over the lazy dog again and again"),
        (101, "the quick brown fox jumps over the lazy cat again and again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = add_simhash(df).select(F.col("doc_id").alias("doc"), "simhash")
    capped = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(sig, max_hamming=3, max_bucket=10).collect()
    }
    # the 20-doc boilerplate cohort (190 hamming-0 pairs) is dropped —
    # exact-dedup territory; the distinct near-dup pair survives (its
    # chunks are its own buckets of size 2, under the cap)
    assert all(a >= 100 for a, b in capped), f"boilerplate leaked: {capped}"
    assert (100, 101) in capped
    # conservation accounting agrees with the shared banding
    st = simhash_band_stats(sig, max_hamming=3, max_bucket=10).collect()[0].asDict()
    assert st["n_docs"] == 22
    assert st["capped_buckets"] >= 1 and st["raw_pairs_dropped"] >= 190
    assert len(capped) <= st["raw_pairs_kept"]
    # uncapped, the same corpus returns the full cohort (guard is the
    # ONLY difference — pigeonhole recall is otherwise exact)
    full = {
        (r.id_a, r.id_b)
        for r in simhash_candidate_pairs(sig, max_hamming=3, max_bucket=1000).collect()
    }
    assert capped <= full and len(full) == len(capped) + 190


def test_simhash_deterministic(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(50)
    a = {r.doc_id: r.simhash for r in add_simhash(d).select("doc_id", "simhash").collect()}
    b = {r.doc_id: r.simhash for r in add_simhash(d).select("doc_id", "simhash").collect()}
    assert a == b


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    """Multi-table LSH recall of the brute-force top-k. The fixture
    embeddings are uniformly random (best cos ≈ 0.35, p ≈ 0.61/plane) —
    expected per-pair capture ≈ 1-(1-0.61^4)^8 ≈ 0.69; assert a safe
    floor well above bucket-join-is-broken territory."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    bf = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )
    truth = {(r.query_id, r.neighbor_id) for r in bf.collect()}
    cand = {
        (r.query_id, r.neighbor_id) for r in ann_candidates(e).collect()
    }
    recall = len(truth & cand) / len(truth)
    assert recall >= 0.4, f"LSH candidate recall {recall:.2f} too low"


def test_langid_on_scripted_data(spark):
    """On text with a real script signal the bigram classifier is exact."""
    en = [(i, "the cat sat on the mat and the dog ran off", "en") for i in range(10)]
    zz = [(i + 10, "zyx wvu zyx qpr zyx wvu zyx qpr zyx wvu", "zz") for i in range(10)]
    df = spark.createDataFrame(en + zz, "doc_id long, text string, lang string")
    profiles = build_language_profiles(df)
    preds = predict_language(df, profiles)
    joined = df.join(preds, "doc_id")
    acc = joined.filter(F.col("lang") == F.col("predicted_lang")).count() / 20
    assert acc == 1.0


def test_approx_distinct_within_tolerance(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    exact = e.agg(F.countDistinct("user_id")).collect()[0][0]
    approx = e.agg(F.approx_count_distinct("user_id", 0.02)).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.05


def test_media_features_deterministic_and_sane(spark, sf_dir):
    from wikistream_lakehouse_spark.queries import all_queries

    q = all_queries()["media_features"]
    rows = q.build(spark, sf_dir).collect()
    assert all(r.decoded for r in rows)
    assert all(0.0 <= r.byte_entropy <= 8.0 for r in rows)
    assert all(r.size_bytes > 0 for r in rows)
    again = q.build(spark, sf_dir).collect()
    assert rows == again


def test_media_real_codec_is_explicit_stub(spark, sf_dir):
    import pytest

    from wikistream_lakehouse_spark.operators.multimodal import real_decode

    with pytest.raises(NotImplementedError):
        real_decode(b"xx", "image", "png")


def test_mllib_minhash_agrees_with_custom(spark, sf_dir):
    """The pyspark.ml MinHashLSH similarity join and the hand-rolled
    minhash pipeline must surface the same high-similarity pairs."""
    from wikistream_lakehouse_spark.operators.ml_lsh import minhash_lsh_similarity_join

    d = table(spark, sf_dir, "documents")
    custom = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(d, threshold=0.6).collect()
    }
    ml = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_similarity_join(d, max_jaccard_distance=0.4).collect()
    }
    assert custom, "expected some near-dup pairs at jaccard >= 0.6"
    overlap = len(custom & ml) / len(custom)
    assert overlap >= 0.9, f"ML/custom pair overlap {overlap:.2f} too low"


def test_brp_lsh_matches_cosine_on_normalized_vectors(spark, sf_dir):
    """BucketedRandomProjectionLSH euclidean top-k over L2-normalized
    vectors ≈ cosine top-k (identical ordering in exact form)."""
    from wikistream_lakehouse_spark.functions.vectors import l2_norm
    from wikistream_lakehouse_spark.operators.ml_lsh import brp_lsh_neighbors

    e = table(spark, sf_dir, "embeddings")
    norm = e.select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: x / l2_norm(F.col("embedding")),
        ).alias("embedding"),
    )
    got = brp_lsh_neighbors(norm, query_ids=[0, 1], k=3, num_hash_tables=10)
    rows = got.collect()
    assert {r.query_id for r in rows} == {0, 1}
    # exact cosine top-3 for query 0 (brute force on the same normalized set)
    q = norm.filter(F.col("vec_id") == 0).head().embedding
    scored = norm.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                "embedding", F.array(*[F.lit(float(x)) for x in q]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("cos"),
    )
    truth = [r.vec_id for r in scored.orderBy(F.desc("cos"), "vec_id").limit(3).collect()]
    got0 = [r.neighbor_id for r in rows if r.query_id == 0]
    assert len(set(truth) & set(got0)) >= 1  # approximate — some overlap required


def test_ivf_topk_recall_and_determinism(spark, sf_dir):
    """X3 second scale path: IVF (k-means inverted lists + n_probe) must
    recover most of the brute-force top-k, and be run-to-run identical
    (seedless deterministic init + fixed iterations)."""
    from wikistream_lakehouse_spark.queries import all_queries

    qs = all_queries()
    truth: dict[int, set] = {}
    for r in qs["cosine_topk_bruteforce"].build(spark, sf_dir).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    first = qs["ann_ivf_topk"].build(spark, sf_dir).collect()
    got: dict[int, set] = {}
    for r in first:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    # fixture embeddings are near-uniform on the sphere, so recall at a
    # 25% scan fraction is bounded by the data, not the operator — the
    # seed-swept floor + clustered-data ≥0.85 certification live in
    # tests/test_ivf_index.py
    assert sum(recalls) / len(recalls) >= 0.6
    assert min(recalls) >= 0.4
    second = qs["ann_ivf_topk"].build(spark, sf_dir).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))


def test_exact_group_quantiles_matches_builtin_percentile(spark):
    """Distributed two-pass exact quantiles ≡ Spark's buffering
    `percentile` aggregate, on adversarial shapes: skewed group sizes,
    heavy duplicates, NULLs, a single-row group, negative values."""
    import random

    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.operators.quantiles import exact_group_quantiles

    rng = random.Random(7)
    rows = []
    for i in range(2000):
        rows.append(("big", float(rng.randint(-50, 50))))  # duplicates galore
    for i in range(37):
        rows.append(("mid", rng.uniform(-1e6, 1e6)))
    rows.append(("one", 42.5))
    rows += [("withnull", float(i)) for i in range(10)] + [("withnull", None)] * 3
    df = spark.createDataFrame(rows, "g string, v double").repartition(7)

    probs = [0.0, 0.25, 0.5, 0.731, 1.0]
    got = {
        (r.g, r.q): r.quantile
        for r in exact_group_quantiles(df, "v", ["g"], probs).collect()
    }
    ref = {
        r.g: r.p
        for r in df.groupBy("g")
        .agg(F.expr(f"percentile(v, array({','.join(map(str, probs))}))").alias("p"))
        .collect()
    }
    assert len(got) == 4 * len(probs)
    for g, pcts in ref.items():
        for q, expected in zip(probs, pcts):
            assert got[(g, q)] == pytest.approx(expected, abs=1e-9), (g, q)


def test_approx_percentile_certified_within_tolerance(spark, sf_dir):
    """J9 scale face: percentile_approx (the 100 TB path) must land within
    1% relative error of the exact distributed quantiles on real data."""
    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.operators.quantiles import exact_group_quantiles
    from wikistream_lakehouse_spark.tables import table

    l = table(spark, sf_dir, "lineitem")
    exact = {
        (r.l_returnflag, r.q): r.quantile
        for r in exact_group_quantiles(
            l, "l_extendedprice", ["l_returnflag"], [0.25, 0.5, 0.75]
        ).collect()
    }
    approx = {
        r.l_returnflag: r.p
        for r in l.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), 10000
            ).alias("p")
        )
        .collect()
    }
    for (flag, q), ev in exact.items():
        av = approx[flag][[0.25, 0.5, 0.75].index(q)]
        assert abs(av - ev) / abs(ev) < 0.01, (flag, q, av, ev)


def test_connected_components_known_graph(spark):
    from wikistream_lakehouse_spark.operators.components import connected_components

    # components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (triangle)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    cc = {r.node: r.component for r in connected_components(pairs).collect()}
    assert {cc[n] for n in (1, 2, 3, 4)} == {1}
    assert {cc[n] for n in (10, 11)} == {10}
    assert {cc[n] for n in (20, 21, 22)} == {20}


def test_connected_components_nonconvergence_is_loud(spark):
    """A component whose diameter exceeds max_iterations must not return
    silently-split labels: strict=True raises, strict=False warns."""
    import pytest

    from wikistream_lakehouse_spark.operators.components import connected_components

    # 12-node path graph: min label needs ~11 rounds to reach the far end
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iterations=3)
    with pytest.warns(RuntimeWarning, match="did not converge"):
        connected_components(chain, max_iterations=3, strict=False)
    # and with enough rounds the same graph closes into one component
    cc = {r.node: r.component for r in connected_components(chain).collect()}
    assert set(cc.values()) == {0}


def test_canonical_documents_keep_drop(spark):
    from wikistream_lakehouse_spark.operators.components import canonical_documents

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {r.doc_id: (r.component, r.is_canonical) for r in canonical_documents(docs, pairs).collect()}
    assert out[0] == (0, True)   # cluster {0,3,5} keeps 0
    assert out[3] == (0, False)
    assert out[5] == (0, False)
    assert out[1] == (1, True)   # singletons keep themselves
    assert out[2] == (2, True)
    assert out[4] == (4, True)


def test_resize_images_geometry_and_passthrough(spark, sf_dir):
    """Nearest-neighbor math on a constructed 4×4: target 2×2 must pick
    pixels (0,0),(0,2),(2,0),(2,2); non-images pass through untouched."""
    import numpy as np

    from wikistream_lakehouse_spark.operators.multimodal import resize_images

    arr = np.arange(16, dtype=np.uint8)  # 4×4 row-major: pixel value = index
    rows = [
        (1, bytes(arr.tobytes()), ("image", "raw", 4, 4, None, 16)),
        (2, b"\x01\x02\x03", ("audio", "raw", None, None, 300, 3)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,size_bytes:bigint>",
    )
    out = {r.doc_id: r for r in resize_images(df, 2, 2).collect()}
    got = np.frombuffer(bytes(out[1].payload), dtype=np.uint8)
    assert list(got) == [0, 2, 8, 10]  # rows 0,2 × cols 0,2
    assert (out[1].width, out[1].height) == (2, 2)
    assert (out[1].orig_width, out[1].orig_height) == (4, 4)
    assert bytes(out[2].payload) == b"\x01\x02\x03"  # non-image untouched
    assert out[2].width is None


def test_sample_frames_stride_and_counts(spark, sf_dir):
    """ceil(n_frames/stride) frames per video, correct indices, videos only."""
    from wikistream_lakehouse_spark.operators.multimodal import sample_frames

    payload = bytes(range(256)) * 9 + b"\x00" * 10  # 9 full frames + tail
    rows = [
        (1, payload, ("video", "raw", None, None, 1000, len(payload))),
        (2, payload, ("image", "raw", 3, 3, None, len(payload))),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, payload binary, meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:bigint,size_bytes:bigint>",
    )
    out = sample_frames(df, stride=3, frame_bytes=256).collect()
    assert {r.doc_id for r in out} == {1}  # image rows contribute nothing
    assert sorted(r.frame_idx for r in out) == [0, 3, 6, 9]  # 10 frames, stride 3
    full = [r for r in out if r.frame_idx == 0][0]
    assert len(bytes(full.frame)) == 256
    tail = [r for r in out if r.frame_idx == 9][0]
    assert len(bytes(tail.frame)) == 10  # short last frame kept, not padded


def test_media_frame_samples_query_deterministic(spark, sf_dir):
    from wikistream_lakehouse_spark.queries import all_queries

    q = all_queries()["media_frame_samples"]
    a = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    b = sorted(map(tuple, q.build(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_langid_default_prediction_without_overlap(spark):
    """r14 argmax-over-present-rows restructure: a document sharing NO
    bigram with any profile must still get the deterministic default
    (alphabetically-first profile language, overlap 0) — the verdict the
    r6-r13 doc×lang universe produced for all-zero rows."""
    labeled = spark.createDataFrame(
        [(0, "aaaa aaab aaba", "aa"), (1, "bbbb bbba bbab", "bb")],
        "doc_id long, text string, lang string",
    )
    profiles = build_language_profiles(labeled)
    target = spark.createDataFrame(
        [(10, "zzzz yyyy xxxx"), (11, "aaaa aaaa")],
        "doc_id long, text string",
    )
    preds = {r.doc_id: r for r in predict_language(target, profiles).collect()}
    assert preds[10].predicted_lang == "aa" and preds[10].overlap == 0
    assert preds[11].predicted_lang == "aa" and preds[11].overlap > 0
    # empty profile set -> no predictions at all (contract unchanged)
    empty = build_language_profiles(labeled.filter("doc_id < 0"))
    assert predict_language(target, empty).count() == 0
