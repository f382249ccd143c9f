"""Misra-Gries heavy hitters: the mergeable-summary guarantees
(superset of true heavy items, N/(k+1) undercount bound) re-derived
against exact counts across partitionings, and the two-scan operator's
output pinned EQUAL to the plain GROUP BY answer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.heavyhitters import (
    heavy_hitters,
    mg_candidates,
)


def _zipf_df(spark, n=20_000, vocab=2_000, seed=11, parts=8):
    rng = np.random.RandomState(seed)
    items = [f"w{z}" for z in rng.zipf(1.3, n) % vocab]
    return spark.createDataFrame(
        [(x,) for x in items], "item string"
    ).repartition(parts), items


@pytest.mark.parametrize("parts", [1, 5, 32])
def test_candidates_superset_of_true_heavy_items(spark, parts):
    df, items = _zipf_df(spark, parts=parts)
    k = 64
    n = len(items)
    from collections import Counter

    true = Counter(items)
    cand = {r.item for r in mg_candidates(df, "item", k).collect()}
    must_have = {i for i, c in true.items() if c > n / (k + 1)}
    assert must_have, "zipf corpus must actually have heavy items"
    assert must_have <= cand


def test_merged_weights_within_undercount_bound(spark):
    df, items = _zipf_df(spark, parts=7)
    k = 64
    n = len(items)
    from collections import Counter

    true = Counter(items)
    got = {
        r.item: r.weight for r in mg_candidates(df, "item", k).collect()
    }
    for item, w in got.items():
        assert w <= true[item], "MG weight must never overcount"
        assert w >= true[item] - n / (k + 1) - 1e-9


@pytest.mark.parametrize("parts", [2, 16])
def test_heavy_hitters_equals_exact_group_by(spark, parts):
    df, items = _zipf_df(spark, parts=parts, seed=3)
    share = 0.01
    got = sorted(
        (r.item, r.cnt) for r in heavy_hitters(df, "item", share).collect()
    )
    n = len(items)
    from collections import Counter

    expected = sorted(
        (i, c) for i, c in Counter(items).items() if c / n > share
    )
    assert got == expected


def test_nulls_ignored_and_bad_args_refused(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], "item string"
    )
    out = heavy_hitters(df, "item", 0.5).collect()
    assert [(r.item, r.cnt) for r in out] == [("a", 2)]  # 2/3 > 0.5
    with pytest.raises(ValueError, match="min_share"):
        heavy_hitters(df, "item", 1.5)
    with pytest.raises(ValueError, match="k must"):
        mg_candidates(df, "item", 0).collect()


# ---- streaming twin: MG state maintained across micro-batches ---------
def test_streaming_frequent_items_state_spans_batches(spark, tmp_path):
    """Two single-file micro-batches: the second trigger's summaries
    must reflect BOTH batches' counts (state carried), and the union of
    final bucket summaries must contain every globally heavy item."""
    import json as _json

    from pyspark.sql import types as T

    from wikistream_lakehouse_spark.streaming.stateful import (
        streaming_frequent_items,
    )

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: 30x 'hot', few others; batch 2: 25x 'hot', 20x 'warm'
    with open(src / "a.json", "w") as f:
        for tok in ["hot"] * 30 + ["x1", "x2", "x3"]:
            f.write(_json.dumps({"tok": tok}) + "\n")
    with open(src / "b.json", "w") as f:
        for tok in ["hot"] * 25 + ["warm"] * 20 + ["x4"]:
            f.write(_json.dumps({"tok": tok}) + "\n")

    schema = T.StructType([T.StructField("tok", T.StringType())])
    stream = (
        spark.readStream.format("json")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = streaming_frequent_items(stream, "tok", k=4, n_buckets=2)
    q = (
        out.writeStream.format("memory")
        .queryName("freq_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM freq_t").collect()
    assert rows, "stateful stream emitted nothing"
    # latest summary per (bucket, item): memory sink appends update-mode
    # rows per trigger, so take the max bucket_n per bucket as 'latest'
    latest_n = {}
    for r in rows:
        latest_n[r.bucket] = max(latest_n.get(r.bucket, 0), r.bucket_n)
    final = {
        r.item: r.weight
        for r in rows
        if r.bucket_n == latest_n[r.bucket]
    }
    # 'hot' spans both batches: its final weight must exceed any single
    # batch's count (state carried across triggers), 'warm' is present
    assert final.get("hot", 0) > 30
    assert "warm" in final
    # per-bucket processed counts sum to the full stream
    assert sum(latest_n.values()) == 79
