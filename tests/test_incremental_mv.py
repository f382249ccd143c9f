"""Incremental materialized-view maintenance (lakehouse/incremental.py):
the invariant under test is EQUIVALENCE — after any sequence of source
appends (+ compactions) and refreshes, the incrementally-folded view
must equal a from-scratch full aggregate of the current source
snapshot.  Plus: idempotence (no-delta refresh commits nothing),
exactly-once under racing refreshers, and the honest failure modes
(spec drift, mutating source commits)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn
from wikistream_lakehouse_spark.lakehouse.incremental import (
    incremental_avg_view,
    refresh_aggregate,
    view_lag,
)

MEASURES = {
    "n_events": ("count", "user"),
    "total_qty": ("sum", "qty"),
    "min_qty": ("min", "qty"),
    "max_qty": ("max", "qty"),
}


def _src_df(spark, rows):
    return spark.createDataFrame(rows, "day string, user string, qty long")


def _full_recompute(spark, src):
    return (
        txn.read_table(spark, src)
        .groupBy("day")
        .agg(
            F.count("user").alias("n_events"),
            F.sum("qty").alias("total_qty"),
            F.min("qty").alias("min_qty"),
            F.max("qty").alias("max_qty"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_refresh_matches_full_recompute_across_appends(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    batches = [
        [("d1", "a", 5), ("d1", "b", 3), ("d2", "a", 7)],
        [("d1", "c", 1), ("d3", "a", 9)],  # new group d3
        [("d2", "b", 2), ("d2", "c", 11), ("d3", "b", 0)],
    ]
    for batch in batches:
        txn.append(_src_df(spark, batch), src)
        v = refresh_aggregate(spark, src, view, ["day"], MEASURES)
        assert v is not None
        assert _rows(txn.read_table(spark, view)) == _rows(
            _full_recompute(spark, src)
        )
    # three refreshes, three view versions (0, 1, 2), lag zero
    assert txn.current_version(view) == 2
    assert view_lag(src, view) == 0


def test_noop_refresh_commits_nothing(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 1)]), src)
    assert refresh_aggregate(spark, src, view, ["day"], MEASURES) == 0
    before = txn.current_version(view)
    assert refresh_aggregate(spark, src, view, ["day"], MEASURES) is None
    assert txn.current_version(view) == before


def test_lagged_refresh_folds_multiple_source_versions(spark, tmp_path):
    """A consumer that falls behind N source commits catches up in ONE
    delta read covering all of them."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 1)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    for i in range(4):
        txn.append(_src_df(spark, [("d1", "x", i), ("d2", "y", i)]), src)
    assert view_lag(src, view) == 4
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    assert view_lag(src, view) == 0
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))


def test_refresh_survives_source_compaction(spark, tmp_path):
    """compact rewrites already-delivered rows; the change feed skips it,
    so a refresh across a compaction neither double-counts nor loses."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    txn.append(_src_df(spark, [("d1", "b", 7), ("d2", "a", 2)]), src)
    txn.compact(spark, src)
    txn.append(_src_df(spark, [("d2", "b", 4)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))


def test_spec_drift_refused(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 1)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    txn.append(_src_df(spark, [("d1", "b", 2)]), src)
    with pytest.raises(ValueError, match="different spec"):
        refresh_aggregate(
            spark, src, view, ["day"], {"n_events": ("count", "user")}
        )


def test_holistic_measures_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="re-mergeable"):
        refresh_aggregate(
            spark,
            str(tmp_path / "src"),
            str(tmp_path / "view"),
            ["day"],
            {"users": ("count_distinct", "user")},
        )


def test_mutating_source_commit_rebuilds_by_default(spark, tmp_path):
    """An upsert on the source is not an append — its row-level delta is
    unrecoverable from a file-granular log. The refresh must never
    mis-fold: the default falls back to a FULL re-aggregate (correct,
    just not incremental for that step); ``on_mutation='error'`` keeps
    the old refusal for callers that must never pay a full scan."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 1)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    txn.transactional_upsert(
        spark, src, _src_df(spark, [("d1", "a", 99)]), keys=["day", "user"]
    )
    with pytest.raises(ValueError, match="content-changing"):
        refresh_aggregate(
            spark, src, view, ["day"], MEASURES, on_mutation="error"
        )
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))
    # and refreshes are incremental again after the rebuild step
    txn.append(_src_df(spark, [("d2", "c", 4)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))


def test_dv_delete_on_source_rebuilds_correctly(spark, tmp_path):
    """A deletion-vector DELETE is content-changing without touching any
    data file — the rebuild fallback must still see the post-delete rows
    (i.e. read through the DV-aware snapshot)."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(
        _src_df(spark, [("d1", "a", 1), ("d1", "b", 10), ("d2", "c", 7)]), src
    )
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    txn.delete_where(spark, src, "qty >= 7", mode="mor")
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    got = _rows(txn.read_table(spark, view))
    assert got == _rows(_full_recompute(spark, src))
    # d2 vanished entirely; d1 lost its qty-10 row from every measure
    assert got == [("d1", 1, 1, 1, 1)]


def test_racing_refreshers_apply_each_delta_exactly_once(spark, tmp_path):
    """Two refreshers fired concurrently after the same source append:
    offset and fold commit atomically, so whatever interleaving wins,
    the final view equals the full recompute (no double-fold)."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5), ("d2", "b", 3)]), src)
    refresh_aggregate(spark, src, view, ["day"], MEASURES)
    txn.append(_src_df(spark, [("d1", "c", 7), ("d3", "d", 1)]), src)

    errs: list[Exception] = []

    def go():
        try:
            refresh_aggregate(spark, src, view, ["day"], MEASURES, max_retries=10)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=go) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))


def test_racing_first_builds_converge(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5), ("d2", "b", 3)]), src)

    errs: list[Exception] = []

    def go():
        try:
            refresh_aggregate(spark, src, view, ["day"], MEASURES, max_retries=10)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    ts = [threading.Thread(target=go) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert _rows(txn.read_table(spark, view)) == _rows(_full_recompute(spark, src))


def test_avg_decomposition(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "avg_view")
    txn.append(_src_df(spark, [("d1", "a", 4), ("d1", "b", 8), ("d2", "a", 5)]), src)
    out = incremental_avg_view(spark, src, view, ["day"], "qty")
    got = {r["day"]: r["mv_avg"] for r in out.collect()}
    assert got == {"d1": 6.0, "d2": 5.0}
    txn.append(_src_df(spark, [("d1", "c", 12)]), src)
    out = incremental_avg_view(spark, src, view, ["day"], "qty")
    got = {r["day"]: r["mv_avg"] for r in out.collect()}
    assert got == {"d1": 8.0, "d2": 5.0}


def test_wiki_serving_view_tracks_streaming_bronze(spark, tmp_path):
    """The reference's serving aggregate (upsert_athena_aggregates.py:
    39-50) as an incremental view directly over the streaming txn
    bronze: each stream pulse appends commits, each refresh folds only
    those commits, and the view always equals the full bot-excluded
    (dt, username) recompute — computed group keys (epoch→date) and the
    row-local bot filter included."""
    from wikistream_lakehouse_spark.streaming.wiki_pipeline import (
        ingest_wiki_stream_txn,
        serve_daily_editors_incremental,
    )

    from tests.test_streaming import wiki_event, write_ndjson

    src = tmp_path / "src"
    bronze = str(tmp_path / "bronze")
    view = str(tmp_path / "serving_view")
    ckpt = str(tmp_path / "ckpt")

    write_ndjson(
        src / "b1.json",
        [wiki_event(i) for i in range(20)]
        + [wiki_event(100 + i, user="bot9000", bot=True) for i in range(5)],
    )
    ingest_wiki_stream_txn(spark, str(src), bronze, ckpt).awaitTermination(300)
    assert serve_daily_editors_incremental(spark, bronze, view) is not None

    write_ndjson(
        src / "b2.json", [wiki_event(200 + i, user="bob") for i in range(15)]
    )
    ingest_wiki_stream_txn(spark, str(src), bronze, ckpt).awaitTermination(300)
    assert serve_daily_editors_incremental(spark, bronze, view) is not None
    # re-run with nothing new: no commit
    assert serve_daily_editors_incremental(spark, bronze, view) is None

    expected = (
        txn.read_table(spark, bronze)
        .filter(~F.coalesce(F.col("bot"), F.lit(False)))
        .groupBy(
            F.to_date(F.to_timestamp(F.from_unixtime("timestamp"))).alias("dt"),
            F.col("user").alias("username"),
        )
        .agg(F.count(F.lit(1)).alias("edits"))
    )
    assert _rows(txn.read_table(spark, view)) == _rows(expected)
    got = {r["username"]: r["edits"] for r in txn.read_table(spark, view).collect()}
    assert got == {"alice": 20, "bob": 15}  # bots never reach the view


def test_streaming_sink_maintains_view_per_microbatch(spark, tmp_path):
    """maintain_views on the exactly-once txn sink: the serving view is
    current after every stream pulse WITHOUT any batch job, and a full
    replay from a lost checkpoint (every batch skipped as a true replay)
    leaves it unchanged."""
    from wikistream_lakehouse_spark.streaming.wiki_pipeline import (
        ingest_wiki_stream_txn,
        wiki_serving_view_spec,
    )

    from tests.test_streaming import wiki_event, write_ndjson

    src = tmp_path / "src"
    bronze = str(tmp_path / "bronze")
    view = str(tmp_path / "serving_view")
    spec = wiki_serving_view_spec(view)

    write_ndjson(src / "b1.json", [wiki_event(i) for i in range(10)])
    ingest_wiki_stream_txn(
        spark, str(src), bronze, str(tmp_path / "ck1"), maintain_views=[spec]
    ).awaitTermination(300)
    assert view_lag(bronze, view) == 0
    assert {r["username"]: r["edits"] for r in txn.read_table(spark, view).collect()} == {
        "alice": 10
    }

    write_ndjson(src / "b2.json", [wiki_event(50 + i, user="bob") for i in range(7)])
    ingest_wiki_stream_txn(
        spark, str(src), bronze, str(tmp_path / "ck1"), maintain_views=[spec]
    ).awaitTermination(300)
    assert view_lag(bronze, view) == 0
    state = {r["username"]: r["edits"] for r in txn.read_table(spark, view).collect()}
    assert state == {"alice": 10, "bob": 7}

    # lost checkpoint → full replay → appends skipped, view untouched
    before = txn.current_version(view)
    ingest_wiki_stream_txn(
        spark, str(src), bronze, str(tmp_path / "ck2"), maintain_views=[spec]
    ).awaitTermination(300)
    assert txn.current_version(view) == before
    assert {r["username"]: r["edits"] for r in txn.read_table(spark, view).collect()} == state


def test_approx_distinct_sketches_fold_losslessly(spark, tmp_path):
    """approx_distinct: HLL sketch partials union across refreshes, so a
    user seen in three different deltas counts ONCE — the incremental
    estimate must equal a from-scratch sketch of the whole source (the
    union is lossless), and for these small cardinalities, the exact
    distinct count."""
    from wikistream_lakehouse_spark.lakehouse.incremental import read_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    measures = {"uniq_users": ("approx_distinct", "user"), "n": ("count", "1")}
    batches = [
        [("d1", "a", 1), ("d1", "b", 1), ("d2", "a", 1)],
        [("d1", "a", 2), ("d1", "c", 2)],  # 'a' repeats across deltas
        [("d2", "a", 3), ("d2", "b", 3), ("d1", "a", 4)],
    ]
    for batch in batches:
        txn.append(_src_df(spark, batch), src)
        refresh_aggregate(spark, src, view, ["day"], measures)

    got = {r["day"]: (r["uniq_users"], r["n"]) for r in read_view(spark, view).collect()}
    assert got == {"d1": (3, 5), "d2": (2, 3)}  # exact at this cardinality

    # lossless vs a from-scratch sketch of the full source
    direct = {
        r["day"]: r["est"]
        for r in txn.read_table(spark, src)
        .groupBy("day")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("est"))
        .collect()
    }
    assert {d: u for d, (u, _) in got.items()} == direct

    # the raw table keeps the mergeable sketch (binary), not the estimate
    raw_type = dict(txn.read_table(spark, view).dtypes)["uniq_users"]
    assert raw_type == "binary"


def test_incremental_medallion_bronze_silver_gold(spark, tmp_path):
    """The full delta-driven chain: bronze appends → sync_append silver
    (row-local curation: filter + derived column) → refresh_aggregate
    gold view on silver. After every pulse each leg is delta-sized, and
    the gold view equals the full recompute from bronze."""
    from wikistream_lakehouse_spark.lakehouse.incremental import sync_append

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    gold = str(tmp_path / "gold")
    curate = lambda df: df.filter("qty >= 0").withColumn(  # noqa: E731
        "qty2", F.col("qty") * 2
    )
    measures = {"total2": ("sum", "qty2"), "n": ("count", "1")}

    batches = [
        [("d1", "a", 5), ("d1", "b", -1), ("d2", "a", 7)],  # -1 filtered
        [("d1", "c", 1), ("d3", "a", 9)],
        [("d2", "b", -2), ("d2", "c", 11)],
    ]
    for batch in batches:
        txn.append(_src_df(spark, batch), bronze)
        assert sync_append(spark, bronze, silver, transform=curate) is not None
        refresh_aggregate(spark, silver, gold, ["day"], measures)
        expected = (
            curate(txn.read_table(spark, bronze))
            .groupBy("day")
            .agg(F.sum("qty2").alias("total2"), F.count("*").alias("n"))
        )
        assert _rows(txn.read_table(spark, gold)) == _rows(expected)

    # idempotent re-run: both legs no-op
    assert sync_append(spark, bronze, silver, transform=curate) is None
    assert refresh_aggregate(spark, silver, gold, ["day"], measures) is None

    # an all-filtered delta still advances the silver offset
    txn.append(_src_df(spark, [("d1", "x", -5)]), bronze)
    v = sync_append(spark, bronze, silver, transform=curate)
    assert v is not None
    assert sync_append(spark, bronze, silver, transform=curate) is None


def test_count_skips_nulls_like_sql(spark, tmp_path):
    """count(expr) semantics: a CASE-null expression makes the measure a
    filtered count, and the fold preserves it."""
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    measures = {
        "big_qty_events": ("count", "CASE WHEN qty >= 5 THEN 1 END"),
        "total_qty": ("sum", "qty"),
    }
    txn.append(_src_df(spark, [("d1", "a", 9), ("d1", "b", 1)]), src)
    refresh_aggregate(spark, src, view, ["day"], measures)
    txn.append(_src_df(spark, [("d1", "c", 6), ("d1", "d", 2)]), src)
    refresh_aggregate(spark, src, view, ["day"], measures)
    row = txn.read_table(spark, view).collect()[0]
    assert (row["big_qty_events"], row["total_qty"]) == (2, 18)


# --- retractable views: O(delta) across deletion-vector deletes ----------

RETRACT_MEASURES = {
    "n_events": ("count", "user"),
    "total_qty": ("sum", "qty"),
}


def _retract_recompute(spark, src):
    return (
        txn.read_table(spark, src)
        .groupBy("day")
        .agg(
            F.count("user").alias("n_events"),
            F.sum("qty").alias("total_qty"),
        )
    )


def test_retract_folds_dv_deletes_without_rebuild(spark, tmp_path):
    """A deletion-vector delete refreshes by SUBTRACTING its exact row
    images (txn.table_changes_cdf) — result equals the full recompute,
    a fully-emptied group vanishes, and later appends keep folding."""
    from wikistream_lakehouse_spark.lakehouse.incremental import read_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(
        _src_df(spark, [("d1", "a", 5), ("d1", "b", 3), ("d2", "c", 7)]), src
    )
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    txn.delete_where(spark, src, "qty >= 5", mode="mor")  # kills a and c
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    got = _rows(read_view(spark, view))
    assert got == _rows(_retract_recompute(spark, src))
    assert got == [("d1", 1, 3)]  # d2's only row died → group gone
    # and the view keeps folding appends afterwards
    txn.append(_src_df(spark, [("d2", "z", 1)]), src)
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    assert _rows(read_view(spark, view)) == _rows(_retract_recompute(spark, src))


def test_retract_hides_internal_counter(spark, tmp_path):
    from wikistream_lakehouse_spark.lakehouse.incremental import read_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5)]), src)
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    assert "_mv_nrows" in txn.read_table(spark, view).columns  # state has it
    assert "_mv_nrows" not in read_view(spark, view).columns  # users don't


def test_retract_refuses_non_invertible_measures(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5)]), src)
    with pytest.raises(ValueError, match="INVERTIBLE"):
        refresh_aggregate(
            spark, src, view, ["day"], MEASURES, on_mutation="retract"
        )


def test_retract_falls_back_to_rebuild_on_cow_mutation(spark, tmp_path):
    from wikistream_lakehouse_spark.lakehouse.incremental import read_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5), ("d2", "b", 3)]), src)
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    txn.update_where(spark, src, {"qty": "qty * 10"}, "day = 'd2'")
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
    )
    assert _rows(read_view(spark, view)) == _rows(_retract_recompute(spark, src))


def test_retract_flag_is_spec_drift_on_existing_view(spark, tmp_path):
    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(_src_df(spark, [("d1", "a", 5)]), src)
    refresh_aggregate(spark, src, view, ["day"], RETRACT_MEASURES)
    txn.append(_src_df(spark, [("d1", "b", 1)]), src)
    with pytest.raises(ValueError, match="different spec"):
        refresh_aggregate(
            spark, src, view, ["day"], RETRACT_MEASURES, on_mutation="retract"
        )


def test_retract_respects_where_filter(spark, tmp_path):
    """Delete images pass through the same row-local filter as inserts —
    deleting a row the filter never counted must not subtract."""
    from wikistream_lakehouse_spark.lakehouse.incremental import read_view

    src, view = str(tmp_path / "src"), str(tmp_path / "view")
    txn.append(
        _src_df(spark, [("d1", "a", 5), ("d1", "b", -1), ("d1", "c", 2)]), src
    )
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES,
        where="qty > 0", on_mutation="retract",
    )
    txn.delete_where(spark, src, "qty < 0", mode="mor")  # uncounted row
    txn.delete_where(spark, src, "qty = 5", mode="mor")  # counted row
    refresh_aggregate(
        spark, src, view, ["day"], RETRACT_MEASURES,
        where="qty > 0", on_mutation="retract",
    )
    assert _rows(read_view(spark, view)) == [("d1", 1, 2)]
