"""Lakehouse-layer tests (SURVEY.md §5.3): dual-time partition derivation,
silver idempotency (the reference's append-duplication bug, fixed), gold
re-run safety, MERGE upsert semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import (
    build_daily_gold,
    curate_to_silver,
    read_table,
    upsert_parquet,
    write_bronze,
)
from wikistream_lakehouse_spark.tables import table


@pytest.fixture()
def events(spark, sf_dir):
    return table(spark, sf_dir, "events")


def test_bronze_is_append_only_processing_dated(spark, events, tmp_path):
    path = str(tmp_path / "bronze")
    write_bronze(events.limit(100), path, ds="2024-02-01")
    write_bronze(events.limit(100), path, ds="2024-02-02")
    out = spark.read.parquet(path)
    assert out.count() == 200  # bronze never dedups — it's the audit log
    assert sorted(
        r.ds.isoformat() for r in out.select("ds").distinct().collect()
    ) == ["2024-02-01", "2024-02-02"]
    assert os.path.isdir(os.path.join(path, "ds=2024-02-01"))


def test_silver_rerun_is_idempotent(spark, events, tmp_path):
    """The reference's curated write appends → re-runs duplicate rows
    (glue/job_wiki_curate.py:48, SURVEY.md §1.3). Ours must converge —
    and the DEFAULT silver path is transactional now (each curation is
    an atomic, time-travelable replace_partitions commit)."""
    from wikistream_lakehouse_spark.lakehouse.txn import history

    path = str(tmp_path / "silver")
    curate_to_silver(events, path)
    n1 = read_table(spark, path).count()
    curate_to_silver(events, path)  # re-run over the same input
    n2 = read_table(spark, path).count()
    assert n1 == n2 == events.count()
    assert [h["op"] for h in history(path)] == ["replace_partitions"] * 2


def test_silver_partitions_follow_event_time(spark, events, tmp_path):
    """T6: a late-arriving event re-homes to its *event* day partition
    regardless of the processing-date it landed under (dual-time model)."""
    path = str(tmp_path / "silver")
    curate_to_silver(events, path)
    out = read_table(spark, path)
    # fixture events all live in 2024-01 → exactly those partitions exist
    parts = {
        (r.yyyy, r.mm) for r in out.select("yyyy", "mm").distinct().collect()
    }
    assert parts == {(2024, 1)}
    mismatch = out.filter(
        (F.year("ts") != F.col("yyyy"))
        | (F.month("ts") != F.col("mm"))
        | (F.dayofmonth("ts") != F.col("dd"))
    ).count()
    assert mismatch == 0


def test_silver_dynamic_overwrite_keeps_other_partitions(spark, events, tmp_path):
    """Overwrite must be per-partition: re-curating one day's data leaves
    the other days untouched (the replaceWhere semantics)."""
    path = str(tmp_path / "silver")
    curate_to_silver(events, path)
    before = read_table(spark, path).count()
    one_day = events.filter(F.to_date("ts") == "2024-01-15")
    curate_to_silver(one_day, path)  # touches only dd=15
    after = read_table(spark, path).count()
    assert after == before


def test_gold_daily_build_idempotent(spark, events, tmp_path):
    """Gold is a transactional table now: each day's build is an atomic
    ds-partition replace; re-runs converge AND the history shows them."""
    from wikistream_lakehouse_spark.lakehouse.txn import history

    path = str(tmp_path / "gold")
    build_daily_gold(events, path, ds="2024-01-10")
    build_daily_gold(events, path, ds="2024-01-11")
    n1 = read_table(spark, path).count()
    build_daily_gold(events, path, ds="2024-01-10")  # re-run one day
    n2 = read_table(spark, path).count()
    assert n1 == n2
    days = {
        r.ds.isoformat()
        for r in read_table(spark, path).select("ds").distinct().collect()
    }
    assert days == {"2024-01-10", "2024-01-11"}
    # three atomic commits, all partition replaces, time-travelable
    ops = [h["op"] for h in history(path)]
    assert ops == ["replace_partitions"] * 3
    assert read_table(spark, path, version=1).count() == n1


def test_upsert_updates_inserts_preserves(spark, tmp_path):
    """K5 semantics (upsert_athena_aggregates.py:103-109): ON CONFLICT
    UPDATE + insert new + untouched rows preserved; idempotent re-run."""
    path = str(tmp_path / "serving")
    t0 = spark.createDataFrame(
        [("2024-01-01", "alice", 5), ("2024-01-01", "bob", 3)],
        "dt string, username string, edits int",
    )
    upsert_parquet(spark, path, t0, keys=["dt", "username"])
    src = spark.createDataFrame(
        [("2024-01-01", "bob", 7), ("2024-01-01", "carol", 2)],
        "dt string, username string, edits int",
    )
    upsert_parquet(spark, path, src, keys=["dt", "username"])
    state = {
        (r.dt, r.username): r.edits for r in spark.read.parquet(path).collect()
    }
    assert state == {
        ("2024-01-01", "alice"): 5,  # preserved
        ("2024-01-01", "bob"): 7,  # updated
        ("2024-01-01", "carol"): 2,  # inserted
    }
    upsert_parquet(spark, path, src, keys=["dt", "username"])  # idempotent
    state2 = {
        (r.dt, r.username): r.edits for r in spark.read.parquet(path).collect()
    }
    assert state2 == state


def test_upsert_rejects_duplicate_source_keys(spark, tmp_path):
    src = spark.createDataFrame(
        [("a", 1), ("a", 2)], "k string, v int"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        upsert_parquet(spark, str(tmp_path / "t"), src, keys=["k"])


def test_bronze_compaction_preserves_rows(spark, events, tmp_path):
    """OPTIMIZE-style compaction: many micro-batch files -> few right-sized
    files, identical row multiset, re-run no-op."""
    from wikistream_lakehouse_spark.lakehouse.compact import compact_table

    path = str(tmp_path / "bronze")
    # simulate 6 micro-batches into one processing-date partition
    for i in range(6):
        write_bronze(events.limit(200).repartition(3), path, ds="2024-02-01")
    before_files = [
        f for f in os.listdir(os.path.join(path, "ds=2024-02-01"))
        if f.endswith(".parquet")
    ]
    assert len(before_files) >= 6
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).drop("ds").collect())
    )
    report = compact_table(spark, path, "ds")
    (b, a) = report["ds=2024-02-01"]
    assert b == len(before_files) and a < b
    after_rows = sorted(
        map(tuple, spark.read.parquet(path).drop("ds").collect())
    )
    assert after_rows == before_rows
    # idempotent: second compaction is a no-op
    report2 = compact_table(spark, path, "ds")
    assert report2["ds=2024-02-01"] == (a, a)


def test_incremental_curation_processes_only_new_partitions(spark, events, tmp_path):
    """Incremental silver: first run curates everything, second run with no
    new bronze is a no-op, a new bronze partition triggers exactly that
    delta — and the silver stays identical to a full re-curation."""
    from wikistream_lakehouse_spark.lakehouse.incremental import curate_incremental

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    state = str(tmp_path / "meta" / "state.json")
    day1 = events.filter(F.dayofmonth("ts") <= 10)
    day2 = events.filter(F.dayofmonth("ts") > 10)
    write_bronze(day1, bronze, ds="2024-02-01")

    done = curate_incremental(spark, bronze, silver, state)
    assert done == ["ds=2024-02-01"]
    n1 = spark.read.parquet(silver).count()
    assert n1 == day1.count()

    assert curate_incremental(spark, bronze, silver, state) == []  # no-op

    write_bronze(day2, bronze, ds="2024-02-02")
    done = curate_incremental(spark, bronze, silver, state)
    assert done == ["ds=2024-02-02"]
    assert spark.read.parquet(silver).count() == events.count()


def test_incremental_overlapping_event_days_no_data_loss(spark, events, tmp_path):
    """Two deltas whose rows share event-time days must both survive —
    the (event-day x arrival-day) partition unit prevents the second
    delta's overwrite from erasing the first's rows. (Regression: found
    by driving overlapping deltas end-to-end.)"""
    from wikistream_lakehouse_spark.lakehouse.incremental import curate_incremental

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    state = str(tmp_path / "meta" / "state.json")
    # both deltas cover the SAME event-time days (overlapping subsets)
    write_bronze(events.limit(400), bronze, ds="2024-04-01")
    curate_incremental(spark, bronze, silver, state)
    write_bronze(events.limit(600), bronze, ds="2024-04-02")
    curate_incremental(spark, bronze, silver, state)
    assert spark.read.parquet(silver).count() == 1000  # 400 + 600, nothing lost
    # re-running a delta converges (simulate crash-before-state)
    import json as _json

    st = _json.load(open(state))
    del st["processed"]["ds=2024-04-02"]
    _json.dump(st, open(state, "w"))
    assert curate_incremental(spark, bronze, silver, state) == ["ds=2024-04-02"]
    assert spark.read.parquet(silver).count() == 1000  # idempotent re-run


def test_incremental_recurates_partition_with_late_files(spark, events, tmp_path):
    """A ds= partition that a live bronze sink keeps appending to must be
    re-curated when new files land AFTER a run marked it processed —
    the state tracks per-partition file listings, not bare names.
    (Regression: open/current-day partition rows were silently lost.)"""
    from wikistream_lakehouse_spark.lakehouse.incremental import curate_incremental

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    state = str(tmp_path / "meta" / "state.json")
    write_bronze(events.limit(300), bronze, ds="2024-05-01")
    assert curate_incremental(spark, bronze, silver, state) == ["ds=2024-05-01"]
    assert spark.read.parquet(silver).count() == 300

    # the "open" partition receives more files after the run (streaming append)
    late = events.subtract(events.limit(300)).limit(200)
    write_bronze(late, bronze, ds="2024-05-01")
    assert curate_incremental(spark, bronze, silver, state) == ["ds=2024-05-01"]
    assert spark.read.parquet(silver).count() == 500
    # and once the listing is stable, it's a no-op again
    assert curate_incremental(spark, bronze, silver, state) == []


def test_curate_to_silver_refuses_legacy_parquet_dir(spark, tmp_path):
    """ADVICE r6 low: pointing the (now-transactional) curate_to_silver
    at a pre-existing PLAIN-parquet silver directory must refuse loudly
    — starting a fresh txn log beside legacy yyyy=... files makes
    read_table silently ignore all pre-existing data while bare parquet
    readers see duplicates. The error names the two escape hatches."""
    import pytest

    from wikistream_lakehouse_spark.lakehouse.silver import (
        curate_to_silver,
        curate_to_silver_parquet,
    )

    legacy = str(tmp_path / "silver")
    raw = spark.createDataFrame(
        [(1700000000, "A"), (1700090000, "B")], "ts long, title string"
    )
    curate_to_silver_parquet(raw, legacy)  # the old function's output
    with pytest.raises(ValueError, match="convert_to_txn"):
        curate_to_silver(raw, legacy)
    # legacy data untouched, no txn log forked in
    assert spark.read.parquet(legacy).count() == 2
    from wikistream_lakehouse_spark.lakehouse import txn

    assert not txn._claimed_versions(legacy)
    # fresh and already-transactional destinations still work
    clean = str(tmp_path / "clean")
    curate_to_silver(raw, clean)
    curate_to_silver(raw, clean)  # incremental re-run on a txn table
    assert txn.read_table(spark, clean).count() == 2
