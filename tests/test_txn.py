"""Transactional commit log (lakehouse/txn.py): atomicity, snapshot
isolation, and optimistic-concurrency behavior under REAL races —
threads driving the same SparkSession commit concurrently, not
sequential simulations of a race.
"""

from __future__ import annotations

import threading

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    CommitConflict,
    MemoryLogStore,
    append,
    checkpoint,
    current_version,
    rewrite,
    snapshot,
    transactional_upsert,
    vacuum,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


@pytest.fixture(params=["posix", "memory"])
def log_store(request):
    """The race suite runs against BOTH commit substrates: None → the
    module-default PosixLogStore (link-publish put-if-absent) and
    MemoryLogStore (the object-store conditional-put shape, S3
    If-None-Match / GCS ifGenerationMatch=0) — proving the protocol's
    guarantees come from the put-if-absent contract, not POSIX."""
    return None if request.param == "posix" else MemoryLogStore()


def test_append_then_snapshot_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = append(_df(spark, [(1, "a"), (2, "b")]), t)
    v1 = append(_df(spark, [(3, "c")]), t)
    assert (v0, v1) == (0, 1)
    assert snapshot(spark, t).count() == 3
    # time travel: the v0 snapshot is unchanged by the later commit
    assert snapshot(spark, t, version=0).count() == 2


def test_snapshot_isolation_across_rewrite(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "old")]), t)
    pinned = snapshot(spark, t, version=0)
    rewrite(_df(spark, [(1, "new")]), t, base_version=0)
    # the pinned reader still sees the pre-rewrite state (immutable files)
    assert [r.v for r in pinned.collect()] == ["old"]
    assert [r.v for r in snapshot(spark, t).collect()] == ["new"]


def test_rewrite_conflict_detection(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a")]), t)
    append(_df(spark, [(2, "b")]), t)  # table moved to v1
    with pytest.raises(CommitConflict):
        rewrite(_df(spark, [(9, "z")]), t, base_version=0)
    # the failed rewrite must not have become visible
    assert sorted(r.k for r in snapshot(spark, t).collect()) == [1, 2]


def test_concurrent_appends_lose_nothing(spark, tmp_path, log_store):
    """N racing appenders: every row lands exactly once, versions are a
    gap-free sequence — the put-if-absent commit serializes them."""
    t = str(tmp_path / "t")
    n_writers, errs = 6, []

    def writer(i: int) -> None:
        try:
            append(
                _df(spark, [(i * 10 + j, f"w{i}") for j in range(5)]),
                t,
                store=log_store,
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert current_version(t, store=log_store) == n_writers - 1  # gap-free
    got = snapshot(spark, t, store=log_store)
    assert got.count() == n_writers * 5
    assert got.select("k").distinct().count() == n_writers * 5


def test_concurrent_merges_serialize(spark, tmp_path, log_store):
    """Two racing upserts on overlapping keys: optimistic conflict makes
    the loser re-run against the winner's state, so BOTH updates survive
    — the lost-update anomaly plain parquet MERGE cannot prevent."""
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "base"), (2, "base"), (3, "base")]), t, store=log_store)
    errs = []
    barrier = threading.Barrier(2)

    def merger(key: int, val: str) -> None:
        try:
            barrier.wait(timeout=30)  # maximize the race window
            transactional_upsert(
                spark, t, _df(spark, [(key, val)]), keys=["k"], store=log_store
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    a = threading.Thread(target=merger, args=(1, "from_A"))
    b = threading.Thread(target=merger, args=(2, "from_B"))
    a.start(), b.start()
    a.join(), b.join()
    assert not errs
    state = {r.k: r.v for r in snapshot(spark, t, store=log_store).collect()}
    assert state == {1: "from_A", 2: "from_B", 3: "base"}


def test_upsert_semantics_match_merge(spark, tmp_path):
    """Same update/insert/preserve contract as merge.upsert_parquet."""
    t = str(tmp_path / "t")
    transactional_upsert(
        spark, t, _df(spark, [(1, "a"), (2, "b")]), keys=["k"]
    )
    transactional_upsert(
        spark, t, _df(spark, [(2, "B"), (3, "c")]), keys=["k"]
    )
    state = {r.k: r.v for r in snapshot(spark, t).collect()}
    assert state == {1: "a", 2: "B", 3: "c"}
    # idempotent re-run converges
    transactional_upsert(
        spark, t, _df(spark, [(2, "B"), (3, "c")]), keys=["k"]
    )
    assert {r.k: r.v for r in snapshot(spark, t).collect()} == state


def test_checkpoint_preserves_state_and_later_commits_apply(spark, tmp_path):
    """A checkpoint is a pure replay cache: state at every version is
    identical with or without it, and commits landing after it apply on
    top."""
    t = str(tmp_path / "t")
    for i in range(5):
        append(_df(spark, [(i, f"v{i}")]), t)
    cp = checkpoint(t)
    assert cp == 4
    assert snapshot(spark, t).count() == 5  # read THROUGH the checkpoint
    append(_df(spark, [(99, "after")]), t)  # commit after the checkpoint
    assert snapshot(spark, t).count() == 6
    assert sorted(r.k for r in snapshot(spark, t).collect())[-1] == 99
    # re-checkpointing the same version is a no-op, a newer one advances
    assert checkpoint(t) == 5


def test_vacuum_reclaims_only_unretained_files(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "gen0")]), t)                      # v0
    rewrite(_df(spark, [(1, "gen1")]), t, base_version=0)     # v1 retires v0 files
    rewrite(_df(spark, [(1, "gen2")]), t, base_version=1)     # v2 retires v1 files
    deleted = vacuum(t, retain_versions=2)  # keep v1 and v2 readable
    assert deleted, "expected the gen0 files to be reclaimed"
    # retained snapshots still read fine
    assert [r.v for r in snapshot(spark, t, version=2).collect()] == ["gen2"]
    assert [r.v for r in snapshot(spark, t, version=1).collect()] == ["gen1"]
    # current state untouched
    assert [r.v for r in snapshot(spark, t).collect()] == ["gen2"]


def test_compact_reduces_files_preserving_content(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(8):  # 8 appends → ≥8 tiny files
        append(_df(spark, [(i, f"v{i}")]), t)
    from wikistream_lakehouse_spark.lakehouse.txn import _replay, compact

    before_files = len(_replay(t, current_version(t)))
    v = compact(spark, t)
    assert v is not None
    after_files = len(_replay(t, current_version(t)))
    assert after_files < before_files
    got = {r.k: r.v for r in snapshot(spark, t).collect()}
    assert got == {i: f"v{i}" for i in range(8)}
    # idempotent: a second compact on compact state is a no-op
    assert compact(spark, t) is None


def test_compact_racing_appends_loses_nothing(spark, tmp_path, log_store):
    """The OPTIMIZE-vs-ingest race: appends keep landing while a
    compaction runs. Optimistic conflict makes the compactor fold in the
    racer's commits and retry; every appended row must survive."""
    from wikistream_lakehouse_spark.lakehouse.txn import compact

    t = str(tmp_path / "t")
    for i in range(6):
        append(_df(spark, [(i, "pre")]), t, store=log_store)
    errs = []
    barrier = threading.Barrier(2)

    def appender() -> None:
        try:
            barrier.wait(timeout=30)
            for j in range(4):
                append(_df(spark, [(100 + j, "during")]), t, store=log_store)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    def compactor() -> None:
        try:
            barrier.wait(timeout=30)
            compact(spark, t, store=log_store)
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    a, b = threading.Thread(target=appender), threading.Thread(target=compactor)
    a.start(), b.start()
    a.join(), b.join()
    assert not errs
    got = sorted(r.k for r in snapshot(spark, t, store=log_store).collect())
    assert got == list(range(6)) + list(range(100, 104))


def test_append_rejects_schema_mismatch_before_commit(spark, tmp_path):
    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a")]), t)
    bad = spark.createDataFrame([(2, 3.5)], "k long, v double")  # v: string→double
    with pytest.raises(ValueError, match="schema mismatch"):
        append(bad, t)
    # nothing leaked into the log or the table state
    assert current_version(t) == 0
    assert snapshot(spark, t).count() == 1
    # column ORDER does not matter (set compare, like Delta by-name)
    reordered = spark.createDataFrame([("b", 2)], "v string, k long")
    append(reordered.select("v", "k"), t)
    assert snapshot(spark, t).count() == 2


def test_uncommitted_files_invisible(spark, tmp_path):
    """Data files written but never committed are never read: kill a
    'writer' after materialization, before commit — readers see nothing."""
    from wikistream_lakehouse_spark.lakehouse.txn import _write_data_files

    t = str(tmp_path / "t")
    append(_df(spark, [(1, "a")]), t)
    _write_data_files(_df(spark, [(99, "ghost")]), t)  # crash before commit
    assert [r.k for r in snapshot(spark, t).collect()] == [1]


# --- model-based property: the log replay IS a key-value history ----------

_ops = st.lists(
    st.tuples(
        st.sampled_from(
            ["append", "upsert", "compact", "checkpoint", "delete", "update"]
        ),
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=6),
                st.sampled_from(["a", "b", "c"]),
            ),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    ),
    min_size=1,
    max_size=6,
)


@given(ops=_ops)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_log_replay_matches_kv_model(spark, tmp_path_factory, log_store, ops):
    """Model-based check: any sequence of append/upsert/delete/update/
    compact/checkpoint must leave the snapshot equal to a plain dict
    model (append = multiset add; upsert = put; delete/update =
    predicate-driven bag edits). Compact and checkpoint must be
    invisible to the model."""
    from collections import Counter

    from wikistream_lakehouse_spark.lakehouse.txn import (
        checkpoint,
        compact,
        delete_where,
        update_where,
    )

    t = str(tmp_path_factory.mktemp("txnprop") / "t")
    model: Counter = Counter()
    for op, kvs in ops:
        if op == "append":
            append(_df(spark, kvs), t, store=log_store)
            model.update(kvs)
        elif op == "upsert":
            transactional_upsert(
                spark, t, _df(spark, kvs), keys=["k"], store=log_store
            )
            for k, v in kvs:
                model = Counter(
                    {(mk, mv): c for (mk, mv), c in model.items() if mk != k}
                )
                model[(k, v)] += 1
        elif op == "delete":
            if current_version(t, store=log_store) >= 0:
                kk = kvs[0][0]
                delete_where(spark, t, f"k >= {kk}", store=log_store)
                model = Counter(
                    {(mk, mv): c for (mk, mv), c in model.items() if mk < kk}
                )
        elif op == "update":
            if current_version(t, store=log_store) >= 0:
                kk = kvs[0][0]
                update_where(spark, t, {"v": "'z'"}, f"k <= {kk}", store=log_store)
                newm: Counter = Counter()
                for (mk, mv), c in model.items():
                    newm[(mk, "z" if mk <= kk else mv)] += c
                model = newm
        elif op == "compact":
            if current_version(t, store=log_store) >= 0:
                compact(spark, t, target_file_bytes=1 << 40, store=log_store)
        elif op == "checkpoint":
            if current_version(t, store=log_store) >= 0:
                checkpoint(t, store=log_store)
        if current_version(t, store=log_store) >= 0:
            got = Counter(
                (r.k, r.v) for r in snapshot(spark, t, store=log_store).collect()
            )
            assert got == model, f"after {op}: {got} != {model}"


def test_numeric_looking_string_partition_values_keep_type_and_value(
    spark, tmp_path
):
    """Directory inference misreports a string partition column whose
    values look numeric ("ds=01" → int 1: type wrong, leading zero
    GONE). Every append stamps its physical schema (r8), and readers
    pin partition-column types from the newest stamp — type and exact
    values survive, and a second append passes the strict check."""
    from wikistream_lakehouse_spark.lakehouse import txn

    t = str(tmp_path / "t")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "01").otherwise("2").alias("ds"),
    )
    txn.append(df.coalesce(1), t, partition_by=["ds"])
    out = txn.read_table(spark, t)
    assert dict(out.dtypes)["ds"] == "string"
    assert sorted(set(r.ds for r in out.collect())) == ["01", "2"]
    # strict second append: the pre-fix failure mode was a bogus
    # "table has ds:int, append has ds:string" refusal
    txn.append(df.coalesce(1), t)
    assert txn.read_table(spark, t).count() == 20
    assert txn.read_table(spark, t).filter("ds = '01'").count() == 10
