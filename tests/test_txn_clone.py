"""Zero-copy CLONE (txn.clone_table): a new independent table sharing
the source snapshot's immutable bytes via DataStore.link — O(files)
metadata work, no data read or copied. The properties under test:
byte-sharing without name-sharing (vacuum/DML on either side never
perturbs the other), metadata carry (partitioning, stats, constraints,
generated columns, evolution flag), historical clones, and the
change-feed contract for DV-carrying clones."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


def _rows(spark, t, version=None):
    return sorted(
        (r.k, r.v) for r in txn.read_table(spark, t, version=version).collect()
    )


@pytest.fixture()
def src(spark, tmp_path):
    t = str(tmp_path / "src")
    txn.append(_kv(spark, 0, 100), t, stats_cols=["k"])
    txn.append(_kv(spark, 100, 200), t, stats_cols=["k"])
    return t


def test_clone_shares_bytes_not_names(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst)
    assert _rows(spark, dst) == _rows(spark, src)
    files = txn._replay(dst, txn.current_version(dst))
    # zero-copy: same inode (hard link), second name
    for rel in files:
        s, d = os.path.join(src, rel), os.path.join(dst, rel)
        assert os.stat(s).st_ino == os.stat(d).st_ino
    meta = txn.history(dst)[0]["meta"]
    assert meta["cloneSourceVersion"] == 1
    # logged stats carried: the clone still prunes from log metadata
    assert set(txn.logged_file_stats(dst)) == set(files)


def test_clone_and_source_evolve_independently(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst)
    before = _rows(spark, src)
    # mutate the clone: delete + append + compact + vacuum
    txn.delete_where(spark, dst, "k < 50")
    txn.append(_kv(spark, 500, 510), dst)
    txn.compact(spark, dst, target_file_bytes=1 << 40)
    txn.vacuum(dst, retain_versions=1, orphan_grace_secs=0)
    assert _rows(spark, src) == before  # source untouched
    # mutate + vacuum the source: clone unaffected (links keep bytes)
    txn.delete_where(spark, src, "k >= 150")
    txn.compact(spark, src, target_file_bytes=1 << 40)
    txn.vacuum(src, retain_versions=1, orphan_grace_secs=0)
    got = _rows(spark, dst)
    assert [k for k, _ in got] == [k for k in range(50, 200)] + list(
        range(500, 510)
    )


def test_clone_historical_version(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst, version=0)
    assert _rows(spark, dst) == _rows(spark, src, version=0)
    assert len(_rows(spark, dst)) == 100


def test_clone_carries_constraints_and_generated_columns(spark, tmp_path):
    s = str(tmp_path / "s")
    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("par")
    )
    txn.append(df, s)
    txn.set_constraint(spark, s, "k_nonneg", "k >= 0")
    txn.set_generated_column(spark, s, "par", "k % 2")
    d = str(tmp_path / "d")
    txn.clone_table(s, d)
    assert txn.constraints(d) == {"k_nonneg": "k >= 0"}
    assert txn.generated_columns(d) == {"par": "k % 2"}
    with pytest.raises(txn.ConstraintViolation):
        txn.append(
            spark.createDataFrame([(-1, -1)], "k long, par long"), d
        )
    # generated column computed on the clone's own appends
    txn.append(spark.createDataFrame([(7,)], "k long"), d)
    assert (7, 1) in {
        (r.k, r.par) for r in txn.read_table(spark, d).collect()
    }


def test_clone_with_active_dvs_reads_right_but_refuses_feeds(
    spark, src, tmp_path
):
    txn.delete_where(spark, src, "k % 10 = 0", mode="mor")
    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst)
    assert _rows(spark, dst) == _rows(spark, src)  # DV carried, applied
    with pytest.raises(ValueError, match="deletion vectors"):
        txn.table_changes_cdf(spark, dst, -1)
    with pytest.raises(ValueError, match="clone"):
        txn.table_changes(spark, dst, -1)
    # after a compact (purges vectors), the feed works from that point
    txn.compact(spark, dst, target_file_bytes=1 << 40)
    base = txn.current_version(dst)
    txn.append(_kv(spark, 900, 905), dst)
    assert txn.table_changes(spark, dst, base).count() == 5


def test_dv_free_clone_streams_as_initial_inserts(spark, src, tmp_path):
    from wikistream_lakehouse_spark.streaming.txn_source import (
        TxnTableStreamReader,
    )

    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst)
    reader = TxnTableStreamReader(dst, cdf=True)
    parts = reader.partitions({"version": -1}, {"version": 0})
    assert parts and all(p.change_type == "insert" for p in parts)
    # plain batch feed agrees
    assert txn.table_changes(spark, dst, -1).count() == 200


def test_clone_refuses_existing_destination_and_vacuumed_snapshot(
    spark, src, tmp_path
):
    dst = str(tmp_path / "dst")
    txn.clone_table(src, dst)
    with pytest.raises(ValueError, match="transaction log"):
        txn.clone_table(src, dst)
    txn.compact(spark, src, target_file_bytes=1 << 40)
    txn.vacuum(src, retain_versions=1, orphan_grace_secs=0)
    with pytest.raises(ValueError, match="vacuumed"):
        txn.clone_table(src, str(tmp_path / "d2"), version=0)


def test_clone_on_memory_logstore_substrate(spark, src, tmp_path):
    """The clone protocol holds on the object-store-shaped log: source
    and destination logs both live in a MemoryLogStore (conditional-put
    only), data files hard-link on the shared data plane — the
    DynamoDB-log + S3-data deployment shape."""
    st = txn.MemoryLogStore()
    s = str(tmp_path / "ms")
    txn.append(_kv(spark, 0, 50), s, store=st)
    d = str(tmp_path / "md")
    txn.clone_table(s, d, store=st)
    got = sorted(
        (r.k, r.v)
        for r in txn.read_table(spark, d, store=st).collect()
    )
    want = sorted(
        (r.k, r.v)
        for r in txn.read_table(spark, s, store=st).collect()
    )
    assert got == want and len(got) == 50
    # independence holds on this substrate too
    txn.delete_where(spark, s, "k < 25", store=st)
    assert txn.read_table(spark, d, store=st).count() == 50


def test_historical_clone_carries_metadata_as_of_that_version(
    spark, tmp_path
):
    """ADVICE r6 medium: CLONE of a snapshot carries constraints and
    generated columns AS OF the cloned version, not HEAD (Delta CLONE
    semantics) — a constraint added after v was never validated against
    v's data, and the clone's log must not falsely assert it."""
    s = str(tmp_path / "s")
    txn.append(
        spark.createDataFrame([(-5, -10), (3, 6)], "k long, dbl long"), s
    )
    txn.set_constraint(spark, s, "old_ok", "k > -100")
    v_with_old = txn.current_version(s)
    # HEAD-only metadata that must NOT ride along with a v_with_old clone
    txn.delete_where(spark, s, "k < 0")
    txn.set_constraint(spark, s, "k_nonneg", "k >= 0")
    txn.set_generated_column(spark, s, "dbl", "k * 2")
    d = str(tmp_path / "d")
    txn.clone_table(s, d, version=v_with_old)
    assert txn.constraints(d) == {"old_ok": "k > -100"}
    assert txn.generated_columns(d) == {}
    # the clone holds k=-5 and its log claims nothing that data violates
    assert {r.k for r in txn.read_table(spark, d).collect()} == {-5, 3}
    txn.append(
        spark.createDataFrame([(-7, 0)], "k long, dbl long"), d
    )  # allowed: neither HEAD-only constraint nor generation carried
