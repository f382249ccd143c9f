"""Row-level change data feed (txn.table_changes_cdf): appends emit
insert images, deletion-vector deletes emit EXACT delete images (the
positions a MoR commit killed still exist in the untouched data files —
one inner join recovers them), compactions/metadata commits are
invisible, and everything else refuses loudly. This is the property
that makes delete_where(mode='mor') the CDC-friendly delete: a
copy-on-write rewrite destroys the row-level delta, a vector preserves
it for free."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import txn


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v double")


@pytest.fixture()
def t(spark, tmp_path):
    p = str(tmp_path / "t")
    txn.append(_df(spark, [(1, 1.0), (2, 2.0)]), p)  # v0
    txn.append(_df(spark, [(3, 3.0)]), p)  # v1
    txn.delete_where(spark, p, "k = 2", mode="mor")  # v2
    return p


def _rows(df):
    return sorted(
        (r.k, r.v, r._change_type, r._commit_version) for r in df.collect()
    )


def test_full_history_inserts_and_delete_images(spark, t):
    assert _rows(txn.table_changes_cdf(spark, t, -1)) == [
        (1, 1.0, "insert", 0),
        (2, 2.0, "delete", 2),
        (2, 2.0, "insert", 0),
        (3, 3.0, "insert", 1),
    ]


def test_compact_and_metadata_commits_invisible(spark, t):
    txn.compact(spark, t)  # v3: applies + retires the vector
    txn.append(_df(spark, [(4, 4.0)]), t)  # v4
    assert _rows(txn.table_changes_cdf(spark, t, 2)) == [
        (4, 4.0, "insert", 4)
    ]
    # the delete image survives ACROSS the compact while files remain
    assert (2, 2.0, "delete", 2) in _rows(txn.table_changes_cdf(spark, t, -1))


def test_stacked_dv_deletes_attribute_to_their_commits(spark, t):
    txn.delete_where(spark, t, "k = 1", mode="mor")  # v3
    got = _rows(txn.table_changes_cdf(spark, t, 1))
    assert got == [(1, 1.0, "delete", 3), (2, 2.0, "delete", 2)]


def test_cow_mutations_refused(spark, t):
    txn.update_where(spark, t, {"v": "v + 1"}, "k = 1")
    with pytest.raises(ValueError, match="not recoverable"):
        txn.table_changes_cdf(spark, t, -1)
    # ...but a range that stops before the mutation still reads
    assert len(_rows(txn.table_changes_cdf(spark, t, -1, to_version=2))) == 4


def test_empty_range_keeps_schema(spark, t):
    out = txn.table_changes_cdf(spark, t, 2, to_version=2)
    assert out.count() == 0
    assert out.columns == ["k", "v", "_change_type", "_commit_version"]


def test_vacuumed_preimage_refused(spark, t):
    txn.compact(spark, t)
    for i in range(3):
        txn.append(_df(spark, [(10 + i, 0.0)]), t)
    txn.vacuum(t, retain_versions=1, orphan_grace_secs=10**9)
    with pytest.raises(ValueError, match="vacuumed"):
        txn.table_changes_cdf(spark, t, -1)
