"""Widening schema evolution on the txn layer (append(merge_schema=True),
the Delta mergeSchema analogue): new columns may be added, old files'
missing values surface as nulls, writers may omit columns, and type
CHANGES are always refused. The evolved flag switches reads to
footer-merge mode and clears after a full rewrite normalizes the files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.txn import (
    append,
    compact,
    delete_where,
    read_table,
    snapshot,
    table_changes,
    transactional_upsert,
    _is_evolved,
)


def test_widening_append_adds_column_nulls_backfill(spark, tmp_path):
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    with pytest.raises(ValueError, match="schema mismatch"):
        append(
            spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
            t,
        )  # strict by default
    append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        t,
        merge_schema=True,
    )
    df = read_table(spark, t)
    assert set(df.columns) == {"k", "v", "score"}
    got = {r.k: r.score for r in df.collect()}
    assert got == {1: None, 2: 9.5}  # old rows null-backfilled
    assert _is_evolved(t)


def test_writer_may_omit_columns_after_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a", 1.0)], "k long, v string, s double"), t)
    append(
        spark.createDataFrame([(2,)], "k long"), t, merge_schema=True
    )  # subset writer
    got = {r.k: (r.v, r.s) for r in read_table(spark, t).collect()}
    assert got == {1: ("a", 1.0), 2: (None, None)}


def test_type_change_always_refused(spark, tmp_path):
    """Since round 7 the SAFE lattice (int→bigint, float→double, …)
    widens instead of refusing — tests/test_txn_type_widening.py covers
    that; here the refusal contract holds for everything OUTSIDE it."""
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    with pytest.raises(ValueError, match="neither"):
        append(
            spark.createDataFrame([(2, 3)], "k long, v long"),
            t,
            merge_schema=True,
        )


def test_full_rewrite_normalizes_and_clears_evolved_flag(spark, tmp_path):
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        t,
        merge_schema=True,
    )
    assert _is_evolved(t)
    assert compact(spark, t) is not None
    # compact rewrote every file with the union schema: cheap read path back
    assert not _is_evolved(t)
    got = {r.k: r.score for r in read_table(spark, t).collect()}
    assert got == {1: None, 2: 9.5}
    # strict appends now require the full evolved schema
    with pytest.raises(ValueError, match="schema mismatch"):
        append(spark.createDataFrame([(3, "c")], "k long, v string"), t)


def test_change_feed_and_dml_across_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        t,
        merge_schema=True,
    )
    append(
        spark.createDataFrame([(3, "c", 1.5)], "k long, v string, score double"),
        t,
    )
    # change feed spanning the widening commit unions the delta's footers
    delta = table_changes(spark, t, from_version=0)
    assert {r.k for r in delta.collect()} == {2, 3}
    # DML whose predicate touches the NEW column still sees pre-evolution
    # files (their score is null ⇒ predicate false ⇒ kept)
    delete_where(spark, t, "score > 5.0")
    assert sorted(r.k for r in read_table(spark, t).collect()) == [1, 3]


def test_merge_after_evolution_keeps_union_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a")], "k long, v string"), t)
    append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        t,
        merge_schema=True,
    )
    src = spark.createDataFrame(
        [(1, "a2", 3.0), (4, "d", 4.0)], "k long, v string, score double"
    )
    transactional_upsert(spark, t, src, keys=["k"])
    got = {r.k: (r.v, r.score) for r in read_table(spark, t).collect()}
    assert got == {1: ("a2", 3.0), 2: ("b", 9.5), 4: ("d", 4.0)}
    assert not _is_evolved(t)  # merge was a full rewrite

    # time travel across the evolution boundary still reads v0 in its
    # ORIGINAL two-column shape
    assert set(snapshot(spark, t, version=0).columns) == {"k", "v"}


def test_mor_merge_with_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION (r11): the MoR merge's source may
    carry a NEW column — one atomic commit upserts the rows AND widens
    the table; pre-merge rows read the new column as NULL."""
    from wikistream_lakehouse_spark.lakehouse.txn import merge_on_read_upsert

    t = str(tmp_path / "t")
    append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), t)
    src = spark.createDataFrame(
        [(2, "b2", 9.5), (3, "c", 1.0)], "k long, v string, score double"
    )
    # strict mode refuses the new column
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_on_read_upsert(spark, t, src, keys=["k"])
    merge_on_read_upsert(spark, t, src, keys=["k"], merge_schema=True)
    got = {r.k: (r.v, r.score) for r in read_table(spark, t).collect()}
    assert got == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}
    assert _is_evolved(t)
    # the widened column participates in later DML
    delete_where(spark, t, "score > 5.0")
    assert sorted(r.k for r in read_table(spark, t).collect()) == [1, 3]
