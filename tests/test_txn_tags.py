"""Version tags (txn.create_tag — the Iceberg TAG analogue): a named,
immutable snapshot reference that reads resolve by name, VACUUM refuses
to eat, and cleanup_log refuses to pass. The lakehouse answer to "keep
the Q3-audit state readable whatever the retention policy says"."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_tag_names_a_snapshot_and_reads_resolve_it(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    txn.create_tag(t, "audit")  # defaults to the current version
    txn.append(_df(spark, [(2, "b")]), t)
    assert {r.k for r in txn.read_table(spark, t, version="audit").collect()} == {1}
    assert {r.k for r in txn.read_table(spark, t).collect()} == {1, 2}
    assert txn.table_tags(t) == {"audit": 0}


def test_vacuum_keeps_tagged_snapshot_files(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a"), (2, "b")]), t)
    txn.create_tag(t, "pinned")
    txn.compact(spark, t)  # rewrites files: v0's originals now retired
    txn.append(_df(spark, [(3, "c")]), t)
    reclaimed = txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    # the tagged snapshot still reads — its files were kept
    assert {r.k for r in txn.read_table(spark, t, version="pinned").collect()} == {1, 2}
    # dropping the tag releases the pin: the next vacuum reclaims
    txn.drop_tag(t, "pinned")
    reclaimed2 = txn.vacuum(t, retain_versions=1, orphan_grace_secs=0)
    assert reclaimed2  # the previously pinned files are now gone
    with pytest.raises(Exception):
        txn.read_table(spark, t, version=0).collect()
    assert {r.k for r in txn.read_table(spark, t).collect()} == {1, 2, 3}


def test_cleanup_log_refuses_past_a_tag(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    txn.create_tag(t, "old")
    txn.append(_df(spark, [(2, "b")]), t)
    txn.checkpoint(t)
    with pytest.raises(ValueError, match="tag.*old"):
        txn.cleanup_log(t)
    txn.drop_tag(t, "old")
    txn.checkpoint(t)
    assert txn.cleanup_log(t)  # proceeds once the pin is gone


def test_tags_map_is_checkpoint_anchored(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    txn.create_tag(t, "keep")
    txn.checkpoint(t)
    # the checkpoint snapshots the tag map — replay from it agrees
    assert txn.table_tags(t) == {"keep": 0}
    txn.append(_df(spark, [(2, "b")]), t)
    txn.drop_tag(t, "keep")
    assert txn.table_tags(t) == {}


def test_refusals(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    with pytest.raises(ValueError, match="reserved"):
        txn.create_tag(t, "v3")
    with pytest.raises(ValueError, match="cannot tag version"):
        txn.create_tag(t, "future", version=99)
    txn.create_tag(t, "once")
    with pytest.raises(ValueError, match="already exists"):
        txn.create_tag(t, "once")
    with pytest.raises(ValueError, match="no tag"):
        txn.read_table(spark, t, version="ghost")
    with pytest.raises(ValueError, match="no tag"):
        txn.drop_tag(t, "ghost")
    assert "tags" in txn.writer_features(t)


def test_restore_and_clone_resolve_tags(spark, tmp_path):
    t, c = str(tmp_path / "t"), str(tmp_path / "c")
    txn.append(_df(spark, [(1, "a")]), t)
    txn.create_tag(t, "good")
    txn.append(_df(spark, [(2, "bad")]), t)
    txn.clone_table(t, c, version="good")
    assert {r.k for r in txn.read_table(spark, c).collect()} == {1}
    txn.restore(t, version="good")
    assert {r.k for r in txn.read_table(spark, t).collect()} == {1}


def test_sql_restore_to_tag(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    catalog.register_table(spark, "rt_t", t)
    try:
        catalog.sql(spark, "ALTER TABLE rt_t CREATE TAG good")
        catalog.sql(spark, "INSERT INTO rt_t VALUES (2, 'bad')")
        catalog.sql(spark, "RESTORE TABLE rt_t TO TAG 'good'")
        assert {r.k for r in spark.table("rt_t").collect()} == {1}
    finally:
        catalog.unregister_table(spark, "rt_t")


def test_sql_surface_create_read_show_drop(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_df(spark, [(1, "a")]), t)
    catalog.register_table(spark, "tag_t", t)
    try:
        catalog.sql(spark, "ALTER TABLE tag_t CREATE TAG baseline")
        catalog.sql(spark, "INSERT INTO tag_t VALUES (2, 'b')")
        got = catalog.sql(
            spark, "SELECT k FROM tag_t VERSION AS OF 'baseline'"
        ).collect()
        assert {r.k for r in got} == {1}
        got = catalog.sql(spark, "SELECT k FROM tag_t@baseline").collect()
        assert {r.k for r in got} == {1}
        # @vN shorthand still means a version number
        got = catalog.sql(spark, "SELECT k FROM tag_t@v0").collect()
        assert {r.k for r in got} == {1}
        rows = catalog.sql(spark, "SHOW TAGS tag_t").collect()
        assert [(r.tag, r.version) for r in rows] == [("baseline", 0)]
        catalog.sql(
            spark, "ALTER TABLE tag_t CREATE TAG later VERSION AS OF 1"
        )
        assert len(catalog.sql(spark, "SHOW TAGS tag_t").collect()) == 2
        catalog.sql(spark, "ALTER TABLE tag_t DROP TAG baseline")
        rows = catalog.sql(spark, "SHOW TAGS tag_t").collect()
        assert [(r.tag, r.version) for r in rows] == [("later", 1)]
    finally:
        catalog.unregister_table(spark, "tag_t")
