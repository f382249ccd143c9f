"""CREATE VIEW / DROP VIEW / SHOW TABLES / DESCRIBE TABLE on the
catalog SQL front door (VERDICT r9 next #4). Views store TEXT and
re-evaluate per read: a view over a latest-bound name follows the
table, one over ``VERSION AS OF`` stays pinned, and one over an
open-ended ``CHANGES(t, start)`` grows with new commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def vt(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"), t
    )
    catalog.register_table(spark, "vt", t)
    yield t
    catalog.unregister_table(spark, "vt")
    views = catalog._session_views(spark)
    for name in list(views):
        views.pop(name)
        spark.catalog.dropTempView(name)


def test_view_follows_latest_bound_table(spark, vt):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k FROM vt WHERE v >= 15")
    assert catalog.sql(spark, "SELECT count(*) AS n FROM big").first().n == 1
    catalog.sql(spark, "INSERT INTO vt VALUES (3, 30.0)")
    # no re-CREATE: the view re-evaluates per read and sees the commit
    assert catalog.sql(spark, "SELECT count(*) AS n FROM big").first().n == 2


def test_view_can_pin_a_version(spark, vt):
    catalog.sql(
        spark, "CREATE VIEW v0 AS SELECT k FROM vt VERSION AS OF 0"
    )
    catalog.sql(spark, "INSERT INTO vt VALUES (3, 30.0)")
    assert catalog.sql(spark, "SELECT count(*) AS n FROM v0").first().n == 2
    assert catalog.sql(spark, "SELECT count(*) AS n FROM vt").first().n == 3


def test_view_over_open_ended_changes_grows(spark, vt):
    catalog.sql(
        spark,
        "CREATE VIEW feed AS SELECT k, _commit_version FROM CHANGES(vt, 1)",
    )
    assert catalog.sql(spark, "SELECT count(*) AS n FROM feed").first().n == 0
    catalog.sql(spark, "INSERT INTO vt VALUES (3, 30.0)")
    catalog.sql(spark, "INSERT INTO vt VALUES (4, 40.0)")
    got = catalog.sql(
        spark, "SELECT k, _commit_version FROM feed ORDER BY k"
    ).collect()
    assert [(r.k, r._commit_version) for r in got] == [(3, 1), (4, 2)]


def test_view_survives_table_re_registration(spark, vt, tmp_path):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k FROM vt WHERE v >= 15")
    # re-register the SAME name over a different table: the view's next
    # read resolves against the new binding
    t2 = str(tmp_path / "t2")
    txn.append(
        spark.createDataFrame(
            [(7, 70.0), (8, 8.0), (9, 90.0)], "k long, v double"
        ),
        t2,
    )
    catalog.register_table(spark, "vt", t2)
    ks = sorted(
        r.k for r in catalog.sql(spark, "SELECT k FROM big").collect()
    )
    assert ks == [7, 9]


def test_view_reads_earlier_view(spark, vt):
    catalog.sql(spark, "CREATE VIEW a AS SELECT k, v FROM vt WHERE k > 1")
    catalog.sql(spark, "CREATE VIEW b AS SELECT sum(v) AS s FROM a")
    assert catalog.sql(spark, "SELECT s FROM b").first().s == 20.0


def test_ctas_and_merge_can_read_views(spark, vt, tmp_path):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k, v FROM vt WHERE v >= 15")
    catalog.sql(
        spark,
        f"CREATE TABLE view_snap LOCATION '{tmp_path}/snap' AS "
        "SELECT * FROM big",
    )
    try:
        assert spark.table("view_snap").count() == 1
        v = catalog.sql(
            spark,
            """MERGE INTO view_snap AS t USING (SELECT k, v * 0 AS v FROM big) AS s
               ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v""",
        )
        assert v == 1
        assert spark.table("view_snap").first().v == 0.0
    finally:
        catalog.sql(spark, "DROP TABLE view_snap")


def test_drop_view_and_refusals(spark, vt):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k FROM vt")
    with pytest.raises(ValueError, match="already exists"):
        catalog.sql(spark, "CREATE VIEW big AS SELECT v FROM vt")
    catalog.sql(spark, "DROP VIEW big")
    with pytest.raises(Exception):  # temp view gone too
        catalog.sql(spark, "SELECT * FROM big").collect()
    with pytest.raises(ValueError, match="not a created view"):
        catalog.sql(spark, "DROP VIEW big")
    with pytest.raises(ValueError, match="DROP TABLE"):
        catalog.sql(spark, "DROP VIEW vt")
    with pytest.raises(ValueError, match="cannot shadow"):
        catalog.sql(spark, "CREATE VIEW vt AS SELECT 1 AS x")
    catalog.sql(spark, "CREATE VIEW r AS SELECT k FROM vt")
    with pytest.raises(ValueError, match="references itself"):
        catalog.sql(spark, "CREATE OR REPLACE VIEW r AS SELECT k FROM r")
    # a self-looking name inside a string literal is data, not a ref
    catalog.sql(
        spark, "CREATE OR REPLACE VIEW r AS SELECT 'r' AS tag FROM vt"
    )
    assert catalog.sql(spark, "SELECT tag FROM r").first().tag == "r"


def test_create_view_validates_body_eagerly(spark, vt):
    with pytest.raises(Exception):
        catalog.sql(spark, "CREATE VIEW bad AS SELECT nope FROM vt")
    assert "bad" not in catalog._session_views(spark)


def test_show_tables_lists_bindings_and_views(spark, vt):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k FROM vt WHERE v >= 15")
    rows = {r.name: r for r in catalog.sql(spark, "SHOW TABLES").collect()}
    assert rows["vt"].kind == "table" and rows["vt"].location == vt
    assert rows["vt"].version == 0 and rows["vt"].pinned is False
    assert rows["big"].kind == "view"
    assert rows["big"].definition == "SELECT k FROM vt WHERE v >= 15"


def test_describe_table_and_view(spark, vt):
    catalog.sql(spark, "CREATE VIEW big AS SELECT k FROM vt WHERE v >= 15")
    t_rows = [
        (r.col_name, r.data_type)
        for r in catalog.sql(spark, "DESCRIBE TABLE vt").collect()
    ]
    assert t_rows == [("k", "bigint"), ("v", "double")]
    v_rows = [
        (r.col_name, r.data_type)
        for r in catalog.sql(spark, "DESCRIBE big").collect()
    ]
    assert v_rows == [("k", "bigint")]
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "DESCRIBE TABLE nope")
    # DESCRIBE HISTORY still routes to the commit log, not the schema
    hist = catalog.sql(spark, "DESCRIBE HISTORY vt")
    assert "op" in hist.columns


def test_show_partitions_from_log_metadata(spark, tmp_path):
    """SHOW PARTITIONS serves from the commit log's file paths — the
    active set only (replaced/deleted partitions drop out), zero data
    IO; unpartitioned tables and unregistered names refuse."""
    from wikistream_lakehouse_spark.lakehouse.silver import (  # noqa: F401
        curate_to_silver,
    )

    t = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")],
        "k long, ds string",
    )
    txn.append(df, t, partition_by=["ds"])
    catalog.register_table(spark, "sp_t", t)
    try:
        got = [r.ds for r in catalog.sql(
            spark, "SHOW PARTITIONS sp_t"
        ).collect()]
        assert sorted(got) == ["2024-01-01", "2024-01-02"]
        # a CoW delete that empties a partition removes it from the set
        txn.delete_where(spark, t, "ds = '2024-01-01'")
        catalog.refresh_table(spark, "sp_t")
        got = [r.ds for r in catalog.sql(
            spark, "SHOW PARTITIONS sp_t"
        ).collect()]
        assert got == ["2024-01-02"]
        with pytest.raises(ValueError, match="not a partitioned"):
            u = str(tmp_path / "u")
            txn.append(spark.createDataFrame([(1,)], "k long"), u)
            catalog.register_table(spark, "sp_u", u)
            catalog.sql(spark, "SHOW PARTITIONS sp_u")
        with pytest.raises(ValueError, match="not a registered"):
            catalog.sql(spark, "SHOW PARTITIONS nope")
    finally:
        catalog.unregister_table(spark, "sp_t")
        catalog.unregister_table(spark, "sp_u")


def test_show_partitions_decodes_uri_values(spark, tmp_path):
    t = str(tmp_path / "enc")
    txn.append(
        spark.createDataFrame(
            [(1, "has space"), (2, "a/b")], "k long, tag string"
        ),
        t,
        partition_by=["tag"],
    )
    catalog.register_table(spark, "sp_enc", t)
    try:
        got = sorted(
            r.tag
            for r in catalog.sql(spark, "SHOW PARTITIONS sp_enc").collect()
        )
        assert got == ["a/b", "has space"]
    finally:
        catalog.unregister_table(spark, "sp_enc")
