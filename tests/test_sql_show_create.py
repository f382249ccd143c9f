"""SHOW CREATE TABLE on the catalog SQL front door (VERDICT r10 next
#6): the returned script is ROUND-TRIPPABLE — running it through
sql_script with a fresh name/LOCATION recreates an empty table with
the same logical schema, partition layout, CHECK constraints,
generated columns and declared stats columns. Views return their
CREATE VIEW text."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def bound(spark, tmp_path):
    t = str(tmp_path / "t")
    catalog.sql_script(
        spark,
        f"""
        CREATE TABLE sc_t (k BIGINT, v DOUBLE, ds STRING)
            PARTITIONED BY (ds) LOCATION '{t}';
        ALTER TABLE sc_t ADD CONSTRAINT v_pos CHECK (v >= 0);
        ALTER TABLE sc_t SET STATS COLUMNS (k, v);
        INSERT INTO sc_t VALUES (1, 1.5, '2024-01-01'), (2, 2.5, '2024-01-02');
        """,
    )
    yield t
    for n in ("sc_t", "sc_t2"):
        try:
            catalog.unregister_table(spark, n)
        except Exception:
            pass
    views = catalog._session_views(spark)
    for name in list(views):
        views.pop(name)
        spark.catalog.dropTempView(name)


def test_show_create_table_shape(spark, bound):
    df = catalog.sql(spark, "SHOW CREATE TABLE sc_t")
    assert [f.name for f in df.schema.fields] == ["createtab_stmt"]
    ddl = df.first().createtab_stmt
    assert "CREATE TABLE sc_t" in ddl
    assert "PARTITIONED BY (ds)" in ddl
    assert f"LOCATION '{bound}'" in ddl
    assert "ADD CONSTRAINT v_pos CHECK (v >= 0)" in ddl
    assert "SET STATS COLUMNS (k, v)" in ddl


def test_show_create_table_round_trips(spark, bound, tmp_path):
    ddl = catalog.sql(spark, "SHOW CREATE TABLE sc_t").first().createtab_stmt
    t2 = str(tmp_path / "t2")
    ddl2 = ddl.replace("sc_t", "sc_t2").replace(
        f"LOCATION '{bound}'", f"LOCATION '{t2}'"
    )
    catalog.sql_script(spark, ddl2)
    d1 = catalog.sql(spark, "DESCRIBE TABLE sc_t").collect()
    d2 = catalog.sql(spark, "DESCRIBE TABLE sc_t2").collect()
    assert [(r.col_name, r.data_type) for r in d1] == [
        (r.col_name, r.data_type) for r in d2
    ]
    assert txn.constraints(t2) == {"v_pos": "v >= 0"}
    assert txn.stats_columns(t2) == ["k", "v"]
    assert txn._current_partitioning(t2) == ["ds"]
    # the recreated table enforces the carried constraint
    with pytest.raises(txn.ConstraintViolation, match="v_pos"):
        catalog.sql(spark, "INSERT INTO sc_t2 VALUES (9, -1.0, '2024-01-03')")


def test_show_create_carries_generated_columns(spark, tmp_path):
    t = str(tmp_path / "g")
    catalog.sql_script(
        spark,
        f"""
        CREATE TABLE sc_g (k BIGINT, v DOUBLE, v2 DOUBLE) LOCATION '{t}';
        ALTER TABLE sc_g SET GENERATED v2 AS (v * 2);
        """,
    )
    try:
        ddl = (
            catalog.sql(spark, "SHOW CREATE TABLE sc_g")
            .first()
            .createtab_stmt
        )
        assert "SET GENERATED v2 AS (v * 2)" in ddl
    finally:
        catalog.unregister_table(spark, "sc_g")


def test_show_create_on_view_returns_view_text(spark, bound):
    catalog.sql(spark, "CREATE VIEW sc_v AS SELECT k FROM sc_t WHERE v > 1")
    ddl = catalog.sql(spark, "SHOW CREATE TABLE sc_v").first().createtab_stmt
    assert ddl == "CREATE VIEW sc_v AS SELECT k FROM sc_t WHERE v > 1"


def test_show_create_uses_logical_names_after_rename(spark, tmp_path):
    t = str(tmp_path / "r")
    catalog.sql(
        spark, f"CREATE TABLE sc_r (k BIGINT, v DOUBLE) LOCATION '{t}'"
    )
    try:
        catalog.sql(spark, "ALTER TABLE sc_r RENAME COLUMN v TO val")
        ddl = (
            catalog.sql(spark, "SHOW CREATE TABLE sc_r")
            .first()
            .createtab_stmt
        )
        assert "val DOUBLE" in ddl and " v DOUBLE" not in ddl
    finally:
        catalog.unregister_table(spark, "sc_r")


def test_show_create_unknown_name_refuses(spark):
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "SHOW CREATE TABLE nope")


def test_show_create_mixes_into_a_script(spark, bound):
    out = catalog.sql_script(
        spark,
        """
        SHOW CREATE TABLE sc_t;
        SELECT count(*) AS n FROM sc_t;
        """,
    )
    assert "CREATE TABLE sc_t" in out[0].first().createtab_stmt
    assert out[1].first().n == 2


def test_explain_routes_through_the_front_door(spark, bound):
    """EXPLAIN rides the read path with the time-travel rewrite applied
    to the inner body — the analyst can inspect a historical read's
    physical plan through the same front door."""
    df = catalog.sql(spark, "EXPLAIN SELECT count(*) FROM sc_t")
    out = "\n".join(r[0] for r in df.collect())
    assert "Physical Plan" in out
    # v3 = the INSERT commit (0 create, 1 constraint, 2 stats): the
    # pinned snapshot has files, so the plan shows the parquet scan
    df2 = catalog.sql(
        spark, "EXPLAIN FORMATTED SELECT k FROM sc_t VERSION AS OF 3"
    )
    out2 = "\n".join(r[0] for r in df2.collect())
    assert "Scan parquet" in out2 or "FileScan" in out2
