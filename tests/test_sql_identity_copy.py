"""SQL front door for the round-11 write-surface additions: identity
columns (CREATE ... GENERATED AS IDENTITY / ALTER SET IDENTITY),
TRUNCATE TABLE, and COPY INTO — each statement routes to the
transactional engine and the binding auto-refreshes."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def reg(spark):
    made = []

    def _reg(name, path):
        catalog.register_table(spark, name, path)
        made.append(name)
        return name

    yield _reg
    for n in made:
        catalog.unregister_table(spark, n)


def test_create_table_with_identity_clause(spark, tmp_path, reg):
    loc = tmp_path / "idt"
    catalog.sql(
        spark,
        f"CREATE TABLE idt (id BIGINT GENERATED ALWAYS AS IDENTITY "
        f"(START WITH 100 INCREMENT BY 10), name STRING) "
        f"LOCATION '{loc}'",
    )
    reg("idt", str(loc))
    catalog.sql(spark, "INSERT INTO idt (name) VALUES ('a'), ('b')")
    rows = spark.table("idt").collect()
    ids = {r.id for r in rows}
    assert len(ids) == 2
    assert all(i >= 100 and (i - 100) % 10 == 0 for i in ids)
    # ALWAYS: supplying the column is refused
    with pytest.raises(txn.ConstraintViolation, match="ALWAYS"):
        catalog.sql(spark, "INSERT INTO idt (id, name) VALUES (1, 'c')")


def test_alter_set_identity_and_drop(spark, tmp_path, reg):
    t = str(tmp_path / "t")
    txn.append(spark.createDataFrame([(5, "a")], "id long, name string"), t)
    reg("alt_i", t)
    catalog.sql(spark, "ALTER TABLE alt_i SET IDENTITY id BY DEFAULT")
    catalog.sql(spark, "INSERT INTO alt_i (name) VALUES ('b')")
    ids = [r.id for r in spark.table("alt_i").collect()]
    assert len(set(ids)) == 2 and max(ids) > 5  # seeded from existing max
    catalog.sql(spark, "ALTER TABLE alt_i DROP IDENTITY id")
    catalog.sql(spark, "INSERT INTO alt_i (id, name) VALUES (999, 'c')")
    assert 999 in [r.id for r in spark.table("alt_i").collect()]


def test_show_create_table_emits_identity_and_round_trips(
    spark, tmp_path, reg
):
    t = str(tmp_path / "t")
    txn.append(spark.createDataFrame([(1, "a")], "id long, name string"), t)
    reg("sci", t)
    catalog.sql(spark, "ALTER TABLE sci SET IDENTITY id START 1 STEP 1")
    [row] = catalog.sql(spark, "SHOW CREATE TABLE sci").collect()
    assert "SET IDENTITY id START 1 STEP 1" in row.createtab_stmt
    # the emitted DDL recreates the declaration on a fresh table
    ddl = row.createtab_stmt.replace("sci", "sci2").replace(
        t, str(tmp_path / "t2")
    )
    catalog.sql_script(spark, ddl)
    reg("sci2", str(tmp_path / "t2"))
    assert txn.identity_columns(str(tmp_path / "t2")) == {
        "id": {"start": 1, "step": 1, "always": True}
    }


def test_truncate_table_statement(spark, tmp_path, reg):
    t = str(tmp_path / "t")
    txn.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"), t)
    reg("trunc_t", t)
    v = catalog.sql(spark, "TRUNCATE TABLE trunc_t")
    assert spark.table("trunc_t").count() == 0
    assert spark.table("trunc_t").columns == ["k", "s"]
    # history intact: restore undoes the truncate
    catalog.sql(spark, f"RESTORE TABLE trunc_t TO VERSION AS OF {v - 1}")
    assert spark.table("trunc_t").count() == 2


def test_copy_into_statement_idempotent(spark, tmp_path, reg):
    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"
    ).coalesce(1).write.parquet(str(src))
    t = str(tmp_path / "t")
    catalog.sql(
        spark, f"CREATE TABLE cpt (k BIGINT, s STRING) LOCATION '{t}'"
    )
    reg("cpt", t)
    v = catalog.sql(
        spark, f"COPY INTO cpt FROM '{src}' FILEFORMAT = PARQUET"
    )
    assert v is not None and spark.table("cpt").count() == 2
    again = catalog.sql(
        spark, f"COPY INTO cpt FROM '{src}' FILEFORMAT = PARQUET"
    )
    assert again is None  # no-op re-run
    assert spark.table("cpt").count() == 2


def test_copy_into_pattern_and_format_options(spark, tmp_path, reg):
    src = tmp_path / "srcj"
    spark.createDataFrame([(1, "a")], "k long, s string").coalesce(
        1
    ).write.json(str(src))
    t = str(tmp_path / "t")
    catalog.sql(
        spark, f"CREATE TABLE cpj (k BIGINT, s STRING) LOCATION '{t}'"
    )
    reg("cpj", t)
    catalog.sql(
        spark,
        f"COPY INTO cpj FROM '{src}' FILEFORMAT = JSON "
        f"PATTERN = '*.json' "
        f"FORMAT_OPTIONS ('mode' = 'FAILFAST')",
    )
    assert {(r.k, r.s) for r in spark.table("cpj").collect()} == {(1, "a")}
    with pytest.raises(ValueError, match="FORMAT_OPTIONS"):
        catalog.sql(
            spark,
            f"COPY INTO cpj FROM '{src}' FILEFORMAT = JSON "
            f"FORMAT_OPTIONS (mode = FAILFAST)",
        )


def test_unregistered_and_pinned_targets_refused(spark, tmp_path, reg):
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "TRUNCATE TABLE nope")
    t = str(tmp_path / "t")
    txn.append(spark.createDataFrame([(1,)], "k long"), t)
    catalog.register_table(spark, "pin_t", t, version=0)
    try:
        with pytest.raises(ValueError, match="pinned|read-only"):
            catalog.sql(spark, "TRUNCATE TABLE pin_t")
    finally:
        catalog.unregister_table(spark, "pin_t")
