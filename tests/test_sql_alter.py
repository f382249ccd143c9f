"""ALTER TABLE on the catalog SQL front door: every action routes to
one of the engine's metadata-only commits (column mapping, schema
evolution, CHECK constraints, generated columns, declared stats
columns) and the binding auto-refreshes. Reference anchor: schema
changes in the reference require editing the Glue crawler/DDL and
re-running the pipeline; here each is one commit, zero data IO."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def at(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double"), t
    )
    catalog.register_table(spark, "alt_t", t)
    yield t
    catalog.unregister_table(spark, "alt_t")


def test_rename_column_is_metadata_only(spark, at):
    files_before = txn._replay_state(at, txn.current_version(at))[0]
    v = catalog.sql(spark, "ALTER TABLE alt_t RENAME COLUMN v TO price")
    assert v == 1
    assert spark.table("alt_t").columns == ["k", "price"]
    # zero data IO: the active file set is untouched
    assert txn._replay_state(at, txn.current_version(at))[0] == files_before
    # time travel shows the old name at the old version
    assert txn.read_table(spark, at, version=0).columns == ["k", "v"]


def test_add_column_null_fills_existing_rows(spark, at):
    catalog.sql(spark, "ALTER TABLE alt_t ADD COLUMN tag STRING")
    tbl = spark.table("alt_t")
    assert tbl.columns == ["k", "v", "tag"]
    assert tbl.filter("tag IS NULL").count() == 2
    catalog.sql(spark, "INSERT INTO alt_t VALUES (3, 30.0, 'x')")
    assert spark.table("alt_t").filter("tag = 'x'").count() == 1
    with pytest.raises(ValueError, match="already exists"):
        catalog.sql(spark, "ALTER TABLE alt_t ADD COLUMN tag STRING")
    # complex types parse too
    catalog.sql(spark, "ALTER TABLE alt_t ADD COLUMN scores ARRAY<DOUBLE>")
    assert dict(spark.table("alt_t").dtypes)["scores"] == "array<double>"


def test_drop_column_hides_but_time_travel_serves(spark, at):
    catalog.sql(spark, "ALTER TABLE alt_t DROP COLUMN v")
    assert spark.table("alt_t").columns == ["k"]
    assert txn.read_table(spark, at, version=0).columns == ["k", "v"]


def test_constraints_via_alter(spark, at):
    catalog.sql(
        spark, "ALTER TABLE alt_t ADD CONSTRAINT v_pos CHECK (v > 0)"
    )
    with pytest.raises(txn.ConstraintViolation):
        catalog.sql(spark, "INSERT INTO alt_t VALUES (9, -1.0)")
    # adding a constraint existing rows violate is refused
    with pytest.raises(txn.ConstraintViolation):
        catalog.sql(
            spark, "ALTER TABLE alt_t ADD CONSTRAINT v_big CHECK (v > 15)"
        )
    catalog.sql(spark, "ALTER TABLE alt_t DROP CONSTRAINT v_pos")
    catalog.sql(spark, "INSERT INTO alt_t VALUES (9, -1.0)")
    assert spark.table("alt_t").count() == 3
    with pytest.raises(ValueError, match="no constraint"):
        catalog.sql(spark, "ALTER TABLE alt_t DROP CONSTRAINT nope")


def test_generated_column_via_alter(spark, at):
    catalog.sql(spark, "ALTER TABLE alt_t ADD COLUMN dbl DOUBLE")
    # declaring over rows that violate the invariant is refused...
    with pytest.raises(txn.ConstraintViolation, match="violate"):
        catalog.sql(
            spark, "ALTER TABLE alt_t SET GENERATED dbl AS (v * 2)"
        )
    # ...so backfill first (the standard migration), then declare
    catalog.sql(spark, "UPDATE alt_t SET dbl = v * 2 WHERE dbl IS NULL")
    catalog.sql(
        spark, "ALTER TABLE alt_t SET GENERATED dbl AS (v * 2)"
    )
    # writer omits the generated column: computed on the write path
    catalog.sql(spark, "INSERT INTO alt_t (k, v) VALUES (5, 50.0)")
    assert (
        spark.table("alt_t").filter("k = 5").first().dbl == 100.0
    )
    catalog.sql(spark, "ALTER TABLE alt_t DROP GENERATED dbl")
    catalog.sql(spark, "INSERT INTO alt_t (k, v) VALUES (6, 60.0)")
    assert spark.table("alt_t").filter("k = 6").first().dbl is None


def test_set_stats_columns_via_alter(spark, at):
    catalog.sql(spark, "ALTER TABLE alt_t SET STATS COLUMNS (k)")
    catalog.sql(spark, "INSERT INTO alt_t VALUES (100, 1.0)")
    assert "k" in (txn.stats_columns(at) or [])
    catalog.sql(spark, "ALTER TABLE alt_t SET STATS COLUMNS ()")
    assert not txn.stats_columns(at)


def test_alter_refusals(spark, at):
    with pytest.raises(ValueError, match="unsupported ALTER"):
        catalog.sql(spark, "ALTER TABLE alt_t FROBNICATE x")
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "ALTER TABLE nope DROP COLUMN v")
    # pinned bindings are read-only for DDL too
    catalog.register_table(spark, "alt_pin", at, version=0)
    try:
        with pytest.raises(ValueError, match="read-only"):
            catalog.sql(spark, "ALTER TABLE alt_pin DROP COLUMN v")
    finally:
        catalog.unregister_table(spark, "alt_pin")


def test_alter_set_partitioning_evolves_spec(spark, at):
    """SET PARTITIONED BY: metadata-only partition evolution — future
    writes land under the new spec, old files keep their layout, reads
    span both."""
    catalog.sql(spark, "ALTER TABLE alt_t ADD COLUMN ds STRING")
    catalog.sql(spark, "UPDATE alt_t SET ds = 'old' WHERE ds IS NULL")
    catalog.sql(spark, "ALTER TABLE alt_t SET PARTITIONED BY (ds)")
    catalog.sql(spark, "INSERT INTO alt_t VALUES (7, 70.0, 'new')")
    assert txn.table_detail(at)["partition_by"] == ["ds"]
    got = {r.ds for r in spark.table("alt_t").select("ds").collect()}
    assert got == {"old", "new"}


def test_create_table_clone_and_convert(spark, at, tmp_path):
    """CREATE TABLE ... CLONE (zero-copy snapshot clone, version-pinnable)
    and CONVERT TO TXN 'dir' AS name (adopt plain parquet in place)."""
    catalog.sql(spark, "INSERT INTO alt_t VALUES (100, 1.0)")  # v1
    loc = str(tmp_path / "c")
    v = catalog.sql(
        spark,
        f"CREATE TABLE alt_clone CLONE alt_t VERSION AS OF 0 "
        f"LOCATION '{loc}'",
    )
    try:
        assert spark.table("alt_clone").count() == 2  # v0 only
        # independence: writes to the clone never touch the source
        catalog.sql(spark, "INSERT INTO alt_clone VALUES (999, 9.0)")
        assert spark.table("alt_clone").count() == 3
        assert spark.table("alt_t").count() == 3  # 2 + the v1 insert
        with pytest.raises(ValueError, match="already registered"):
            catalog.sql(spark, f"CREATE TABLE alt_clone CLONE alt_t")
    finally:
        catalog.unregister_table(spark, "alt_clone")
    # CONVERT: plain parquet dir becomes a txn table in place
    plain = str(tmp_path / "plain")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, tag string"
    ).coalesce(1).write.parquet(plain)
    v = catalog.sql(spark, f"CONVERT TO TXN '{plain}' AS adopted")
    try:
        assert v == 0
        assert spark.table("adopted").count() == 2
        catalog.sql(spark, "INSERT INTO adopted VALUES (3, 'c')")
        assert txn.read_table(spark, plain).count() == 3
    finally:
        catalog.unregister_table(spark, "adopted")
