"""SQL maintenance statements over registered txn tables
(catalog.sql_dml routing): OPTIMIZE [WHERE/ZORDER BY], VACUUM,
CHECKPOINT, RESTORE ... TO VERSION AS OF, GENERATE
symlink_format_manifest — each reaches the corresponding engine call,
bindings refresh, version-pinned names stay refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import catalog, txn


def _kv(spark, lo, hi, tag="a"):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            F.lit(tag).alias("ds"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def reg(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):  # several small commits → compactable
        txn.append(_kv(spark, i * 10, (i + 1) * 10), t)
    catalog.register_table(spark, "mnt_t", t)
    yield t
    catalog.unregister_table(spark, "mnt_t")


def test_optimize_compacts_and_refreshes(spark, reg):
    before = len(txn._replay(reg, txn.current_version(reg)))
    v = catalog.sql_dml(spark, "OPTIMIZE mnt_t")
    assert v == txn.current_version(reg)
    after = len(txn._replay(reg, txn.current_version(reg)))
    assert after < before
    assert spark.sql("SELECT count(*) AS n FROM mnt_t").first().n == 40


def test_optimize_zorder_by(spark, reg):
    v = catalog.sql_dml(spark, "OPTIMIZE mnt_t ZORDER BY (k, v)")
    assert v is not None
    assert spark.table("mnt_t").count() == 40


def test_optimize_where_scopes_to_partition(spark, tmp_path):
    t = str(tmp_path / "p")
    txn.append(_kv(spark, 0, 10, "x"), t, partition_by=["ds"])
    txn.append(_kv(spark, 10, 20, "x"), t, partition_by=["ds"])
    txn.append(_kv(spark, 20, 30, "y"), t, partition_by=["ds"])
    catalog.register_table(spark, "mnt_p", t)
    try:
        files_before = txn._replay(t, txn.current_version(t))
        y_before = [f for f in files_before if "ds=y" in f]
        catalog.sql_dml(spark, "OPTIMIZE mnt_p WHERE ds = 'x'")
        files_after = txn._replay(t, txn.current_version(t))
        # y partition untouched (exact paths survive), x compacted
        assert [f for f in files_after if "ds=y" in f] == y_before
        assert len([f for f in files_after if "ds=x" in f]) < len(
            [f for f in files_before if "ds=x" in f]
        )
        assert spark.table("mnt_p").count() == 30
    finally:
        catalog.unregister_table(spark, "mnt_p")


def test_optimize_where_refuses_non_equality(spark, reg):
    with pytest.raises(ValueError, match="OPTIMIZE"):
        catalog.sql_dml(spark, "OPTIMIZE mnt_t WHERE ds > 'a'")


def test_vacuum_retain_and_dry_run(spark, reg):
    catalog.sql_dml(spark, "OPTIMIZE mnt_t")  # retire the small files
    dry = catalog.sql_dml(spark, "VACUUM mnt_t RETAIN 1 VERSIONS DRY RUN")
    assert isinstance(dry, list) and dry
    assert all(os.path.exists(os.path.join(reg, f)) for f in dry)
    removed = catalog.sql_dml(spark, "VACUUM mnt_t RETAIN 1 VERSIONS")
    assert sorted(removed) == sorted(dry)
    assert not any(os.path.exists(os.path.join(reg, f)) for f in removed)
    assert spark.table("mnt_t").count() == 40


def test_checkpoint_statement(spark, reg):
    v = catalog.sql_dml(spark, "CHECKPOINT mnt_t")
    assert v == txn.current_version(reg)
    assert txn._latest_checkpoint(reg) is not None


def test_restore_to_version_as_of(spark, reg):
    catalog.sql_dml(spark, "DELETE FROM mnt_t WHERE k < 20")
    assert spark.table("mnt_t").count() == 20
    v = catalog.sql_dml(spark, "RESTORE mnt_t TO VERSION AS OF 3")
    assert v == txn.current_version(reg)
    # binding refreshed: the name serves the restored snapshot
    assert spark.sql("SELECT count(*) AS n FROM mnt_t").first().n == 40


def test_generate_manifest_statement(spark, reg):
    out = catalog.sql_dml(
        spark, "GENERATE symlink_format_manifest FOR TABLE mnt_t"
    )
    assert set(out) == {"manifest"}
    active = {
        os.path.join(reg, f)
        for f in txn._replay(reg, txn.current_version(reg))
    }
    assert set(out["manifest"]) == active
    assert os.path.exists(
        os.path.join(reg, "_symlink_format_manifest", "manifest")
    )


def test_maintenance_refused_on_version_pinned_binding(spark, reg):
    catalog.register_table(spark, "mnt_pin", reg, version=0)
    try:
        for stmt in (
            "OPTIMIZE mnt_pin",
            "VACUUM mnt_pin",
            "CHECKPOINT mnt_pin",
            "RESTORE mnt_pin TO VERSION AS OF 0",
            "GENERATE symlink_format_manifest FOR TABLE mnt_pin",
        ):
            with pytest.raises(ValueError):
                catalog.sql_dml(spark, stmt)
    finally:
        catalog.unregister_table(spark, "mnt_pin")


def test_unknown_statement_still_refused_loudly(spark, reg):
    # ANALYZE graduated to a supported statement (r11); GRANT stands in
    # as the canonical out-of-grammar form
    with pytest.raises(ValueError, match="unsupported DML"):
        catalog.sql_dml(spark, "GRANT SELECT ON mnt_t TO analyst")
    # ANALYZE itself routes — and refuses helpfully without columns
    with pytest.raises(ValueError, match="no columns"):
        catalog.sql_dml(spark, "ANALYZE TABLE mnt_t COMPUTE STATISTICS")


# ---- DDL: CREATE TABLE AS / DROP TABLE ---------------------------------
def test_ctas_creates_registers_and_reads_back(spark, tmp_path):
    loc = str(tmp_path / "ctas_t")
    v = catalog.sql_dml(
        spark,
        f"CREATE TABLE ctas_t LOCATION '{loc}' AS "
        "SELECT id AS k, id * 2.0 AS v FROM range(50)",
    )
    try:
        assert v == 0
        assert spark.sql("SELECT count(*) AS n FROM ctas_t").first().n == 50
        assert txn.current_version(loc) == 0
    finally:
        catalog.sql_dml(spark, "DROP TABLE ctas_t")


def test_ctas_partitioned_layout(spark, tmp_path):
    loc = str(tmp_path / "ctas_p")
    catalog.sql_dml(
        spark,
        f"CREATE TABLE ctas_p PARTITIONED BY (tag) LOCATION '{loc}' AS "
        "SELECT id AS k, CAST(id % 2 AS STRING) AS tag FROM range(20)",
    )
    try:
        files = txn._replay(loc, txn.current_version(loc))
        assert any("tag=0" in f for f in files)
        assert any("tag=1" in f for f in files)
    finally:
        catalog.sql_dml(spark, "DROP TABLE ctas_p")


def test_create_or_replace_changes_schema_atomically(spark, tmp_path):
    loc = str(tmp_path / "ctas_r")
    catalog.sql_dml(
        spark,
        f"CREATE TABLE ctas_r LOCATION '{loc}' AS "
        "SELECT id AS k FROM range(10)",
    )
    try:
        with pytest.raises(ValueError, match="OR REPLACE"):
            catalog.sql_dml(
                spark,
                f"CREATE TABLE ctas_r LOCATION '{loc}' AS "
                "SELECT id AS k FROM range(5)",
            )
        catalog.sql_dml(
            spark,
            f"CREATE OR REPLACE TABLE ctas_r LOCATION '{loc}' AS "
            "SELECT id AS k, 'x' AS tag FROM range(7)",
        )
        got = spark.table("ctas_r")
        assert sorted(got.columns) == ["k", "tag"] and got.count() == 7
        # the pre-replace snapshot time-travels
        assert txn.read_table(spark, loc, version=0).columns == ["k"]
        assert txn.read_table(spark, loc, version=0).count() == 10
    finally:
        catalog.sql_dml(spark, "DROP TABLE ctas_r")


def test_ctas_reads_registered_views(spark, tmp_path):
    src = str(tmp_path / "src")
    txn.append(_kv(spark, 0, 30), src)
    catalog.register_table(spark, "ddl_src", src)
    loc = str(tmp_path / "dst")
    try:
        catalog.sql_dml(
            spark,
            f"CREATE TABLE ddl_dst LOCATION '{loc}' AS "
            "SELECT k, v FROM ddl_src WHERE k >= 20",
        )
        assert spark.table("ddl_dst").count() == 10
    finally:
        catalog.unregister_table(spark, "ddl_src")
        catalog.sql_dml(spark, "DROP TABLE ddl_dst")


def test_drop_table_purge_removes_log_and_data(spark, tmp_path):
    loc = str(tmp_path / "doomed")
    catalog.sql_dml(
        spark,
        f"CREATE TABLE doomed LOCATION '{loc}' AS "
        "SELECT id AS k FROM range(5)",
    )
    assert txn.current_version(loc) == 0
    catalog.sql_dml(spark, "DROP TABLE doomed PURGE")
    assert txn.current_version(loc) < 0  # log gone
    assert not os.path.exists(loc)
    with pytest.raises(ValueError):
        catalog.sql_dml(spark, "DROP TABLE doomed")  # binding gone too


def test_drop_without_purge_keeps_the_table(spark, tmp_path):
    loc = str(tmp_path / "kept")
    catalog.sql_dml(
        spark,
        f"CREATE TABLE kept LOCATION '{loc}' AS "
        "SELECT id AS k FROM range(5)",
    )
    catalog.sql_dml(spark, "DROP TABLE kept")
    assert txn.current_version(loc) == 0  # data + log intact
    catalog.register_table(spark, "kept2", loc)
    try:
        assert spark.table("kept2").count() == 5
    finally:
        catalog.unregister_table(spark, "kept2")


def test_create_or_replace_respects_existing_binding_path(spark, tmp_path):
    """ADVICE r8 medium #2: OR REPLACE without LOCATION must replace
    the table the binding points at (one atomic replace commit, history
    time-travelable) — not mint a new table at the default warehouse
    path, orphaning the old one."""
    loc = str(tmp_path / "custom" / "spot")
    txn.append(
        spark.range(5).select(F.col("id").alias("k")).coalesce(1), loc
    )
    catalog.register_table(spark, "pinned_loc", loc)
    v = catalog.sql_dml(
        spark, "CREATE OR REPLACE TABLE pinned_loc AS SELECT 99 AS k"
    )
    # the replacement landed at the ORIGINAL location as a new version
    assert txn.current_version(loc) == v == 1
    assert spark.table("pinned_loc").collect()[0].k == 99
    # history stayed time-travelable at that path
    assert txn.read_table(spark, loc, version=0).count() == 5
    # and nothing appeared at the default warehouse path
    wh = catalog._warehouse_path(spark, "pinned_loc")
    assert txn.current_version(wh) < 0


def test_create_or_replace_refused_on_pinned_binding(spark, tmp_path):
    loc = str(tmp_path / "t")
    txn.append(
        spark.range(3).select(F.col("id").alias("k")).coalesce(1), loc
    )
    txn.append(
        spark.range(3, 6).select(F.col("id").alias("k")).coalesce(1), loc
    )
    catalog.register_table(spark, "pinned_snap", loc, version=0)
    with pytest.raises(ValueError, match="version-pinned"):
        catalog.sql_dml(
            spark, "CREATE OR REPLACE TABLE pinned_snap AS SELECT 1 AS k"
        )


def test_restore_to_timestamp_as_of(spark, tmp_path):
    import time

    loc = str(tmp_path / "t")
    txn.append(
        spark.range(5).select(F.col("id").alias("k")).coalesce(1), loc
    )
    t_after_v0 = txn.history(loc)[-1]["ts"] + 0.01
    time.sleep(0.05)
    txn.append(
        spark.range(5, 9).select(F.col("id").alias("k")).coalesce(1), loc
    )
    catalog.register_table(spark, "rst_ts", loc)
    from datetime import datetime

    iso = datetime.fromtimestamp(t_after_v0).isoformat()
    v = catalog.sql_dml(
        spark, f"RESTORE TABLE rst_ts TO TIMESTAMP AS OF '{iso}'"
    )
    assert v == txn.current_version(loc)
    assert spark.table("rst_ts").count() == 5


def test_maintain_table_statement(spark, tmp_path):
    loc = str(tmp_path / "t")
    # many tiny files so the tending pass has something to do
    for i in range(10):
        txn.append(
            spark.range(i * 5, i * 5 + 5)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            loc,
        )
    catalog.register_table(spark, "tended", loc)
    report = catalog.sql_dml(spark, "MAINTAIN TABLE tended")
    assert "compact" in report  # 10 tiny files trip the small-file policy
    assert spark.table("tended").count() == 50  # binding auto-refreshed
    # WITH LOG RETENTION also checkpoints + cleans (or reports refusal)
    report2 = catalog.sql_dml(spark, "MAINTAIN tended WITH LOG RETENTION")
    assert ("cleanup_log" in report2) or ("cleanup_log_refused" in report2)
    assert spark.table("tended").count() == 50


def test_vacuum_retain_hours(spark, reg):
    """RETAIN n HOURS (the Delta default form): keeps the snapshot
    current at the window edge plus everything newer. A large window
    over a young table reclaims nothing; HOURS and VERSIONS agree when
    the window covers the same snapshots."""
    catalog.sql_dml(spark, "OPTIMIZE mnt_t")  # retire the small files
    # the whole history is seconds old: a 1-hour window keeps it all
    assert catalog.sql_dml(
        spark, "VACUUM mnt_t RETAIN 1 HOURS DRY RUN"
    ) == []
    # a 0-hour window = only snapshots "current now" → same file list
    # as RETAIN 1 VERSIONS
    by_versions = catalog.sql_dml(
        spark, "VACUUM mnt_t RETAIN 1 VERSIONS DRY RUN"
    )
    by_hours = catalog.sql_dml(spark, "VACUUM mnt_t RETAIN 0 HOURS DRY RUN")
    assert sorted(by_hours) == sorted(by_versions)
