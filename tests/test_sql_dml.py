"""SQL DML routing over registered txn tables (``catalog.sql_dml``):
DELETE/UPDATE/INSERT/MERGE statements reach the transactional engine,
bindings auto-refresh, the narrow grammar refuses loudly outside
itself, and version-pinned bindings stay read-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import catalog, txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.0).alias("v"),
            (F.col("id") % 3).cast("string").alias("tag"),
        )
        .coalesce(1)
    )


@pytest.fixture()
def reg(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    catalog.register_table(spark, "dml_t", t)
    yield t
    catalog.unregister_table(spark, "dml_t")


def test_delete_from_where(spark, reg):
    v = catalog.sql_dml(spark, "DELETE FROM dml_t WHERE k < 10")
    assert v == 1
    # the binding auto-refreshed: SQL over the name sees the delete
    assert spark.sql("SELECT count(*) AS n FROM dml_t").first().n == 90
    # time travel still shows the pre-delete rows
    assert txn.read_table(spark, reg, version=0).count() == 100


def test_delete_mor_mode_routes_to_deletion_vectors(spark, reg):
    catalog.sql_dml(
        spark, "DELETE FROM dml_t WHERE k = 5", delete_mode="mor"
    )
    assert spark.table("dml_t").count() == 99
    assert txn.table_detail(reg)["num_deletion_vectors"] >= 1


def test_update_set_where_with_commas_in_exprs(spark, reg):
    v = catalog.sql_dml(
        spark,
        "UPDATE dml_t SET v = round(v + 0.5, 1), tag = concat(tag, ',x') "
        "WHERE k BETWEEN 10 AND 12",
    )
    assert v == 1
    got = (
        spark.table("dml_t")
        .filter("k = 10")
        .select("v", "tag")
        .first()
    )
    assert got.v == 20.5 and got.tag.endswith(",x")
    assert spark.table("dml_t").filter("tag LIKE '%,x'").count() == 3


def test_insert_select_and_values(spark, reg):
    v = catalog.sql_dml(
        spark,
        "INSERT INTO dml_t SELECT k + 1000, v, tag FROM dml_t WHERE k < 3",
    )
    assert v == 1
    assert spark.table("dml_t").filter("k >= 1000").count() == 3
    catalog.sql_dml(
        spark, "INSERT INTO dml_t VALUES (5000, 1.5, 'zz')"
    )
    row = spark.table("dml_t").filter("k = 5000").first()
    assert row.v == 1.5 and row.tag == "zz"


def test_insert_column_list_null_fills_the_rest(spark, reg):
    catalog.sql_dml(spark, "INSERT INTO dml_t (k, tag) VALUES (7000, 'q')")
    row = spark.table("dml_t").filter("k = 7000").first()
    assert row.v is None and row.tag == "q"
    with pytest.raises(ValueError, match="arity"):
        catalog.sql_dml(spark, "INSERT INTO dml_t (k) VALUES (1, 2)")
    with pytest.raises(ValueError, match="unknown columns"):
        catalog.sql_dml(spark, "INSERT INTO dml_t (nope) VALUES (1)")


def test_merge_upsert_all_shorthand(spark, reg):
    src = spark.createDataFrame(
        [(5, 111.0, "upd"), (9999, 1.0, "new")], "k long, v double, tag string"
    )
    src.createOrReplaceTempView("dml_src")
    v = catalog.sql_dml(
        spark,
        "MERGE INTO dml_t AS t USING dml_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert v == 1
    tbl = spark.table("dml_t")
    assert tbl.count() == 101
    assert tbl.filter("k = 5").first().tag == "upd"
    assert tbl.filter("k = 9999").first().tag == "new"


def test_unsupported_and_malformed_statements_refuse_loudly(spark, reg):
    for stmt in (
        "SELECT * FROM dml_t",
        "ALTER TABLE dml_t SET LOCATION '/x'",  # ALTER beyond the grammar
        "DELETE FROM dml_t",  # no WHERE: TRUNCATE TABLE is the explicit verb
        "COPY INTO dml_t FROM '/x'",  # FILEFORMAT is mandatory
    ):
        with pytest.raises(ValueError, match="grammar|unsupported"):
            catalog.sql_dml(spark, stmt)
    with pytest.raises(ValueError, match="SET assignment"):
        catalog.sql_dml(spark, "UPDATE dml_t SET 5 = v WHERE k = 1")
    with pytest.raises(ValueError, match="equalities|equate"):
        catalog.sql_dml(
            spark,
            "MERGE INTO dml_t AS t USING dml_t AS s ON t.k > s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT *",
        )


def test_unregistered_and_pinned_targets_are_refused(spark, reg):
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql_dml(spark, "DELETE FROM nosuch WHERE k = 1")
    catalog.register_table(spark, "dml_pinned", reg, version=0)
    try:
        with pytest.raises(ValueError, match="read-only"):
            catalog.sql_dml(spark, "DELETE FROM dml_pinned WHERE k = 1")
    finally:
        catalog.unregister_table(spark, "dml_pinned")


def test_dml_composes_with_history_and_cdf(spark, reg):
    # MoR delete: the only delete form CDF can replay (CoW removes files)
    catalog.sql_dml(
        spark, "DELETE FROM dml_t WHERE k < 5", delete_mode="mor"
    )
    catalog.sql_dml(spark, "INSERT INTO dml_t VALUES (42424, 0.0, 'h')")
    ops = [
        r.op
        for r in catalog.history_df(spark, "dml_t").orderBy("version").collect()
    ]
    assert ops[0] == "append" and "delete" in ops and "append" == ops[-1]
    # CDF range is (from, to]: from=0 replays both DML commits
    cdf = txn.table_changes_cdf(spark, reg, 0, txn.current_version(reg))
    kinds = {r["_change_type"] for r in cdf.select("_change_type").collect()}
    assert kinds == {"delete", "insert"}


# --------------------------------------------------------------------------
# Conditional MERGE grammar (VERDICT r7 next #1): WHEN clause parsing
# routes to merge_builder; the exact upsert-all shorthand keeps its
# transactional_upsert route.
# --------------------------------------------------------------------------


@pytest.fixture()
def merge_pair(spark, tmp_path):
    t = str(tmp_path / "mt")
    txn.append(_kv(spark, 0, 10), t)
    catalog.register_table(spark, "m_t", t)
    spark.createDataFrame(
        [
            (2, -2.0, "D"),
            (3, -3.0, "U"),
            (11, -11.0, "U"),
        ],
        "k long, v double, op string",
    ).createOrReplaceTempView("m_src")
    yield t
    catalog.unregister_table(spark, "m_t")
    spark.catalog.dropTempView("m_src")


def test_merge_conditional_clauses_sql(spark, merge_pair):
    v = catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t USING m_src AS s ON t.k = s.k
           WHEN MATCHED AND s.op = 'D' THEN DELETE
           WHEN MATCHED THEN UPDATE SET v = s.v, tag = 'upd'
           WHEN NOT MATCHED AND s.op <> 'D' THEN
               INSERT (k, v, tag) VALUES (s.k, s.v, 'new')
           WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE""",
    )
    assert v == txn.current_version(merge_pair)
    rows = {
        (r.k, r.v, r.tag) for r in spark.table("m_t").collect()
    }
    expected = (
        {(k, k * 2.0, str(k % 3)) for k in range(10) if k not in (2, 3, 8, 9)}
        | {(3, -3.0, "upd"), (11, -11.0, "new")}
    )
    assert rows == expected


def test_merge_update_set_star_and_insert_star_sql(spark, merge_pair):
    """The * forms with a condition route through the builder (not the
    shorthand path) and take source values column-by-column."""
    catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t USING m_src AS s ON t.k = s.k
           WHEN MATCHED AND s.op = 'U' THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    rows = {(r.k, r.v) for r in spark.table("m_t").collect()}
    assert (3, -3.0) in rows            # conditionally updated
    assert (2, 4.0) in rows             # op='D': condition false, kept
    assert (11, -11.0) in rows          # inserted
    # m_src has no 'tag': UPDATE SET * keeps target tag, INSERT * nulls
    tag11 = spark.table("m_t").filter("k = 11").first().tag
    assert tag11 is None


def test_merge_shorthand_still_routes_to_upsert(spark, merge_pair, monkeypatch):
    calls = []
    real = txn.transactional_upsert

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(txn, "transactional_upsert", spy)
    spark.createDataFrame(
        [(1, -1.0, "z")], "k long, v double, tag string"
    ).createOrReplaceTempView("m_src2")
    catalog.sql_dml(
        spark,
        "MERGE INTO m_t AS t USING m_src2 AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert calls == [1]
    assert spark.table("m_t").filter("k = 1").first().v == -1.0
    spark.catalog.dropTempView("m_src2")


def test_merge_bad_when_clause_refused(spark, merge_pair):
    with pytest.raises(ValueError, match="unparseable WHEN clause"):
        catalog.sql_dml(
            spark,
            "MERGE INTO m_t USING m_src ON m_t.k = m_src.k "
            "WHEN SORT OF MATCHED THEN UPDATE SET *",
        )
    with pytest.raises(ValueError, match="arity"):
        catalog.sql_dml(
            spark,
            "MERGE INTO m_t USING m_src ON m_t.k = m_src.k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)",
        )


# ---------------------------------------------------------------------------
# MERGE source forms beyond a plain name (VERDICT r9 next #1):
# USING (subquery) AS s and USING CHANGES(t, start [, end]) AS s
# ---------------------------------------------------------------------------


@pytest.fixture()
def changes_pair(spark, tmp_path):
    """Target m_t (k 0..9) + a TWO-version source table: v0 = k 2,3
    updates, v1 = k 11 arrival (the delta a CDC consumer folds)."""
    t = str(tmp_path / "mt")
    txn.append(_kv(spark, 0, 10), t)
    catalog.register_table(spark, "m_t", t)
    s = str(tmp_path / "ms")
    txn.append(
        spark.createDataFrame(
            [(2, -2.0, "a"), (3, -3.0, "a")], "k long, v double, tag string"
        ),
        s,
    )
    txn.append(
        spark.createDataFrame([(11, -11.0, "b")], "k long, v double, tag string"),
        s,
    )
    catalog.register_table(spark, "m_s", s)
    yield t
    catalog.unregister_table(spark, "m_t")
    catalog.unregister_table(spark, "m_s")


def test_merge_using_subquery_source(spark, changes_pair):
    """USING (SELECT …) AS s: the subquery body is evaluated through
    the same in-query time-travel grammar as INSERT/CTAS bodies, so a
    historical snapshot can drive the merge."""
    v = catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t
           USING (SELECT k, v * 10 AS v FROM m_s VERSION AS OF 0) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""",
    )
    assert v == 1
    got = {r.k: r.v for r in spark.table("m_t").collect()}
    assert got[2] == -20.0 and got[3] == -30.0
    assert 11 not in got  # v0 has no k=11 — it arrives in v1


def test_merge_using_changes_source(spark, changes_pair):
    """USING CHANGES(t, start) AS s: the one-statement CDC consumer —
    the source is the row-level change feed (table columns +
    _change_type/_commit_version)."""
    v = catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t USING CHANGES(m_s, 1, 1) AS s
           ON t.k = s.k AND s._change_type = 'insert'
           WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
           WHEN NOT MATCHED AND s._change_type = 'insert'
               THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)""",
    )
    assert v == 1
    tbl = spark.table("m_t")
    assert tbl.count() == 11
    assert tbl.filter("k = 11").first().v == -11.0
    # the v0 rows were NOT in this delta: untouched
    assert tbl.filter("k = 2").first().v == 4.0


def test_merge_subquery_shorthand_routes_to_upsert(spark, changes_pair):
    """UPDATE SET * / INSERT * shorthand works with a subquery source
    (schema-aligned projection required, like the named form)."""
    v = catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t
           USING (SELECT k, v, tag FROM m_s VERSION AS OF 1) AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
    )
    assert v == 1
    got = {r.k: (r.v, r.tag) for r in spark.table("m_t").collect()}
    assert got[2] == (-2.0, "a") and got[11] == (-11.0, "b")


def test_merge_source_alias_required_for_anonymous_sources(spark, changes_pair):
    for src in ("(SELECT 1 AS k)", "CHANGES(m_s, 1)"):
        with pytest.raises(ValueError, match="AS <alias>"):
            catalog.sql_dml(
                spark,
                f"MERGE INTO m_t USING {src} ON m_t.k = k "
                "WHEN MATCHED THEN DELETE",
            )


def test_merge_subquery_nested_parens_and_literals(spark, changes_pair):
    """Balanced-paren scan: nested function calls and a string literal
    containing ')' and ' ON ' inside the subquery don't break parsing."""
    v = catalog.sql_dml(
        spark,
        """MERGE INTO m_t AS t
           USING (SELECT k, round(coalesce(v, 0.0), 2) AS v
                  FROM m_s VERSION AS OF 0
                  WHERE tag <> 'x) ON junk WHEN ') AS s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v""",
    )
    assert v == 1
    assert spark.table("m_t").filter("k = 2").first().v == -2.0


# ---------------------------------------------------------------------------
# INSERT OVERWRITE: dynamic partition overwrite on partitioned tables,
# static PARTITION spec, full replace on unpartitioned tables
# ---------------------------------------------------------------------------


@pytest.fixture()
def part_reg(spark, tmp_path):
    t = str(tmp_path / "pt")
    txn.append(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "x"), (3, "c", "y")],
            "k long, tag string, ds string",
        ),
        t,
        partition_by=["ds"],
    )
    catalog.register_table(spark, "ow_t", t)
    yield t
    catalog.unregister_table(spark, "ow_t")


def test_insert_overwrite_dynamic_partitions(spark, part_reg):
    """No PARTITION clause on a partitioned table = DYNAMIC overwrite:
    exactly the partitions the source touches are replaced, others
    keep their files."""
    files_before = txn._replay_state(part_reg, txn.current_version(part_reg))[0]
    y_files = [f for f in files_before if "ds=y" in f]
    v = catalog.sql_dml(
        spark,
        "INSERT OVERWRITE ow_t VALUES (10, 'A', 'x'), (11, 'B', 'x')",
    )
    assert v == 1
    got = {(r.k, r.ds) for r in spark.table("ow_t").collect()}
    assert got == {(10, "x"), (11, "x"), (3, "y")}
    files_after = txn._replay_state(part_reg, txn.current_version(part_reg))[0]
    assert [f for f in files_after if "ds=y" in f] == y_files
    # pre-overwrite state still time-travels
    assert txn.read_table(spark, part_reg, version=0).count() == 3


def test_insert_overwrite_static_partition_spec(spark, part_reg):
    """PARTITION (ds='y'): the body supplies the non-partition columns,
    the spec fills ds — only that partition is replaced."""
    v = catalog.sql_dml(
        spark,
        "INSERT OVERWRITE ow_t PARTITION (ds = 'y') VALUES (30, 'Z')",
    )
    assert v == 1
    got = {(r.k, r.ds) for r in spark.table("ow_t").collect()}
    assert got == {(1, "x"), (2, "x"), (30, "y")}
    with pytest.raises(ValueError, match="non-partition columns"):
        catalog.sql_dml(
            spark,
            "INSERT OVERWRITE ow_t PARTITION (tag = 'z') VALUES (1, 'q')",
        )
    with pytest.raises(ValueError, match="arity"):
        catalog.sql_dml(
            spark,
            "INSERT OVERWRITE ow_t PARTITION (ds = 'y') VALUES (1)",
        )


def test_insert_overwrite_unpartitioned_full_replace(spark, reg):
    v = catalog.sql_dml(
        spark,
        "INSERT OVERWRITE dml_t SELECT k, v, tag FROM dml_t WHERE k < 5",
    )
    assert v == 1
    assert spark.table("dml_t").count() == 5
    assert txn.read_table(spark, reg, version=0).count() == 100
    with pytest.raises(ValueError, match="not partitioned"):
        catalog.sql_dml(
            spark,
            "INSERT OVERWRITE dml_t PARTITION (tag='a') VALUES (1, 1.0)",
        )


def test_time_travel_at_shorthand(spark, part_reg):
    """The Delta @-shorthand: FROM t@vN rewrites like VERSION AS OF N."""
    catalog.sql_dml(
        spark, "INSERT OVERWRITE ow_t PARTITION (ds='y') VALUES (30, 'Z')"
    )
    df = catalog.sql(
        spark,
        """SELECT 'v0' AS snap, count(*) AS n FROM ow_t@v0
           UNION ALL
           SELECT 'v1' AS snap, count(*) AS n FROM ow_t
           ORDER BY snap""",
    )
    assert [(r.snap, r.n) for r in df.collect()] == [("v0", 3), ("v1", 3)]
    got = catalog.sql(
        spark, "SELECT k FROM ow_t@v1 WHERE ds = 'y'"
    ).first().k
    assert got == 30
