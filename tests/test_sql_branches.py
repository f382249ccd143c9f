"""BRANCH verbs on the SQL front door (VERDICT r11 #6): CREATE/DROP
BRANCH and FAST FORWARD BRANCH through ALTER TABLE, reads of the
moving ref via ``t@branch``, branch-targeted DML (INSERT INTO /
UPDATE / DELETE FROM / MERGE INTO ``t@branch``), and SHOW
BRANCHES/REFS. Tags stay read-only pins; the @ref namespace is
shared."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def bt(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(
        spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"
        ),
        t,
    )
    catalog.register_table(spark, "br_t", t)
    yield t
    catalog.unregister_table(spark, "br_t")


def _rows(spark, sql):
    return sorted(tuple(r) for r in catalog.sql(spark, sql).collect())


def test_create_branch_write_read_and_isolation(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    catalog.sql(spark, "UPDATE br_t@dev SET v = v + 1 WHERE k = 1")
    catalog.sql(spark, "DELETE FROM br_t@dev WHERE k = 2")
    assert _rows(spark, "SELECT k, v FROM br_t@dev") == [
        (1, 11.0), (3, 30.0), (9, 90.0),
    ]
    # main untouched
    assert _rows(spark, "SELECT k, v FROM br_t") == [
        (1, 10.0), (2, 20.0), (3, 30.0),
    ]


def test_merge_into_branch_target(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(
        spark,
        "MERGE INTO br_t@dev AS t USING "
        "(SELECT 1 AS k, 99.0 AS v UNION ALL SELECT 7, 70.0) AS s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)",
    )
    assert _rows(spark, "SELECT k, v FROM br_t@dev") == [
        (1, 99.0), (2, 20.0), (3, 30.0), (7, 70.0),
    ]
    assert _rows(spark, "SELECT k, v FROM br_t WHERE k IN (1, 7)") == [
        (1, 10.0),
    ]


def test_fast_forward_via_sql_and_rebase(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    catalog.sql(spark, "ALTER TABLE br_t FAST FORWARD BRANCH dev")
    # the binding auto-refreshed: main now serves the merged state
    assert (9, 90.0) in _rows(spark, "SELECT k, v FROM br_t")
    # rebased: another round works
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (10, 100.0)")
    catalog.sql(spark, "ALTER TABLE br_t FAST FORWARD BRANCH dev")
    assert (10, 100.0) in _rows(spark, "SELECT k, v FROM br_t")


def test_show_branches_and_refs(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE TAG audit")
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    got = _rows(spark, "SHOW BRANCHES br_t")
    assert len(got) == 1
    (branch, base, head) = got[0]
    assert branch == "dev" and head > 0
    refs = _rows(spark, "SHOW REFS br_t")
    assert ("audit", "tag", 0) in refs  # tag pinned the pre-branch head
    assert any(r[0] == "dev" and r[1] == "branch" for r in refs)
    catalog.sql(spark, "ALTER TABLE br_t DROP BRANCH dev")
    assert _rows(spark, "SHOW BRANCHES br_t") == []


def test_writes_to_tags_and_unknown_refs_refused(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE TAG audit")
    with pytest.raises(ValueError, match="TAG"):
        catalog.sql(spark, "INSERT INTO br_t@audit VALUES (9, 90.0)")
    with pytest.raises(ValueError, match="not a branch"):
        catalog.sql(spark, "INSERT INTO br_t@ghost VALUES (9, 90.0)")


def test_branch_read_is_a_moving_ref(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    n0 = len(_rows(spark, "SELECT * FROM br_t@dev"))
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    assert len(_rows(spark, "SELECT * FROM br_t@dev")) == n0 + 1
    # joins resolve too, and tags still pin
    catalog.sql(spark, "ALTER TABLE br_t CREATE TAG pinned")
    catalog.sql(spark, "INSERT INTO br_t VALUES (50, 500.0)")
    assert len(_rows(spark, "SELECT * FROM br_t@pinned")) == 3


def test_fast_forward_refusal_surfaces_merge_hint(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t VALUES (50, 500.0)")  # main moved
    with pytest.raises(ValueError, match="MERGE INTO"):
        catalog.sql(spark, "ALTER TABLE br_t FAST FORWARD BRANCH dev")


def test_maintenance_and_describe_verbs_accept_branch_targets(spark, bt):
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    catalog.sql(spark, "DELETE FROM br_t@dev WHERE k = 2")

    hist = catalog.sql(spark, "DESCRIBE HISTORY br_t@dev").collect()
    ops = [r.op for r in hist]
    assert "clone" in ops and "append" in ops  # the branch's OWN log
    detail = catalog.sql(spark, "DESCRIBE DETAIL br_t@dev").collect()
    assert len(detail) == 1

    bpath = txn.branch_location(bt, "dev")
    v = catalog.sql(spark, "OPTIMIZE br_t@dev")
    assert v == txn.current_version(bpath)
    catalog.sql(spark, "CHECKPOINT br_t@dev")
    assert catalog.sql(spark, "VACUUM br_t@dev RETAIN 1 VERSIONS DRY RUN") != []
    report = catalog.sql(spark, "MAINTAIN TABLE br_t@dev")
    assert isinstance(report, dict)
    # main's history untouched by all of the above
    main_ops = [r.op for r in catalog.sql(spark, "DESCRIBE HISTORY br_t").collect()]
    assert "append" in main_ops and "compact" not in main_ops


def test_refresh_table_validates_branch_ref(spark, bt):
    """refresh_table('t@ref') for a non-branch ref (tag, typo) raises
    naming the valid branches instead of silently returning -1 for a
    nonexistent directory (ADVICE r12 low)."""
    catalog.sql(spark, "ALTER TABLE br_t CREATE BRANCH dev")
    catalog.sql(spark, "INSERT INTO br_t@dev VALUES (9, 90.0)")
    assert catalog.refresh_table(spark, "br_t@dev") == 1
    with pytest.raises(ValueError, match="not a branch.*dev"):
        catalog.refresh_table(spark, "br_t@nope")
    # a TAG is a read pin, not a branch head — same refusal
    txn.create_tag(bt, "rel0", version=0)
    with pytest.raises(ValueError, match="not a branch"):
        catalog.refresh_table(spark, "br_t@rel0")
