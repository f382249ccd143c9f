"""Materialized views on the SQL front door (r11): CREATE MATERIALIZED
VIEW routes to incremental.refresh_aggregate (first build = full
aggregate, REFRESH = delta-only fold, exactly-once via the version
offset in the view's commit meta); reads of the MV name serve the last
refreshed state. Reference anchor: the reference's daily CTAS tables
(dag/wiki_pipeline_dag.py:29-39) are full rebuilds of exactly this
shape — the MV folds the same aggregate incrementally."""

from __future__ import annotations

import pytest

from wikistream_lakehouse_spark.lakehouse import catalog, txn


@pytest.fixture()
def src(spark, tmp_path):
    t = str(tmp_path / "src")
    txn.append(
        spark.createDataFrame(
            [("a", 10.0), ("a", 5.0), ("b", 1.0)], "k string, v double"
        ),
        t,
    )
    catalog.register_table(spark, "mv_src", t)
    yield t
    catalog.unregister_table(spark, "mv_src")
    for mv in ("mv_agg",):
        try:
            catalog.sql(spark, f"DROP MATERIALIZED VIEW {mv}")
        except Exception:
            pass


def _mk(spark, tmp_path, extra=""):
    return catalog.sql(
        spark,
        f"CREATE MATERIALIZED VIEW mv_agg LOCATION '{tmp_path}/mv' {extra} AS "
        "SELECT k, COUNT(*) AS n, SUM(v) AS total FROM mv_src GROUP BY k",
    )


def test_create_build_refresh_delta_and_read(spark, tmp_path, src):
    _mk(spark, tmp_path)
    got = {(r.k, r.n, r.total) for r in spark.table("mv_agg").collect()}
    assert got == {("a", 2, 15.0), ("b", 1, 1.0)}
    # MV reads serve the last refreshed state: a source append is
    # invisible until REFRESH
    txn.append(
        spark.createDataFrame([("b", 4.0), ("c", 7.0)], "k string, v double"),
        src,
    )
    assert {(r.k, r.n) for r in spark.table("mv_agg").collect()} == {
        ("a", 2), ("b", 1)
    }
    v = catalog.sql(spark, "REFRESH MATERIALIZED VIEW mv_agg")
    assert v is not None
    got = {(r.k, r.n, r.total) for r in spark.table("mv_agg").collect()}
    assert got == {("a", 2, 15.0), ("b", 2, 5.0), ("c", 1, 7.0)}
    # idempotent: already-current refresh commits nothing
    assert catalog.sql(spark, "REFRESH MATERIALIZED VIEW mv_agg") is None


def test_where_and_computed_key_and_positions(spark, tmp_path, src):
    catalog.sql(
        spark,
        f"CREATE MATERIALIZED VIEW mv_agg LOCATION '{tmp_path}/mv' AS "
        "SELECT upper(k) AS uk, COUNT(*) AS n FROM mv_src "
        "WHERE v > 2 GROUP BY 1",
    )
    got = {(r.uk, r.n) for r in spark.table("mv_agg").collect()}
    assert got == {("A", 2)}


def test_retraction_stays_incremental_across_dv_delete(spark, tmp_path, src):
    _mk(spark, tmp_path, extra="WITH RETRACTION")
    txn.delete_where(spark, src, "v = 5.0", mode="mor")
    catalog.sql(spark, "REFRESH MATERIALIZED VIEW mv_agg")
    got = {(r.k, r.n, r.total) for r in spark.table("mv_agg").collect()}
    assert got == {("a", 1, 10.0), ("b", 1, 1.0)}


def test_refusals(spark, tmp_path, src):
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg AS "
            "SELECT k, AVG(v) AS m FROM mv_src GROUP BY k",
        )
    # COUNT(DISTINCT x) matches the measure SHAPE (kind=count,
    # inner='DISTINCT x') — the holistic refusal must still fire with
    # the decomposition hint, not an opaque Spark parse error
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg AS "
            "SELECT k, COUNT(DISTINCT v) AS n FROM mv_src GROUP BY k",
        )
    with pytest.raises(ValueError, match="not incrementally maintainable"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg AS "
            "SELECT k, SUM(DISTINCT v) AS s FROM mv_src GROUP BY k",
        )
    with pytest.raises(ValueError, match="GROUP BY"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg AS "
            "SELECT k, COUNT(*) AS n FROM mv_src GROUP BY k, v",
        )
    with pytest.raises(ValueError, match="not a registered txn table"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg AS "
            "SELECT k, COUNT(*) AS n FROM nowhere GROUP BY k",
        )
    with pytest.raises(ValueError, match="INVERTIBLE"):
        catalog.sql(
            spark,
            "CREATE MATERIALIZED VIEW mv_agg WITH RETRACTION AS "
            "SELECT k, MIN(v) AS lo FROM mv_src GROUP BY k",
        )
    with pytest.raises(ValueError, match="not a created materialized"):
        catalog.sql(spark, "REFRESH MATERIALIZED VIEW ghost")
    _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        _mk(spark, tmp_path)


def test_drop_purge_removes_the_view_table(spark, tmp_path, src):
    _mk(spark, tmp_path)
    path = str(tmp_path / "mv")
    assert txn.current_version(path) >= 0
    catalog.sql(spark, "DROP MATERIALIZED VIEW mv_agg PURGE")
    assert txn.current_version(path) < 0
    with pytest.raises(Exception):
        spark.table("mv_agg").collect()


def test_approx_distinct_measure_estimates_on_read(spark, tmp_path, src):
    catalog.sql(
        spark,
        f"CREATE MATERIALIZED VIEW mv_agg LOCATION '{tmp_path}/mv' AS "
        "SELECT k, APPROX_DISTINCT(CAST(v AS STRING)) AS nv "
        "FROM mv_src GROUP BY k",
    )
    got = {(r.k, r.nv) for r in spark.table("mv_agg").collect()}
    assert got == {("a", 2), ("b", 1)}  # exact at this cardinality
