"""K5 second path: foreachBatch → RDBMS batch upsert, proven against
stdlib sqlite3 (same ON CONFLICT SQL as Postgres)."""

from __future__ import annotations

import pytest

import sqlite3

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.streaming.jdbc import jdbc_upsert_sink, upsert_sql
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream

from test_streaming import write_ndjson

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(n, start=0):
    return [
        {
            "user_id": i % 5,
            "ts": f"2024-01-15T10:{i % 60:02d}:00.000Z",
            "value": float(i),
        }
        for i in range(start, start + n)
    ]


def test_upsert_sql_shape():
    assert upsert_sql("t", ["k", "a", "b"], ["k"]) == (
        "INSERT INTO t (k, a, b) VALUES (?, ?, ?) "
        "ON CONFLICT(k) DO UPDATE SET a=excluded.a, b=excluded.b"
    )
    assert upsert_sql("t", ["k"], ["k"]).endswith("DO NOTHING")


def test_upsert_sql_paramstyle_variants():
    """psycopg2 (pyformat) gets '%s' markers; named has no positional
    form and is rejected; a sqlite3 connection resolves to qmark."""
    import sqlite3

    from wikistream_lakehouse_spark.streaming.jdbc import driver_paramstyle

    assert "VALUES (%s, %s)" in upsert_sql(
        "t", ["k", "a"], ["k"], paramstyle="pyformat"
    )
    assert "VALUES (:1, :2)" in upsert_sql(
        "t", ["k", "a"], ["k"], paramstyle="numeric"
    )
    with pytest.raises(ValueError, match="paramstyle"):
        upsert_sql("t", ["k"], ["k"], paramstyle="named")
    con = sqlite3.connect(":memory:")
    try:
        assert driver_paramstyle(con) == "qmark"
    finally:
        con.close()


def test_jdbc_upsert_sink_idempotent_convergence(spark, tmp_path):
    """Micro-batched counts upsert into sqlite and end at batch truth;
    re-running the SAME data through a fresh checkpoint (worst-case full
    replay) leaves the table unchanged — the upsert is idempotent."""
    db = str(tmp_path / "serving.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE user_counts (user_id INTEGER PRIMARY KEY, n_events INTEGER)"
    )
    con.commit()
    con.close()

    src = tmp_path / "src"
    rows = _rows(40)
    write_ndjson(src / "a.json", rows[:25])
    write_ndjson(src / "b.json", rows[25:])

    def connect():
        return sqlite3.connect(db)

    def run(ck: str) -> None:
        stream = file_replay_stream(spark, str(src), SCHEMA)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        q = jdbc_upsert_sink(
            agg, connect, "user_counts", ["user_id"], ck, available_now=True
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ck1"))
    got = dict(
        sqlite3.connect(db).execute("SELECT user_id, n_events FROM user_counts")
    )
    assert got == {0: 8, 1: 8, 2: 8, 3: 8, 4: 8}

    # full replay (fresh checkpoint): converges, no double counting
    run(str(tmp_path / "ck2"))
    again = dict(
        sqlite3.connect(db).execute("SELECT user_id, n_events FROM user_counts")
    )
    assert again == got
