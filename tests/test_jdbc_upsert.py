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


# ---------------------------------------------------------------------------
# psycopg2 code path (VERDICT r12 #6): an in-process DB-API fake that
# DECLARES paramstyle='pyformat' (psycopg2's) and refuses anything but
# '%s' markers, implementing the ON CONFLICT subset over a dict — pins
# the driver-module paramstyle resolution, the PG-dialect statement the
# sink would actually send, and replay convergence through that exact
# plumbing. A live variant runs when SPARK_GRAFT_PG_DSN points at a
# real Postgres.
# ---------------------------------------------------------------------------

import os
import re
import sys
import types


def _install_fakepg():
    """A module that quacks like psycopg2 where upsert_dataframe looks:
    sys.modules entry carrying paramstyle='pyformat', connections whose
    type's __module__ resolves back to it."""
    mod = types.ModuleType("fakepg2")
    mod.paramstyle = "pyformat"

    _UPSERT_RE = re.compile(
        r"^INSERT INTO (\w+) \(([^)]+)\) VALUES \(([^)]+)\) "
        r"ON CONFLICT\(([^)]+)\) DO UPDATE SET (.+)$"
    )

    class FakePgCursor:
        def __init__(self, con):
            self._con = con

        def executemany(self, stmt, rows):
            if self._con.closed:
                raise RuntimeError("cursor on closed connection")
            m = _UPSERT_RE.match(stmt)
            assert m, f"not the PG upsert dialect: {stmt!r}"
            table, cols_s, ph, keys_s, sets = m.groups()
            cols = [c.strip() for c in cols_s.split(",")]
            keys = [k.strip() for k in keys_s.split(",")]
            # psycopg2 positional markers are '%s', one per column
            assert ph == ", ".join("%s" for _ in cols), (
                f"wrong markers for pyformat: {ph!r}"
            )
            for c in [s.strip() for s in sets.split(",")]:
                lhs, rhs = c.split("=")
                assert rhs == f"excluded.{lhs}", f"bad SET clause {c!r}"
            t = self._con._staged.setdefault(table, {})
            for row in rows:
                assert len(row) == len(cols)
                d = dict(zip(cols, row))
                t[tuple(d[k] for k in keys)] = d

    class FakePgConnection:
        __module__ = "fakepg2"

        def __init__(self, store):
            self._store = store
            self._staged = {k: dict(v) for k, v in store.items()}
            self.closed = False
            self.commits = 0
            self.rollbacks = 0

        def cursor(self):
            return FakePgCursor(self)

        def commit(self):
            self.commits += 1
            self._store.clear()
            self._store.update(
                {k: dict(v) for k, v in self._staged.items()}
            )

        def rollback(self):
            self.rollbacks += 1
            self._staged = {
                k: dict(v) for k, v in self._store.items()
            }

        def close(self):
            self.closed = True

    mod.FakePgConnection = FakePgConnection
    sys.modules["fakepg2"] = mod
    return mod


def test_upsert_dataframe_psycopg2_dialect_path(spark):
    """upsert_dataframe against the pyformat fake: '%s' markers, PG
    upsert dialect, one transaction per call, replay convergence."""
    from wikistream_lakehouse_spark.streaming.jdbc import upsert_dataframe

    mod = _install_fakepg()
    try:
        store: dict = {}
        conns: list = []

        def connect():
            c = mod.FakePgConnection(store)
            conns.append(c)
            return c

        df = spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (1, 11.0)], "user_id long, value double"
        )
        n = upsert_dataframe(df, connect, "serving", ["user_id"])
        assert n == 3
        assert store["serving"] == {
            (1,): {"user_id": 1, "value": 11.0},
            (2,): {"user_id": 2, "value": 20.0},
        }
        # replay converges byte-identically (the K5 idempotency claim)
        upsert_dataframe(df, connect, "serving", ["user_id"])
        assert store["serving"] == {
            (1,): {"user_id": 1, "value": 11.0},
            (2,): {"user_id": 2, "value": 20.0},
        }
        assert all(c.commits == 1 and c.closed for c in conns)
    finally:
        sys.modules.pop("fakepg2", None)


def test_upsert_dataframe_psycopg2_rollback_on_failure(spark):
    """A mid-upsert failure rolls the transaction back: the store keeps
    its pre-call state (no partial batch), and the connection closes."""
    from wikistream_lakehouse_spark.streaming.jdbc import upsert_dataframe

    mod = _install_fakepg()
    try:
        store: dict = {"serving": {(9,): {"user_id": 9, "value": 1.0}}}
        conns: list = []

        def connect():
            c = mod.FakePgConnection(store)
            orig = c.cursor

            def cursor():
                cur = orig()
                real = cur.executemany

                def boom(stmt, rows):
                    real(stmt, rows)
                    raise RuntimeError("wire dropped")

                cur.executemany = boom
                return cur

            c.cursor = cursor
            conns.append(c)
            return c

        df = spark.createDataFrame([(1, 10.0)], "user_id long, value double")
        with pytest.raises(RuntimeError, match="wire dropped"):
            upsert_dataframe(df, connect, "serving", ["user_id"])
        assert store["serving"] == {(9,): {"user_id": 9, "value": 1.0}}
        assert conns[0].rollbacks == 1 and conns[0].closed
    finally:
        sys.modules.pop("fakepg2", None)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PG_DSN"),
    reason="set SPARK_GRAFT_PG_DSN=postgresql://... to run the live leg",
)
def test_upsert_dataframe_live_postgres(spark):
    psycopg2 = pytest.importorskip("psycopg2")
    dsn = os.environ["SPARK_GRAFT_PG_DSN"]
    from wikistream_lakehouse_spark.streaming.jdbc import upsert_dataframe

    setup = psycopg2.connect(dsn)
    with setup, setup.cursor() as cur:
        cur.execute("DROP TABLE IF EXISTS sg_upsert_live")
        cur.execute(
            "CREATE TABLE sg_upsert_live "
            "(user_id BIGINT PRIMARY KEY, value DOUBLE PRECISION)"
        )
    setup.close()
    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (1, 11.0)], "user_id long, value double"
    )
    for _ in range(2):  # second pass proves convergence
        upsert_dataframe(
            df, lambda: psycopg2.connect(dsn), "sg_upsert_live", ["user_id"]
        )
        check = psycopg2.connect(dsn)
        with check, check.cursor() as cur:
            cur.execute("SELECT user_id, value FROM sg_upsert_live ORDER BY 1")
            assert cur.fetchall() == [(1, 11.0), (2, 20.0)]
        check.close()
