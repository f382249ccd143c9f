"""K5 second path — `foreachBatch` upsert into an RDBMS serving store.

The reference's serving loop is a Postgres ``INSERT ... ON CONFLICT DO
UPDATE`` per aggregate row (upsert_athena_aggregates.py:87-110). The
engine form is set-based: each micro-batch executes ONE executemany
upsert inside ONE transaction, so a replayed batch (restart between sink
write and checkpoint commit) converges instead of double-counting.

The DB handle comes from a ``connect`` factory (DB-API 2.0), so tests
prove the contract with stdlib ``sqlite3`` and production passes a
psycopg2/JDBC factory — the SQL emitted (``ON CONFLICT(keys) DO UPDATE
SET col=excluded.col``) is shared by SQLite ≥3.24 and Postgres ≥9.5,
and the parameter markers are derived from the driver module's declared
``paramstyle`` ('?' for sqlite3, '%s' for psycopg2).

Scale posture: this sink is for SERVING aggregates — post-aggregation
cardinality (dashboard dimensions), not fact rows. Rows stream to the
driver via ``toLocalIterator`` in bounded chunks (no whole-batch
collect); the RDBMS is the bottleneck long before the driver is. Fact-
scale egress belongs in the parquet/MERGE sinks, not an RDBMS.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _placeholders(paramstyle: str, n: int) -> str:
    """Positional parameter markers for a DB-API ``paramstyle``.

    sqlite3 declares ``qmark`` ('?'); psycopg2 declares ``pyformat``
    but accepts positional ``format`` markers ('%s'), per DB-API 2.0.
    ``named`` has no positional form, so it is rejected explicitly.
    """
    if paramstyle == "qmark":
        return ", ".join("?" for _ in range(n))
    if paramstyle in ("format", "pyformat"):
        return ", ".join("%s" for _ in range(n))
    if paramstyle == "numeric":
        return ", ".join(f":{i + 1}" for i in range(n))
    raise ValueError(f"unsupported DB-API paramstyle: {paramstyle!r}")


def driver_paramstyle(con: Any) -> str:
    """Best-effort ``paramstyle`` of the module that produced ``con``;
    falls back to qmark (the sqlite3/JDBC convention)."""
    import sys

    root = type(con).__module__.split(".", 1)[0]
    mod = sys.modules.get(root)
    return getattr(mod, "paramstyle", "qmark")


def upsert_sql(
    table: str, cols: list[str], keys: list[str], paramstyle: str = "qmark"
) -> str:
    """The ON CONFLICT upsert statement shared by SQLite and Postgres."""
    non_keys = [c for c in cols if c not in keys]
    placeholders = _placeholders(paramstyle, len(cols))
    stmt = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
    if non_keys:
        sets = ", ".join(f"{c}=excluded.{c}" for c in non_keys)
        stmt += f"ON CONFLICT({', '.join(keys)}) DO UPDATE SET {sets}"
    else:
        stmt += f"ON CONFLICT({', '.join(keys)}) DO NOTHING"
    return stmt


def upsert_dataframe(
    df: DataFrame,
    connect: Callable[[], Any],
    table: str,
    keys: list[str],
    chunk_size: int = 10_000,
) -> int:
    """Upsert every row of ``df`` into ``table`` in one transaction;
    returns the number of rows written."""
    cols = df.columns
    con = connect()
    stmt = upsert_sql(table, cols, keys, paramstyle=driver_paramstyle(con))
    n = 0
    try:
        cur = con.cursor()
        buf: list[tuple] = []
        for row in df.toLocalIterator():
            buf.append(tuple(row))
            if len(buf) >= chunk_size:
                cur.executemany(stmt, buf)
                n += len(buf)
                buf = []
        if buf:
            cur.executemany(stmt, buf)
            n += len(buf)
        con.commit()
    except Exception:
        con.rollback()
        raise
    finally:
        con.close()
    return n


def jdbc_upsert_sink(
    agg: DataFrame,
    connect: Callable[[], Any],
    table: str,
    keys: list[str],
    checkpoint: str,
    trigger_secs: int = 10,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming serving sink: every micro-batch batch-upserts into the
    RDBMS table (which must already exist with a unique index on
    ``keys``). Idempotent under batch replay — re-executing a batch
    rewrites the same key/value pairs."""

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_dataframe(batch_df, connect, table, keys)

    writer = (
        agg.writeStream.foreachBatch(upsert_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()
