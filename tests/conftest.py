"""Shared fixtures: one local SparkSession per test session + a DuckDB
oracle comparator mirroring the driver's check (row count, column names,
order-insensitive values)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from wikistream_lakehouse_spark.session import get_spark
from wikistream_lakehouse_spark.tables import TABLE_NAMES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("wikistream-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def run_oracle(sql: str, sf_dir: str):
    """Run oracle SQL on DuckDB with fixture tables registered as views."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return v
    return v


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str):
    """Order-insensitive comparison of a Spark result vs the DuckDB oracle."""
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    s_cols = spark_df.columns
    assert sorted(s_cols) == sorted(o_cols), (
        f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    s_rows = [tuple(r) for r in spark_df.collect()]
    assert len(s_rows) == len(o_rows), (
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    )
    # align columns by sorted name, normalize values, compare as multisets
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    # sort by repr: total order even with None/mixed types in a column
    s_set = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=repr
    )
    o_set = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=repr
    )
    for i, (sr, orow) in enumerate(zip(s_set, o_set)):
        assert sr == orow, f"row {i} differs:\n  spark : {sr}\n  oracle: {orow}"
