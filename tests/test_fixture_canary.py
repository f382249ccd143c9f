"""Fixture-drift canary (VERDICT r3 next-round #8).

Round 3 lost 15 tests, one scored query, and the whole bench artifact to
a single silent fixture change: the driver regenerated `/root/testdata`
and `events.ts` went from parquet TIMESTAMP(NANOS) to naive
`timestamp[us]` (TIMESTAMP_NTZ in Spark).  This test pins the engine's
*assumptions* about every fixture table — column names, and for each
time column the SET of encodings the load boundary
(tscompat.to_utc_timestamp) knows how to normalize — so the next drift
costs exactly one red test with a readable message instead of fifteen
confusing ones.

Footer-only (pyarrow schema read, no Spark, no data pages): runs in
milliseconds at any scale factor.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

#: Encodings of a time-instant column the engine's load boundary absorbs
#: (tscompat.to_utc_timestamp): UTC-adjusted micros → TIMESTAMP (LTZ),
#: naive micros → TIMESTAMP_NTZ, TIMESTAMP(NANOS) → nanosAsLong LongType.
ACCEPTED_TS_ENCODINGS = {
    "timestamp[us]",
    "timestamp[us, tz=UTC]",
    "timestamp[ns]",
    "timestamp[ns, tz=UTC]",
    "int64",  # pre-converted epoch (nanos); loader restores TimestampType
}

#: column name -> None (any type is fine — engine treats it structurally)
#: or a set of acceptable pyarrow type strings (engine branches on it).
EXPECTED: dict[str, dict[str, set[str] | None]] = {
    "region": {"r_regionkey": None, "r_name": None},
    "nation": {"n_nationkey": None, "n_name": None, "n_regionkey": None},
    "customer": {
        "c_custkey": None,
        "c_name": None,
        "c_nationkey": None,
        "c_acctbal": None,
        "c_mktsegment": None,
    },
    "supplier": {
        "s_suppkey": None,
        "s_name": None,
        "s_nationkey": None,
        "s_acctbal": None,
    },
    "part": {
        "p_partkey": None,
        "p_name": None,
        "p_brand": None,
        "p_type": None,
        "p_size": None,
        "p_retailprice": None,
    },
    "orders": {
        "o_orderkey": None,
        "o_custkey": None,
        "o_orderstatus": None,
        "o_totalprice": None,
        "o_orderdate": ACCEPTED_TS_ENCODINGS,
        "o_orderpriority": None,
    },
    "lineitem": {
        "l_orderkey": None,
        "l_partkey": None,
        "l_suppkey": None,
        "l_linenumber": None,
        "l_quantity": None,
        "l_extendedprice": None,
        "l_discount": None,
        "l_tax": None,
        "l_returnflag": None,
        "l_linestatus": None,
        "l_shipdate": ACCEPTED_TS_ENCODINGS,
    },
    "events": {
        "event_id": None,
        # THE column that drifted in round 3. If this assertion fires,
        # the driver regenerated testdata with a ts encoding the load
        # boundary does not normalize yet: extend
        # tscompat.to_utc_timestamp FIRST, then widen the accepted set.
        "ts": ACCEPTED_TS_ENCODINGS,
        "user_id": None,
        "event_type": None,
        "value": None,
        "props": None,
    },
    "documents": {
        "doc_id": None,
        "text": None,
        "lang": None,
        "source": None,
        "n_chars": None,
    },
    "embeddings": {
        "vec_id": None,
        "embedding": {"list<element: float>", "list<item: float>"},
        "label": None,
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_matches_engine_assumptions(table: str) -> None:
    path = os.path.join(SF_DIR, f"{table}.parquet")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    expected = EXPECTED[table]

    missing = set(expected) - set(actual)
    assert not missing, (
        f"FIXTURE DRIFT: {table} lost column(s) {sorted(missing)} — the "
        f"driver regenerated {path} with a different schema. Engine "
        f"queries reference these columns by name; update queries/ and "
        f"this canary together. Actual columns: {sorted(actual)}"
    )

    for col, accepted in expected.items():
        if accepted is None:
            continue
        assert actual[col] in accepted, (
            f"FIXTURE DRIFT: {table}.{col} is now declared {actual[col]!r}, "
            f"not one of {sorted(accepted)}. The load boundary "
            f"(wikistream_lakehouse_spark/tscompat.py) must learn this "
            f"encoding BEFORE any query touches the column — round 3 lost "
            f"15 tests to exactly this class of drift."
        )
