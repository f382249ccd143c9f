"""Load-boundary timestamp normalization (tscompat) certified by
BEHAVIOR, not just schema: the same logical instants written under all
three parquet encodings the fixtures have shipped — TIMESTAMP(NANOS),
naive micros (→ TIMESTAMP_NTZ), UTC-adjusted micros (→ TIMESTAMP) —
must load as ONE type (TIMESTAMP_LTZ under the pinned UTC session) with
IDENTICAL values, so every downstream operator (unix_micros, epoch
casts, window functions, watermarks) sees one contract.

The fixture-drift canary (test_fixture_canary.py) pins what the driver
ships; this pins what the engine does with each accepted encoding.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.tscompat import epoch_seconds, to_utc_timestamp

#: Three instants incl. a microsecond-precision one; written identically
#: under every encoding.
INSTANTS = [
    dt.datetime(2024, 3, 1, 12, 0, 0),
    dt.datetime(2024, 3, 1, 23, 59, 59, 123456),
    dt.datetime(2025, 1, 15, 4, 30, 1, 999999),
]


def _write(path, arrow_type, tz_aware: bool):
    vals = [
        v.replace(tzinfo=dt.timezone.utc) if tz_aware else v for v in INSTANTS
    ]
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(vals, arrow_type),
        }
    )
    pq.write_table(t, str(path))
    return str(path)


ENCODINGS = {
    "ntz_micros": (pa.timestamp("us"), False),           # → TIMESTAMP_NTZ
    "utc_micros": (pa.timestamp("us", tz="UTC"), True),  # → TIMESTAMP (LTZ)
    "nanos": (pa.timestamp("ns"), False),                # → LongType (nanosAsLong)
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_every_encoding_normalizes_to_ltz_with_identical_values(
    spark, tmp_path, enc
):
    arrow_type, tz_aware = ENCODINGS[enc]
    path = _write(tmp_path / f"{enc}.parquet", arrow_type, tz_aware)
    df = spark.read.parquet(path)
    out = df.withColumn("ts", to_utc_timestamp(df, "ts"))
    assert isinstance(out.schema["ts"].dataType, T.TimestampType), enc
    # values must be the SAME instants — compare in the epoch domain,
    # which is encoding-free (UTC session pinned by the conftest session)
    micros = [
        r.us for r in out.select(F.unix_micros("ts").alias("us")).orderBy("us").collect()
    ]
    expected = sorted(
        int(v.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for v in INSTANTS
    )
    assert micros == expected, f"{enc}: {micros} != {expected}"


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_epoch_seconds_matches_across_encodings(spark, tmp_path, enc):
    """The skipping/zorder stat domain (epoch-seconds double) must be
    identical no matter which encoding the files declared."""
    arrow_type, tz_aware = ENCODINGS[enc]
    path = _write(tmp_path / f"{enc}.parquet", arrow_type, tz_aware)
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # nanos route: normalize first (the loader's path), then stat-cast
        df = df.withColumn("ts", to_utc_timestamp(df, "ts"))
    secs = sorted(
        r.s for r in df.select(epoch_seconds(df, "ts").alias("s")).collect()
    )
    expected = sorted(
        v.replace(tzinfo=dt.timezone.utc).timestamp() for v in INSTANTS
    )
    assert secs == pytest.approx(expected, abs=1e-6), enc


def test_unknown_type_fails_loudly(spark):
    df = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="expected a timestamp"):
        to_utc_timestamp(df, "ts")
