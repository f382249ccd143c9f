"""As-of join semantics on constructed data; Kafka record encoding (K1);
raw NDJSON(.gz) scans with inferred + explicit schema (S6); map scalars."""

from __future__ import annotations

import gzip
import json

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.asof import asof_join
from wikistream_lakehouse_spark.schema import WIKI_EVENT_SCHEMA
from wikistream_lakehouse_spark.streaming.sinks import encode_kafka_records


def _ts(s: str):
    return f"2024-01-15T{s}.000Z"


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("10:00:00")), (2, 10, _ts("10:05:00")), (3, 20, _ts("09:00:00"))],
        "lid long, k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            (100, 10, _ts("09:59:00")),  # before l1
            (101, 10, _ts("10:05:00")),  # exactly at l2 (inclusive)
            (102, 20, _ts("12:00:00")),  # after l3 — never matched
        ],
        "rid long, k long, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    out = {
        r.lid: r.rid
        for r in asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
    }
    assert out == {1: 100, 2: 101, 3: None}
    # 1 gets the earlier click; 2 gets the equal-timestamp one (inclusive);
    # 3 has no prior right row → NULL (left join semantics)


def test_asof_join_renames_colliding_columns(spark):
    left = spark.createDataFrame([(1, 5, 1.0)], "id long, k long, ts double")
    right = spark.createDataFrame([(9, 5, 0.5)], "id long, k long, ts double")
    out = asof_join(left, right, on="k", left_ts="ts", right_ts="ts")
    assert set(out.columns) == {"id", "k", "ts", "id_right", "k_right", "ts_right"}
    row = out.collect()[0]
    assert (row.id, row.id_right) == (1, 9)


def test_asof_join_tie_on_equal_key_ts_is_deterministic(spark):
    """Several right rows sharing (key, ts): the matched payload must be
    the same across runs and input orderings — the greatest right struct
    wins, by construction of the window sort key."""
    left = spark.createDataFrame(
        [(1, 10, _ts("10:00:00"))], "lid long, k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    dup_rows = [(rid, 10, _ts("09:59:00")) for rid in (104, 101, 103, 102)]
    for ordering in (dup_rows, list(reversed(dup_rows))):
        right = (
            spark.createDataFrame(ordering, "rid long, k long, rts string")
            .withColumn("rts", F.to_timestamp("rts"))
            .repartition(4)
        )
        out = asof_join(left, right, on="k", left_ts="ts", right_ts="rts").collect()
        assert out[0].rid == 104  # greatest payload struct, every time


def test_kafka_record_encoding_roundtrip(spark):
    """K1: key = string(id), value = compact JSON of the record — and the
    value decodes back to the identical typed record (the S5 path)."""
    df = spark.createDataFrame(
        [(42, "edit", "Page", "alice", None, 1705300000, "c", False)],
        WIKI_EVENT_SCHEMA,
    )
    enc = encode_kafka_records(df, key_col="id")
    assert enc.columns == ["key", "value"]
    row = enc.collect()[0]
    assert row.key == "42"
    back = (
        spark.createDataFrame([(row.value,)], "value string")
        .select(F.from_json("value", WIKI_EVENT_SCHEMA).alias("r"))
        .select("r.*")
        .collect()[0]
    )
    assert back.id == 42 and back.user == "alice" and back.minor is False
    assert back.bot is None  # null survives the round trip


def test_raw_ndjson_gz_scan_inferred_and_explicit(spark, tmp_path):
    """S6: `spark.read.json` over gzipped NDJSON under ds= partition dirs —
    partition discovery + gzip decode implicit (glue/job_wiki_curate.py:31-32);
    explicit-schema variant returns identical rows with exact types."""
    raw = tmp_path / "raw" / "ds=2024-01-15"
    raw.mkdir(parents=True)
    events = [
        {"id": i, "type": "edit", "title": f"P{i}", "user": "u", "bot": None,
         "timestamp": 1705300000 + i, "comment": "c", "minor": False}
        for i in range(25)
    ]
    with gzip.open(raw / "part-0001.json.gz", "wt") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    inferred = spark.read.json(str(tmp_path / "raw"))
    assert inferred.count() == 25
    assert "ds" in inferred.columns  # partition discovery
    explicit = spark.read.schema(WIKI_EVENT_SCHEMA).json(str(tmp_path / "raw"))
    assert explicit.count() == 25
    assert explicit.schema["timestamp"].dataType.typeName() == "long"
    assert {r.id for r in explicit.select("id").collect()} == set(range(25))


def test_map_scalar_functions(spark):
    """J10 map family: construction, access, keys/values, map_concat —
    covered as unit tests (DuckDB's MAP access returns lists, so no clean
    cross-engine oracle)."""
    df = spark.range(1).select(
        F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2)).alias("m")
    )
    row = df.select(
        F.element_at("m", "a").alias("va"),
        F.size(F.map_keys("m")).alias("nk"),
        F.element_at(F.map_concat("m", F.create_map(F.lit("c"), F.lit(3))), "c").alias(
            "vc"
        ),
        F.map_contains_key("m", "b").alias("has_b"),
    ).collect()[0]
    assert (row.va, row.nk, row.vc, row.has_b) == (1, 2, 3, True)


def test_corrupt_record_audit_column(spark, tmp_path):
    """P4 audit path: PERMISSIVE read keeps unparseable lines in a corrupt-
    record column instead of dropping them silently — the raw zone stays
    a complete audit log even of garbage."""
    src = tmp_path / "raw"
    src.mkdir()
    with open(src / "mixed.json", "w") as f:
        f.write('{"id": 1, "user": "alice"}\n')
        f.write("garbage {{{ not json\n")
        f.write('{"id": 2, "user": "bob"}\n')
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("user", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(src))
    ).cache()  # corrupt-record queries require materialization first
    assert df.count() == 3
    good = df.filter(F.col("_corrupt").isNull())
    bad = df.filter(F.col("_corrupt").isNotNull())
    assert {r.id for r in good.collect()} == {1, 2}
    assert bad.count() == 1 and "garbage" in bad.collect()[0]._corrupt
