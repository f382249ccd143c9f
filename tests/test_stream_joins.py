"""Stream-stream join tests: watermarked time-range attribution join ==
the batch range join over the same data; left-outer emits unmatched
purchases only after the watermark closes their window."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from wikistream_lakehouse_spark.streaming.joins import attribute_purchases_stream
from wikistream_lakehouse_spark.streaming.sources import file_replay_stream

from test_streaming import write_ndjson

CLICK_SCHEMA = T.StructType(
    [
        T.StructField("click_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("click_ts", T.TimestampType()),
    ]
)
PURCHASE_SCHEMA = T.StructType(
    [
        T.StructField("purchase_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("purchase_ts", T.TimestampType()),
    ]
)


def _ts(hh, mm):
    return f"2024-01-15T{hh:02d}:{mm:02d}:00.000Z"


def _click(cid, user, hh, mm):
    return {"click_id": cid, "user_id": user, "click_ts": _ts(hh, mm)}


def _purchase(pid, user, hh, mm):
    return {"purchase_id": pid, "user_id": user, "purchase_ts": _ts(hh, mm)}


def _ordered(src, batches):
    import os
    import time

    base = time.time() - 1000
    for i, rows in enumerate(batches):
        p = src / f"{i:03d}.json"
        write_ndjson(p, rows)
        os.utime(p, (base + i * 10, base + i * 10))


def _run(spark, tmp_path, join_type, name):
    clicks_src = tmp_path / "clicks"
    purch_src = tmp_path / "purchases"
    # watermark sentinels ride in LATER micro-batches on BOTH streams:
    # the global watermark is the min across sources and only advances
    # between batches, which is what flushes outer-join NULL results
    _ordered(
        clicks_src,
        [
            [
                _click(1, 7, 10, 0),   # within 30m of purchase 100 → match
                _click(2, 7, 10, 20),  # within 30m of purchase 100 → match
                _click(3, 7, 8, 0),    # 2h before → outside horizon
                _click(4, 9, 10, 25),  # other user
                _click(5, 7, 10, 40),  # AFTER the purchase → no match
            ],
            [_click(90, 50, 14, 0)],
            [_click(91, 50, 15, 0)],
        ],
    )
    _ordered(
        purch_src,
        [
            [
                _purchase(100, 7, 10, 30),
                _purchase(200, 9, 12, 0),  # no click within horizon
            ],
            [_purchase(300, 60, 14, 0)],
            [_purchase(301, 60, 15, 0)],
        ],
    )
    clicks = file_replay_stream(spark, str(clicks_src), CLICK_SCHEMA)
    purchases = file_replay_stream(spark, str(purch_src), PURCHASE_SCHEMA)
    joined = attribute_purchases_stream(clicks, purchases, join_type=join_type)
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT purchase_id, click_id FROM {name}").collect()


def test_stream_stream_inner_matches_batch_range_join(spark, tmp_path):
    got = {(r.purchase_id, r.click_id) for r in _run(spark, tmp_path, "inner", "ssj_i")}
    assert got == {(100, 1), (100, 2)}


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    rows = _run(spark, tmp_path, "leftOuter", "ssj_o")
    got = {(r.purchase_id, r.click_id) for r in rows}
    assert (100, 1) in got and (100, 2) in got
    # purchase 200 had no in-horizon click: emitted exactly once, NULL click
    assert (200, None) in got
    assert sum(1 for r in rows if r.purchase_id == 200) == 1
