"""Stream-stream joins (X6/T depth): watermarked, time-range-bounded
joins between two live streams.

The batch engine answers "which click caused this purchase" with the
as-of / range join (operators/asof.py, J4). The streaming form is a
stream-stream join with BOTH sides watermarked and a time-range join
condition — the two things Spark needs to bound join state: the range
condition limits how far apart matching rows can be, the watermarks let
it evict buffered rows once no future match is possible. Without either,
state grows forever; this module always sets both.

Scale shape: state is partitioned by the join key (one shuffle per
side), eviction is per-key monotone in event time — the same bounded-
state argument as windowed aggregation, so a 1000-executor cluster holds
horizon-sized state per key, not history-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_stream(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    click_ts: str = "click_ts",
    purchase_ts: str = "purchase_ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Join each purchase to the clicks that preceded it within
    ``horizon`` for the same user — the streaming attribution join.

    ``join_type='leftOuter'`` emits purchases with NULL click columns
    once the watermark proves no matching click can still arrive (the
    streaming form of the as-of join's unmatched-left behavior).
    """
    c = clicks.withWatermark(click_ts, watermark)
    p = purchases.withWatermark(purchase_ts, watermark)
    cond = (
        (c[user_col] == p[user_col])
        & (c[click_ts] <= p[purchase_ts])
        & (c[click_ts] >= p[purchase_ts] - F.expr(f"INTERVAL {horizon}"))
    )
    joined = p.join(c, cond, join_type)
    # disambiguate the duplicated user column: keep the purchase side
    return joined.drop(c[user_col])
