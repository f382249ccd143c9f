"""Custom stateful streaming operator via applyInPandasWithState (X6+).

`session_window` covers gap-based sessions with standard aggregates; this
operator is the template for session state Spark can't express builtin —
here: per-session distinct-event-type count and value sum, emitted when the
session times out under the event-time watermark.

Scale shape: state lives in the state store keyed by user — per-key state
is a handful of scalars (running aggregates, not buffered events), so
state size is O(active users), and batches reach Python as Arrow frames.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double, n_event_types long"
)
_STATE_SCHEMA = (
    "start long, last long, n long, total double, types array<string>"
)


def sessionize_with_state(
    events: DataFrame,
    gap_secs: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 hour",
) -> DataFrame:
    """Emit one summary row per closed user session (gap > gap_secs).

    A session closes when the event-time watermark passes last_event +
    gap — the same closure rule as session_window, with arbitrary custom
    state (distinct types here) maintained as running aggregates.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total, types = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last + gap_secs * 1_000_000, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "n_event_types": [len(types)],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        ts_us = (rows[ts_col].astype("int64") // 1000).to_numpy()  # ns → µs
        values = rows["value"].to_numpy()
        types_arr = rows["event_type"].to_numpy()

        if state.exists:
            start, last, n, total, types = state.get
            types = set(types)
        else:
            start, last, n, total, types = int(ts_us[0]), int(ts_us[0]), 0, 0.0, set()

        out = []
        gap_us = gap_secs * 1_000_000
        for t, v, et in zip(ts_us, values, types_arr):
            if n > 0 and t - last > gap_us:
                # gap inside the batch: close the running session now
                out.append(
                    (user_id, pd.Timestamp(start, unit="us"),
                     pd.Timestamp(last + gap_us, unit="us"), n,
                     round(total, 6), len(types))
                )
                start, n, total, types = int(t), 0, 0.0, set()
            last = int(t)
            n += 1
            total += float(v)
            types.add(str(et))
        state.update((start, last, n, total, sorted(types)))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms epoch
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "total_value", "n_event_types",
                ],
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


FREQ_OUTPUT_SCHEMA = "bucket integer, item string, weight long, bucket_n long"
_FREQ_STATE_SCHEMA = "items array<string>, weights array<long>, n long"


def streaming_frequent_items(
    stream: DataFrame,
    col: str,
    k: int = 64,
    n_buckets: int = 32,
) -> DataFrame:
    """Streaming heavy hitters: the batch Misra-Gries operator
    (operators/heavyhitters.py) as continuously-maintained state.

    Items hash into ``n_buckets`` disjoint key groups; each group's
    state is its own k-counter MG summary, folded per micro-batch with
    the same weighted-decrement rule (an item's entire stream lives in
    exactly ONE bucket, so the per-bucket undercount bound
    N_bucket/(k+1) ≤ N/(k+1) — the union of bucket summaries is a
    guaranteed superset of every item whose all-time count exceeds
    N/(k+1)). Each trigger emits every bucket's current summary plus
    its processed-count ``bucket_n`` (update mode): consumers union the
    latest row set per bucket and, as in the batch form, verify
    candidates exactly if exact counts are needed.

    State is O(n_buckets × k) scalars TOTAL regardless of stream
    length or item cardinality — the property that makes this viable
    where a streaming groupBy(count) state would grow with vocabulary.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")

    def update(key, pdfs, state: GroupState):
        (bucket,) = key
        if state.exists:
            items, weights, n = state.get
            counters = dict(zip(items, (int(w) for w in weights)))
            n = int(n)
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            vals = pdf[col].dropna()
            n += int(len(vals))
            for item, c in vals.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            while len(counters) > k:
                m = min(counters.values())
                counters = {i: c - m for i, c in counters.items() if c > m}
        state.update((list(counters), [int(c) for c in counters.values()], n))
        if counters:
            yield pd.DataFrame(
                {
                    "bucket": int(bucket),
                    "item": list(counters),
                    "weight": [int(c) for c in counters.values()],
                    "bucket_n": n,
                }
            )

    from pyspark.sql import functions as F

    keyed = stream.select(
        (F.abs(F.xxhash64(F.col(col))) % n_buckets).cast("int").alias(
            "bucket"
        ),
        F.col(col).alias(col),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=FREQ_OUTPUT_SCHEMA,
        stateStructType=_FREQ_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
