"""Chaos-soak throughput capture (VERDICT r7 next #7: "SCALING.md
records ops/s").

Reuses the soak harness from tests/test_txn_chaos_soak.py — the same
seeded multi-threaded append / MoR-merge / delete / compact /
checkpoint mix against one table — but times it and reports commit
throughput per log substrate. The subject is the COMMIT PROTOCOL's
contention behavior (optimistic retries on one table head), not data
volume: every op writes tens of rows, so ops/s here is a ceiling on
single-table commit rate under full contention, the number a CDC
planner needs when sizing how many writers may share a table.

Usage: python scripts/chaos_soak_bench.py [--threads 4] [--ops 8] [--waves 2]
Prints one JSON line; SCALING.md records the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)


def run_substrate(spark, substrate: str, threads: int, ops: int, waves: int):
    import test_txn_chaos_soak as soak

    from wikistream_lakehouse_spark.lakehouse import txn

    saved_data = txn.DEFAULT_DATA_STORE
    if substrate == "object":
        txn.DEFAULT_DATA_STORE = txn.ObjectDataStore()
        store = txn.MemoryLogStore()
    else:
        store = None
    try:
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t")
            txn.append(
                soak._frame(spark, 0, 50, 0), path,
                meta={"soak": {"op": "append", "lo": 0, "hi": 50, "val": 0}},
                store=store,
            )
            base = txn.current_version(path, store)
            t0 = time.perf_counter()
            for w in range(waves):
                soak._run_soak(
                    spark, path, store, seed=20260814 + w,
                    n_threads=threads, ops_per_thread=ops,
                    key_base=1000 + 10_000 * w,
                )
            wall = time.perf_counter() - t0
            head = txn.current_version(path, store)
            committed = head - base
            issued = waves * threads * ops
            # correctness sweep on the timed table — throughput that
            # breaks serializability wouldn't count
            soak._check_invariants(spark, path, store)
            return {
                "substrate": substrate,
                "issued_ops": issued,
                "committed_commits": committed,
                "wall_s": round(wall, 2),
                "commits_per_s": round(committed / wall, 2),
                "lost_to_retry_budget": issued - committed,
            }
    finally:
        txn.DEFAULT_DATA_STORE = saved_data


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--ops", type=int, default=8)
    ap.add_argument("--waves", type=int, default=2)
    args = ap.parse_args()

    from wikistream_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="chaos-soak-bench")
    out = {
        "bench": "chaos_soak",
        "threads": args.threads,
        "ops_per_thread": args.ops,
        "waves": args.waves,
        "results": [
            run_substrate(spark, s, args.threads, args.ops, args.waves)
            for s in ("posix", "object")
        ],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
