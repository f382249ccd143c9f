"""Merge-on-read READ AMPLIFICATION bench (VERDICT r5 next-round #8).

The MoR design note says "readers pay the anti-join until compact
purges" — this script measures how much, so the compact cadence the
design assumes is a number, not a vibe. It builds a transactional table,
stacks deletion vectors in increments, times a full snapshot scan at
each DV count, then compacts and times the purged table:

    python scripts/mor_read_amp_bench.py --rows 4000000 --runs 5

Output: one JSON with {n_vectors, dv_positions, scan_sec} rows plus the
post-compact scan — the read-amp curve and its break-even (the DV count
at which a reader pays more extra time than a compact amortizes over
the read rate). Numbers land in SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def median(xs):
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def time_scan(spark, t, runs):
    from wikistream_lakehouse_spark.lakehouse import txn

    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        txn.read_table(spark, t).write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    return median(ts)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--steps", nargs="*", type=int, default=[0, 1, 4, 16, 64],
        help="cumulative deletion-vector counts to measure at",
    )
    ap.add_argument("--out", default=os.path.join(REPO, ".localdata/mor_read_amp.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.lakehouse import txn
    from wikistream_lakehouse_spark.session import get_spark

    spark = get_spark(
        "mor-read-amp", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        t = os.path.join(tmp, "t")
        base = (
            spark.range(args.rows)
            .repartition(args.files)
            .select(
                F.col("id").alias("k"),
                (F.col("id") % 997).alias("grp"),
                F.rand(seed=7).alias("v"),
            )
        )
        txn.append(base, t)
        rows = []
        done = 0
        for target in sorted(set(args.steps)):
            # each vector kills ~0.05% of rows (a trickle GDPR-style
            # delete), chosen disjoint per step via k % 2048 slots
            while done < target:
                txn.delete_where(
                    spark, t, f"k % 2048 = {done}", mode="mor"
                )
                done += 1
            detail = txn.table_detail(t)
            sec = time_scan(spark, t, args.runs)
            rows.append(
                {
                    "n_vector_commits": target,
                    "n_vector_files": detail["num_deletion_vectors"],
                    "scan_sec": round(sec, 3),
                }
            )
            print(json.dumps(rows[-1]), file=sys.stderr)
        txn.compact(spark, t, target_file_bytes=256 * 1024 * 1024)
        sec = time_scan(spark, t, args.runs)
        rows.append(
            {"n_vector_commits": "post-compact", "n_vector_files": 0,
             "scan_sec": round(sec, 3)}
        )
        print(json.dumps(rows[-1]), file=sys.stderr)
        payload = {
            "rows_in_table": args.rows,
            "data_files": args.files,
            "runs": args.runs,
            "rows": rows,
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
