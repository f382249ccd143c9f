"""Measured evidence for the incremental-MV claim (SCALING.md):
refresh-after-one-append must cost ~O(delta + view), not O(source).

Builds a txn source of R=12 full copies of sf0.1 events (~1.2 M rows,
one append per copy), materializes a (user_id, event_type) count/sum
view, then measures:

  * full    — a from-scratch aggregate over the whole source (what the
              reference's DAG does every run; noop sink, no write cost)
  * delta   — refresh_aggregate folding ONE new copy (1/13 of the
              data), INCLUDING its view rewrite + commit

Refresh carries a constant overhead (view snapshot + rewrite + commit),
so the win appears once the source outweighs the view — exactly the
100 TB regime; the R=12 source is the smallest local demonstration.
Prints one JSON line {"full_s", "delta_s", "ratio", ...}; medians of 3.
Usage: python scripts/incremental_bench.py [sf_dir] [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from wikistream_lakehouse_spark.lakehouse import incremental, txn  # noqa: E402
from wikistream_lakehouse_spark.session import get_spark  # noqa: E402
from wikistream_lakehouse_spark.tables import table  # noqa: E402

GROUP = ["user_id", "event_type"]
MEASURES = {"n": ("count", "1"), "total_v": ("sum", "coalesce(value, 0.0)")}


def median3(fn) -> float:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[1]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="mvbench")
    n_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    spark = get_spark("mv-bench", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    src = os.path.join(workdir, "events_txn")
    view = os.path.join(workdir, "view")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)

    e = table(spark, sf_dir, "events")
    cols = [c for c in e.columns if c in ("event_id", "user_id", "event_type", "value")]
    e = e.select(*cols)
    n_one = e.count()
    n_src = 0
    for i in range(n_copies):
        # one full events copy per append (ids offset per copy — the
        # group keys user_id/event_type repeat, like real daily traffic)
        part = e.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 10_000_000)
        )
        txn.append(part, src)
        n_src += n_one
    # bring the view current over the 8 appends
    incremental.refresh_aggregate(spark, src, view, GROUP, MEASURES)

    # FULL: from-scratch aggregate over the whole source (noop sink)
    def full():
        snap = txn.read_table(spark, src)
        agg = snap.groupBy(*GROUP).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("coalesce(value, 0.0)")).alias("total_v"),
        )
        agg.write.format("noop").mode("overwrite").save()

    full_s = median3(full)

    # DELTA: one new copy folded in (measure refresh incl. its commit)
    n_delta = n_one
    deltas = []
    for j in range(3):
        delta_part = e.withColumn(
            "event_id", F.col("event_id") + F.lit((100 + j) * 10_000_000)
        )
        txn.append(delta_part, src)
        t0 = time.perf_counter()
        incremental.refresh_aggregate(spark, src, view, GROUP, MEASURES)
        deltas.append(time.perf_counter() - t0)
    delta_s = sorted(deltas)[1]

    n_view = txn.read_table(spark, view).count()
    out = {
        "full_s": round(full_s, 3),
        "delta_s": round(delta_s, 3),
        "wall_ratio": round(delta_s / full_s, 3),
        # the quantity that dominates at 100 TB, where scan IS the job:
        # rows touched by a refresh (delta + view) vs a full rebuild
        "scan_ratio": round((n_delta + n_view) / (n_src + n_delta), 4),
        "rows_source": n_src,
        "rows_delta": n_delta,
        "rows_view": n_view,
        "sf_dir": sf_dir,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
