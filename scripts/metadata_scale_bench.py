"""Metadata-plane scale benchmark (VERDICT r7 next #3): what do
open/plan/maintain cost on a table with 10^4-10^5 commits, with and
without checkpoints?

Builds a real on-disk table of N one-file append commits (tiny parquet
files written driver-side via pyarrow — the DATA volume is irrelevant
here; the LOG volume is the subject), then times:

  * ``current_version``            (one directory listing + tail reads)
  * ``_replay_state`` cold         (full log replay vs checkpointed)
  * ``read_table(...).count()``    (plan + tiny scan)
  * ``maintain_table`` decision    (log-driven sizes, zero data HEADs)
  * ``_stamped_physical_types``    (reverse scan to the newest stamp)
  * txn stream-source catch-up     (microbatch planning over the log)

Usage:  python scripts/metadata_scale_bench.py [--commits 10000]
Writes a JSON summary to stdout; SCALING.md records the numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_table(path: str, n_commits: int, with_files: bool = True) -> None:
    """N append commits, each one tiny real parquet file with the same
    entry shape txn.append stamps (physicalSchemaJson, fileSizes via
    _try_commit) — pure driver-side, no Spark jobs. ``with_files=False``
    writes the LOG only (file refs dangle): the 10^5-commit capture
    measures pure log-plane cost, where building 10^5 real files would
    dominate the wall clock without changing any measured number."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wikistream_lakehouse_spark.lakehouse import txn

    schema_json = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            ],
        }
    )
    t0 = time.perf_counter()
    # claim once, count locally: calling _next_claim per commit lists
    # the whole log dir every time — O(n²) at 10⁵ commits, the build
    # (not the engine) became the bench bottleneck
    v = txn._next_claim(path)
    for i in range(n_commits):
        sub = f"{txn._COMMIT_COL}=g{uuid.uuid4().hex[:12]}"
        rel = f"{sub}/part-00000.parquet"
        if with_files:
            os.makedirs(os.path.join(path, sub), exist_ok=True)
            pq.write_table(
                pa.table({"k": [i], "v": [float(i)]}),
                os.path.join(path, rel),
            )
        entry = txn._entry("append", [rel], [], [], None)
        if not with_files:
            entry["fileSizes"] = {rel: 2048}
        entry["physicalSchemaJson"] = schema_json
        assert txn._try_commit(path, v, entry), f"commit {v} lost?"
        v += 1
    print(
        f"built {n_commits} commits in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )


class CountingLogStore:
    """Wraps the default PosixLogStore and counts read/list calls."""

    def __init__(self):
        from wikistream_lakehouse_spark.lakehouse import txn

        self._inner = txn._store(None)
        self.reads = 0
        self.lists = 0

    def read(self, path):
        self.reads += 1
        return self._inner.read(path)

    def list_dir(self, path):
        self.lists += 1
        return self._inner.list_dir(path)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def timed(fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=10_000)
    ap.add_argument("--cycles", type=int, default=3,
                    help="steady-state retention cycles to measure")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--no-files", action="store_true",
        help="log-plane only: no data files, skip read/stream measures",
    )
    args = ap.parse_args()

    from wikistream_lakehouse_spark.lakehouse import txn
    from wikistream_lakehouse_spark.session import get_spark

    base = tempfile.mkdtemp(prefix="wsls_meta_bench_")
    path = os.path.join(base, "t")
    build_table(path, args.commits, with_files=not args.no_files)

    spark = get_spark(
        "metadata-scale-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"commits": args.commits}
    head = txn.current_version(path)
    out["current_version_sec"] = timed(lambda: txn.current_version(path))
    out["replay_no_checkpoint_sec"] = timed(
        lambda: txn._replay_state(path, head)
    )
    out["stamped_types_sec"] = timed(
        lambda: txn._stamped_physical_types(path)
    )
    if not args.no_files:
        out["read_table_count_no_cp_sec"] = timed(
            lambda: txn.read_table(spark, path).count(), runs=2
        )
    # maintenance decision pass (log-driven; excludes actual compaction
    # IO by using thresholds nothing trips except checkpoint)
    out["maintain_decision_no_cp_sec"] = timed(
        lambda: txn.maintain_table(
            spark, path, max_small_files=10**9, max_active_dvs=10**9,
            checkpoint_every=10**9,
        ),
        runs=2,
    )

    # ---- checkpoint at HEAD, re-measure ----
    t0 = time.perf_counter()
    txn.checkpoint(path)
    out["checkpoint_write_sec"] = round(time.perf_counter() - t0, 4)
    out["replay_with_checkpoint_sec"] = timed(
        lambda: txn._replay_state(path, head)
    )
    if not args.no_files:
        out["read_table_count_with_cp_sec"] = timed(
            lambda: txn.read_table(spark, path).count(), runs=2
        )
    out["maintain_decision_with_cp_sec"] = timed(
        lambda: txn.maintain_table(
            spark, path, max_small_files=10**9, max_active_dvs=10**9,
            checkpoint_every=10**9,
        ),
        runs=2,
    )

    # log reads for one checkpointed open (the O(1)-log-files claim)
    cs = CountingLogStore()
    txn._replay_state(path, head, store=cs)
    out["log_reads_checkpointed_open"] = cs.reads
    out["log_lists_checkpointed_open"] = cs.lists

    # ---- log retention: delete pre-checkpoint entries, re-measure the
    # residual O(commits) terms (directory listing + metadata walks)
    t0 = time.perf_counter()
    out["cleanup_removed_entries"] = len(txn.cleanup_log(path))
    out["cleanup_sec"] = round(time.perf_counter() - t0, 4)
    out["current_version_after_cleanup_sec"] = timed(
        lambda: txn.current_version(path)
    )
    out["replay_after_cleanup_sec"] = timed(
        lambda: txn._replay_state(path, head)
    )
    out["stamped_types_after_cleanup_sec"] = timed(
        lambda: txn._stamped_physical_types(path)
    )
    out["maintain_decision_after_cleanup_sec"] = timed(
        lambda: txn.maintain_table(
            spark, path, max_small_files=10**9, max_active_dvs=10**9,
            checkpoint_every=10**9,
        ),
        runs=2,
    )

    # ---- steady-state retention CYCLES (the production shape a table
    # lives in forever): commit a wave, checkpoint, clean, then read a
    # version BETWEEN the previous and new horizons (must anchor to the
    # newest checkpoint <= target, never the global newest) and vacuum.
    # Run several cycles: the r8 replay-anchoring bug broke exactly the
    # SECOND cycle, so one-cycle benches could never see it.
    cycle_stats = []
    wave = 50
    for cyc in range(args.cycles):
        build_table(path, wave, with_files=not args.no_files)
        t0 = time.perf_counter()
        cpv = txn.checkpoint(path)
        cyc_cp = time.perf_counter() - t0
        # the r8 bug window: a version in [old horizon, new checkpoint)
        # while the newer checkpoint exists must seed from the PREVIOUS
        # anchor (newest cp <= target), never refuse — read it BEFORE
        # cleanup advances the horizon past it
        interior = cpv - wave // 2
        t0 = time.perf_counter()
        txn._replay_state(path, interior)
        cyc_interior = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_vac = len(txn.vacuum(path, retain_versions=3))
        cyc_vac = time.perf_counter() - t0
        t0 = time.perf_counter()
        removed = len(txn.cleanup_log(path))
        cyc_clean = time.perf_counter() - t0
        cs = CountingLogStore()
        txn._replay_state(path, txn.current_version(path), store=cs)
        cycle_stats.append(
            {
                "cycle": cyc + 1,
                "checkpoint_version": cpv,
                "checkpoint_sec": round(cyc_cp, 4),
                "interior_replay_sec": round(cyc_interior, 4),
                "vacuum_sec": round(cyc_vac, 4),
                "vacuum_removed": n_vac,
                "cleanup_removed": removed,
                "cleanup_sec": round(cyc_clean, 4),
                "log_reads_open": cs.reads,
            }
        )
    out["retention_cycles"] = cycle_stats

    # stream-source catch-up planning: how long to enumerate the next
    # microbatch bounds over the full log (no data read)
    try:
        if args.no_files:
            raise RuntimeError("skipped in --no-files mode")
        from wikistream_lakehouse_spark.streaming.txn_source import (
            register_txn_source,
        )

        register_txn_source(spark)
        ck = os.path.join(base, "ck")
        outp = os.path.join(base, "out")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("txn_table")
            .option("maxCommitsPerBatch", "100000")
            .load(path)
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        out["stream_catchup_full_sec"] = round(time.perf_counter() - t0, 2)
    except Exception as exc:  # noqa: BLE001
        out["stream_catchup_error"] = str(exc)[:200]

    spark.stop()
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
