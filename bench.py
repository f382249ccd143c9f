"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, no driver
collect skew).  Variance protocol (VERDICT r2 #4, tightened r8 per
VERDICT r7 #5): one UNTIMED full warm-up sweep first (JVM JIT, parquet
footer and catalyst caches), then the timed sweep repeats
$SPARK_GRAFT_BENCH_RUNS times (default 5); per-query time is the
across-sweep MEDIAN, `value` the sum of medians, and `spread` reports
the median per-query IQR and range so host-load noise is read as noise
instead of as a regression (r7's three phantom regressions were all
unchanged-code queries with ranges ~= their medians).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if REPO_DIR not in sys.path:
    sys.path.insert(0, REPO_DIR)


def infer_sf(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def calibration_probe(spark) -> float:
    """One pinned synthetic sort/agg on GENERATED data (no IO, no
    dependence on sf_dir or the query set): 16M rows → hash → 9973-key
    aggregate → sort. Timed with the same noop sink as the queries.
    Its wall-clock moves with host load/CPU contention exactly like the
    query timings do, so cross-round comparisons normalize per-query
    medians by the round's calibration instead of reading host drift as
    regression (VERDICT r8 next #4 — r7→r8 moved 1.10× uniformly on
    unchanged code)."""
    import time as _time

    from pyspark.sql import functions as F

    df = (
        spark.range(0, 16_000_000, 1, 32)
        .select(
            (F.col("id") % 9973).alias("k"),
            # bounded hash: full-range xxhash64 sums overflow long under
            # ANSI mode; 16M × 1e6 stays far inside it
            (F.pmod(F.xxhash64("id"), F.lit(1000003))).alias("v"),
        )
        .groupBy("k")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.avg("v").alias("a"),
        )
        .orderBy("k")
    )
    t0 = _time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return _time.perf_counter() - t0


def main() -> None:
    # The ONLY bytes this process writes to stdout are the final JSON line:
    # park fd 1 on stderr for the whole run (the JVM inherits fd 1, so its
    # banner/progress output would otherwise pollute the driver's capture),
    # keep the real stdout on a duped fd, and write the payload there last.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from wikistream_lakehouse_spark.queries import all_queries
    from wikistream_lakehouse_spark.session import get_spark

    spark = get_spark(
        "wikistream-bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = all_queries()
    # Optional subset filter (comma-separated names): targeted re-measures
    # and cheap harness tests without sweeping the full registry.
    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES", "").strip()
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = sorted(set(names) - set(qs))
        if unknown:
            print(f"bench: unknown query names skipped: {unknown}", file=sys.stderr)
        qs = {n: qs[n] for n in names if n in qs}
        if not qs:
            print("bench: SPARK_GRAFT_BENCH_QUERIES matched nothing", file=sys.stderr)
            sys.exit(2)

    # Sweep-outer repetition (not per-query back-to-back) so each sample
    # sees the same cache state and inter-run host drift is captured.
    # Sweep 0 is the UNTIMED warm-up (VERDICT r7 #5): every query's plan
    # compiles, every footer is read, the JIT warms — the timed sweeps
    # then measure steady state.
    try:
        n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    except ValueError:
        print("bench: bad SPARK_GRAFT_BENCH_RUNS, using 5", file=sys.stderr)
        n_runs = 5
    # Calibration (VERDICT r8 next #4): the probe runs FIRST (after one
    # untimed warm-up of itself) and LAST, bracketing the sweeps; the
    # median is the round's host-speed unit. Regression gates should
    # compare (per-query median / calibration_sec) across rounds.
    calibration_probe(spark)  # untimed: JIT + codegen warm-up
    cal_pre = [calibration_probe(spark) for _ in range(3)]

    # Wall budget (r11): the query set grew past the point where 1
    # warm-up + 5 timed sweeps fit any plausible driver timeout on a
    # loaded host. The artifact must ALWAYS materialize — a truncated
    # run with fewer sweeps beats a killed process with none (the fate
    # of BENCH_r01/r03) — so sweeps stop early when the next one would
    # overrun the budget; at least one timed sweep always runs.
    try:
        budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "1200"))
    except ValueError:
        print("bench: bad SPARK_GRAFT_BENCH_BUDGET_SEC, using 1200", file=sys.stderr)
        budget = 1200.0
    t_sweeps = time.perf_counter()
    done_sweeps = 0

    samples: dict[str, list[float]] = {name: [] for name in qs}
    errors: dict[str, str] = {}
    for sweep in range(n_runs + 1):
        warmup = sweep == 0
        if done_sweeps >= 1:
            elapsed = time.perf_counter() - t_sweeps
            per_sweep = elapsed / (done_sweeps + 1)  # warm-up included
            if elapsed + per_sweep > budget:
                print(
                    f"bench: wall budget {budget:.0f}s — stopping after "
                    f"{done_sweeps} timed sweep(s)",
                    file=sys.stderr,
                )
                break
        if not warmup:
            done_sweeps += 1
        for name in sorted(qs):
            if name in errors:
                continue
            # Failure-isolated: one broken query must never cost the whole
            # artifact (round 3 lost ALL timings to one AnalysisException).
            try:
                df = qs[name].build(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                if not warmup:
                    samples[name].append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                samples.pop(name, None)
                print(f"bench: {name} failed: {errors[name]}", file=sys.stderr)

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    def quantile(xs: list[float], q: float) -> float:
        xs = sorted(xs)
        if len(xs) == 1:
            return xs[0]
        pos = q * (len(xs) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(xs) - 1)
        return xs[lo] + (xs[hi] - xs[lo]) * (pos - lo)

    def iqr(xs: list[float]) -> float:
        return quantile(xs, 0.75) - quantile(xs, 0.25)

    # 2dp: keeps the whole payload line under the driver's 2000-byte
    # stdout tail capture even as the query set grows
    timings = {n: round(median(ts), 2) for n, ts in samples.items() if ts}
    spreads = sorted(
        max(ts) - min(ts) for ts in samples.values() if ts
    ) or [0.0]
    iqrs = sorted(iqr(ts) for ts in samples.values() if ts) or [0.0]
    spread = {
        "runs": done_sweeps,
        "per_query_range_p50": round(median(spreads), 2),
        "per_query_range_max": round(spreads[-1], 2),
        "per_query_iqr_p50": round(median(iqrs), 3),
        "per_query_iqr_max": round(iqrs[-1], 3),
    }

    cal_post = [calibration_probe(spark) for _ in range(3)]
    calibration = {
        "pre": round(median(cal_pre), 4),
        "post": round(median(cal_post), 4),
        "sec": round(median(cal_pre + cal_post), 4),
    }

    # Scaling-evidence contract (VERDICT r14 next #2): record the
    # parallelism the session ACTUALLY ran with, so the driver can verify
    # $SPARK_GRAFT_CPUS was honored instead of inferring it from ratios
    # that the per-query fixed-cost floor flattens at sf0.1.
    cpus_used = spark.sparkContext.defaultParallelism
    master_used = spark.sparkContext.master

    total = round(sum(timings.values()), 4)
    spark.stop()

    # Full-detail artifact (VERDICT r4 #4): the stdout payload below is
    # tail-capture-truncated to the slowest ~60 queries, which hid
    # round-over-round regressions in everything under ~0.33 s. Persist
    # EVERY query's median + per-query spread (4dp) to a committed file
    # so verdicts can diff the complete set.
    detail = {
        "metric": "headline_query_set_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": infer_sf(sf_dir),
        "runs": done_sweeps,
        "cpus": cpus_used,
        "master": master_used,
        "calibration": calibration,
        "queries": {
            n: {
                "median": round(median(ts), 4),
                "range": round(max(ts) - min(ts), 4),
                # regression gates should read this: a round-over-round
                # delta inside ~2x the IQR is noise, not drift
                "iqr": round(iqr(ts), 4),
            }
            for n, ts in sorted(samples.items())
            if ts
        },
        "errors": errors,
    }
    # Canonical, round-stamped name (VERDICT r5 wrong #4: the unsuffixed
    # BENCH_detail.json drifted against the driver's BENCH_r{N}.json and a
    # verdict could diff the wrong pair): infer the CURRENT round as
    # 1 + the newest committed BENCH_r{N}.json, so the file bench writes
    # this round is exactly the one the driver records alongside.
    rounds = [0]
    for n in os.listdir(REPO_DIR):
        m = re.match(r"^BENCH_r(\d+)\.json$", n)
        if m:
            rounds.append(int(m.group(1)))
    this_round = max(rounds) + 1
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(REPO_DIR, f"BENCH_detail_r{this_round:02d}.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    print(f"bench: full detail -> {detail_path}", file=sys.stderr)

    def payload_for(qs_shown: dict[str, float]) -> str:
        body = {
            "metric": "headline_query_set_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": qs_shown,
            "queries_timed": len(timings),
            "spread": spread,
            "calibration_sec": calibration["sec"],
            "cpus": cpus_used,
            "master": master_used,
            "sf": infer_sf(sf_dir),
        }
        if errors:
            body["errors"] = {n: e[:80] for n, e in errors.items()}
        return json.dumps(body, separators=(",", ":"))

    # The driver tail-captures ~2000 bytes of stdout; a payload longer than
    # that loses its head and fails to parse (round-1 lesson). `value` always
    # covers ALL queries; the per-query dict keeps the slowest entries and
    # drops the cheapest until the line fits.
    shown = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while len(payload_for(shown)) > 1900 and shown:
        shown.pop(min(shown, key=shown.get))
    os.write(real_stdout, payload_for(shown).encode() + b"\n")


if __name__ == "__main__":
    main()
