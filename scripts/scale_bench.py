"""sf0.1 → sf1 scaling evidence (VERDICT r3 next-round #3).

Times a named query subset (default: the hottest queries from the last
full bench, plus the structures VERDICT flagged for special watch —
two-pass rank quantiles, MinHash/SimHash band joins, the iterative
canonical-docs clustering) at two scale factors and reports per-query
wall-clock ratios.  Near-linear scaling at 10× data is ≤ ~12×; anything
above is an offender to name in SCALING.md.

    python scripts/scale_bench.py --small /root/testdata/sf0.1 \
        --big .localdata/sf1 --runs 3 --out scaling_raw.json

Per-query time is the across-run MEDIAN — the same protocol as
bench.py, so scaling ratios and bench numbers are comparable.

Each scale factor gets its own FRESH SparkSession (same conf), so AQE
statistics, parquet footer caches, and broadcast decisions are per-SF —
no warm-cache bleed from the small run into the big one beyond JVM JIT,
which the warmup query absorbs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Hottest per BENCH_r02 + VERDICT special-watch structures.
DEFAULT_QUERIES = [
    "price_percentiles",          # two-pass exact rank (watch)
    "simhash_near_dups",          # band join (watch)
    "language_id_ngram",
    "ngram_jaccard_pairs",        # shingle explode + bounded join (watch)
    "minhash_near_dups",          # LSH band join (watch)
    "dedup_canonical_docs",       # iterative components (watch)
    "json_props_extract",
    "late_suppliers_multi_supplier_orders",
    "part_price_bands",
    "ann_ivf_topk",
    "session_windows_per_user",
    "benchmark_contamination",
    "doc_repetition_profile",
    "regional_same_nation_revenue",
    "corpus_funnel",
    "revenue_by_nation",
    "cheapest_supplier_per_part",
    "daily_top_titles",           # flagship
    # round-5 additions
    "doc_char_chunks",            # posexplode row multiplier (watch)
    "doc_token_chunks",
    "ann_pq_topk",                # PQ encode + ADC + re-rank (watch)
    # round-6 additions
    "unigram_logprob_score",      # corpus-wide token explode ×2 + vocab join (watch)
    "hourly_gapfill_locf",        # grid generate + per-series window
    # round-7 additions
    "ann_ivf_pq_topk",            # composed index: build + probed-partition ADC (watch)
    "sql_daily_top_titles",       # catalog surface: curate + register + SQL
    # round-8 additions
    "semantic_dedup_keep",        # k-means + per-cluster greedy prune (watch)
    "cdc_apply_latest_state",     # streaming CDC apply: merge per batch (watch)
    "scd2_history_splice",        # SCD2 splice under out-of-order batches
    "scd_serving_merge",          # conditional-MERGE serving table
    "heavy_hitter_tokens",        # MG sketch + exact verify pass (watch)
    # round-9 additions
    "sql_time_travel_diff",       # two-version txn build + in-query time travel
    # round-11 additions (VERDICT r10 next #7: the new SQL surface)
    "sql_alter_lineage",          # ALTER chain: rename/add/constraint/generated
    "sql_view_changes_replay",    # views over pinned snapshot + change feed
    "sql_merge_changes_upsert",   # MERGE USING CHANGES(t, start)
    # round-14 additions: the single-pass span-dedup family (one Generate,
    # window cross-doc marking) — all three faces watched at 10x
    "dup_span_stats",
    "substring_dup_coverage",
    "span_dedup_filter",
]


def dedup_work_metrics(spark, sf_dir: str) -> dict:
    """Deterministic work metrics behind the noisiest wall-clock ratios
    (VERDICT r7 next #6): the MinHash band join's bucket occupancy and
    candidate volume are a pure function of (corpus, hash params), so
    they must be IDENTICAL across captures — they are the stable metric;
    the wall-clock spread around them is host noise."""
    from wikistream_lakehouse_spark.operators.minhash import (
        exploded_shingle_hashes,
        lsh_band_stats,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from wikistream_lakehouse_spark.tables import table

    d = table(spark, sf_dir, "documents")
    ex = exploded_shingle_hashes(d, "text", "doc_id", distinct=False)
    sig = minhash_signatures(ex, "doc_id").persist()
    stats = lsh_band_stats(sig).collect()[0].asDict()
    stats["distinct_candidate_pairs"] = lsh_candidate_pairs(sig).count()
    sig.unpersist()
    return {k: int(v) for k, v in stats.items()}


def simhash_work_metrics(spark, sf_dir: str) -> dict:
    """The simhash twin (VERDICT r12 #1): chunk-band bucket occupancy
    and candidate volume under the max_bucket guard — deterministic in
    (corpus, hash params) like the minhash metrics, including the
    capped-bucket accounting the guard introduces."""
    from pyspark.sql import functions as F

    from wikistream_lakehouse_spark.operators.simhash import (
        add_simhash,
        simhash_band_stats,
        simhash_candidate_pairs,
    )
    from wikistream_lakehouse_spark.tables import table

    d = table(spark, sf_dir, "documents")
    sig = add_simhash(d).select(
        F.col("doc_id").alias("doc"), "simhash"
    ).persist()
    stats = simhash_band_stats(sig).collect()[0].asDict()
    stats["distinct_candidate_pairs"] = simhash_candidate_pairs(sig).count()
    sig.unpersist()
    return {k: int(v) for k, v in stats.items()}


def time_sweep(
    sf_dir: str, names: list[str], runs: int, prewarm: bool = True
) -> "tuple[dict[str, float], dict]":
    from wikistream_lakehouse_spark.queries import all_queries
    from wikistream_lakehouse_spark.session import get_spark

    spark = get_spark(
        f"scale-bench-{os.path.basename(sf_dir)}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warmup: JVM JIT + codegen caches
    qs["daily_top_titles"].build(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    if prewarm:
        # one untimed pass per measured query: a freshly GENERATED big
        # SF sits cold in the page cache while sf0.1 is warm from daily
        # use, which fabricates scale ratios (the r11 minhash 7.58×-
        # cold vs 1.6×-warm anomaly, SCALING.md) — timed sweeps should
        # compare warm against warm
        for n in names:
            try:
                qs[n].build(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — the timed loop reports it
                pass
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for n in names:
            try:
                df = qs[n].build(spark, sf_dir)
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                samples[n].append(time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                print(f"{sf_dir}: {n} FAILED: {exc}", file=sys.stderr)
                samples[n].append(float("nan"))
    work = (
        dedup_work_metrics(spark, sf_dir)
        if "minhash_near_dups" in names
        else {}
    )
    sim_work = (
        simhash_work_metrics(spark, sf_dir)
        if "simhash_near_dups" in names
        else {}
    )
    spark.stop()

    def median(xs: list[float]) -> float:
        xs = sorted(xs)
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2

    # median-of-N: the same protocol as bench.py (VERDICT r4 #4 asked to
    # unify — best-of-N reported slightly optimistic ratios)
    return {n: median(ts) for n, ts in samples.items()}, work, sim_work


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default=os.path.join(REPO, ".localdata/sf1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--out", default=os.path.join(REPO, ".localdata/scaling_raw.json"))
    ap.add_argument(
        "--no-prewarm", action="store_true",
        help="skip the untimed per-query warm pass (measures cold IO)",
    )
    args = ap.parse_args()

    pw = not args.no_prewarm
    small, small_work, small_sim = time_sweep(
        args.small, args.queries, args.runs, pw
    )
    big, big_work, big_sim = time_sweep(args.big, args.queries, args.runs, pw)
    rows = []
    for n in args.queries:
        s, b = small[n], big[n]
        rows.append(
            {
                "query": n,
                "sf0.1_sec": round(s, 3),
                "sf1_sec": round(b, 3),
                "ratio": round(b / s, 2) if s > 0 else None,
            }
        )
    payload = {
        "small_dir": args.small,
        "big_dir": args.big,
        "runs_per_sf": args.runs,
        "prewarm": pw,
        "rows": rows,
        # deterministic band-join work metrics: identical across captures
        # on the same corpus by construction; compare THESE, not seconds
        "minhash_work": {"small": small_work, "big": big_work},
        "simhash_work": {"small": small_sim, "big": big_sim},
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
