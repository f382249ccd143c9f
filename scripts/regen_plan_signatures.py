"""Regenerate tests/plan_signatures.json — the committed plan-shape
baseline for the hottest queries.

Run after any INTENDED planner-relevant change:
    python scripts/regen_plan_signatures.py
then review the diff: every changed line is a physical-plan shape change
(a join strategy, an exchange, an aggregate flavor) and should be
explainable before committing.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: The queries whose plan shape is load-bearing at 100 TB: the bench
#: top-5 plus the reference flagship family's heavy hitters and the two
#: rewritten global-rank queries.
GUARDED = [
    "daily_top_titles",
    "other_bucket_rollup",
    "customer_spend_distribution",
    "price_percentiles",
    "revenue_by_nation",
    "pricing_summary",
    "top_revenue_orders",
    "purchase_click_attribution",
    "dedup_exact_events",
    "cosine_topk_bruteforce",
    "ngram_jaccard_pairs",
    "ann_lsh_topk",
    # round-2 additions whose shapes are load-bearing: pure-pushdown Q6,
    # per-side OR-implication Q19, decorrelated-min Q2, BM25 search, and
    # the broadcast-eval contamination join
    "forecast_revenue",
    "disjunctive_part_revenue",
    "cheapest_supplier_per_part",
    "keyword_search_bm25",
    "benchmark_contamination",
    # round-5/6 hot additions (VERDICT r5 next-round #5): the salted
    # skew join, the shuffle-free chunkers, the PQ/IVF ANN stages, and
    # the band-join near-dup family
    "skewed_cohort_stats",
    "doc_char_chunks",
    "doc_token_chunks",
    "ann_pq_topk",
    "ann_ivf_topk",
    "minhash_near_dups",
    "simhash_near_dups",
    "language_id_ngram",
    "doc_repetition_profile",
    "session_windows_per_user",
    # round-6 additions: grid gapfill, rank-limited sampling, the
    # correlated non-equi EXISTS, and the corpus LM scorer
    "hourly_gapfill_locf",
    "fixed_count_per_lang_sample",
    "late_order_priority_counts",
    "unigram_logprob_score",
    # round-9 additions: the SQL-history surface — the time-travel read
    # must stay two pruned scans + partial aggs (no snapshot join), the
    # CDF reference one pass over the delta's files
    "sql_time_travel_diff",
    "sql_changes_feed",
    # round-10 additions: the view read must inline the body (union of a
    # pruned pinned scan + the delta read — no materialization barrier);
    # the MERGE consumer reads O(changed files), never a snapshot rescan
    "sql_view_changes_replay",
    "sql_merge_changes_upsert",
    # round-13 additions: exact-substring dedup — the span explode must
    # stay a single linear Generate per scan, dup marking must never
    # multiply rows on hot spans, islands a per-doc window
    "dup_span_stats",
    "substring_dup_coverage",
    # round-14 (optimization): the whole-corpus span verdict face joins
    # the SAME single-Generate islands relation — pin it so the one-pass
    # window marking (min/max over span_hash) cannot silently regress to
    # the r13 double span build
    "span_dedup_filter",
]

#: Pinned generation context — signatures are only comparable under the
#: same session shape and data scale (join strategies see file sizes).
CONTEXT = {
    "master": "local[8]",
    "shuffle_partitions": 8,
    "sf_dir": "/root/testdata/sf0.001",
}


def compute() -> dict:
    from wikistream_lakehouse_spark.plans import plan_signature
    from wikistream_lakehouse_spark.queries import all_queries
    from wikistream_lakehouse_spark.session import get_spark

    spark = get_spark(
        "plan-signatures",
        master=CONTEXT["master"],
        shuffle_partitions=CONTEXT["shuffle_partitions"],
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    sigs = {
        name: plan_signature(qs[name].build(spark, CONTEXT["sf_dir"]))
        for name in GUARDED
    }
    return {"context": CONTEXT, "signatures": sigs}


def main() -> None:
    out = os.path.join(REPO, "tests", "plan_signatures.json")
    with open(out, "w") as f:
        json.dump(compute(), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
