"""Query registry: every engine capability lands here as a named query.

Each registered query pairs
  * ``build(spark, sf_dir) -> DataFrame`` — the idiomatic PySpark plan, and
  * ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (or None for
    genuinely non-SQL-expressible operators → rows-only check).

Conventions (FIXTURES.md):
  * UTC session timezone (pinned via ensure_session_conf on every build).
  * Every computed column is aliased identically in Spark and SQL.
  * Results are deterministic: any LIMIT is preceded by a total order
    (explicit tie-breaks), so hash comparison is stable.
  * Integer-typed computed columns are cast to BIGINT on both sides;
    unstable float aggregates are rounded the same on both sides.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from wikistream_lakehouse_spark.session import ensure_session_conf

BuildFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    build: BuildFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    #: typed invariant for rows-only (◇) queries — called with the
    #: built DataFrame by the oracle sweep in place of the vacuous
    #: ``count() >= 0`` (VERDICT r8 wrong #2). Must raise on a frame
    #: that is structurally plausible but semantically garbage (wrong
    #: schema, violated recall floor, broken conservation sum, …).
    check: "Callable[[DataFrame], None] | None" = None


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    check: "Callable[[DataFrame], None] | None" = None,
) -> Callable[[BuildFn], BuildFn]:
    """Decorator: register a query build function under ``name``.
    ``check`` is required exactly when ``oracle`` is None — a rows-only
    query with no invariant would be unpinned in the sweep."""

    def deco(fn: BuildFn) -> BuildFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        if oracle is None and check is None:
            raise ValueError(
                f"rows-only query {name!r} needs a check= invariant"
            )
        REGISTRY[name] = Query(
            name=name,
            build=wrapped,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            tags=tags,
            check=check,
        )
        return wrapped

    return deco


#: name → the LAST round whose CORRECTNESS_r{N}.json scored it
#: (computed from the per-round driver records). ROTATION POLICY
#: (VERDICT r7 next #2, re-rotated per r8 next #7): the driver scores
#: only the first 50 registered queries per round, so ``all_queries``
#: orders oracle-backed queries by least-recently-scored — never-scored
#: names (absent here, rank 0) lead, then the stalest driver rows —
#: keeping every oracle query's driver score at most ~2 rounds behind
#: its code. Update after each round from the new CORRECTNESS file.
_LAST_SCORED: dict[str, int] = {}
_LAST_SCORED.update(dict.fromkeys((
    # round 1 (never re-scored since)
    "ann_lsh_topk", "approx_distinct_profile", "array_functions_showcase",
    "conditional_functions_showcase", "date_functions_showcase",
    "grouping_sets_sql", "language_id_ngram", "math_functions_showcase",
    "media_features", "minhash_near_dups", "simhash_near_dups",
    "string_functions_showcase",
), 1))
_LAST_SCORED.update(dict.fromkeys((
    # round 7
    "above_average_customers", "corpus_quality_filter",
    "cosine_topk_bruteforce", "cube_part_brand_size", "curate_projection",
    "customer_running_spend", "customer_spend_distribution",
    "customers_with_orders", "customers_without_orders",
    "daily_editor_counts", "dedup_canonical_docs", "distinct_order_status",
    "distinct_users_per_day", "doc_fingerprints", "embedding_cosine_pairs",
    "embedding_label_centroids", "event_date_slice",
    "first_orders_per_customer", "global_totals", "json_props_extract",
    "lang_source_stats", "late_shipment_priority", "limit_scan",
    "media_manifest", "nation_customer_supplier_presence",
    "orders_left_join_returns", "other_bucket_rollup", "part_price_bands",
    "pivot_event_type_counts", "price_percentiles", "pricing_summary",
    "priority_discount_orders", "project_with_defaults",
    "promo_revenue_share", "purchase_click_attribution",
    "revenue_by_nation", "rollup_daily_edits", "segment_set_ops",
    "session_windows_per_user", "sliding_window_counts", "sum_by_title",
    "text_quality_profile", "token_counts", "top_returning_customers",
    "top_revenue_orders", "top_titles_per_day", "tumbling_hourly_counts",
), 7))
_LAST_SCORED.update(dict.fromkeys((
    # round 8
    "benchmark_contamination", "cdc_apply_latest_state",
    "cheapest_supplier_per_part", "chunk_dedup_stats", "conversion_funnel",
    "corpus_funnel", "corpus_mixture_sample", "corpus_train_split",
    "cross_nation_trade_volume", "customer_cohort_retention",
    "customer_order_histogram", "daily_top_titles",
    "dedup_canonical_embeddings", "dedup_exact_events",
    "disjunctive_part_revenue", "doc_char_chunks", "doc_repetition_profile",
    "doc_token_chunks", "dominant_part_shippers",
    "fixed_count_per_lang_sample", "forecast_revenue",
    "heavy_hitter_tokens", "hourly_gapfill_locf", "idle_customer_balance",
    "important_part_value", "ivf_rerank_exact", "keyword_search_bm25",
    "large_volume_orders", "late_order_priority_counts",
    "late_suppliers_multi_supplier_orders", "leakage_safe_split",
    "nation_market_share", "ngram_jaccard_pairs", "order_measures_unpivot",
    "pii_scrub_profile", "product_profit_by_nation_year",
    "regional_same_nation_revenue", "rolling_zscore_anomalies",
    "scd2_history_splice", "scd_serving_merge", "skewed_cohort_stats",
    "small_quantity_revenue", "sql_daily_top_titles",
    "supplier_count_by_part_attrs", "term_frequency_topk",
    "top_supplier_by_revenue", "training_order_shuffle",
    "unigram_logprob_score", "weekly_retention", "window_frames_showcase",
), 8))
_LAST_SCORED.update(dict.fromkeys((
    # round 9 (CORRECTNESS_r09.json — 50 scored, all green)
    "above_average_customers", "array_functions_showcase",
    "cdc_apply_expectations", "conditional_functions_showcase",
    "corpus_quality_filter", "cosine_topk_bruteforce",
    "cube_part_brand_size", "curate_projection", "customer_running_spend",
    "customer_spend_distribution", "customers_with_orders",
    "customers_without_orders", "daily_editor_counts", "daily_top_titles",
    "date_functions_showcase", "dedup_canonical_docs",
    "distinct_order_status", "distinct_users_per_day", "doc_fingerprints",
    "embedding_cosine_pairs", "embedding_label_centroids",
    "event_date_slice", "first_orders_per_customer", "grouping_sets_sql",
    "lang_source_stats", "late_shipment_priority",
    "math_functions_showcase", "media_manifest",
    "nation_customer_supplier_presence", "orders_left_join_returns",
    "part_price_bands", "pivot_event_type_counts", "price_percentiles",
    "pricing_summary", "priority_discount_orders", "promo_revenue_share",
    "purchase_click_attribution", "revenue_by_nation",
    "rollup_daily_edits", "segment_set_ops", "session_windows_per_user",
    "sliding_window_counts", "sql_changes_feed", "sql_time_travel_diff",
    "string_functions_showcase", "text_quality_profile", "token_counts",
    "top_returning_customers", "top_revenue_orders",
    "tumbling_hourly_counts",
), 9))
_LAST_SCORED.update(dict.fromkeys((
    # round 10 (CORRECTNESS_r10.json — 50 scored, all green)
    "benchmark_contamination", "cdc_apply_latest_state",
    "cheapest_supplier_per_part", "conversion_funnel", "corpus_funnel",
    "corpus_mixture_sample", "corpus_train_split",
    "cross_nation_trade_volume", "customer_cohort_retention",
    "customer_order_histogram", "daily_top_titles",
    "dedup_canonical_embeddings", "dedup_exact_events",
    "disjunctive_part_revenue", "doc_repetition_profile",
    "dominant_part_shippers", "fixed_count_per_lang_sample",
    "forecast_revenue", "global_totals", "idle_customer_balance",
    "important_part_value", "ivf_rerank_exact", "json_props_extract",
    "large_volume_orders", "late_order_priority_counts",
    "late_suppliers_multi_supplier_orders", "leakage_safe_split",
    "limit_scan", "nation_market_share", "ngram_jaccard_pairs",
    "order_measures_unpivot", "other_bucket_rollup", "pii_scrub_profile",
    "product_profit_by_nation_year", "project_with_defaults",
    "regional_same_nation_revenue", "scd2_history_splice",
    "scd_serving_merge", "skewed_cohort_stats", "small_quantity_revenue",
    "sql_alter_lineage", "sql_merge_changes_upsert",
    "sql_view_changes_replay", "sum_by_title",
    "supplier_count_by_part_attrs", "top_supplier_by_revenue",
    "top_titles_per_day", "training_order_shuffle", "weekly_retention",
    "window_frames_showcase",
), 10))
_LAST_SCORED.update(dict.fromkeys((
    # round 11 (CORRECTNESS_r11.json — 50 scored, all green)
    "above_average_customers", "array_functions_showcase",
    "chunk_dedup_stats", "conditional_functions_showcase",
    "cube_part_brand_size", "customer_running_spend",
    "customers_with_orders", "customers_without_orders", "daily_top_titles",
    "date_functions_showcase", "dedup_canonical_docs",
    "distinct_order_status", "distinct_users_per_day", "doc_char_chunks",
    "doc_token_chunks", "first_orders_per_customer", "grouping_sets_sql",
    "heavy_hitter_tokens", "hourly_gapfill_locf", "ivfpq_adc_rerank_exact",
    "keyword_search_bm25", "language_id_ngram", "math_functions_showcase",
    "media_features_exact", "media_frame_arithmetic", "media_manifest",
    "nation_customer_supplier_presence", "orders_left_join_returns",
    "part_price_bands", "pq_adc_rerank_exact", "price_percentiles",
    "pricing_summary", "priority_discount_orders",
    "purchase_click_attribution", "revenue_by_nation",
    "rolling_zscore_anomalies", "rollup_daily_edits", "segment_set_ops",
    "semantic_dedup_assignments", "sequence_packing_accounting",
    "sql_copy_into_idempotent", "sql_daily_top_titles",
    "sql_identity_allocation", "sql_mv_incremental_refresh",
    "sql_show_create_roundtrip", "sql_version_tags",
    "string_functions_showcase", "term_frequency_topk",
    "top_revenue_orders", "unigram_logprob_score",
), 11))
_LAST_SCORED.update(dict.fromkeys((
    # round 12 (CORRECTNESS_r12.json — 50 scored, all green)
    "benchmark_contamination", "cdc_apply_expectations",
    "cheapest_supplier_per_part", "corpus_funnel", "corpus_quality_filter",
    "cosine_topk_bruteforce", "cross_nation_trade_volume",
    "curate_projection", "customer_order_histogram",
    "customer_spend_distribution", "daily_editor_counts",
    "daily_top_titles", "dedup_canonical_embeddings", "dedup_exact_events",
    "disjunctive_part_revenue", "doc_fingerprints",
    "doc_repetition_profile", "dominant_part_shippers",
    "embedding_cosine_pairs", "embedding_label_centroids",
    "event_date_slice", "forecast_revenue", "idle_customer_balance",
    "important_part_value", "lang_source_stats", "large_volume_orders",
    "late_order_priority_counts", "late_shipment_priority",
    "late_suppliers_multi_supplier_orders", "minhash_bands_exact",
    "nation_market_share", "ngram_jaccard_pairs", "pii_scrub_profile",
    "pivot_event_type_counts", "product_profit_by_nation_year",
    "promo_revenue_share", "regional_same_nation_revenue",
    "session_windows_per_user", "simhash_bands_exact",
    "sliding_window_counts", "small_quantity_revenue",
    "sql_branch_fast_forward", "sql_changes_feed", "sql_time_travel_diff",
    "supplier_count_by_part_attrs", "text_quality_profile", "token_counts",
    "top_returning_customers", "top_supplier_by_revenue",
    "tumbling_hourly_counts",
), 12))
_LAST_SCORED.update(dict.fromkeys((
    # round 13 (CORRECTNESS_r13.json — 50 scored, all green)
    "cdc_apply_latest_state", "conversion_funnel", "corpus_mixture_sample",
    "corpus_train_split", "cube_part_brand_size",
    "customer_cohort_retention", "customer_running_spend",
    "customers_with_orders", "customers_without_orders", "daily_top_titles",
    "dedup_canonical_docs", "distinct_order_status",
    "distinct_users_per_day", "dup_span_stats", "first_orders_per_customer",
    "fixed_count_per_lang_sample", "global_totals", "ivf_rerank_exact",
    "json_props_extract", "leakage_safe_split", "limit_scan",
    "media_features_exact", "media_frame_arithmetic", "media_manifest",
    "nation_customer_supplier_presence", "order_measures_unpivot",
    "orders_left_join_returns", "other_bucket_rollup", "part_price_bands",
    "price_percentiles", "project_with_defaults", "revenue_by_nation",
    "rollup_daily_edits", "scd2_history_splice", "scd_serving_merge",
    "segment_set_ops", "semantic_dedup_assignments", "skewed_cohort_stats",
    "span_dedup_filter", "sql_alter_lineage", "sql_branch_shared_refs",
    "sql_changes_over_fast_forward", "sql_merge_changes_upsert",
    "sql_view_changes_replay", "substring_dup_coverage", "sum_by_title",
    "top_titles_per_day", "training_order_shuffle", "weekly_retention",
    "window_frames_showcase",
), 13))
_LAST_SCORED.update(dict.fromkeys((
    # round 14 (CORRECTNESS_r14.json — 50 scored, all green)
    "above_average_customers", "array_functions_showcase",
    "benchmark_contamination", "cheapest_supplier_per_part",
    "chunk_dedup_stats", "conditional_functions_showcase", "corpus_funnel",
    "daily_top_titles", "date_functions_showcase",
    "dedup_canonical_embeddings", "dedup_exact_events",
    "disjunctive_part_revenue", "doc_char_chunks", "doc_repetition_profile",
    "doc_token_chunks", "dominant_part_shippers", "forecast_revenue",
    "grouping_sets_sql", "heavy_hitter_tokens", "hourly_gapfill_locf",
    "idle_customer_balance", "important_part_value", "ivfpq_adc_rerank_exact",
    "keyword_search_bm25", "language_id_ngram", "late_order_priority_counts",
    "math_functions_showcase", "minhash_bands_exact", "nation_market_share",
    "ngram_jaccard_pairs", "pii_scrub_profile", "pq_adc_rerank_exact",
    "pricing_summary", "priority_discount_orders",
    "product_profit_by_nation_year", "purchase_click_attribution",
    "rolling_zscore_anomalies", "sequence_packing_accounting",
    "simhash_bands_exact", "sql_copy_into_idempotent", "sql_daily_top_titles",
    "sql_identity_allocation", "sql_mv_incremental_refresh",
    "sql_show_create_roundtrip", "sql_version_tags",
    "string_functions_showcase", "supplier_count_by_part_attrs",
    "term_frequency_topk", "top_revenue_orders", "unigram_logprob_score",
), 14))


def all_queries() -> dict[str, Query]:
    """Import every query module and return the full registry.

    Ordering matters: the correctness driver scores only the FIRST 50
    registered queries, so the returned dict puts (1) the flagship
    ``daily_top_titles`` first (``entry()`` serves it), then (2) every
    other oracle-backed query ordered by LEAST-recently-scored
    (``_LAST_SCORED`` rotation — never-scored names lead, then the
    stalest prior driver rows), and pushes (3) rows-only queries
    (``oracle is None`` — approximate/hash-specific operators whose
    semantics aren't ANSI-SQL-expressible) past the cap, where the
    driver records its weaker rows-only check anyway (their typed
    ``check`` invariants run in the in-repo sweep instead).
    """
    # Local import to avoid import cycles; modules self-register on import.
    from wikistream_lakehouse_spark.queries import (  # noqa: F401
        classics,
        dedup,
        hygiene,
        multimodal,
        relational,
        sampling,
        scd,
        similarity,
        skew,
        sql_surface,
        streaming_windows,
        text,
        timeseries,
        wiki,
    )

    order = {name: i for i, name in enumerate(REGISTRY)}

    def key(item: tuple[str, Query]) -> tuple[int, int, int]:
        name, q = item
        if name == "daily_top_titles":
            tier = 0  # flagship: entry() serves it, always scored
        elif q.oracle is None:
            tier = 2  # rows-only: driver records `no_oracle` regardless
        else:
            tier = 1  # oracle-backed: staleness-ordered window
        return (tier, _LAST_SCORED.get(name, 0), order[name])

    return dict(sorted(REGISTRY.items(), key=key))
