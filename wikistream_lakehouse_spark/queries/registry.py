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


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[BuildFn], BuildFn]:
    """Decorator: register a query build function under ``name``."""

    def deco(fn: BuildFn) -> BuildFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_conf(spark)
            return fn(spark, sf_dir)

        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, build=wrapped, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return wrapped

    return deco


#: Names that already have a driver-side CORRECTNESS row from rounds
#: 1–7 (union of CORRECTNESS_r0{1..7}.json keys). ROTATION POLICY
#: (VERDICT r7 next #2): the driver scores only the first 50 registered
#: queries per round, so each round demotes previously-scored
#: oracle-backed queries behind the never-scored ones — every oracle
#: query eventually gets the driver's independent hard check, not just
#: the in-repo suite's DuckDB sweep. Append each round's newly-scored
#: names here when rotating.
_DRIVER_SCORED: frozenset = frozenset({
    "above_average_customers", "ann_lsh_topk", "approx_distinct_profile",
    "array_functions_showcase", "conditional_functions_showcase",
    "corpus_quality_filter", "cosine_topk_bruteforce",
    "cube_part_brand_size", "curate_projection", "customer_running_spend",
    "customer_spend_distribution", "customers_with_orders",
    "customers_without_orders", "daily_editor_counts", "daily_top_titles",
    "date_functions_showcase", "dedup_canonical_docs", "dedup_exact_events",
    "distinct_order_status", "distinct_users_per_day", "doc_fingerprints",
    "embedding_cosine_pairs", "embedding_label_centroids",
    "event_date_slice", "first_orders_per_customer", "global_totals",
    "grouping_sets_sql", "json_props_extract", "lang_source_stats",
    "language_id_ngram", "late_shipment_priority", "limit_scan",
    "math_functions_showcase", "media_features", "media_manifest",
    "minhash_near_dups", "nation_customer_supplier_presence",
    "ngram_jaccard_pairs", "orders_left_join_returns",
    "other_bucket_rollup", "part_price_bands", "pivot_event_type_counts",
    "price_percentiles", "pricing_summary", "priority_discount_orders",
    "project_with_defaults", "promo_revenue_share",
    "purchase_click_attribution", "revenue_by_nation",
    "rollup_daily_edits", "segment_set_ops", "session_windows_per_user",
    "simhash_near_dups", "sliding_window_counts",
    "string_functions_showcase", "sum_by_title", "text_quality_profile",
    "token_counts", "top_returning_customers", "top_revenue_orders",
    "top_titles_per_day", "tumbling_hourly_counts",
})


def all_queries() -> dict[str, Query]:
    """Import every query module and return the full registry.

    Ordering matters: the correctness driver scores only the FIRST 50
    registered queries, so the returned dict puts (1) the flagship
    ``daily_top_titles`` first (``entry()`` serves it), then (2) the
    oracle-backed queries with NO driver-side CORRECTNESS row from any
    prior round (``_DRIVER_SCORED`` rotation — see its docstring), then
    (3) previously-scored oracle-backed queries, and pushes (4)
    rows-only queries (``oracle is None`` — approximate/hash-specific
    operators whose semantics aren't ANSI-SQL-expressible) past the
    cap, where the driver records its weaker rows-only check anyway.
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

    def key(item: tuple[str, Query]) -> tuple[int, int]:
        name, q = item
        if name == "daily_top_titles":
            tier = 0  # flagship: entry() serves it, always scored
        elif q.oracle is None:
            tier = 3  # rows-only: driver records `no_oracle` regardless
        elif name in _DRIVER_SCORED:
            tier = 2  # already has a hard driver row from r1–r7
        else:
            tier = 1  # never driver-scored: this round's window
        return (tier, order[name])

    return dict(sorted(REGISTRY.items(), key=key))
