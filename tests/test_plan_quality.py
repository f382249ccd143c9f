"""Plan-quality assertions (SURVEY.md §4, M5): the *physical plans* must
have the shape we designed for, not just correct results —

  * filters/column pruning reach the parquet scan (PushedFilters/ReadSchema)
  * bounded dims join as BroadcastHashJoin, fact-fact as SortMergeJoin
  * ordered-limit plans as TakeOrderedAndProject (no global sort)
  * event-time partition predicates prune silver partitions
  * hot relational plans run inside WholeStageCodegen
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse import curate_to_silver_parquet
from wikistream_lakehouse_spark.queries import all_queries
from wikistream_lakehouse_spark.tables import table

QUERIES = all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300).select(
        "l_orderkey", "l_quantity"
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,300)]" in plan


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "l_extendedprice" not in rs[0], "scan reads pruned columns"
    assert "l_orderkey" in rs[0] and "l_quantity" in rs[0]


def test_bounded_dims_broadcast_fact_joins_sort_merge(spark, sf_dir):
    plan = plan_of(QUERIES["revenue_by_nation"].build(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # nation/region sides
    # lineitem⋈orders is fact-fact: must NOT be nested-loop
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_take_ordered_and_project(spark, sf_dir):
    plan = plan_of(QUERIES["daily_top_titles"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # a global Sort operator would mean we materialize a full ordering
    # before the limit — TakeOrderedAndProject replaces it entirely


def test_semi_and_anti_join_operators(spark, sf_dir):
    assert "LeftSemi" in plan_of(QUERIES["customers_with_orders"].build(spark, sf_dir))
    assert "LeftAnti" in plan_of(
        QUERIES["customers_without_orders"].build(spark, sf_dir)
    )


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = plan_of(QUERIES["pricing_summary"].build(spark, sf_dir))
    # two HashAggregate levels around one Exchange, with map-side combine:
    # the shuffle moves per-group partial states, not raw lineitem rows
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan and "partial_count" in plan


def test_event_time_partition_pruning_on_silver(spark, sf_dir, tmp_path):
    """P7: a yyyy/mm/dd predicate on the silver table must prune at scan
    time — the 'partition pruning keeps queries cheap' property the
    reference relies on (README.md:115)."""
    path = str(tmp_path / "silver")
    curate_to_silver_parquet(table(spark, sf_dir, "events"), path)
    df = spark.read.parquet(path).filter(
        (F.col("yyyy") == 2024) & (F.col("mm") == 1) & (F.col("dd") == 15)
    )
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "dd" in plan.split("PartitionFilters")[1][:200]
    # row count confirms pruning semantics (one day only)
    days = df.select(F.to_date("ts").alias("d")).distinct().collect()
    assert len(days) == 1


def test_cosine_topk_has_no_shuffle_on_candidate_side(spark, sf_dir):
    """X3 brute force: the big (candidate) side must stream map-side into a
    BroadcastNestedLoopJoin against the tiny query set — no Exchange before
    the join on the candidate branch."""
    plan = plan_of(QUERIES["cosine_topk_bruteforce"].build(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def _window_specs(plan: str) -> list[str]:
    """Extract every windowspecdefinition(...) argument list from a plan."""
    specs = []
    i = 0
    while True:
        i = plan.find("windowspecdefinition(", i)
        if i == -1:
            return specs
        j = i + len("windowspecdefinition(")
        depth, start = 1, j
        while depth and j < len(plan):
            depth += {"(": 1, ")": -1}.get(plan[j], 0)
            j += 1
        specs.append(plan[start : j - 1])
        i = j


def test_other_bucket_rollup_has_no_global_window(spark, sf_dir):
    """The top-10+'Other' rollup must NOT rank through an unpartitioned
    window (single-task sort of 10^7-10^8 user groups at wiki scale).
    Correct shape: TakeOrderedAndProject for the top-10 + broadcast
    membership join."""
    plan = plan_of(QUERIES["other_bucket_rollup"].build(spark, sf_dir), "simple")
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_spend_distribution_windows_are_partitioned(spark, sf_dir):
    """Two-pass global rank: the DATA-SIZED window (row_number over
    every customer) must carry a partition spec — an unpartitioned one
    would be a single-partition sort of all customers. The r12 offsets
    cumsum (same shape as operators/quantiles.py) adds ONE deliberately
    unpartitioned window, but its input is the per-partition COUNT
    frame — exactly P = spark.sql.shuffle.partitions rows,
    cluster-bounded, never data-sized — recognizable by ordering on the
    synthetic `pid` column."""
    plan = plan_of(QUERIES["customer_spend_distribution"].build(spark, sf_dir), "simple")
    specs = _window_specs(plan)
    assert specs, "expected the per-range-partition row_number window"
    partitioned = []
    for spec in specs:
        first_arg = spec.split(",")[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            # only the P-row offsets cumsum may run unpartitioned
            assert first_arg.strip().startswith("pid"), (
                f"unpartitioned data-sized window spec: {spec[:120]}"
            )
        else:
            partitioned.append(spec)
    assert partitioned, "the row_number pass lost its pid partition spec"
    # SinglePartition exchanges: the tiny global-count agg + the P-row
    # offsets window — both bounded by partition count, not data
    assert plan.count("Exchange SinglePartition") <= 2


def test_price_percentiles_never_buffers_groups(spark, sf_dir):
    """Exact percentiles must come from the distributed two-pass rank
    operator, not Spark's `percentile` aggregate (an ObjectHashAggregate
    that buffers every value of a group in memory — an OOM with 3 groups
    over 100 TB). No value-buffering aggregate, no single-partition
    exchange."""
    plan = plan_of(QUERIES["price_percentiles"].build(spark, sf_dir), "simple")
    assert "ObjectHashAggregate" not in plan
    assert "Exchange SinglePartition" not in plan


@pytest.mark.parametrize(
    "name",
    ["revenue_by_nation", "pricing_summary", "daily_top_titles", "top_revenue_orders"],
)
def test_hot_queries_stay_in_codegen(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    df.collect()  # AQE final plan only materializes codegen info on execution
    plan = plan_of(df, mode="simple")
    assert "isFinalPlan=true" in plan
    # `*(n)` marks whole-stage-codegen'd operators — the relational hot
    # path must compile, not fall back to interpreted evaluation
    assert "*(1)" in plan


def test_new_classics_broadcast_their_dims(spark, sf_dir):
    """Q5/Q15/Q17 shapes: only BOUNDED sides carry broadcast hints
    (nation/region, the 1-row max set) — supplier/part grow with SF and
    are left to AQE — and nothing degenerates to a nested-loop join."""
    for name in (
        "regional_same_nation_revenue",
        "top_supplier_by_revenue",
        "small_quantity_revenue",
    ):
        plan = plan_of(QUERIES[name].build(spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    # the statically-known bounded sides must still plan as broadcasts
    assert "BroadcastHashJoin" in plan_of(
        QUERIES["regional_same_nation_revenue"].build(spark, sf_dir)
    )
    assert "BroadcastHashJoin" in plan_of(
        QUERIES["top_supplier_by_revenue"].build(spark, sf_dir)
    )
    # Q17: every join keys on partkey — one partitioning reused end-to-end
    plan = plan_of(QUERIES["small_quantity_revenue"].build(spark, sf_dir), "simple")
    assert plan.count("hashpartitioning(l_partkey") >= 1


def test_order_histogram_keeps_left_join_and_partial_agg(spark, sf_dir):
    """Q13 shape: the priority predicate must stay inside the left join
    (zero-order customers survive) and the first aggregate must combine
    map-side before its exchange."""
    plan = plan_of(QUERIES["customer_order_histogram"].build(spark, sf_dir))
    assert "LeftOuter" in plan
    assert "partial_count" in plan


def test_sampling_queries_shuffle_only_for_presentation(spark, sf_dir):
    """Split and mixture sampling are row-local scan predicates: the ONLY
    exchange allowed is the final ORDER BY's range partitioning; the
    mixture filter must sit on the scan as a data filter."""
    plan = plan_of(QUERIES["corpus_train_split"].build(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1 and "rangepartitioning" in plan
    plan = plan_of(QUERIES["corpus_mixture_sample"].build(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1 and "rangepartitioning" in plan
    assert "Filter" in plan


def test_training_order_has_no_single_task_sort(spark, sf_dir):
    """The global shuffle is a range exchange + per-partition sort —
    never `Sort [...], true` fed by a single partition."""
    plan = plan_of(QUERIES["training_order_shuffle"].build(spark, sf_dir), "simple")
    assert "rangepartitioning(shuffle_key" in plan
    assert "Exchange SinglePartition" not in plan


def test_q6_all_predicates_pushed_no_join(spark, sf_dir):
    """forecast_revenue (Q6 shape): every predicate — date range,
    discount band, quantity cap — must reach the parquet scan."""
    plan = plan_of(QUERIES["forecast_revenue"].build(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for frag in (
        "GreaterThanOrEqual(l_shipdate,1996-01-01",
        "LessThan(l_shipdate,1997-01-01",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in pushed, f"missing pushed predicate {frag}"
    assert "Join" not in plan and "partial_sum" in plan


def test_q19_disjunction_pushes_per_side_implications(spark, sf_dir):
    """disjunctive_part_revenue (Q19 shape): Catalyst must derive the
    single-side implications of the cross-side OR and push them to BOTH
    scans — the lineitem scan gets the quantity-window disjunction, the
    part scan gets the brand/size disjunction."""
    plan = plan_of(QUERIES["disjunctive_part_revenue"].build(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_quantity,1.0" in ln and "l_quantity,30.0" in ln for ln in pushed)
    assert any("p_brand,Brand#12" in ln and "p_size" in ln for ln in pushed)


def test_new_classic_shapes(spark, sf_dir):
    """Q2/Q20/BM25: ordered limits are TakeOrderedAndProject, the nested
    IN decorrelates to LeftSemi, nothing degenerates to a nested-loop
    join, and Q11's global-scalar HAVING plans without any Window."""
    q2 = plan_of(QUERIES["cheapest_supplier_per_part"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in q2
    assert "BroadcastNestedLoopJoin" not in q2
    q20 = plan_of(QUERIES["dominant_part_shippers"].build(spark, sf_dir))
    assert "LeftSemi" in q20 and "BroadcastNestedLoopJoin" not in q20
    bm25 = plan_of(QUERIES["keyword_search_bm25"].build(spark, sf_dir))
    assert "TakeOrderedAndProject" in bm25 and "BroadcastHashJoin" in bm25
    q11 = plan_of(QUERIES["important_part_value"].build(spark, sf_dir))
    assert "Window" not in q11


def test_skew_query_plans_with_salt_mitigation(spark, sf_dir):
    """VERDICT r4 #6: the registered skewed_cohort_stats query carries
    its skew mitigation IN THE COMMITTED PLAN — the join keys include
    the synthetic _salt column (hot cohort spread over 16 sub-keys),
    the dim side replicates via explode, and the post-join aggregation
    still partial-aggregates map-side before the exchange."""
    plan = plan_of(QUERIES["skewed_cohort_stats"].build(spark, sf_dir))
    assert "Join" in plan
    # join equi-keys include the salt (strategy-agnostic: at test scale
    # Catalyst may broadcast the small side; at 100 TB it shuffles on
    # exactly these keys — either way the hot key is spread 16-ways)
    key_lines = [ln for ln in plan.splitlines() if "keys" in ln]
    assert any("_salt" in ln for ln in key_lines), key_lines
    assert "Generate" in plan  # dim replicated across salts via explode
    # two-phase aggregation: map-side partial collapses the re-grouped
    # hot key before the exchange
    assert "partial_count" in plan


def test_dynamic_partition_pruning_from_dim_filter(spark, sf_dir, tmp_path):
    """DPP: a filter on a DIMENSION must prune the partitioned FACT's
    scan at runtime — the join key's qualifying values flow into the
    fact's PartitionFilters as a dynamicpruning subquery. At 100 TB
    this is the difference between scanning one nation's partitions and
    scanning the table because the filter sits on the other join side."""
    fact_path = str(tmp_path / "orders_by_cust_nation")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf_dir, "orders")
    (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("nk", F.col("c_nationkey"))
        .drop("c_nationkey", "c_custkey")
        .write.partitionBy("nk")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    nation = table(spark, sf_dir, "nation").filter(F.col("n_name") == "FRANCE")
    j = fact.join(nation, fact.nk == nation.n_nationkey).select(
        "o_orderkey", "o_totalprice", "n_name"
    )
    plan = plan_of(j)
    pf = plan.split("PartitionFilters")[1][:300] if "PartitionFilters" in plan else ""
    assert "dynamicpruning" in pf, pf
    # semantics: only FRANCE's partition rows flow
    nk = [r.n_nationkey for r in nation.collect()]
    assert j.count() == fact.filter(F.col("nk").isin(nk)).count()


def test_event_time_partition_pruning_on_txn_silver(spark, sf_dir, tmp_path):
    """The DEFAULT silver is transactional now — the same yyyy/mm/dd
    predicate must still prune at scan planning through txn.read_table
    (snapshot reads carry basePath, so hive partition columns stay
    prunable)."""
    from wikistream_lakehouse_spark.lakehouse import curate_to_silver
    from wikistream_lakehouse_spark.lakehouse.txn import read_table as txn_read

    path = str(tmp_path / "silver_txn")
    curate_to_silver(table(spark, sf_dir, "events"), path)
    df = txn_read(spark, path).filter(
        (F.col("yyyy") == 2024) & (F.col("mm") == 1) & (F.col("dd") == 15)
    )
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "dd" in plan.split("PartitionFilters")[1][:200]
    days = df.select(F.to_date("ts").alias("d")).distinct().collect()
    assert len(days) == 1
