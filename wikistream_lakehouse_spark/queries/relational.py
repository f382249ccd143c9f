"""General relational surface (SURVEY.md §2.9 J1–J10) over the star schema.

The reference's analytics are one-table group-bys delegated to Athena/Presto
(dag/wiki_pipeline_dag.py:29-39, README.md:99-110); a drop-in engine needs
the full relational surface those engines provide. Everything here is
built-in Catalyst — no UDFs.

Scale notes (100 TB posture):
  * Bounded dims (region: 5 rows, nation: 25 rows, literal band tables) are
    explicitly `broadcast()` — no shuffle of the fact side for those joins.
  * Fact-fact joins (lineitem⋈orders) are equi-joins → sort-merge with AQE
    skew splitting; both sides shuffle once on the join key.
  * Aggregations pre-reduce before any join where semantics allow, so the
    join input is group-cardinality, not row-cardinality.
  * Windows partition by high-cardinality keys (customer), never a global
    unpartitioned window over raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.operators.asof import asof_join
from wikistream_lakehouse_spark.queries import checks
from wikistream_lakehouse_spark.queries.registry import register
from wikistream_lakehouse_spark.tables import table


# --- J1: multi-way inner equi-join through the full dimension chain --------
@register(
    "revenue_by_nation",
    oracle="""
        SELECT r.r_name AS region_name, n.n_name AS nation_name,
               count(*) AS n_items,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
        ORDER BY region_name, nation_name
    """,
    tags=("J1", "joins"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim chain lineitem⋈orders⋈customer⋈nation⋈region with revenue
    rollup. nation/region are broadcast (bounded at any SF); lineitem⋈orders
    is the one real shuffle — on the natural key, AQE-coalesced."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
        .orderBy("region_name", "nation_name")
    )


# --- J2: left outer join with null-producing right side --------------------
@register(
    "orders_left_join_returns",
    oracle="""
        SELECT o.o_orderkey,
               CAST(count(l.l_orderkey) AS BIGINT) AS n_returned_items,
               ROUND(coalesce(SUM(l.l_quantity), 0), 2) AS returned_qty
        FROM orders o
        LEFT JOIN (SELECT * FROM lineitem WHERE l_returnflag = 'R') l
               ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
        ORDER BY o_orderkey
        LIMIT 500
    """,
    tags=("J2", "joins"),
)
def orders_left_join_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders LEFT JOIN returned lineitems: orders without 'R' items keep a
    zero count — exercises null semantics of outer joins + count(col)."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_orderkey").alias("n_returned_items"),
            F.round(F.coalesce(F.sum("l_quantity"), F.lit(0.0)), 2).alias(
                "returned_qty"
            ),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


# --- J2b: full outer join of two pre-aggregated sides ----------------------
@register(
    "nation_customer_supplier_presence",
    oracle="""
        WITH cc AS (SELECT c_nationkey AS nk, count(*) AS n_cust
                    FROM customer GROUP BY 1),
             ss AS (SELECT s_nationkey AS nk, count(*) AS n_supp
                    FROM supplier GROUP BY 1)
        SELECT coalesce(cc.nk, ss.nk) AS nationkey,
               coalesce(cc.n_cust, 0) AS n_cust,
               coalesce(ss.n_supp, 0) AS n_supp
        FROM cc FULL OUTER JOIN ss ON cc.nk = ss.nk
        ORDER BY nationkey
    """,
    tags=("J2", "joins"),
)
def nation_customer_supplier_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer and supplier counts. Both sides
    are aggregated *before* the join — the join runs over ≤25 rows per side
    regardless of fact size (aggregate-then-join, not join-then-aggregate)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cc = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    ss = s.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        cc.join(ss, cc.nk == ss.nk, "full_outer")
        .select(
            F.coalesce(cc.nk, ss.nk).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# --- J3: semi join (EXISTS) ------------------------------------------------
@register(
    "customers_with_orders",
    oracle="""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
        ORDER BY c_mktsegment
    """,
    tags=("J3", "joins"),
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 order, per segment — left_semi join (EXISTS).
    Semi join never duplicates the left side, so no post-join dedup shuffle."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# --- J3b: anti join (NOT EXISTS) -------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey
    """,
    tags=("J3", "joins"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all — left_anti join (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --- J4: theta/range join against a literal band table ---------------------
@register(
    "part_price_bands",
    oracle="""
        SELECT b.band, count(*) AS n_parts,
               ROUND(AVG(p.p_retailprice), 4) AS avg_price
        FROM part p
        JOIN (VALUES ('budget', 0.0, 500.0),
                     ('mid', 500.0, 1500.0),
                     ('premium', 1500.0, 1e12)) b(band, lo, hi)
          ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
        GROUP BY 1
        ORDER BY band
    """,
    tags=("J4", "joins"),
)
def part_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: parts bucketed into price bands via inequality
    conditions. The band table is a broadcast literal → BroadcastNestedLoop
    over 3 rows, i.e. effectively a map-side CASE at any scale."""
    p = table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1500.0), ("premium", 1500.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


# --- J5: ranking window -----------------------------------------------------
@register(
    "first_orders_per_customer",
    oracle="""
        SELECT o_custkey, o_orderkey, rk FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS rk
            FROM orders
        ) WHERE rk <= 2
        ORDER BY o_custkey, rk
    """,
    tags=("J5", "windows"),
)
def first_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First two orders per customer by order date — ranking window with a
    deterministic key tie-break. Partitioned by customer: state per window
    partition is one customer's orders, bounded at any total scale."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "rk")
        .orderBy("o_custkey", "rk")
    )


# --- J6: analytic window (running total, lag/lead) --------------------------
@register(
    "customer_running_spend",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                   AS running_spend,
               ROUND(coalesce(lag(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_total
        FROM orders
        WHERE o_custkey <= 200
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("J6", "windows"),
)
def customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running spend + previous-order total per customer — analytic window
    functions (running sum with explicit ROWS frame, lag with default)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(frame), 2).alias("running_spend"),
        F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias(
            "prev_total"
        ),
    ).orderBy("o_custkey", "o_orderkey")


# --- J7: set operations ----------------------------------------------------
@register(
    "segment_set_ops",
    oracle="""
        WITH building AS (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING'),
             rich     AS (SELECT c_custkey FROM customer
                          WHERE c_acctbal > 5000)
        SELECT 'union' AS op,
               CAST(count(*) AS BIGINT) AS n
          FROM (SELECT * FROM building UNION SELECT * FROM rich)
        UNION ALL
        SELECT 'intersect', CAST(count(*) AS BIGINT)
          FROM (SELECT * FROM building INTERSECT SELECT * FROM rich)
        UNION ALL
        SELECT 'except', CAST(count(*) AS BIGINT)
          FROM (SELECT * FROM building EXCEPT SELECT * FROM rich)
        ORDER BY op
    """,
    tags=("J7", "setops"),
)
def segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except over two customer slices, reported as one
    (op, n) table. Spark's distinct set ops are aggregate-backed — same
    shuffle as a groupBy on the compared columns."""
    c = table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def count1(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(op).alias("op"), "n")

    return (
        count1(building.union(rich).distinct(), "union")
        .unionByName(count1(building.intersect(rich), "intersect"))
        .unionByName(count1(building.exceptAll(rich).distinct(), "except"))
        .orderBy("op")
    )


# --- J7b: distinct / dropDuplicates ----------------------------------------
@register(
    "distinct_order_status",
    oracle="""
        SELECT DISTINCT o_orderstatus, o_orderpriority
        FROM orders
        ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("J7", "setops"),
)
def distinct_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over two low-cardinality columns — partial aggregation means
    each task emits its local distinct set; the shuffle moves only the
    handful of combinations."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# --- J8: rollup with grouping indicator ------------------------------------
@register(
    "rollup_daily_edits",
    oracle="""
        SELECT CAST(ts AS DATE) AS ds, event_type,
               count(*) AS edits,
               CAST(GROUPING(CAST(ts AS DATE), event_type) AS BIGINT) AS gid
        FROM events
        GROUP BY ROLLUP(1, 2)
        ORDER BY gid, ds, event_type
    """,
    tags=("J8", "rollup"),
)
def rollup_daily_edits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (ds, event_type) → per-(day,type), per-day, and grand-total
    rows in one pass, disambiguated by grouping_id. Spark evaluates all
    grouping sets in a single shuffle (Expand + hash aggregate)."""
    e = table(spark, sf_dir, "events").withColumn("ds", F.to_date("ts"))
    return (
        e.rollup("ds", "event_type")
        .agg(
            F.count(F.lit(1)).alias("edits"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("gid", "ds", "event_type")
    )


# --- J8b: cube -------------------------------------------------------------
@register(
    "cube_part_brand_size",
    oracle="""
        SELECT p_brand, p_size, count(*) AS n_parts,
               ROUND(SUM(p_retailprice), 2) AS total_price,
               CAST(GROUPING(p_brand, p_size) AS BIGINT) AS gid
        FROM part
        GROUP BY CUBE(p_brand, p_size)
        ORDER BY gid, p_brand, p_size
    """,
    tags=("J8", "cube"),
)
def cube_part_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (brand, size): all four grouping sets in one aggregate pass."""
    p = table(spark, sf_dir, "part")
    return (
        p.cube("p_brand", "p_size")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("p_retailprice"), 2).alias("total_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy("gid", "p_brand", "p_size")
    )


# --- J9: distinct counts + exact percentiles -------------------------------
@register(
    "distinct_users_per_day",
    oracle="""
        SELECT CAST(ts AS DATE) AS ds,
               CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
               CAST(count(DISTINCT event_type) AS BIGINT) AS distinct_types
        FROM events
        GROUP BY 1
        ORDER BY ds
    """,
    tags=("J9", "aggregates"),
)
def distinct_users_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts per day. Spark plans Expand +
    two-phase aggregate; the approx variant (approx_distinct_profile) is
    the 100 TB path — one pass, fixed-size HLL sketch."""
    e = table(spark, sf_dir, "events").withColumn("ds", F.to_date("ts"))
    return (
        e.groupBy("ds")
        .agg(
            F.countDistinct("user_id").cast("long").alias("distinct_users"),
            F.countDistinct("event_type").cast("long").alias("distinct_types"),
        )
        .orderBy("ds")
    )


@register(
    "approx_distinct_profile",
    oracle=None,  # sketch implementations differ across engines → rows-only
    tags=("J9", "aggregates", "approx"),
    check=checks.approx_distinct_check(rel_err=0.10),
)
def approx_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + approx percentiles per event_type.
    No SQL oracle: DuckDB's sketches are a different algorithm, so values
    legitimately differ; accuracy is asserted in unit tests against exact
    counts (±5% rsd)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
        )
        .orderBy("event_type")
    )


@register(
    "price_percentiles",
    oracle="""
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
               ROUND(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
               ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        FROM lineitem
        GROUP BY 1
        ORDER BY l_returnflag
    """,
    tags=("J9", "aggregates"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (≡ DuckDB quantile_cont) computed by
    the DISTRIBUTED exact-quantile operator (operators/quantiles.py):
    range-partitioned parallel sort + two-pass rank selection. Spark's
    built-in `percentile` buffers every group value in one aggregate
    buffer — with 3 groups over a 100 TB lineitem that is an executor
    OOM; this plan's memory is bounded by partition size (external sort)
    regardless of group count. percentile_approx stays the sketch twin."""
    from wikistream_lakehouse_spark.operators.quantiles import exact_group_quantiles

    l = table(spark, sf_dir, "lineitem")
    q = exact_group_quantiles(l, "l_extendedprice", ["l_returnflag"], [0.25, 0.50, 0.75])
    return (
        q.groupBy("l_returnflag")
        .agg(
            F.round(F.min(F.when(F.col("q") == 0.25, F.col("quantile"))), 4).alias("p25"),
            F.round(F.min(F.when(F.col("q") == 0.50, F.col("quantile"))), 4).alias("p50"),
            F.round(F.min(F.when(F.col("q") == 0.75, F.col("quantile"))), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


# --- J10: scalar function families -----------------------------------------
@register(
    "string_functions_showcase",
    oracle="""
        SELECT doc_id,
               upper(lang) AS lang_uc,
               CAST(length(text) AS BIGINT) AS n_chars,
               substring(text, 1, 12) AS prefix,
               CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               regexp_extract(text, '^[a-z]+') AS first_word,
               replace(source, 'src', 'source-') AS source_renamed
        FROM documents
        WHERE doc_id < 200
        ORDER BY doc_id
    """,
    tags=("J10", "functions", "strings"),
)
def string_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar family: case, length, substring, split, regexp,
    replace — all JVM-side codegen, no UDFs."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.length("text").cast("long").alias("n_chars"),
        F.substring("text", 1, 12).alias("prefix"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_extract("text", r"^[a-z]+", 0).alias("first_word"),
        F.regexp_replace("source", "src", "source-").alias("source_renamed"),
    ).orderBy("doc_id")


@register(
    "math_functions_showcase",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 1) AS price_r1,
               ABS(l_discount - 0.05) AS disc_dev,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
               ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
               CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
        FROM lineitem
        WHERE l_orderkey < 300
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("J10", "functions", "math"),
)
def math_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar family: round/abs/ceil/floor/sqrt/ln/mod — IEEE-identical
    across engines, rounded where transcendental."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "array_functions_showcase",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               ROUND(embedding[1], 6) AS first_coord,
               ROUND(list_aggregate(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 3)
                   AS sq_norm
        FROM embeddings
        WHERE vec_id < 100
        ORDER BY vec_id
    """,
    tags=("J10", "functions", "arrays"),
)
def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar family over the embedding column: size, element access,
    higher-order transform+aggregate (squared L2 norm) — the same JVM-side
    primitives the similarity-search operators build on."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_coord"),
        F.round(sq, 3).alias("sq_norm"),
    ).orderBy("vec_id")


# --- TPC-H-style classics ---------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '2001-06-01'
        GROUP BY 1, 2
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("classic", "A1", "aggregates"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical scan→filter→wide
    hash-aggregate. One scan, partial aggregation map-side, 4-group output."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_revenue_orders",
    oracle="""
        SELECT l.l_orderkey,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY 1, 3, 4
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("classic", "J1", "O1"),
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment-filtered 3-way join → revenue per order →
    top 10. The segment filter runs before the join (pushdown), shrinking
    the build side; final top-k is TakeOrderedAndProject, no full sort."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "priority_discount_orders",
    oracle="""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08)
        GROUP BY 1
        ORDER BY o_orderpriority
    """,
    tags=("classic", "J3"),
)
def priority_discount_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders with ≥1 deeply-discounted item, counted by
    priority — semi join keeps each order once regardless of item count."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "above_average_customers",
    oracle="""
        WITH nation_avg AS (
            SELECT c_nationkey, AVG(c_acctbal) AS avg_bal
            FROM customer GROUP BY 1
        )
        SELECT c.c_custkey, c.c_nationkey,
               ROUND(c.c_acctbal, 2) AS acctbal,
               ROUND(a.avg_bal, 4) AS nation_avg_bal
        FROM customer c
        JOIN nation_avg a ON c.c_nationkey = a.c_nationkey
        WHERE c.c_acctbal > a.avg_bal
        ORDER BY c_custkey
    """,
    tags=("classic", "J1", "subquery"),
)
def above_average_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decorrelated 'above per-group average' — the aggregate side collapses
    to ≤25 rows and broadcasts; the classic correlated-subquery shape with
    no per-row subquery execution."""
    c = table(spark, sf_dir, "customer")
    avg_bal = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal), c.c_nationkey == avg_bal.nk)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round("avg_bal", 4).alias("nation_avg_bal"),
        )
        .orderBy("c_custkey")
    )


# --- As-of join (custom operator; DuckDB native ASOF as oracle) ------------
@register(
    "purchase_click_attribution",
    oracle="""
        WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                   FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS click_id, user_id,
                          CAST(ts AS TIMESTAMP) AS click_ts
                   FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, c.click_id,
               ROUND(CAST(date_diff('microsecond', c.click_ts, p.ts) AS DOUBLE)
                     / 60000000, 4) AS minutes_since_click
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.click_ts
        ORDER BY event_id
    """,
    tags=("asof", "custom-operator", "joins"),
)
def purchase_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/asof.py): each purchase attributed to
    the user's most recent prior click — the canonical last-touch
    attribution query. One shuffle on user_id, running-window match, no
    range-join explosion; oracle is DuckDB's native ASOF JOIN."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="click_ts"
    )
    # integer µs on both sides → identical doubles after one division
    mins = (F.unix_micros("ts") - F.unix_micros("click_ts")) / F.lit(60000000.0)
    return joined.select(
        "event_id",
        "user_id",
        "click_id",
        F.round(mins, 4).alias("minutes_since_click"),
    ).orderBy("event_id")


# --- J10: date/time scalar family ------------------------------------------
@register(
    "date_functions_showcase",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               CAST(date_add(CAST(o_orderdate AS DATE), INTERVAL 30 DAY)
                    AS DATE) AS due_date,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                             DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
                   AS week_start,
               CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
               CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
        FROM orders
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
    tags=("J10", "functions", "dates"),
)
def date_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar family: add/diff/truncate/boundary/calendar-part —
    all JVM-side. (DuckDB dayofweek: Sunday=0; Spark dayofweek: Sunday=1 →
    aligned via -1.)"""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).cast("long").alias(
            "days_to_y2k"
        ),
        F.last_day(d).alias("month_end"),
        F.date_trunc("week", d).cast("date").alias("week_start"),
        (F.dayofweek(d) - 1).cast("long").alias("dow"),
        F.quarter(d).cast("long").alias("qtr"),
    ).orderBy("o_orderkey")


# --- J10: conditional / null-handling scalar family -------------------------
@register(
    "conditional_functions_showcase",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity >= 40 THEN 'bulk'
                    WHEN l_quantity >= 10 THEN 'standard'
                    ELSE 'small' END AS qty_class,
               ifnull(nullif(l_returnflag, 'N'), 'NONE') AS return_state,
               greatest(l_discount, l_tax) AS max_rate,
               least(l_discount, l_tax) AS min_rate,
               CASE WHEN l_discount > 0.05 THEN l_extendedprice * 0.95
                    ELSE l_extendedprice END AS adjusted_price
        FROM lineitem
        WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber
    """,
    tags=("J10", "functions", "conditional"),
)
def conditional_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling family: CASE chains, nullif/ifnull,
    greatest/least — constant-folded and codegen'd by Catalyst."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") >= 40, "bulk")
        .when(F.col("l_quantity") >= 10, "standard")
        .otherwise("small")
        .alias("qty_class"),
        F.ifnull(F.nullif("l_returnflag", F.lit("N")), F.lit("NONE")).alias(
            "return_state"
        ),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        # raw IEEE product, no per-row decimal rounding: round-half rules
        # differ between engines exactly at *.xx5 boundaries, while the
        # product itself is bit-identical
        F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice") * 0.95)
        .otherwise(F.col("l_extendedprice"))
        .alias("adjusted_price"),
    ).orderBy("l_orderkey", "l_linenumber")


# --- J8c: GROUPING SETS via the SQL entry point -----------------------------
@register(
    "grouping_sets_sql",
    oracle="""
        SELECT CAST(ts AS DATE) AS ds, event_type, count(*) AS edits,
               CAST(GROUPING(CAST(ts AS DATE), event_type) AS BIGINT) AS gid
        FROM events
        GROUP BY GROUPING SETS ((CAST(ts AS DATE)), (event_type), ())
        ORDER BY gid, ds, event_type
    """,
    tags=("J8", "sql-api", "extra"),
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through spark.sql — the engine's SQL entry
    point over registered views (same Catalyst plan as the DataFrame
    rollup/cube: one Expand + hash aggregate)."""
    table(spark, sf_dir, "events").createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT CAST(ts AS DATE) AS ds, event_type, count(1) AS edits,
               CAST(grouping_id(CAST(ts AS DATE), event_type) AS BIGINT) AS gid
        FROM events_gs
        GROUP BY GROUPING SETS ((CAST(ts AS DATE)), (event_type), ())
        ORDER BY gid, ds, event_type
        """
    )


# --- Pivot (dynamic columns from values) ------------------------------------
@register(
    "pivot_event_type_counts",
    oracle="""
        SELECT CAST(ts AS DATE) AS ds,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events
        GROUP BY 1
        ORDER BY ds
    """,
    tags=("A1", "pivot"),
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, one row per day. The value list is
    pinned explicitly — at scale an unpinned pivot needs a distinct-values
    job first; pinning keeps it a single-pass aggregate."""
    e = table(spark, sf_dir, "events").withColumn("ds", F.to_date("ts"))
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        e.groupBy("ds")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    return out.orderBy("ds")


# --- J5b: distribution-rank window family -----------------------------------
@register(
    "customer_spend_distribution",
    oracle="""
        WITH s AS (
            SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend
            FROM orders GROUP BY 1
        )
        SELECT o_custkey, spend,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               ROUND(percent_rank() OVER w, 6) AS pct_rank,
               ROUND(cume_dist() OVER w, 6) AS cume
        FROM s
        WINDOW w AS (ORDER BY spend, o_custkey)
        ORDER BY o_custkey
    """,
    tags=("J5", "windows"),
)
def customer_spend_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics over an aggregate: ntile/percent_rank/
    cume_dist — computed as a RANGE-PARTITIONED TWO-PASS RANK, never a
    single-partition global window.

    Pass 1: ``repartitionByRange(spend, o_custkey)`` gives a parallel
    global sort; ``row_number`` runs per range partition (bounded
    state). Pass 2: per-partition row counts (one tiny row per
    partition) become cumulative offsets via a running-sum window over
    that P-row frame (one pass, O(P) state — same shape as
    operators/quantiles.py, which replaced the earlier O(P²)
    triangular self-join), then broadcast back; global_rank = offset +
    local_rank. ntile/percent_rank/cume_dist are then closed-form over
    (rank, N) because (spend, o_custkey) is unique — rank ==
    row_number, no ties. Every stage is parallel in data size; only
    the P-row offsets frame (P = shuffle partition count,
    cluster-bounded) is small-joined."""
    o = table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = s.repartitionByRange(n_parts, "spend", "o_custkey").withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid").orderBy("spend", "o_custkey")
    local = ranged.withColumn("lrn", F.row_number().over(local_w))

    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    off_w = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid",
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("offset"),
    )
    total = counts.agg(F.sum("cnt").alias("n_total"))

    ranked = (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .withColumn("rn", (F.col("offset") + F.col("lrn")).cast("long"))
    )
    # ntile(k): first (N % k) buckets hold ceil(N/k) rows, the rest floor(N/k).
    k = 4
    base = F.floor(F.col("n_total") / k)
    rem = F.col("n_total") % k
    cut = rem * (base + 1)
    rn = F.col("rn")
    quartile = (
        F.when(base == 0, rn)
        .when(rn <= cut, F.floor((rn - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((rn - cut - 1) / base) + 1)
    )
    pct_rank = F.when(F.col("n_total") == 1, F.lit(0.0)).otherwise(
        (rn - 1) / (F.col("n_total") - 1)
    )
    return ranked.select(
        "o_custkey",
        "spend",
        quartile.cast("long").alias("quartile"),
        F.round(pct_rank, 6).alias("pct_rank"),
        F.round(rn / F.col("n_total"), 6).alias("cume"),
    ).orderBy("o_custkey")


# --- TPC-H Q18 shape: large-volume orders (HAVING + join back) --------------
@register(
    "large_volume_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem
            GROUP BY 1
            HAVING SUM(l_quantity) > 150
        )
        SELECT c.c_custkey, c.c_name, o.o_orderkey,
               ROUND(o.o_totalprice, 2) AS o_totalprice, big.total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN big ON o.o_orderkey = big.l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20
    """,
    tags=("classic", "J1", "O1", "extra"),
)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total lineitem quantity clears a
    threshold, joined back to their customers. The HAVING pre-aggregate
    reduces lineitem to qualifying order keys BEFORE any join — the join
    input is group-cardinality; top-20 is TakeOrderedAndProject."""
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(big, o.o_orderkey == big.l_orderkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# --- TPC-H Q21 shape: correlated EXISTS with an inequality ------------------
@register(
    "late_suppliers_multi_supplier_orders",
    oracle="""
        SELECT s.s_name,
               CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_late_orders
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
        GROUP BY 1
        ORDER BY n_late_orders DESC, s_name
        LIMIT 15
    """,
    tags=("classic", "J3", "extra"),
)
def late_suppliers_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped: suppliers who shipped late (>90 days after order
    date) inside orders that involve OTHER suppliers too. The correlated
    EXISTS-with-inequality becomes a semi-join of lineitem against itself
    on order key with a supplier-mismatch condition — one shuffle on
    l_orderkey, no correlated per-row subquery execution."""
    s = table(spark, sf_dir, "supplier")
    l1 = table(spark, sf_dir, "lineitem").alias("l1")
    l2 = table(spark, sf_dir, "lineitem").alias("l2")
    o = table(spark, sf_dir, "orders")
    multi = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    late = multi.join(o, F.col("l1.l_orderkey") == o.o_orderkey).filter(
        F.col("l1.l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return (
        # supplier grows with SF (unbounded dim): no broadcast hint — AQE
        # promotes the join to broadcast at runtime only when it truly fits
        late.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.countDistinct("l1.l_orderkey").cast("long").alias("n_late_orders"))
        .orderBy(F.desc("n_late_orders"), "s_name")
        .limit(15)
    )


# --- TPC-H Q7 shape: double-aliased dimension (nation × nation) -------------
@register(
    "cross_nation_trade_volume",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, supp_nation, cust_nation, order_year
        LIMIT 25
    """,
    tags=("classic", "J1", "extra"),
)
def cross_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: supplier-nation → customer-nation trade volume by
    year. The nation dimension joins TWICE under different roles (both
    broadcast); the fact chain shuffles once per equi-join key."""
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        # nation broadcasts are the bounded dims; supplier scales with SF,
        # so its join is left to AQE (broadcast only if runtime-small)
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "supp_nation", "cust_nation", "order_year")
        .limit(25)
    )


# --- TPC-H Q10 shape: returned-item revenue per customer --------------------
@register(
    "top_returning_customers",
    oracle="""
        SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                   AS lost_revenue,
               count(*) AS n_items
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
        GROUP BY 1, 2, 3
        ORDER BY lost_revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("classic", "J1", "O1"),
)
def top_returning_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: customers ranked by revenue lost to returns.
    The returnflag filter lands on the lineitem scan (pushdown) before the
    join; nation broadcast; top-20 via TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q12 shape: shipment lateness by priority class -------------------
@register(
    "late_shipment_priority",
    oracle="""
        SELECT CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'critical' ELSE 'regular' END AS priority_class,
               CAST(SUM(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
               count(*) AS total_items
        FROM orders o
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
        ORDER BY priority_class
    """,
    tags=("classic", "J1"),
)
def late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: late shipments (>90 days after order) bucketed by
    priority criticality — join + conditional aggregation in one pass."""
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.when(critical, "critical").otherwise("regular").alias("priority_class")
        )
        .agg(
            F.sum(F.when(late, 1).otherwise(0)).alias("late_items"),
            F.count(F.lit(1)).alias("total_items"),
        )
        .orderBy("priority_class")
    )


# --- TPC-H Q14 shape: promo revenue share per month -------------------------
@register(
    "promo_revenue_share",
    oracle="""
        SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
               ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN l.l_extendedprice * (1 - l.l_discount)
                        ELSE 0 END)
                     / SUM(l.l_extendedprice * (1 - l.l_discount)), 4)
                   AS promo_pct,
               count(*) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= DATE '2000-01-01'
        GROUP BY 1
        ORDER BY ship_month
    """,
    tags=("classic", "J1"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: monthly share of revenue from promo parts — the
    ratio-of-conditional-sums pattern; part side joins on partkey (broadcast
    at small SF, sort-merge at scale — planner's call via AQE)."""
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2000-01-01").cast("date")
    )
    p = table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_month")
    )


# --- TPC-H Q5 shape: same-nation customer↔supplier revenue by region --------
@register(
    "regional_same_nation_revenue",
    oracle="""
        SELECT n.n_name AS nation_name,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
        GROUP BY 1
        ORDER BY revenue DESC, nation_name
    """,
    tags=("classic", "J1", "extra"),
)
def regional_same_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue kept "local" — supplier and customer must
    share a nation, nations restricted to one region. The same-nation
    constraint is an extra equi-condition on the supplier join (stays a
    hash join, no theta); nation/region prune the fact chain through two
    broadcasts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .join(
            # supplier is unbounded (grows with SF): AQE decides; the
            # bounded nation/region dims below carry explicit broadcasts
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "nation_name")
    )


# --- TPC-H Q13 shape: order-count histogram over a filtered left join -------
@register(
    "customer_order_histogram",
    oracle="""
        SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM (
            SELECT c.c_custkey,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey
             AND o.o_orderpriority <> '1-URGENT'
            GROUP BY 1
        )
        GROUP BY 1
        ORDER BY n_customers DESC, n_orders DESC
    """,
    tags=("classic", "J2", "extra"),
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: distribution of per-customer order counts,
    zero-order customers included. The shape that matters: the priority
    predicate belongs INSIDE the left join (filtering after the join
    would silently delete the zero-order bucket), and the double
    aggregate is two shuffles with the second one tiny (distinct
    count values)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_customer = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("n_orders"))
    )
    return (
        per_customer.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# --- TPC-H Q15 shape: top supplier(s) via aggregate-max self-reference ------
@register(
    "top_supplier_by_revenue",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, rev.total_rev
        FROM supplier s
        JOIN rev ON s.s_suppkey = rev.l_suppkey
        WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s.s_suppkey
    """,
    tags=("classic", "J1", "subquery", "extra"),
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) achieving the maximum shipped
    revenue in a year. The CTE aggregates once; the max is a 1-row
    broadcast joined back (no second scan of lineitem, no window). Ties
    surface every max supplier, as the spec demands."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    rev = l.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_rev"
        )
    )
    max_rev = rev.agg(F.max("total_rev").alias("max_rev"))
    s = table(spark, sf_dir, "supplier")
    # after the 1-row max join, `top` holds only the winning supplier(s) —
    # THAT is the broadcastable side; supplier itself is unbounded
    top = rev.join(F.broadcast(max_rev), rev.total_rev == F.col("max_rev"))
    return (
        s.join(F.broadcast(top), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q17 shape: per-group threshold from a correlated aggregate -------
@register(
    "small_quantity_revenue",
    oracle="""
        SELECT p.p_brand,
               ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN (
            SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thr
            FROM lineitem
            GROUP BY 1
        ) t ON l.l_partkey = t.l_partkey
        WHERE l.l_quantity < t.qty_thr
        GROUP BY 1
        ORDER BY p.p_brand
    """,
    tags=("classic", "J1", "subquery", "extra"),
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped: revenue from orders below 20% of the part's
    average quantity, per brand. The correlated AVG decorrelates into an
    aggregate-then-join on l_partkey — both sides shuffle on the same
    key, so AQE can plan a co-partitioned join with no extra exchange.
    (l_quantity is integer-valued: the AVG is exact on both engines, so
    the threshold compare is certifiable.)"""
    l = table(spark, sf_dir, "lineitem")
    thr = l.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thr")
    )
    p = table(spark, sf_dir, "part")
    return (
        # all three joins key on partkey: the threshold join and the part
        # join reuse one hash partitioning (part is unbounded — no hint)
        l.join(thr, l.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
        .orderBy("p_brand")
    )


# --- Retention: day-over-week user overlap ----------------------------------
@register(
    "weekly_retention",
    oracle="""
        WITH ud AS (
            SELECT DISTINCT CAST(ts AS DATE) AS ds, user_id
            FROM events
        )
        SELECT a.ds,
               CAST(COUNT(*) AS BIGINT) AS active_users,
               CAST(COUNT(b.user_id) AS BIGINT) AS retained_users,
               ROUND(CAST(COUNT(b.user_id) AS DOUBLE) / COUNT(*), 4)
                   AS d7_retention
        FROM ud a
        LEFT JOIN ud b
          ON b.user_id = a.user_id AND b.ds = a.ds + INTERVAL 7 DAY
        GROUP BY 1
        ORDER BY 1
    """,
    tags=("analytics", "extra"),
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7 retention: of each day's active users, the fraction active
    exactly seven days later. The user-day frame self-joins keyed on
    (user_id, date+7) — an equi join, both sides hash-partitioned on
    the same user key, so the join co-shuffles once; per-day counts
    aggregate after. No window, no per-user collect; the classic
    retention matrix at any event volume."""
    e = table(spark, sf_dir, "events")
    ud = e.select(F.to_date("ts").alias("ds"), "user_id").distinct()
    a = ud.alias("a")
    b = ud.select(
        F.col("user_id").alias("b_user"), F.date_sub(F.col("ds"), 7).alias("b_ds")
    )
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b_user")) & (F.col("a.ds") == F.col("b_ds")),
            "left",
        )
        .groupBy(F.col("a.ds").alias("ds"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.count("b_user").cast("long").alias("retained_users"),
            F.round(
                F.count("b_user").cast("double") / F.count(F.lit(1)), 4
            ).alias("d7_retention"),
        )
        .orderBy("ds")
    )


# --- Cohort analysis: first-order month × order month -----------------------
@register(
    "customer_cohort_retention",
    oracle="""
        WITH firsts AS (
            SELECT o_custkey,
                   MIN(date_trunc('month', o_orderdate)) AS cohort_month
            FROM orders GROUP BY 1
        )
        SELECT CAST(f.cohort_month AS DATE) AS cohort_month,
               CAST(date_trunc('month', o.o_orderdate) AS DATE) AS order_month,
               CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers
        FROM orders o
        JOIN firsts f ON f.o_custkey = o.o_custkey
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    tags=("analytics", "extra"),
)
def customer_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort triangle: customers grouped by first-order month, counted
    in every month they ordered again. First-order month is an
    aggregate-then-join on custkey (both sides shuffle on the same key
    — AQE co-partitions, no decorrelated window); the triangle itself
    is one two-key distinct count."""
    o = table(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("f_custkey")).agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort_ts")
    )
    return (
        o.join(firsts, o.o_custkey == F.col("f_custkey"))
        .groupBy(
            F.to_date("cohort_ts").alias("cohort_month"),
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month"),
        )
        .agg(F.countDistinct("o_custkey").cast("long").alias("n_customers"))
        .orderBy("cohort_month", "order_month")
    )


# --- Window frame varieties: RANGE-by-interval + positional values ----------
@register(
    "window_frames_showcase",
    oracle="""
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) / 100, 2) AS trailing_30d_spend,
               first_value(o_totalprice) OVER w AS first_price,
               nth_value(o_totalprice, 2) OVER w AS second_price,
               ROUND(o_totalprice - lag(o_totalprice, 1, 0.0) OVER w, 2)
                   AS price_delta
        FROM orders
        WHERE o_custkey < 500
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY o_custkey, o_orderkey
    """,
    tags=("J6", "windows", "extra"),
)
def window_frames_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frame-specification surface beyond running sums: a
    RANGE-by-time-interval frame (trailing 30-day spend — peers at
    the same timestamp all join the frame, so no tiebreak is needed or
    allowed) next to ROWS-frame positional functions (first/nth/lag,
    deterministically tiebroken by orderkey). Both windows partition by
    customer — per-key state, never a global sort."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    w_rows = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # lag is frame-less in Spark (offset functions reject explicit frames)
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        # sum exact integer CENTS, never average doubles: double sums are
        # order-dependent, and dividing by a frame COUNT mints fresh .xx5
        # halves that flip ROUND differently per engine; the cents SUM is
        # exact and /100 re-yields the original 2-decimal grid
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w_range)
            / 100,
            2,
        ).alias("trailing_30d_spend"),
        F.first("o_totalprice").over(w_rows).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w_rows).alias("second_price"),
        F.round(
            F.col("o_totalprice") - F.lag("o_totalprice", 1, 0.0).over(w_lag), 2
        ).alias("price_delta"),
    ).orderBy("o_custkey", "o_orderkey")


# --- UNPIVOT: wide measures back to long form -------------------------------
@register(
    "order_measures_unpivot",
    oracle="""
        WITH agg AS (
            SELECT l_orderkey,
                   ROUND(SUM(l_quantity), 2) AS qty,
                   ROUND(SUM(l_extendedprice), 2) AS extprice,
                   ROUND(SUM(l_tax), 2) AS tax
            FROM lineitem
            WHERE l_orderkey < 2000
            GROUP BY 1
        )
        SELECT l_orderkey, measure, value
        FROM agg UNPIVOT (value FOR measure IN (qty, extprice, tax))
        ORDER BY l_orderkey, measure
    """,
    tags=("J8", "reshape", "extra"),
)
def order_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the inverse of pivot_event_type_counts: per-order wide
    measures fold back to (key, measure, value) long form via stack(),
    a Generate operator that multiplies rows map-side with no shuffle
    beyond the feeding aggregate."""
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    agg = l.groupBy("l_orderkey").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("extprice"),
        F.round(F.sum("l_tax"), 2).alias("tax"),
    )
    return agg.select(
        "l_orderkey",
        F.expr(
            "stack(3, 'qty', qty, 'extprice', extprice, 'tax', tax) "
            "as (measure, value)"
        ),
    ).orderBy("l_orderkey", "measure")


# --- Sequential funnel: ordered stage conversion per user -------------------
@register(
    "conversion_funnel",
    oracle="""
        WITH fv AS (
            SELECT user_id, MIN(ts) AS fv_ts FROM events
            WHERE event_type = 'view' GROUP BY 1
        ), fc AS (
            SELECT e.user_id, MIN(e.ts) AS fc_ts
            FROM events e JOIN fv ON fv.user_id = e.user_id
            WHERE e.event_type = 'click' AND e.ts > fv.fv_ts
            GROUP BY 1
        ), fp AS (
            SELECT e.user_id, MIN(e.ts) AS fp_ts
            FROM events e JOIN fc ON fc.user_id = e.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fc.fc_ts
            GROUP BY 1
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fv) AS n_viewed,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM fc) AS n_clicked_after_view,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM fp) AS n_purchased_after_click
    """,
    tags=("analytics", "funnel", "extra"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users who viewed, then clicked strictly
    AFTER their first view, then purchased strictly after that click.
    The order constraint is what separates a funnel from three counts —
    min-after-threshold per stage, not min overall.

    Scale shape: each stage is a keyed MIN aggregate joined to the
    previous stage's (user, ts) frame — every join and aggregate keys
    on user_id, so the whole funnel reuses ONE hash partitioning; the
    final counts are three 1-row aggregates cross-joined (broadcast).
    No windows, no per-user event sorting."""
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv_ts"))
    )
    fc = (
        e.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(F.col("ts") > F.col("fv_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc_ts"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(F.col("ts") > F.col("fc_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    return (
        fv.agg(F.count(F.lit(1)).cast("long").alias("n_viewed"))
        .crossJoin(
            fc.agg(F.count(F.lit(1)).cast("long").alias("n_clicked_after_view"))
        )
        .crossJoin(
            fp.agg(F.count(F.lit(1)).cast("long").alias("n_purchased_after_click"))
        )
    )
