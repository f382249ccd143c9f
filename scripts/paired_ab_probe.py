"""Paired A/B probe: old vs new operator impls timed ALTERNATELY in one
process so host-speed drift cancels (this box shows heavy CPU steal).
Old impls are inlined copies of the r13 code; new impls come from the
package. Reports per-sweep pairs and the median of per-sweep ratios.
"""
import functools
import operator
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import tokens
from wikistream_lakehouse_spark.operators.spans import positional_span_hashes
from wikistream_lakehouse_spark.session import get_spark
from wikistream_lakehouse_spark.tables import table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 8


# ---------- OLD spans (r13) ----------
def old_coverage(df, k=K):
    spans = positional_span_hashes(df, "text", "doc_id", k)
    dup = (
        spans.groupBy("span_hash")
        .agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
        .filter(F.col("_mn") != F.col("_mx"))
        .select("span_hash")
    )
    marked = spans.join(dup, "span_hash", "left_semi")
    end = F.col("pos") + F.lit(k - 1)
    w_order = Window.partitionBy("doc_id").orderBy("pos")
    prev_max_end = F.max(end).over(w_order.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        marked.withColumn(
            "new_island",
            F.when(prev_max_end.isNull() | (F.col("pos") > prev_max_end), 1).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_order))
        .groupBy("doc_id", "island")
        .agg((F.max(end) - F.min("pos") + 1).alias("island_tokens"))
        .groupBy("doc_id")
        .agg(F.sum("island_tokens").alias("dup_tokens"))
    )
    totals = df.select(F.col("doc_id"), F.size(tokens(F.col("text"))).alias("total_tokens"))
    return islands.join(totals, "doc_id").select(
        F.col("doc_id"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("dup_tokens").cast("long").alias("dup_tokens"),
        F.round(F.col("dup_tokens") / F.col("total_tokens"), 6).alias("coverage"),
    )


def old_span_filter(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    cov = old_coverage(d).select("doc_id", "dup_tokens")
    alldocs = d.select("doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"))
    dup = F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
    cov_raw = F.when(F.col("n_tokens") > 0, dup / F.col("n_tokens")).otherwise(F.lit(0.0))
    return (
        alldocs.join(cov, "doc_id", "left")
        .select(
            "doc_id", "n_tokens", dup.alias("dup_tokens"),
            F.round(cov_raw, 6).alias("coverage"),
            (cov_raw < 0.8).alias("keep"),
            F.when(cov_raw >= 0.99, "near_copy").when(cov_raw >= 0.8, "dup_heavy")
            .otherwise("ok").alias("reason"),
        )
        .orderBy("doc_id")
    )


def old_subcov(spark, sf_dir):
    return old_coverage(table(spark, sf_dir, "documents")).orderBy("doc_id")


# ---------- OLD quantiles (r13) ----------
def old_exact_group_quantiles(df, value_col, group_cols, probs):
    group_cols = list(group_cols)
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = F.col(value_col)
    base = df.select(*group_cols, value_col).filter(v.isNotNull())
    ranged = base.repartitionByRange(n_parts, *group_cols, value_col).withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid", *group_cols).orderBy(value_col)
    local = ranged.withColumn("lrn", F.row_number().over(local_w))
    counts = ranged.groupBy("pid", *group_cols).agg(F.count(F.lit(1)).alias("cnt"))
    off_w = (
        Window.partitionBy(*group_cols).orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "pid", *group_cols, F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("offset")
    )
    ranked = local.join(offsets, ["pid", *group_cols]).withColumn(
        "rn", (F.col("offset") + F.col("lrn")).cast("long")
    )
    totals = counts.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    needed = (
        totals.select(
            *group_cols, "n",
            F.explode(F.array(*[F.lit(float(q)) for q in probs])).alias("q"),
        )
        .withColumn("pos", F.col("q") * (F.col("n") - 1) + 1)
        .withColumn("klo", F.floor("pos").cast("long"))
        .withColumn("khi", F.ceil("pos").cast("long"))
        .withColumn("frac", F.col("pos") - F.col("klo"))
        .select(*group_cols, "q", "klo", "khi", "frac")
    )
    hit_cond = functools.reduce(
        operator.and_,
        [ranked[g].eqNullSafe(needed[g]) for g in group_cols],
        (F.col("rn") == needed["klo"]) | (F.col("rn") == needed["khi"]),
    )
    hits = ranked.join(F.broadcast(needed), hit_cond).drop(*(needed[g] for g in group_cols))
    return (
        hits.groupBy(*group_cols, "q", "frac")
        .agg(
            F.min(F.when(F.col("rn") == F.col("klo"), v)).alias("vlo"),
            F.max(F.when(F.col("rn") == F.col("khi"), v)).alias("vhi"),
        )
        .select(
            *group_cols, "q",
            (F.col("vlo") + F.col("frac") * (F.col("vhi") - F.col("vlo"))).alias("quantile"),
        )
    )


def old_price_percentiles(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    q = old_exact_group_quantiles(l, "l_extendedprice", ["l_returnflag"], [0.25, 0.50, 0.75])
    return (
        q.groupBy("l_returnflag")
        .agg(
            F.round(F.min(F.when(F.col("q") == 0.25, F.col("quantile"))), 4).alias("p25"),
            F.round(F.min(F.when(F.col("q") == 0.50, F.col("quantile"))), 4).alias("p50"),
            F.round(F.min(F.when(F.col("q") == 0.75, F.col("quantile"))), 4).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


# ---------- OLD langid (r13) ----------
def old_language_id(spark, sf_dir):
    from pyspark import StorageLevel

    from wikistream_lakehouse_spark.operators.langid import (
        build_language_profiles,
        explode_grams,
    )

    d = table(spark, sf_dir, "documents")
    grams = explode_grams(d).persist(StorageLevel.MEMORY_AND_DISK)
    profiles = build_language_profiles(d, grams=grams)
    doc_grams = grams
    prof_grams = profiles.select("profile_lang", F.explode("profile").alias("g"))
    overlaps = (
        doc_grams.join(F.broadcast(prof_grams), "g")
        .groupBy("doc_id", "profile_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    universe = d.select("doc_id").crossJoin(F.broadcast(profiles.select("profile_lang")))
    scored = universe.join(overlaps, ["doc_id", "profile_lang"], "left").fillna({"overlap": 0})
    pick = Window.partitionBy("doc_id").orderBy(F.desc("overlap"), "profile_lang")
    preds = (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("profile_lang").alias("predicted_lang"), "overlap")
    )
    return (
        d.select("doc_id", "lang")
        .join(preds, "doc_id")
        .select(
            "doc_id", "lang", "predicted_lang",
            (F.col("lang") == F.col("predicted_lang")).alias("correct"),
        )
        .orderBy("doc_id")
    )


def main():
    from wikistream_lakehouse_spark.queries import all_queries

    spark = get_spark("paired-probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    pairs = {
        "substring_dup_coverage": (old_subcov, qs["substring_dup_coverage"].build),
        "span_dedup_filter": (old_span_filter, qs["span_dedup_filter"].build),
        "price_percentiles": (old_price_percentiles, qs["price_percentiles"].build),
        "language_id_ngram": (old_language_id, qs["language_id_ngram"].build),
    }

    def run(fn):
        df = fn(spark, SF)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()  # langid persists; keep sweeps independent
        return dt

    n_sweeps = int(os.environ.get("SWEEPS", "9"))
    results = {n: {"old": [], "new": []} for n in pairs}
    # warm-up both variants once
    for name, (old, new) in pairs.items():
        run(old); run(new)
    for s in range(n_sweeps):
        for name, (old, new) in pairs.items():
            if s % 2 == 0:
                results[name]["old"].append(run(old))
                results[name]["new"].append(run(new))
            else:
                results[name]["new"].append(run(new))
                results[name]["old"].append(run(old))

    def med(xs):
        xs = sorted(xs); m = len(xs) // 2
        return xs[m] if len(xs) % 2 else (xs[m - 1] + xs[m]) / 2

    for name, r in results.items():
        ratios = sorted(n / o for o, n in zip(r["old"], r["new"]))
        print(f"{name:28s} old_med={med(r['old']):.3f} new_med={med(r['new']):.3f} "
              f"med_ratio={med(ratios):.3f} "
              f"per-sweep new/old ratios: {[round(x,3) for x in ratios]}")
    spark.stop()


if __name__ == "__main__":
    main()
