"""The training-corpus writer — the pipeline all the LLM-data operators
feed (SURVEY X1-X4 composed): quality-filter → near-dup canonical
selection → partitioned gold corpus + an audit table of every drop.

This is the decision layer of a pretraining data pipeline: given a raw
documents table it writes

  * ``<out>/corpus/``  — kept documents, partitioned by ``lang`` (the
    downstream sampler's access pattern), with the quality features
    attached;
  * ``<out>/audit/``   — one row per INPUT document with keep flag and
    the first-failing reason (``quality:*`` or ``near_duplicate``) — at
    100 TB the audit table is how you answer "why did doc X disappear"
    without re-running anything.

Scale shape: the quality pass is one codegen scan (functions/text.py);
near-dup pairs come from the caller (MinHash-LSH at corpus scale, exact
Jaccard for bounded certification) so this module never does all-pairs
work; canonical selection is the label-propagation operator
(operators/components.py); writes are plain partitioned parquet with
dynamic overwrite so re-runs converge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import (
    stopword_ratio,
    tokens,
    type_token_ratio,
)
from wikistream_lakehouse_spark.operators.components import canonical_documents


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Input plus (n_tokens, ttr, sw_ratio, quality_ok, quality_reason) —
    the same thresholds the oracle-certified corpus_quality_filter uses."""
    toks = tokens(F.col(text_col))
    feat = docs.withColumns(
        {
            "n_tokens": F.size(toks).cast("long"),
            "ttr": type_token_ratio(toks),
            "sw_ratio": stopword_ratio(toks),
        }
    )
    keep = (
        F.col("n_tokens").between(20, 2000)
        & (F.col("ttr") >= 0.20)
        & (F.coalesce("sw_ratio", F.lit(1.0)) <= 0.5)
    )
    reason = (
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(F.col("n_tokens") > 2000, "too_long")
        .when(F.col("ttr") < 0.20, "low_diversity")
        .when(F.coalesce("sw_ratio", F.lit(1.0)) > 0.5, "stopword_heavy")
        .otherwise("ok")
    )
    return feat.withColumns({"quality_ok": keep, "quality_reason": reason})


def build_training_corpus(
    docs: DataFrame,
    near_dup_pairs: DataFrame,
    out_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    max_iterations: int = 64,
) -> dict[str, int]:
    """Write the corpus + audit tables; returns {'kept': n, 'dropped': n}.

    Drop precedence: quality first (a low-quality doc can't be a
    canonical keeper), then near-duplicate canonicalization among the
    quality survivors.
    """
    spark = docs.sparkSession
    feat = quality_features(docs, text_col=text_col)
    good = feat.filter("quality_ok")

    # canonical selection among quality survivors only: pairs touching a
    # dropped doc must not force-drop its surviving counterpart
    good_ids = good.select(id_col)
    pairs = (
        near_dup_pairs.join(
            good_ids.withColumnRenamed(id_col, "id_a"), "id_a", "left_semi"
        ).join(good_ids.withColumnRenamed(id_col, "id_b"), "id_b", "left_semi")
    )
    canon = canonical_documents(
        good, pairs, id_col=id_col, max_iterations=max_iterations
    )

    decided = feat.join(
        canon.select(id_col, "component", "is_canonical"), id_col, "left"
    ).withColumns(
        {
            "keep": F.col("quality_ok") & F.coalesce("is_canonical", F.lit(False)),
            "drop_reason": F.when(~F.col("quality_ok"), F.concat(F.lit("quality:"), "quality_reason"))
            .when(~F.coalesce("is_canonical", F.lit(False)), F.lit("near_duplicate"))
            .otherwise(F.lit(None)),
        }
    )

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    # two writes + the stats read share one materialization of the
    # decision frame (the CC labels above are already checkpointed)
    decided = decided.persist()
    decided.filter("keep").drop(
        "quality_ok", "quality_reason", "keep", "drop_reason", "is_canonical"
    ).write.mode("overwrite").partitionBy(lang_col).parquet(f"{out_path}/corpus")
    decided.select(
        id_col, lang_col, "n_tokens", "keep", "drop_reason", "component"
    ).write.mode("overwrite").parquet(f"{out_path}/audit")

    audit = spark.read.parquet(f"{out_path}/audit")
    kept = audit.filter("keep").count()
    total = audit.count()
    decided.unpersist()
    return {"kept": kept, "dropped": total - kept}
