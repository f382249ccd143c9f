"""Heuristic n-gram language identification (X4) as a reusable operator.

Profile-based classifier: per-language character-bigram profiles (top-N by
document frequency) are learned from labeled data, then documents are
scored by profile overlap and assigned the argmax language.

Scale shape: profiles collapse to (n_langs × top_n) rows and broadcast;
the corpus is never shuffled on raw text — one scan to build profiles
(aggregate on (lang, gram)), one scan to score.

Note: the synthetic fixture corpus draws every language from one shared
vocabulary, so accuracy there is chance level by construction; unit tests
exercise the operator on text with a real script signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wikistream_lakehouse_spark.functions.text import char_ngrams


def build_language_profiles(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_n: int = 20,
) -> DataFrame:
    """(profile_lang, profile array<string>) — top-N bigrams per language."""
    grams = labeled.select(
        F.col(lang_col).alias("profile_lang"),
        F.explode(char_ngrams(F.col(text_col), 2)).alias("g"),
    )
    df_counts = grams.groupBy("profile_lang", "g").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("profile_lang").orderBy(F.desc("df"), "g")
    return (
        df_counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_n)
        .groupBy("profile_lang")
        .agg(F.collect_set("g").alias("profile"))
    )


def predict_language(
    df: DataFrame,
    profiles: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document the language whose profile overlaps most.

    Returns (id_col, predicted_lang, overlap). Ties break on language name
    for determinism.
    """
    scored = (
        df.select(F.col(id_col), char_ngrams(F.col(text_col), 2).alias("grams"))
        .crossJoin(F.broadcast(profiles))
        .select(
            id_col,
            "profile_lang",
            F.size(F.array_intersect("grams", "profile")).alias("overlap"),
        )
    )
    pick = Window.partitionBy(id_col).orderBy(F.desc("overlap"), "profile_lang")
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(id_col, F.col("profile_lang").alias("predicted_lang"), "overlap")
    )
