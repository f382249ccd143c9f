"""Training-corpus writer e2e: quality filter + canonical near-dedup →
partitioned corpus + per-document audit, convergent under re-run."""

from __future__ import annotations

from pyspark.sql import functions as F

from wikistream_lakehouse_spark.lakehouse.corpus import (
    build_training_corpus,
    quality_features,
)
from wikistream_lakehouse_spark.tables import table


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_build_training_corpus_end_to_end(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    feat = quality_features(docs)
    good_ids = {r.doc_id for r in feat.filter("quality_ok").select("doc_id").collect()}
    assert good_ids, "fixture should have quality survivors"
    bad_ids = {r.doc_id for r in feat.filter("NOT quality_ok").select("doc_id").collect()}

    g = sorted(good_ids)
    pairs = [(g[0], g[1]), (g[1], g[2])]  # near-dup chain among survivors
    if bad_ids:
        pairs.append((g[3], sorted(bad_ids)[0]))  # pair touching a dropped doc

    out = str(tmp_path / "gold")
    stats = build_training_corpus(docs, _pairs(spark, pairs), out)

    audit = spark.read.parquet(f"{out}/audit")
    assert audit.count() == n_docs  # every input doc is accounted for
    by_id = {r.doc_id: r for r in audit.collect()}

    # chain {g0,g1,g2}: min id is canonical, others drop as near_duplicate
    assert by_id[g[0]].keep is True
    assert by_id[g[1]].keep is False and by_id[g[1]].drop_reason == "near_duplicate"
    assert by_id[g[2]].keep is False and by_id[g[2]].drop_reason == "near_duplicate"
    # a pair touching a quality-dropped doc must NOT drop the survivor
    assert by_id[g[3]].keep is True
    for b in bad_ids:
        assert by_id[b].keep is False and by_id[b].drop_reason.startswith("quality:")

    corpus = spark.read.parquet(f"{out}/corpus")
    kept_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert kept_ids == {d for d, r in by_id.items() if r.keep}
    assert stats["kept"] == len(kept_ids)
    assert stats["kept"] + stats["dropped"] == n_docs
    # lang partitioning survives the round trip
    assert "lang" in corpus.columns
    assert set(corpus.select("lang").distinct().toPandas()["lang"]) == set(
        docs.filter(F.col("doc_id").isin(list(kept_ids)))
        .select("lang")
        .distinct()
        .toPandas()["lang"]
    )

    # re-run converges (dynamic overwrite, deterministic decisions)
    stats2 = build_training_corpus(docs, _pairs(spark, pairs), out)
    assert stats2 == stats
    assert spark.read.parquet(f"{out}/corpus").count() == len(kept_ids)
