"""Streaming corpus ingestion: the training-corpus front door as a
Structured Streaming pipeline — documents arrive as micro-batches and
flow through exact dedup → quality features → mixture sampling before
landing in the corpus bronze table.

Every stage is the SAME expression the batch path uses (lakehouse/
corpus.quality_features, operators/sampling.stratified_sample): the
quality and sampling predicates are stateless row-local Columns, so
they are streaming-safe by construction and the batch oracle certifies
their semantics.  The only stateful stage is the id-dedup:

  * ``dedup="exact"`` uses ``dropDuplicates(id)`` — unbounded state,
    correct for bounded backfills/replays (availableNow);
  * for true always-on streams callers should give documents an
    event-time column and use ``dropDuplicatesWithinWatermark`` (the
    watermarked form is exercised in tests/test_streaming.py) —
    unbounded id-state at 100 TB is exactly the OOM the watermark
    bounds.

Near-dup canonicalization is deliberately NOT streamed: connected
components is an iterative global algorithm; the lakehouse runs it in
the daily batch pass (lakehouse/corpus.build_training_corpus) over the
bronze this stream appends — the standard streaming-ingest /
batch-decide split of production data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wikistream_lakehouse_spark.lakehouse.corpus import quality_features
from wikistream_lakehouse_spark.operators.sampling import stratified_sample


def corpus_ingest_stream(
    docs: DataFrame,
    mixture: dict[str, float] | None = None,
    mixture_default: float = 0.0,
    id_col: str = "doc_id",
    dedup: str = "exact",
) -> DataFrame:
    """Compose the streaming corpus filter chain on a streaming frame.

    Returns the transformed streaming DataFrame (caller attaches the
    sink); rows that fail quality are dropped here — the full
    keep/drop audit belongs to the batch corpus writer.
    """
    out = docs
    if dedup == "exact":
        out = out.dropDuplicates([id_col])
    elif dedup != "none":
        raise ValueError(f"unknown dedup mode {dedup!r}")
    out = quality_features(out).filter("quality_ok")
    if mixture:
        out = stratified_sample(out, id_col, "lang", mixture, mixture_default)
    return out.drop("quality_ok", "quality_reason")
