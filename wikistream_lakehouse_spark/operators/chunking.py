"""Document chunking for training-data pipelines: split long documents
into overlapping windows sized for a model's context — the step between
corpus curation and sequence packing (operators/packing.py consumes
chunks, not whole documents).

Pure Catalyst (sequence → posexplode → substring/slice): the explode
multiplies rows inside the scan stage with no shuffle and no UDF, so
chunking a 100 TB corpus is a single map-side pass whose output
partitioning follows the input's. Two granularities:

  * ``chunk_by_chars`` — fixed character windows with overlap; the
    cheap, tokenizer-agnostic form (byte/char budgets).
  * ``chunk_by_tokens`` — fixed WHITESPACE-TOKEN windows with overlap;
    approximates a real tokenizer's budget the way functions/text.py's
    token ops do (SURVEY X4's token-counting convention).

Both emit (id, chunk_id, chunk, …) with chunk_id dense from 0 per
document — deterministic, so re-runs produce identical chunk sets
(exactly-once downstream dedup can key on (id, chunk_id)).

Reference parity: none — the reference stops at event analytics; this
is the LLM-pipeline surface the task brief adds as first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_windows(length: Column, stride: int) -> Column:
    """Number of windows whose start offset lies inside the text:
    ceil(length / stride) via floor((length-1)/stride) + 1; 0 for empty."""
    return F.when(length <= 0, F.lit(0)).otherwise(
        F.floor((length - 1) / F.lit(stride)) + 1
    )


def chunk_by_chars(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 256,
    overlap: int = 64,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Overlapping character windows: chunk i covers
    [i*(chunk_size-overlap), …+chunk_size). The final window is short
    (the remainder), never empty, and every character of the document
    appears in at least one chunk."""
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    n = _n_windows(F.length(F.col(text_col)), stride)
    return (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(
            *keep,
            F.posexplode(F.sequence(F.lit(0), n.cast("int") - 1)).alias(
                "chunk_id", "_i"
            ),
            F.col(text_col),
        )
        .select(
            *keep,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.substring(
                F.col(text_col), F.col("_i") * stride + 1, chunk_size
            ).alias("chunk"),
        )
        .withColumn("chunk_chars", F.length("chunk").cast("long"))
    )


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Overlapping whitespace-token windows, re-joined with single
    spaces: chunk i covers tokens [i*(chunk_tokens-overlap), …+chunk_tokens).
    ``n_tokens`` is the window's actual token count (short final window)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    keep = keep_cols if keep_cols is not None else [c for c in df.columns if c != text_col]
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    n = _n_windows(F.size(F.col("_toks")), stride)
    return (
        df.withColumn("_toks", toks)
        .filter(F.size("_toks") > 0)
        .select(
            *keep,
            F.posexplode(F.sequence(F.lit(0), n.cast("int") - 1)).alias(
                "chunk_id", "_i"
            ),
            F.col("_toks"),
        )
        .select(
            *keep,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.slice(F.col("_toks"), F.col("_i") * stride + 1, chunk_tokens).alias(
                "_win"
            ),
        )
        .select(
            *keep,
            "chunk_id",
            F.array_join("_win", " ").alias("chunk"),
            F.size("_win").cast("long").alias("n_tokens"),
        )
    )
