"""Multimodal column plumbing (SURVEY.md §2.9 X5).

Convention: media payloads are opaque BinaryType columns + a typed metadata
struct (schema.MEDIA_META_SCHEMA). Decode / feature-extraction runs as
Arrow-batched pandas iterators over mapInPandas — the Spark-side plumbing
(schema, batching, partitioning) is real; the actual codec call is stubbed
because image/audio libraries are not in this container.

Scale shape: mapInPandas streams Arrow batches through Python with bounded
memory (spark.sql.execution.arrow.maxRecordsPerBatch); payload bytes never
pass through the driver, and per-batch vectorized numpy work amortizes the
Python boundary to ~zero per-row overhead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_media_features (DDL form for mapInPandas).
MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_type string, size_bytes long, "
    "byte_mean double, byte_entropy double, decoded boolean"
)


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in for a codec: byte buffer as uint8 array.

    Real deployment: replace with PIL/imageio/librosa per media_type.
    """
    return np.frombuffer(payload, dtype=np.uint8)


def real_decode(payload: bytes, media_type: str, fmt: str) -> np.ndarray:
    """Actual codec hook — intentionally stubbed in this container (no
    image/audio libs available; see task environment constraints)."""
    raise NotImplementedError(
        "media codecs (PIL/librosa/av) are not installed in this environment; "
        "wire them here and route extract_media_features(use_real_codec=True)"
    )


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "meta",
    id_col: str = "doc_id",
    use_real_codec: bool = False,
) -> DataFrame:
    """Per-item features from binary payloads via mapInPandas.

    Input: any DataFrame with (id_col long, payload binary, meta struct).
    Output: MEDIA_FEATURES_SCHEMA rows, one per input row.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in MEDIA_FEATURES_SCHEMA.split(", ")]
        for pdf in batches:
            # vectorized over the Arrow batch: itertuples + numpy only —
            # .iterrows() materializes a Series per row and costs ~10×
            out = []
            metas = pdf[meta_col]
            for doc_id, payload, meta in zip(
                pdf[id_col].to_numpy(), pdf[payload_col], metas
            ):
                payload = bytes(payload) if payload is not None else b""
                mtype = meta["media_type"]
                if use_real_codec:
                    arr = real_decode(payload, mtype, meta["format"])
                else:
                    arr = _fake_decode(payload, mtype)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    entropy = float(-(p * np.log2(p)).sum())
                    mean = float(arr.mean())
                else:
                    entropy, mean = 0.0, 0.0
                out.append(
                    (doc_id, mtype, len(payload), round(mean, 6), round(entropy, 6),
                     not use_real_codec)
                )
            yield pd.DataFrame(out, columns=cols)

    cols = [F.col(id_col), F.col(payload_col), F.col(meta_col)]
    return df.select(*cols).mapInPandas(compute, schema=MEDIA_FEATURES_SCHEMA)


#: Output schema of resize_images.
RESIZED_SCHEMA = (
    "doc_id long, payload binary, width int, height int, "
    "orig_width int, orig_height int"
)

#: Output schema of sample_frames (fan-out: one row per kept frame).
FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_mean double"


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    meta_col: str = "meta",
    id_col: str = "doc_id",
) -> DataFrame:
    """Nearest-neighbor resize of image payloads via mapInPandas (X5).

    The geometry is the real thing — decode to (h, w), index-sample rows
    and columns to (target_h, target_w), re-flatten — with the fake
    byte-buffer codec standing in for PIL (swap `_fake_decode` for a real
    decoder and nothing else changes). Non-image rows pass through
    untouched payload-wise with NULL target dims, so one pipeline can
    carry mixed media.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf[id_col].to_numpy(), pdf[payload_col], pdf[meta_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                w, h = meta["width"], meta["height"]
                if meta["media_type"] != "image" or not w or not h:
                    out.append((doc_id, payload, None, None, w, h))
                    continue
                arr = _fake_decode(payload, "image")
                # pad/truncate the fake buffer to the declared geometry —
                # a real codec returns exactly (h, w[, c]) and needs neither
                arr = np.resize(arr, (h, w))
                rows = (np.arange(target_h) * h) // target_h
                cols = (np.arange(target_w) * w) // target_w
                resized = arr[np.ix_(rows, cols)]
                out.append(
                    (doc_id, resized.tobytes(), target_w, target_h, w, h)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "payload", "width", "height",
                    "orig_width", "orig_height",
                ],
            )

    return df.select(id_col, payload_col, meta_col).mapInPandas(
        compute, schema=RESIZED_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    stride: int = 4,
    frame_bytes: int = 256,
    payload_col: str = "payload",
    meta_col: str = "meta",
    id_col: str = "doc_id",
) -> DataFrame:
    """Every-Nth-frame sampling from video payloads (X5 fan-out shape).

    One input row yields ceil(n_frames / stride) output rows — the
    mapInPandas generator emits them per Arrow batch, so a long video
    never materializes all its frames at once on one executor. The fake
    codec chops the byte buffer into fixed-size frames; a real demuxer
    (av/ffmpeg) slots into the same loop.
    """
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(
                pdf[id_col].to_numpy(), pdf[payload_col], pdf[meta_col]
            ):
                if meta["media_type"] != "video" or payload is None:
                    continue
                buf = bytes(payload)
                for i in range(0, max(1, -(-len(buf) // frame_bytes)), stride):
                    frame = buf[i * frame_bytes : (i + 1) * frame_bytes]
                    arr = np.frombuffer(frame, dtype=np.uint8)
                    mean = round(float(arr.mean()), 6) if arr.size else 0.0
                    out.append((doc_id, i, frame, mean))
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_idx", "frame", "frame_mean"]
            )

    return df.select(id_col, payload_col, meta_col).mapInPandas(
        compute, schema=FRAME_SCHEMA
    )
