"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The pattern for a 100 TB multimodal corpus: media lives in a ``binary``
column (or object-store pointers) beside typed metadata; decode / feature-
extract / resize / frame-sample run as Arrow-batched Pandas UDFs over
``mapInPandas`` — Python touches each batch once, vectorized, and the
surrounding plan (partitioning, predicate pushdown on metadata, shuffle
boundaries) stays fully Catalyst-managed.

This container has no image/audio codecs, so the decode kernels are STUBBED
with a clearly-marked deterministic fake (`_fake_decode_meta`) derived only
from the byte payload — the Spark-side plumbing (schema, batch iteration,
UDF signatures, multi-row emission for frame sampling) is real and tested.
Swapping in PIL/ffmpeg later changes only the marked function bodies.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

DECODE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """STUB — deterministic fake decode. A real implementation would call
    PIL.Image.open / av.open here; the container has no codecs, so metadata
    derives from the byte length only (which makes the pipeline testable and
    the oracle expressible). Returns (n_bytes, width, height, n_frames)."""
    n = len(payload)
    return n, 64 + n % 512, 64 + (n * 7) % 512, 1 + n % 30


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture helper: materialize an opaque binary column from a text column
    (stand-in for real media bytes) plus a media_type tag."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )


def decode_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode media metadata with an Arrow-batched mapInPandas kernel:
    one Python hop per batch (not per row), output schema fixed up front so
    Catalyst can plan downstream pruning/joins before execution."""

    id_idx, payload_idx = id_col, payload_col

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [_fake_decode_meta(p) for p in pdf[payload_idx]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_idx].astype("int64"),
                    "n_bytes": pd.Series([m[0] for m in metas], dtype="int32"),
                    "width": pd.Series([m[1] for m in metas], dtype="int32"),
                    "height": pd.Series([m[2] for m in metas], dtype="int32"),
                    "n_frames": pd.Series([m[3] for m in metas], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, DECODE_META_SCHEMA)


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Frame sampling (video -> first / middle / last frame): a UDTF-shaped
    mapInPandas kernel emitting up to 3 rows per input. Frame bytes are
    STUB slices of the payload (a real kernel would demux+decode)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = _fake_decode_meta(payload)[3]
                picks = sorted({0, n_frames // 2, n_frames - 1})
                for fi in picks:
                    out_ids.append(doc_id)
                    out_idx.append(fi)
                    # STUB frame payload: a deterministic slice
                    start = (fi * 16) % max(len(payload), 1)
                    out_bytes.append(bytes(payload[start : start + 16]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_bytes": out_bytes,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, FRAME_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize kernel (image -> fixed training resolution): Arrow-batched
    mapInPandas, one Python hop per batch. The pixel work is STUBBED (a real
    kernel calls PIL ``Image.resize`` here — no codecs in this container):
    the fake output payload is a deterministic byte fold of the input sized
    ``target_w * target_h // 64``, so batch shapes, memory profile, and
    schema match a real thumbnail pipeline."""

    out_len = max(1, target_w * target_h // 64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                # STUB resize: cycle the source bytes to the target length
                reps = out_len // max(len(payload), 1) + 1
                out.append(bytes((payload * reps)[:out_len]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "payload": out,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, RESIZE_SCHEMA)


def extract_features(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Feature extraction from opaque media bytes — REAL (not stubbed):
    an L2-normalized byte-value histogram folded to ``dim`` buckets,
    vectorized with numpy over each Arrow batch. Codec-free but a genuine
    content feature: near-identical payloads land near each other in cosine
    space, so the output column (``features: array<float>``) feeds directly
    into the similarity operators (brute_force_topk / lsh_topk / ivf_topk)
    — the full multimodal -> embedding -> ANN pipeline with no placeholder
    math anywhere."""
    import numpy as np
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                counts = np.bincount(
                    np.frombuffer(payload, dtype=np.uint8) % dim, minlength=dim
                ).astype(np.float64)
                norm = np.linalg.norm(counts)
                feats.append((counts / norm if norm else counts).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema)
