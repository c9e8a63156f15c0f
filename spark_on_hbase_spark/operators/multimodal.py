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
