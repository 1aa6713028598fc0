"""Multimodal column plumbing (driver-mandated extension, SURVEY.md §2.9).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side machinery — schema,
partitioning, Arrow-batched decode UDFs, batch shapes — is real and
tested; the actual codec step is STUBBED (the container has no
image/audio libraries): ``decode_stub_features`` produces deterministic
fake features, and ``decode_real`` raises ``NotImplementedError`` with
the integration point documented.

Scale notes: payload bytes dominate — keep them in their own parquet
column (column pruning skips them unless selected), repartition by size
before decode so Arrow batches stay bounded, and decode via
``mapInPandas`` (one Python worker per partition, zero-copy Arrow
transfer) rather than a per-row UDF.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, out_col: str = "media"
) -> DataFrame:
    """Wrap an existing binary/string column as a media column + metadata
    struct (width/height/duration unknown until decode)."""
    payload = F.col(payload_col)
    binary = payload.cast("binary")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.withColumn(out_col, F.struct(binary.alias("payload"), meta.alias("meta")))


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def decode_stub_features(
    df: DataFrame, id_col: str = "doc_id", media_col: str = "media", dim: int = 8
) -> DataFrame:
    """Arrow-batched 'decode' over mapInPandas: real plumbing (batch
    iteration, schema contract, payload access), deterministic fake
    features (byte-sum based) standing in for the codec."""
    picked = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.payload").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(len).astype("int64")
            feats = [
                [float((sum(buf[j::dim]) % 251)) / 251.0 for j in range(dim)]
                for buf in payloads
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "byte_len": byte_len, "feature": feats}
            )

    return picked.mapInPandas(run, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Image-resize plumbing over ``mapInPandas``: batch iteration,
    payload access, output schema carrying the new dimensions and the
    re-encoded payload. The pixel work is a deterministic stand-in
    (payload truncated/cycled to ``target_w*target_h`` bytes — a real
    implementation swaps in ``PIL.Image.resize`` inside the closure and
    a binary output column; plumbing and batch shape are identical)."""
    picked = df.select(
        F.col(id_col).alias("doc_id"), F.col(f"{media_col}.payload").alias("payload")
    )
    n_out = target_w * target_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                bytes(buf[i % len(buf)] for i in range(n_out)) if len(buf) else b""
                for buf in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return picked.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ms", LongType()),
        StructField("frame_hash", LongType()),
    ]
)


def frame_sample_stub(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Video frame-sampling plumbing: one input row fans out to N frame
    rows (the 1→N generator shape a real ``pyav`` sampler has). Frame
    count derives from the metadata duration (fallback: payload length);
    the per-frame 'content' is a deterministic hash of (payload slice,
    frame index) standing in for the decoded frame tensor."""
    picked = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(f"{media_col}.payload").alias("payload"),
        F.coalesce(
            F.col(f"{media_col}.meta.duration_ms"),
            F.octet_length(F.col(f"{media_col}.payload")).cast("long"),
        ).alias("duration_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, hashes = [], [], [], []
            for doc_id, buf, dur in zip(
                pdf["doc_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n = max(1, min(max_frames, int(dur // every_ms) + 1))
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    chunk = buf[i :: max(1, n)]
                    h = 1469598103934665603
                    for b in chunk[:64]:
                        h = ((h ^ b) * 1099511628211) & 0x7FFFFFFFFFFFFFFF
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="int64"),
                }
            )

    return picked.mapInPandas(run, FRAME_SCHEMA)


def decode_real(df: DataFrame, **_: object) -> DataFrame:
    """Integration point for a real codec (PIL / torchaudio / pyav).

    Same contract as ``decode_stub_features``; swap the stub's byte-sum
    with the library call inside the mapInPandas closure."""
    raise NotImplementedError(
        "no image/audio codec libraries in this environment; use "
        "decode_stub_features for the plumbing-verified deterministic stub"
    )
