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


def decode_real(df: DataFrame, **_: object) -> DataFrame:
    """Integration point for a real codec (PIL / torchaudio / pyav).

    Same contract as ``decode_stub_features``; swap the stub's byte-sum
    with the library call inside the mapInPandas closure."""
    raise NotImplementedError(
        "no image/audio codec libraries in this environment; use "
        "decode_stub_features for the plumbing-verified deterministic stub"
    )
