"""Sequence packing — concat-then-chunk document packing for LLM
pretraining batches (driver-mandated §2.9 family: the op a large-scale
training-data pipeline needs between "clean corpus" and "token
shards").

Semantics (the GPT-style packing used by most pretraining pipelines):
within each stream (language here), documents are laid end-to-end in
ascending id order and the token stream is chunked into fixed
``budget``-token sequences; a document starting at global token offset
``off`` belongs to sequence ``floor(off / budget)`` at in-sequence
offset ``off % budget`` (documents may straddle a boundary — that is
the point of concat-then-chunk; no padding waste).

Scale design — a distributed prefix sum, not one giant window:
a naive ``sum() OVER (PARTITION BY lang ORDER BY doc_id)`` makes each
language ONE window partition = one task sorting the whole stream — the
classic 100 TB single-reducer trap. Instead:

1. shard each stream by contiguous id ranges
   (``shard = floor(id / shard_width)``);
2. per-shard running sums run in parallel (window partitioned by
   (lang, shard) — bounded work per task);
3. shard TOTALS (one row per shard) get a tiny running sum per lang
   and broadcast back; global offset = shard prefix + within-shard
   running sum.

Equal by construction to the single-window spec — the oracle SQL in
queries.py IS that single window, so the driver's DuckDB gate proves
the distributed decomposition correct. Cost: one shuffle of doc-sized
rows on (lang, shard), one broadcast of #shards rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    stream_col: str,
    tokens_col,
    budget: int = 512,
    shard_width: int = 1024,
) -> DataFrame:
    """Assign each document a (seq_id, seq_offset) under concat-then-
    chunk packing per stream.

    ``tokens_col`` is a Column (per-doc token count, e.g.
    ``textanalysis.token_count(F.col('text'))``). Output keeps
    (id, stream, n_tokens) and adds ``seq_id``, ``seq_offset``,
    ``spans_boundary`` (does this doc cross a sequence edge).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shard_width <= 0:
        raise ValueError(f"shard_width must be positive, got {shard_width}")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(stream_col).alias("__stream"),
        tokens_col.cast("long").alias("__tok"),
    ).withColumn("__shard", F.floor(F.col("__id") / shard_width))

    in_shard = Window.partitionBy("__stream", "__shard").orderBy("__id")
    local = base.withColumn(
        "__local_end", F.sum("__tok").over(in_shard)
    )  # running sum INCLUDING this doc, within its shard

    shard_totals = base.groupBy("__stream", "__shard").agg(
        F.sum("__tok").alias("__shard_tok")
    )
    over_shards = (
        Window.partitionBy("__stream")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = shard_totals.select(
        F.col("__stream").alias("__pstream"),
        F.col("__shard").alias("__pshard"),
        F.coalesce(F.sum("__shard_tok").over(over_shards), F.lit(0)).alias(
            "__shard_prefix"
        ),
    )

    off = F.col("__shard_prefix") + F.col("__local_end") - F.col("__tok")
    return (
        local.join(
            F.broadcast(prefixes),
            (F.col("__stream") == F.col("__pstream"))
            & (F.col("__shard") == F.col("__pshard")),
        )
        .select(
            F.col("__id").alias(id_col),
            F.col("__stream").alias(stream_col),
            F.col("__tok").alias("n_tokens"),
            F.floor(off / budget).alias("seq_id"),
            (off % budget).alias("seq_offset"),
            (
                F.floor(off / budget)
                != F.floor((off + F.greatest(F.col("__tok"), F.lit(1)) - 1) / budget)
            ).alias("spans_boundary"),
        )
    )
