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


# Arrow-batch schema for pack_bins output.
_PACK_BINS_SCHEMA = (
    "id long, stream string, n_tokens long, shard long, "
    "bin_local long, bin_fill long, is_packed int"
)


def pack_bins(
    df: DataFrame,
    id_col: str,
    stream_col: str,
    tokens_col,
    budget: int = 512,
    shard_width: int = 1024,
) -> DataFrame:
    """Boundary-RESPECTING sequence packing: first-fit-decreasing bin
    packing within contiguous-id shards — the complement of
    :func:`pack_sequences` (concat-then-chunk). Chunk packing never
    wastes a token but splits documents across sequence edges;
    instruction/SFT pipelines need the opposite contract — a document
    never straddles, bins are padded to ``budget`` — and pay padding
    waste for it. FFD is the standard way to keep that waste small
    (classically within 11/9·OPT + 1 bins).

    Deterministic spec: docs shard by contiguous id range
    (``shard = floor(id / shard_width)``) per stream; within each
    (stream, shard) group, docs sort by (n_tokens DESC, id) and place
    first-fit; bins are identified by (stream, shard, bin_local).
    Oversize docs (n_tokens > budget) come back with ``is_packed=0``
    and bin_local = -1 — route them to chunking, don't silently trim.

    Scale: one shuffle keyed (stream, shard) — sharded BY CONSTRUCTION
    like every per-doc group in this engine; the greedy loop runs in
    an Arrow ``applyInPandas`` batch whose size is capped by
    shard_width rows, and packing quality is shard-local by design
    (global FFD would order the whole corpus — a single-reducer sort).
    The iterative greedy is not SQL-expressible, so this family is
    property-tested (python reference + invariants) rather than
    DuckDB-oracled — the same registry treatment as bpe_tokenize.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if shard_width <= 0:
        raise ValueError(f"shard_width must be positive, got {shard_width}")

    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        # cast mirrors the id cast: the Arrow output schema pins
        # `stream string`, so a non-string stream (e.g. an integer
        # domain id) must be coerced here, not fail in applyInPandas
        F.col(stream_col).cast("string").alias("stream"),
        tokens_col.cast("long").alias("n_tokens"),
        F.floor(F.col(id_col).cast("long") / shard_width).alias("shard"),
    )
    # NULL token counts (failed upstream tokenize) route out like
    # oversize docs — map-only, BEFORE the Arrow group: a NaN in the
    # pandas batch would flip the whole n_tokens column to float64 and
    # kill the task on int conversion / schema mismatch.
    nulls = base.filter(F.col("n_tokens").isNull()).select(
        "id",
        "stream",
        "n_tokens",
        "shard",
        F.lit(-1).cast("long").alias("bin_local"),
        F.lit(0).cast("long").alias("bin_fill"),
        F.lit(0).alias("is_packed"),
    )
    base = base.filter(F.col("n_tokens").isNotNull())

    def _ffd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assign: list[int] = []
        packed: list[int] = []
        for t in pdf["n_tokens"]:
            t = int(t)
            if t > budget:
                assign.append(-1)
                packed.append(0)
                continue
            placed = False
            for b, fill in enumerate(fills):
                if fill + t <= budget:
                    fills[b] = fill + t
                    assign.append(b)
                    packed.append(1)
                    placed = True
                    break
            if not placed:
                fills.append(t)
                assign.append(len(fills) - 1)
                packed.append(1)
        pdf["bin_local"] = pd.array(assign, dtype="int64")
        pdf["bin_fill"] = pd.array(
            [fills[b] if b >= 0 else 0 for b in assign], dtype="int64"
        )
        pdf["is_packed"] = pd.array(packed, dtype="int32")
        return pdf

    packed = base.groupBy("stream", "shard").applyInPandas(
        _ffd, _PACK_BINS_SCHEMA
    )
    return packed.unionByName(nulls)


def packing_waste(packed: DataFrame, budget: int) -> DataFrame:
    """One row per stream: bins used, padding waste fraction
    (1 − packed tokens / (bins × budget)), the oversize-drop count and
    the failed-tokenize count — the metric that justifies FFD over
    naive in-order packing. pack_bins routes BOTH oversize docs and
    NULL-token docs out with is_packed=0; the two causes are reported
    separately (an oversize doc needs chunking, a NULL one needs its
    tokenizer fixed). One tiny two-level aggregation (distinct bins per
    stream ≪ docs)."""
    bins = (
        packed.filter(F.col("is_packed") == 1)
        .groupBy("stream", "shard", "bin_local")
        .agg(F.first("bin_fill").alias("fill"))
        .groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("fill").alias("packed_tokens"),
        )
    )
    unpacked = F.col("is_packed") == 0
    drops = packed.groupBy("stream").agg(
        F.sum(
            F.when(unpacked & F.col("n_tokens").isNotNull(), 1).otherwise(0)
        ).alias("n_oversize_dropped"),
        F.sum(
            F.when(unpacked & F.col("n_tokens").isNull(), 1).otherwise(0)
        ).alias("n_null_tokens"),
    )
    # drops is the base side: a stream whose docs are ALL oversize has
    # no packed bins, and its drop count is exactly the signal this
    # report exists to surface
    return drops.join(bins, "stream", "left").select(
        "stream",
        F.coalesce("n_bins", F.lit(0)).alias("n_bins"),
        F.coalesce("packed_tokens", F.lit(0)).alias("packed_tokens"),
        F.when(F.col("n_bins").isNull() | (F.col("n_bins") == 0), F.lit(0.0))
        .otherwise(
            1.0
            - F.col("packed_tokens").cast("double")
            / (F.col("n_bins") * F.lit(float(budget)))
        )
        .alias("waste_frac"),
        "n_oversize_dropped",
        "n_null_tokens",
    )
