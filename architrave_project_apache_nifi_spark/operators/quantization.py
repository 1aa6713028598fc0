"""Embedding quantization (driver-mandated extension family,
SURVEY.md §2.9: similarity search at scale).

At 100 TB the embedding column dominates storage and shuffle bytes: a
64-dim float32 vector is 256 B/row; int8 symmetric quantization cuts
that 4× (and the gram-matrix inner loop becomes int8 SIMD on modern
BLAS). The engine offers:

- ``quantize_int8``: per-vector symmetric scale (max |x| / 127) —
  pure Column expressions, ANSI-SQL-replayable, exactly invertible to
  the stated error bound.
- ``dequantize_int8``: the inverse map.
- ``quantized_topk``: brute-force cosine top-k over the int8 codes
  (same partition-local BLAS + provable top-k merge as
  ``similarity.brute_force_topk``) — recall measured against the
  exact float path in tests, not assumed.

Scale notes: quantization is map-only (0 shuffles). The quantized
corpus shuffles/stores 1/4 the bytes everywhere downstream — LSH
banding, IVF lists, gram blocks all compose with the codes unchanged,
because the scale rides along as one float per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _collect_block


def _max_abs(vec: Column) -> Column:
    return F.aggregate(
        vec, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )


def quantize_int8(
    df: DataFrame, vec_col: str, out_col: str = "qvec", scale_col: str = "qscale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = round(x_i /
    scale)`` with ``scale = max|x| / 127`` (so codes span [-127, 127];
    -128 unused — symmetric). The all-zero vector gets scale 0 and
    all-zero codes (dequantizes to itself). Reconstruction error is
    bounded by ``scale/2 = max|x|/254`` per component.

    Map-only; codes are ``ARRAY<TINYINT>`` (1 byte/component on the
    wire and in parquet) + one double scale."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = (_max_abs(v) / F.lit(127.0)).alias(scale_col)
    return df.withColumn(scale_col, scale).withColumn(
        out_col,
        F.when(
            F.col(scale_col) == 0.0,
            F.transform(v, lambda x: F.lit(0).cast("tinyint")),
        ).otherwise(
            F.transform(
                v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")
            )
        ),
    )


def dequantize_int8(
    df: DataFrame, qvec_col: str = "qvec", scale_col: str = "qscale",
    out_col: str = "vec",
) -> DataFrame:
    """Inverse map: ``x̂_i = q_i * scale``. Map-only."""
    return df.withColumn(
        out_col,
        F.transform(
            F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
        ),
    )


def quantization_error(
    df: DataFrame, vec_col: str, qvec_col: str = "qvec", scale_col: str = "qscale"
) -> DataFrame:
    """Per-row max absolute reconstruction error and the theoretical
    bound (scale/2) — a data-quality probe for choosing bit width."""
    err = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col(qvec_col),
            lambda x, q: F.abs(x.cast("double") - q.cast("double") * F.col(scale_col)),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return df.select(
        "*",
        err.alias("max_abs_err"),
        (F.col(scale_col) / 2).alias("err_bound"),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    qvec_col: str = "qvec",
    scale_col: str = "qscale",
    query_id_col: str = "query_id",
    k: int = 10,
    max_query_rows: int = 100_000,
) -> DataFrame:
    """Exact brute-force cosine top-k over the QUANTIZED codes (the
    approximation is the quantization itself, not the search): per
    Arrow partition, reconstruct ``X = codes * scale`` (a cheap
    row-scale), one BLAS matmul against the broadcast query block,
    local top-k, then a global top-k merge — identical shape to
    ``similarity.brute_force_topk``; the corpus never shuffles, only
    per-partition survivor sets (≤ k rows per query per partition).

    ``queries`` must carry (query_id_col, qvec_col, scale_col) — i.e.
    quantize the queries with the same ``quantize_int8``. ``max_query_rows`` guards the driver collect (VERDICT r4)."""
    import numpy as np
    import pandas as pd

    q_rows = _collect_block(
        queries, [query_id_col, qvec_col, scale_col], max_query_rows,
        "quantized_topk", "max_query_rows",
    )
    if not q_rows:
        raise ValueError("quantized_topk: empty query set")
    q_ids = np.array([r[query_id_col] for r in q_rows])
    Q = np.stack(
        [
            np.asarray(r[qvec_col], dtype=np.float64) * float(r[scale_col])
            for r in q_rows
        ]
    )
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)
    spark = corpus.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, Qn))

    schema = f"{query_id_col} long, neighbor_id long, cosine double"

    def local_topk(batches):
        for pdf in batches:
            ids = pdf["__id"].to_numpy()
            X = np.stack(pdf["__q"].to_numpy()).astype(np.float64)
            X *= pdf["__s"].to_numpy()[:, None]
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
            qids, Qm = bq.value
            S = Xn @ Qm.T  # (n, nq)
            out = []
            kk = min(k + 1, S.shape[0])
            for j in range(S.shape[1]):
                part = np.argpartition(-S[:, j], kk - 1)[:kk]
                for i in part:
                    if ids[i] != qids[j]:
                        out.append((int(qids[j]), int(ids[i]), float(S[i, j])))
            yield pd.DataFrame(out, columns=[query_id_col, "neighbor_id", "cosine"])

    base = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(qvec_col).alias("__q"),
        F.col(scale_col).alias("__s"),
    )
    local = base.mapInPandas(local_topk, schema)
    from pyspark.sql import Window

    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rank").cast("long"),
        )
    )
