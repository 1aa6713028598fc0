"""Similarity search over embedding columns (driver-mandated extension,
SURVEY.md §2.9).

Baseline: brute-force cosine top-k — exact, one broadcast of the query
set, no shuffle of the corpus. Scale path: LSH (random-hyperplane)
bucketing — the corpus is hashed once into buckets; queries probe only
their bucket (+ optional multi-probe neighbors), turning a full scan
into a pruned one. Deterministic: projection vectors derive from a
seeded hash, not runtime randomness.

All vector math is ``aggregate``/``zip_with`` Column expressions —
JVM-side; no Python in the scoring loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — deterministic double summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against the
    corpus, score every pair, keep k per query via window row_number.

    At 100 TB: corpus stays partitioned, queries broadcast — the scan is
    embarrassingly parallel and the only shuffle is the per-query top-k
    (tiny: k rows per partition after partial sort)."""
    c = corpus.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    scored = c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col)).withColumn(
        "cosine", dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )


def lsh_bucket(
    df: DataFrame,
    vec_col: str,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern over ``n_planes``
    projections). Plane components are deterministic pseudo-randoms
    derived from ``xxhash64(seed, plane, dim_index)`` mapped to [-1, 1] —
    reproducible across runs/systems, no runtime RNG state."""
    v = _as_double(F.col(vec_col))

    def plane_component(p: int, i: Column) -> Column:
        h = F.xxhash64(F.lit(seed), F.lit(p), i)
        return (h % 20001).cast("double") / 10000.0  # [-1, 1], deterministic

    def sign_bit(p: int) -> Column:
        idx = F.sequence(F.lit(0), F.lit(dim - 1))
        proj = F.aggregate(
            F.zip_with(v, idx, lambda x, i: x * plane_component(p, i)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(proj >= 0, F.shiftleft(F.lit(1), p)).otherwise(F.lit(0))

    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket.bitwiseOR(sign_bit(p))
    return df.withColumn(out_col, bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Recall measured against brute force in tests; at scale add
    multi-probe (flip one bit) to trade compute for recall."""
    cb = lsh_bucket(
        corpus.select(id_col, vec_col), vec_col, n_planes, dim
    ).select(
        F.col(id_col), F.col("bucket"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__cn", l2_norm(F.col("__cv")))
    qb = lsh_bucket(
        queries.select(query_id_col, vec_col), vec_col, n_planes, dim
    ).select(
        F.col(query_id_col), F.col("bucket"), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__qn", l2_norm(F.col("__qv")))
    scored = cb.join(
        F.broadcast(qb), (cb.bucket == qb.bucket) & (F.col(id_col) != F.col(query_id_col))
    ).withColumn(
        "cosine", dot(F.col("__cv"), F.col("__qv")) / (F.col("__cn") * F.col("__qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, F.col(id_col).alias("neighbor_id"), "cosine", "rank")
    )
