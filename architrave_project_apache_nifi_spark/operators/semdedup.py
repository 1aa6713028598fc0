"""Semantic deduplication (SemDeDup-style) + distributed k-means
(driver-mandated extension family, SURVEY.md §2.9).

SemDeDup (Abbas et al., 2023, arXiv:2303.09540 — public paper):
cluster the corpus embeddings, then inside each cluster drop every
document whose cosine similarity to another kept document exceeds a
threshold. The expensive all-pairs comparison is confined to clusters,
exactly like the LSH-bucket confinement in ``dedup.py`` — the pair
space is O(Σ cluster²), never O(corpus²).

Two cluster-assignment paths:

- ``seed_centroids`` + ``assign_clusters``: deterministic,
  closed-form, ANSI-SQL-replayable (the DuckDB oracle replays the
  identical arithmetic) — the correctness-gate path.
- ``kmeans_fit``: Lloyd's iterations done the scalable way (one pass
  per iteration: map-side partial sums per cluster via Arrow, one
  bounded k×dim driver combine, re-broadcast) — the quality path at
  scale; property-tested against a numpy reference instead of a SQL
  oracle (iterative float refinement is not stably SQL-expressible).

Scale notes (100 TB): assignment is map-only against a broadcast
centroid table (k×dim doubles — megabytes at any sane k). The pruning
stage shuffles one row per doc keyed by cluster id, and each cluster
is one Arrow gram-matrix task (``dedup.embedding_neardup_pairs``
mechanics). ``kmeans_fit`` materializes only k×dim numbers on the
driver per iteration — bounded, documented, and identical in shape to
``similarity.ivf_centroids``'s training collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import embedding_neardup_pairs
from .similarity import _unit, dot

# Knuth multiplicative hash over the doc id — deterministic, order-free
# and exactly replayable in ANSI SQL (BIGINT arithmetic, no engine
# hash builtin involved).
_SEED_MULT = 2654435761
_SEED_MOD = 2**32


def seed_hash(id_col: F.Column) -> F.Column:
    return F.pmod(id_col.cast("long") * F.lit(_SEED_MULT), F.lit(_SEED_MOD))


def seed_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """The k rows with the smallest multiplicative-hash of their id,
    L2-normalized, become centroids 0..k-1 (ordered by hash, ties by
    id — fully deterministic, no RNG). A k-row sort-limit: the shuffle
    carries k rows past the first stage. Output: (centroid_id,
    centroid) with unit-norm double vectors."""
    # orderBy().limit(k) plans as TakeOrderedAndProject — per-partition
    # top-k merged on the driver, NOT a global single-reducer sort; the
    # row_number window then runs over k rows only.
    top = (
        df.select(F.col(id_col), F.col(vec_col), seed_hash(F.col(id_col)).alias("__h"))
        .orderBy(F.col("__h"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("__h"), F.col(id_col))
    return (
        top.withColumn("__rn", F.row_number().over(w))
        .select(
            (F.col("__rn") - 1).cast("int").alias("centroid_id"),
            _unit(F.col(vec_col)).alias("centroid"),
        )
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Nearest-centroid assignment by cosine (spherical k-means
    E-step): broadcast cross join against the k-row centroid table,
    argmax cosine with deterministic tiebreak (smaller centroid_id).
    Map-only per input row — the corpus never shuffles; the window
    below partitions by the doc id over the k-way crossed rows, which
    Catalyst plans as a single exchange of k rows per doc... so instead
    the argmax is a groupBy(max_by) — one partial-aggregatable hash
    agg, shuffle carries one row per doc."""
    crossed = df.select(
        F.col(id_col),
        F.col(vec_col),
        _unit(F.col(vec_col)).alias("__u"),
    ).crossJoin(F.broadcast(centroids))
    scored = crossed.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        dot(F.col("__u"), F.col("centroid")).alias("__cos"),
    )
    # max_by with a struct orders (cos DESC, centroid_id ASC): encode
    # as (cos, -centroid_id) so the natural struct max is the argmax
    # with the deterministic tiebreak.
    return scored.groupBy(id_col).agg(
        F.max_by(
            F.col("centroid_id"),
            F.struct(F.col("__cos"), (-F.col("centroid_id")).alias("__t")),
        ).alias("cluster"),
        F.first(vec_col).alias(vec_col),
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    threshold: float = 0.95,
    centroids: DataFrame | None = None,
    max_cluster_rows: int | None = None,
    sub_bucket_planes: int = 4,
) -> DataFrame:
    """SemDeDup: assign clusters (seeded deterministic centroids unless
    a trained table is passed), find within-cluster cosine-similar
    pairs (blocked gram matrix — one Arrow task per cluster), and drop
    every doc that has a LOWER-id similar neighbor in its cluster
    (keep-first semantics: deterministic, SQL-replayable, and exactly
    the anti-join shape the exact-dedup family uses).

    Output: the surviving rows (id, cluster) — join back to the corpus
    for payloads. Shuffles: one k-row sort (seeding), one hash agg
    (assignment), one cluster-keyed exchange (gram tasks), one
    broadcast-able anti join over the dropped-id set.

    **Sizing k is the scale lever**: each cluster is ONE O(c²·dim)
    gram task, so pick k ≈ corpus / target_cluster_size (the SemDeDup
    paper uses tens of thousands of clusters at web scale).
    ``max_cluster_rows`` is the skew guard for when the data defeats
    that sizing: clusters above the cap are split by a deterministic
    LSH sub-bucket (``sub_bucket_planes`` hyperplanes → ≤ 2^planes
    splits), which bounds every task at the cost of missing pairs
    that straddle sub-buckets of the SAME oversized cluster — an
    explicit, documented recall tradeoff (near-identical vectors
    land in the same sub-bucket with high probability). Leave it None
    for exact within-cluster semantics (the oracle-checked mode)."""
    cents = centroids if centroids is not None else seed_centroids(
        df, id_col, vec_col, k
    )
    assigned = assign_clusters(df, cents, id_col, vec_col)
    if max_cluster_rows is not None:
        from .similarity import lsh_bucket

        sizes = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("__csize")
        )
        sub = lsh_bucket(
            assigned, vec_col, n_planes=sub_bucket_planes, out_col="__sub"
        )
        assigned_blocked = (
            sub.join(F.broadcast(sizes), "cluster")
            .withColumn(
                "__blk",
                F.when(
                    F.col("__csize") > max_cluster_rows,
                    F.concat_ws(":", F.col("cluster"), F.col("__sub")),
                ).otherwise(F.concat_ws(":", F.col("cluster"), F.lit("*"))),
            )
            .drop("__csize", "__sub")
        )
        pairs = embedding_neardup_pairs(
            assigned_blocked, id_col, vec_col, threshold, block_col="__blk"
        )
    else:
        pairs = embedding_neardup_pairs(
            assigned, id_col, vec_col, threshold, block_col="cluster"
        )
    dropped = pairs.select(F.col("id_b").alias("__drop")).distinct()
    return assigned.select(F.col(id_col), F.col("cluster")).join(
        F.broadcast(dropped),
        F.col(id_col) == F.col("__drop"),
        "left_anti",
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (the quality path for SemDeDup / IVF at
# scale; property-tested, not SQL-oracled)
# ---------------------------------------------------------------------------


@dataclass
class KMeansModel:
    centroids: "object"  # numpy (k, dim) float64, unit rows
    inertia: float  # mean (1 - cosine) over the training pass
    iters_run: int


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    max_iters: int = 10,
    tol: float = 1e-6,
    id_col: str | None = None,
) -> KMeansModel:
    """Spherical k-means via Lloyd's iterations, built for the 100 TB
    shape: per iteration ONE pass over the data — each Arrow batch
    computes its partial (sum-vector, count, cosine-sum) per nearest
    centroid, Spark's hash agg combines partials, and only k rows of
    (k×dim sum, count) reach the driver (same bounded-collect contract
    as ``similarity.ivf_centroids``). Initialization = deterministic
    ``seed_centroids`` when ``id_col`` is given, else the first k rows
    in storage order (deterministic for a fixed file layout).

    Stops early when inertia improves by less than ``tol``. Returns
    the model; use ``kmeans_assign`` (or ``assign_clusters`` with a
    centroid DataFrame) to label data."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    vecs = df.select(_unit(F.col(vec_col)).alias("__u")).cache()
    try:
        if id_col is not None:
            cents_rows = seed_centroids(df, id_col, vec_col, k).orderBy(
                "centroid_id"
            ).collect()
            C = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in cents_rows])
        else:
            head = vecs.limit(k).collect()
            C = np.stack([np.asarray(r["__u"], dtype=np.float64) for r in head])
        if C.shape[0] < k:
            raise ValueError(f"kmeans_fit: need >= {k} rows, got {C.shape[0]}")

        dim = C.shape[1]
        prev_inertia = float("inf")
        inertia = float("inf")
        it = 0
        schema = "cluster int, psum array<double>, pcount long, pcos double"
        for it in range(1, max_iters + 1):
            bc = spark.sparkContext.broadcast(C)

            def partials(batches):
                for pdf in batches:
                    X = np.stack(pdf["__u"].to_numpy()).astype(np.float64)
                    S = X @ bc.value.T  # (n, k) cosines (unit rows)
                    lab = S.argmax(axis=1)
                    best = S[np.arange(len(lab)), lab]
                    out = []
                    for c in np.unique(lab):
                        m = lab == c
                        out.append(
                            {
                                "cluster": int(c),
                                "psum": X[m].sum(axis=0).tolist(),
                                "pcount": int(m.sum()),
                                "pcos": float(best[m].sum()),
                            }
                        )
                    yield pd.DataFrame(out)

            agg = (
                vecs.mapInPandas(partials, schema)
                .groupBy("cluster")
                .agg(
                    F.aggregate(
                        F.collect_list("psum"),
                        F.array([F.lit(0.0)] * dim),
                        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                    ).alias("vsum"),
                    F.sum("pcount").alias("n"),
                    F.sum("pcos").alias("cos_sum"),
                )
                .collect()
            )  # bounded: k rows of dim doubles
            bc.destroy()

            total_n = sum(r["n"] for r in agg)
            inertia = 1.0 - sum(r["cos_sum"] for r in agg) / total_n
            C_new = C.copy()  # empty clusters keep their old centroid
            for r in agg:
                v = np.asarray(r["vsum"], dtype=np.float64)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    C_new[r["cluster"]] = v / nrm
            C = C_new
            if prev_inertia - inertia < tol:
                break
            prev_inertia = inertia
        return KMeansModel(centroids=C, inertia=float(inertia), iters_run=it)
    finally:
        vecs.unpersist()


def centroids_df(spark, model: KMeansModel) -> DataFrame:
    """Materialize a fitted model as the (centroid_id, centroid) table
    ``assign_clusters`` / ``semdedup_prune`` consume."""
    from ..tables import local_df

    rows = [
        (i, [float(x) for x in model.centroids[i]])
        for i in range(model.centroids.shape[0])
    ]
    # local_df (r12): LocalTableScan instead of a Python RDD — the
    # centroid table broadcasts into every assignment join, and the
    # Python-RDD form re-ran a Python-worker stage per evaluation
    return local_df(spark, rows, "centroid_id int, centroid array<double>")
