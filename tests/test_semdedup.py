from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.semdedup import (
    assign_clusters,
    centroids_df,
    kmeans_fit,
    seed_centroids,
    semdedup_prune,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_seed_centroids_deterministic_and_unit_norm(spark, emb):
    a = seed_centroids(emb, "vec_id", "embedding", 8).collect()
    b = seed_centroids(emb, "vec_id", "embedding", 8).collect()
    assert [r["centroid_id"] for r in a] == sorted(r["centroid_id"] for r in a)
    assert {tuple(r["centroid"]) for r in a} == {tuple(r["centroid"]) for r in b}
    for r in a:
        assert abs(np.linalg.norm(r["centroid"]) - 1.0) < 1e-9


def test_assign_matches_numpy_argmax(spark, emb):
    cents = seed_centroids(emb, "vec_id", "embedding", 8)
    C = np.stack(
        [np.asarray(r["centroid"]) for r in cents.orderBy("centroid_id").collect()]
    )
    assigned = assign_clusters(emb, cents, "vec_id", "embedding").collect()
    rows = {r["vec_id"]: (np.asarray(r["embedding"], dtype=np.float64), r["cluster"]) for r in assigned}
    for vid, (v, cl) in list(rows.items())[:100]:
        u = v / (np.linalg.norm(v) or 1.0)
        expect = int((u @ C.T).argmax())
        assert cl == expect, f"vec {vid}: {cl} != {expect}"


def test_assignment_covers_every_row_once(spark, emb):
    cents = seed_centroids(emb, "vec_id", "embedding", 8)
    assigned = assign_clusters(emb, cents, "vec_id", "embedding")
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_semdedup_prune_drops_only_similar_lower_id_neighbors(spark, emb):
    kept = semdedup_prune(emb, "vec_id", "embedding", k=8, threshold=0.9)
    n_kept = kept.count()
    assert 0 < n_kept <= emb.count()
    # threshold=1.01 → nothing can be similar → everything survives
    all_kept = semdedup_prune(emb, "vec_id", "embedding", k=8, threshold=1.01)
    assert all_kept.count() == emb.count()


def test_semdedup_drops_exact_duplicates(spark, emb):
    # plant an exact duplicate of vec 0 with a HIGHER id — it must drop
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(10_000_000).alias("vec_id"), "embedding", "label"
    )
    planted = emb.unionByName(dup)
    kept = semdedup_prune(planted, "vec_id", "embedding", k=8, threshold=0.999)
    ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert 10_000_000 not in ids
    assert 0 in ids


def test_kmeans_inertia_non_increasing_and_matches_reference(spark, emb):
    small = emb.limit(200)
    model = kmeans_fit(small, "embedding", k=4, max_iters=5, id_col="vec_id")
    assert model.iters_run >= 1
    assert 0.0 <= model.inertia <= 2.0

    # reference Lloyd's in pure numpy with the same seeding
    rows = small.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    h = (ids.astype(np.int64) * 2654435761) % (2**32)
    seed_idx = np.lexsort((ids, h))[:4]
    C = X[seed_idx].copy()
    for _ in range(model.iters_run):
        lab = (X @ C.T).argmax(axis=1)
        for c in range(4):
            m = lab == c
            if m.any():
                v = X[m].sum(axis=0)
                C[c] = v / np.linalg.norm(v)
    # centroids agree to float tolerance (same iteration count, same math)
    assert np.allclose(np.sort(model.centroids, axis=0), np.sort(C, axis=0), atol=1e-6)


def test_fitted_centroids_usable_for_assignment(spark, emb):
    model = kmeans_fit(emb.limit(200), "embedding", k=4, max_iters=3, id_col="vec_id")
    cents = centroids_df(spark, model)
    out = assign_clusters(emb.limit(50), cents, "vec_id", "embedding")
    assert out.count() == 50
    assert out.filter((F.col("cluster") < 0) | (F.col("cluster") > 3)).count() == 0


def test_assignment_plan_broadcasts_centroids(spark, emb):
    cents = seed_centroids(emb, "vec_id", "embedding", 8)
    plan = (
        assign_clusters(emb, cents, "vec_id", "embedding")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_skew_guard_bounds_blocks_and_stays_valid(spark, emb):
    """With a tiny cluster cap, oversized clusters split into LSH
    sub-buckets: every output row is still a valid input row, exact
    duplicates still drop (same sub-bucket by construction), and the
    kept set can only GROW vs exact mode (sub-bucketing sees fewer
    pairs)."""
    exact = semdedup_prune(emb, "vec_id", "embedding", k=4, threshold=0.35)
    guarded = semdedup_prune(
        emb, "vec_id", "embedding", k=4, threshold=0.35, max_cluster_rows=50
    )
    n_exact, n_guarded = exact.count(), guarded.count()
    assert n_guarded >= n_exact
    assert guarded.join(
        emb.select("vec_id"), "vec_id", "left_anti"
    ).count() == 0
    # identical vectors share every LSH sub-bucket → still deduped
    dup = emb.filter(F.col("vec_id") == 0).select(
        F.lit(10_000_001).alias("vec_id"), "embedding", "label"
    )
    kept = semdedup_prune(
        emb.unionByName(dup), "vec_id", "embedding",
        k=4, threshold=0.999, max_cluster_rows=10,
    )
    assert kept.filter(F.col("vec_id") == 10_000_001).count() == 0
