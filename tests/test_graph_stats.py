from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.graph_stats import (
    clustering_coefficient,
    degrees,
    triangle_count,
    triangles_per_node,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_known_graph(spark):
    # K4 on {1,2,3,4} plus a pendant 5—1: 4 triangles, deg(1)=4
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    e = _edges(spark, k4 + [(1, 5)])
    assert triangle_count(e) == 4
    deg = {r["id"]: r["degree"] for r in degrees(e).collect()}
    assert deg == {1: 4, 2: 3, 3: 3, 4: 3, 5: 1}
    tri = {r["id"]: r["n_triangles"] for r in triangles_per_node(e).collect()}
    assert tri == {1: 3, 2: 3, 3: 3, 4: 3}  # each K4 corner in 3 of 4


def test_canonicalization_handles_disorder_and_dups(spark):
    e = _edges(spark, [(2, 1), (1, 2), (1, 1), (2, 3), (3, 1)])
    assert triangle_count(e) == 1  # {1,2,3} once; self-loop/dups ignored
    assert degrees(e).count() == 3


def test_clustering_coefficient_bounds(spark):
    # triangle + pendant: node 1 has deg 3 (2 triangle partners + pendant)
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4)])
    cc = {r["id"]: r for r in clustering_coefficient(e).collect()}
    assert cc[2]["coeff"] == 1.0 and cc[3]["coeff"] == 1.0
    assert abs(cc[1]["coeff"] - 2 * 1 / (3 * 2)) < 1e-12
    assert cc[4]["coeff"] == 0.0  # degree-1 → 0 by convention


def test_neardup_graph_statistics(spark):
    """The intended use: inspect the near-dup pair graph. Planted
    duplicate triple must form one triangle with coefficient 1."""
    from architrave_project_apache_nifi_spark.operators.dedup import (
        embedding_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    trip = emb.filter(F.col("vec_id") == 7)
    planted = emb.unionByName(
        trip.select((F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label")
    ).unionByName(
        trip.select((F.col("vec_id") + 2000).alias("vec_id"), "embedding", "label")
    )
    pairs = embedding_neardup_pairs(
        planted, "vec_id", "embedding", 0.999, block_col="label"
    )
    cc = {r["id"]: r for r in clustering_coefficient(pairs).collect()}
    for node in (7, 1007, 2007):
        assert cc[node]["coeff"] == 1.0 and cc[node]["n_triangles"] == 1
