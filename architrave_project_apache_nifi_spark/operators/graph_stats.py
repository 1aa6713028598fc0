"""Graph statistics over pair sets (degrees, triangles, clustering) —
the inspection toolkit for the graphs this engine builds: near-dup
pair graphs (`dedup.py`), fuzzy-match graphs (`fuzzyjoin.py`), whose
structure decides dedup quality (a dense triangle-rich component is a
true duplicate cluster; a star around one hub is usually a shingle
artifact).

Input convention: an undirected edge list with ``src < dst`` (the
pair operators' native output shape). All pure DataFrame ops:

- ``degrees``: one groupBy over the symmetrized edges.
- ``triangle_count``: the standard two-join formulation on the
  ordered edge list — each triangle a<b<c is counted exactly once as
  (a,b)+(b,c) closed by (a,c). Join keys are node ids; no pair-space
  blowup beyond wedges (2-paths), the known cost of exact triangle
  counting. At 100 TB-scale graphs, pre-filter to the component or
  degree-cap hubs first (wedge count is Σ deg² — hubs dominate).
- ``clustering_coefficient``: per-node closed-wedge ratio from the
  two results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ordered(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonicalize to src < dst, drop self-loops and duplicates."""
    a = F.least(F.col(src), F.col(dst)).alias("src")
    b = F.greatest(F.col(src), F.col(dst)).alias("dst")
    return edges.select(a, b).filter(F.col("src") < F.col("dst")).distinct()


def degrees(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """(id, degree) over the undirected graph."""
    e = _ordered(edges, src, dst)
    sym = e.select(F.col("src").alias("id")).unionAll(
        e.select(F.col("dst").alias("id"))
    )
    return sym.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))


def triangles_per_node(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(id, n_triangles) — how many triangles each node participates
    in. Exact: wedges (a<b<c via (a,b),(b,c)) semi-joined against the
    closing edge (a,c); each triangle found once, credited to all
    three corners."""
    e = _ordered(edges, src, dst)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    closed = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    corners = (
        closed.select(F.col("a").alias("id"))
        .unionAll(closed.select(F.col("b").alias("id")))
        .unionAll(closed.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def triangle_count(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> int:
    """Global triangle count (each counted once)."""
    e = _ordered(edges, src, dst)
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    return wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    ).count()


def clustering_coefficient(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """(id, degree, n_triangles, coeff) with
    coeff = 2·triangles / (degree·(degree−1)); degree-1 nodes get 0.
    The per-node density signal separating true dup clusters (→1)
    from hub artifacts (→0)."""
    d = degrees(edges, src, dst)
    t = triangles_per_node(edges, src, dst)
    joined = d.join(t, "id", "left").withColumn(
        "n_triangles", F.coalesce("n_triangles", F.lit(0))
    )
    return joined.withColumn(
        "coeff",
        F.when(
            F.col("degree") > 1,
            2.0 * F.col("n_triangles") / (F.col("degree") * (F.col("degree") - 1)),
        ).otherwise(F.lit(0.0)),
    )
