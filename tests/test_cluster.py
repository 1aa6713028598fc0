from __future__ import annotations

import random

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.cluster import (
    canonical_docs,
    connected_components,
)


def _union_find_components(n_nodes: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    """Min-id component per node appearing in edges (plain union-find)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_cc_matches_union_find_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(5, 60)
        m = rng.randint(0, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            edges = [(0, 1)]
        expected = _union_find_components(n, edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["id"]: r["comp"]
            for r in connected_components(df, "src", "dst").collect()
        }
        assert got == expected, f"trial {trial}: {sorted(got.items())[:10]}"


def test_cc_long_path_converges(spark):
    # A 64-node path graph: worst case for plain propagation (diameter
    # 63); pointer jumping must converge well inside max_iter.
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, "src", "dst", max_iter=12).collect()
    assert len(got) == 64
    assert {r["comp"] for r in got} == {0}


def test_canonical_docs_keeps_min_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 7), (2, 9)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in canonical_docs(docs, pairs).collect()}
    assert rows[1]["canonical_id"] == 1 and rows[1]["is_kept"] == 1
    assert rows[4]["canonical_id"] == 1 and rows[4]["is_kept"] == 0
    assert rows[7]["canonical_id"] == 1 and rows[7]["is_kept"] == 0
    assert rows[2]["canonical_id"] == 2 and rows[2]["is_kept"] == 1
    assert rows[9]["canonical_id"] == 2 and rows[9]["is_kept"] == 0
    # Untouched docs are their own kept canonical.
    assert rows[0]["canonical_id"] == 0 and rows[0]["is_kept"] == 1
    kept = sum(r["is_kept"] for r in rows.values())
    assert kept == 7  # 10 docs - 3 dropped duplicates


def test_canonical_docs_best_keeps_top_score(spark):
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs_best,
    )

    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate([3, 5, 9, 9, 1, 2, 8, 4, 6, 7])],
        "doc_id long, n_chars long",
    )
    # component {1,2,3}: scores 5,9,9 -> argmax ties on 9, min id 2 wins
    # component {5,8}:   scores 2,6   -> 8 wins (not the min id 5)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 8)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: r
        for r in canonical_docs_best(docs, pairs, "doc_id", "n_chars").collect()
    }
    for i in (1, 2, 3):
        assert rows[i]["canonical_id"] == 2
    assert rows[2]["is_kept"] == 1 and rows[1]["is_kept"] == 0
    assert rows[5]["canonical_id"] == 8 and rows[5]["is_kept"] == 0
    assert rows[8]["is_kept"] == 1
    # singletons keep themselves
    assert rows[0]["canonical_id"] == 0 and rows[0]["is_kept"] == 1
    assert sum(r["is_kept"] for r in rows.values()) == 7


def test_canonical_docs_best_constant_score_equals_min_id_rule(spark):
    from architrave_project_apache_nifi_spark.operators.cluster import (
        canonical_docs_best,
    )

    rng = random.Random(3)
    n = 40
    docs = spark.createDataFrame(
        [(i, 1) for i in range(n)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(25)
        ],
        "id_a long, id_b long",
    ).filter("id_a <> id_b")
    a = sorted(
        map(tuple, canonical_docs_best(docs, pairs, "doc_id", "n_chars").collect())
    )
    b = sorted(
        map(
            tuple,
            canonical_docs(
                docs.select("doc_id"), pairs
            ).collect(),
        )
    )
    assert a == b


def test_keep_best_prod_invariants_and_recall_vs_exact_twin(spark):
    """The prod-banded composite (queries.dedup_cluster_keep_best_prod):
    lsh_plan-sized bands instead of the gate entries' rows=1 pinning.
    Not SQL-oracled (banding has a recall knee near the threshold), so
    pin the contract here: (a) output is a total partition of the
    corpus with exactly one kept representative per cluster, (b) the
    representative is the argmax by (n_chars, -id) within its cluster,
    (c) cluster assignments are a coarsening of the exact rows=1
    twin's (banding only MISSES edges, never invents them), and
    (d) recall of the exact twin's duplicate pairs is high at gate
    scale."""
    from collections import defaultdict

    from architrave_project_apache_nifi_spark.queries import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    prod = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_cluster_keep_best_prod"].fn(spark, sf_dir).collect()
    }
    exact = {
        r["doc_id"]: r
        for r in REGISTRY["dedup_cluster_keep_best"].fn(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert prod.keys() == docs.keys()  # total partition, nothing lost

    clusters = defaultdict(list)
    for i, r in prod.items():
        clusters[r["canonical_id"]].append(i)
    for canon, members in clusters.items():
        kept = [i for i in members if prod[i]["is_kept"] == 1]
        assert kept == [canon]  # exactly one representative: the label
        best = max(members, key=lambda i: (docs[i], -i))
        assert canon == best  # argmax by (n_chars, -id)

    # coarsening: prod clusters never merge docs the exact twin separates
    same_prod = {
        (min(a, b), max(a, b))
        for c in clusters.values()
        if len(c) > 1
        for a in c
        for b in c
        if a < b
    }
    exact_clusters = defaultdict(set)
    for i, r in exact.items():
        exact_clusters[r["canonical_id"]].add(i)
    exact_pairs = {
        (min(a, b), max(a, b))
        for c in exact_clusters.values()
        if len(c) > 1
        for a in c
        for b in c
        if a < b
    }
    assert same_prod <= exact_pairs
    # recall at gate scale: the S-curve knee loses only near-threshold
    # edges; the synthetic corpus's dup families sit well above it
    if exact_pairs:
        recall = len(same_prod) / len(exact_pairs)
        assert recall >= 0.8, recall
