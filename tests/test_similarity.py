"""Tests for similarity search (SURVEY.md §2.9): brute-force top-k is
checked against an independent numpy reference; the approximate LSH
variant is held to a recall floor against brute force (it has no SQL
oracle — this is its correctness gate)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"
K = 5
N_QUERIES = 3


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _queries(df):
    return df.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _numpy_topk(rows, k):
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    S = (X @ X.T) / np.outer(nrm, nrm)
    out = {}
    for qi in range(N_QUERIES):
        j = int(np.where(ids == qi)[0][0])
        mask = ids != qi
        cand_ids, cand_s = ids[mask], S[mask, j]
        order = np.lexsort((cand_ids, -cand_s))[:k]
        out[qi] = [(int(cand_ids[i]), float(cand_s[i])) for i in order]
    return out


def test_brute_force_topk_matches_numpy(spark):
    emb = _emb(spark)
    got = sim.brute_force_topk(emb, _queries(emb), k=K).collect()
    expected = _numpy_topk(emb.collect(), K)
    by_query: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))
    assert set(by_query) == set(expected)
    for q in expected:
        assert [n for n, _ in by_query[q]] == [n for n, _ in expected[q]]
        for (_, c_got), (_, c_exp) in zip(by_query[q], expected[q]):
            assert abs(c_got - c_exp) < 1e-9


def test_brute_force_excludes_self_and_ranks_densely(spark):
    emb = _emb(spark)
    rows = sim.brute_force_topk(emb, _queries(emb), k=K).collect()
    for r in rows:
        assert r.neighbor_id != r.query_id
    for q in range(N_QUERIES):
        ranks = sorted(r.rank for r in rows if r.query_id == q)
        assert ranks == list(range(1, K + 1))


def test_lsh_bucket_deterministic(spark):
    emb = _emb(spark)
    b1 = {r.vec_id: r.bucket for r in sim.lsh_bucket(emb, "embedding").collect()}
    b2 = {r.vec_id: r.bucket for r in sim.lsh_bucket(emb, "embedding").collect()}
    assert b1 == b2
    assert all(0 <= b < 256 for b in b1.values())  # 8 planes → 8-bit bucket


def test_lsh_topk_subset_of_corpus_with_sane_recall(spark):
    """LSH prunes to the query's bucket; every returned neighbor must be
    a real corpus id, scores must match brute-force scores for the same
    pair, and recall@K against brute force must clear a floor (random
    hyperplanes at 8 planes leave same-bucket neighbors likely for the
    clustered test embeddings)."""
    emb = _emb(spark)
    brute = sim.brute_force_topk(emb, _queries(emb), k=K).collect()
    lsh = sim.lsh_topk(emb, _queries(emb), k=K).collect()
    brute_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in brute}
    corpus_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    for r in lsh:
        assert r.neighbor_id in corpus_ids
        if (r.query_id, r.neighbor_id) in brute_pairs:
            assert abs(r.cosine - brute_pairs[(r.query_id, r.neighbor_id)]) < 1e-6
    hits = sum(1 for p in {(r.query_id, r.neighbor_id) for r in lsh} if p in brute_pairs)
    assert hits >= 1, "LSH found none of the true top-k — buckets degenerate"


def test_ivf_topk_recall_and_score_exactness(spark):
    """IVF with nprobe/nlist = 1/4 of the cells scanned must still
    recover most of the true top-k (k-means cells track the embedding
    clusters), and every (query, neighbor) cosine it reports must equal
    the brute-force cosine for the same pair — IVF prunes candidates,
    it never alters scores."""
    emb = _emb(spark)
    brute = sim.brute_force_topk(emb, _queries(emb), k=K).collect()
    ivf = sim.ivf_topk(emb, _queries(emb), k=K, nlist=8, nprobe=2).collect()
    brute_pairs = {(r.query_id, r.neighbor_id): r.cosine for r in brute}
    for r in ivf:
        assert r.neighbor_id != r.query_id
        if (r.query_id, r.neighbor_id) in brute_pairs:
            assert abs(r.cosine - brute_pairs[(r.query_id, r.neighbor_id)]) < 1e-9
    got_pairs = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = sum(1 for p in brute_pairs if p in got_pairs) / len(brute_pairs)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_ivf_split_build_probe_and_save_load(spark, tmp_path):
    """The index is a reusable artifact: build once, probe many; a
    save/load round-trip through the partitioned parquet layout must
    return the identical result. At the registered operating point
    (nlist=32, nprobe=12 — ~38% of this isotropic corpus scanned)
    recall against brute force clears 0.85."""
    emb = _emb(spark)
    brute_pairs = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, _queries(emb), k=K).collect()
    }
    index = sim.ivf_build(emb, nlist=32)
    probed = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim.ivf_probe(index, _queries(emb), k=K, nprobe=12).collect()
    )
    got_pairs = {(q, n) for q, _, n in probed}
    recall = sum(1 for p in brute_pairs if p in got_pairs) / len(brute_pairs)
    assert recall >= 0.85, f"IVF recall {recall:.2f} below floor"

    path = str(tmp_path / "ivf_index")
    sim.ivf_save(index, path)
    loaded = sim.ivf_load(spark, path)
    assert loaded.nlist == index.nlist
    reprobed = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim.ivf_probe(loaded, _queries(emb), k=K, nprobe=12).collect()
    )
    assert reprobed == probed
    index.assigned.unpersist()


def test_ivf_deterministic_across_runs(spark):
    emb = _emb(spark)
    a = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim.ivf_topk(emb, _queries(emb), k=K, nlist=8, nprobe=2).collect()
    )
    b = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sim.ivf_topk(emb, _queries(emb), k=K, nlist=8, nprobe=2).collect()
    )
    assert a == b


def test_ivf_handles_zero_norm_vectors(spark):
    """A zero-norm embedding (padding row / failed encoder) must not
    NaN-poison the spherical quantizer: build trains, every row gets a
    cell, and a zero-norm QUERY still ranks cells deterministically."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    rows.append((40, [0.0] * 8))  # zero-norm corpus row
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    index = sim.ivf_build(corpus, nlist=4, materialize=False)
    assigned = index.assigned.collect()
    assert len(assigned) == 41
    assert all(r.list_id is not None for r in assigned)

    queries = spark.createDataFrame(
        [(100, [0.0] * 8)], "query_id LONG, embedding ARRAY<DOUBLE>"
    )
    out = sim.ivf_probe(index, queries, k=3, nprobe=2).collect()
    # scores against a zero query are NaN/undefined; the contract here is
    # only "no crash, deterministic cells" — row_number still yields k
    assert len(out) <= 3

def test_ivf_cache_evict(spark):
    """ivf_index_for memoizes per cache_key; ivf_evict unpersists and
    forgets exactly that key's indexes (long-lived drivers cycling
    corpora must not accumulate executor storage)."""
    emb = _emb(spark)
    idx_a = sim.ivf_index_for(emb, cache_key="evict-a", nlist=4)
    idx_a2 = sim.ivf_index_for(emb, cache_key="evict-a", nlist=4)
    assert idx_a is idx_a2  # memo hit
    assert idx_a.assigned.storageLevel.useMemory
    sim.ivf_index_for(emb, cache_key="evict-b", nlist=4)
    assert sim.ivf_evict("evict-a") == 1
    assert not idx_a.assigned.storageLevel.useMemory
    # evict-b untouched; rebuilding evict-a is a fresh object
    assert sim.ivf_index_for(emb, cache_key="evict-a", nlist=4) is not idx_a
    assert sim.ivf_evict_all() >= 2

def test_ivf_disk_index_probe_prunes_partitions(spark, tmp_path):
    """The 100 TB probe contract made physical: probing an on-disk
    (list_id-partitioned) index puts the probed cell set into the
    scan's PartitionFilters — whole unprobed list directories are never
    read. (Asserted on the plan; inputFiles() reflects the unpruned
    file index, so it is not the right witness.)"""
    import re

    from architrave_project_apache_nifi_spark.plans import inspect as pi

    emb = _emb(spark)
    index = sim.ivf_build(emb, nlist=8, materialize=False)
    path = str(tmp_path / "ix")
    sim.ivf_save(index, path)
    loaded = sim.ivf_load(spark, path)
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = sim.ivf_probe(loaded, q, k=5, nprobe=2)
    plan = pi.formatted_plan(out)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    m = re.search(r"list_id#\d+ IN \(([\d,]+)\)", pf[0])
    assert m, pf[0]
    probed = m.group(1).split(",")
    # ≤ n_queries × nprobe cells, strictly fewer than nlist directories
    assert 0 < len(probed) <= 6 < 8, pf[0]

def test_brute_force_metrics_agree_with_numpy(spark):
    """dot and l2 metrics: top-1 neighbor must match the numpy argmax/
    argmin on the same data (cosine already covered); l2 scores are
    negated distances so the shared 'higher is better' rank order holds."""
    import numpy as np

    emb = _emb(spark).limit(60)
    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    q = emb.filter(F.col("vec_id") == rows[0].vec_id).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qv = X[0]

    for metric in ("dot", "l2"):
        got = sim.brute_force_topk(emb, q, k=1, metric=metric).collect()[0]
        if metric == "dot":
            scores = X @ qv
        else:
            scores = -np.sqrt(((X - qv) ** 2).sum(axis=1))
        scores[0] = -np.inf  # exclude the query itself, as the operator does
        best = ids[int(np.argmax(scores))]
        assert got.neighbor_id == best, metric

    import pytest

    with pytest.raises(ValueError, match="metric"):
        sim.brute_force_topk(emb, q, k=1, metric="hamming")

def test_ivf_append_without_retraining(spark, tmp_path):
    """Serving-path index update: append vectors to a SAVED index (no
    retraining); a probe after reload must surface an appended
    near-duplicate of the query as its top neighbor, and the appended
    rows must land inside the existing list_id partition layout."""
    emb = _emb(spark)
    index = sim.ivf_build(emb, nlist=8, materialize=False)
    path = str(tmp_path / "ix")
    sim.ivf_save(index, path)

    # craft a near-duplicate of query 0's vector with a fresh id
    qvec = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    near = [float(x) * 1.01 for x in qvec]
    new = spark.createDataFrame(
        [(100000, near)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    assert sim.ivf_append(spark, path, new) == 1

    loaded = sim.ivf_load(spark, path)
    assert loaded.assigned.count() == emb.count() + 1
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = (
        sim.ivf_probe(loaded, q, k=1, nprobe=2)
        .collect()[0]
    )
    assert top.neighbor_id == 100000  # scaled copy ⇒ cosine ≈ 1, rank 1
    assert abs(top.cosine - 1.0) < 1e-9


def test_hard_negatives_exclude_same_label_and_match_numpy(spark):
    import numpy as np
    from architrave_project_apache_nifi_spark.operators.similarity import (
        hard_negatives,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    anchors = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("anchor_id"), "embedding", "label"
    )
    out = hard_negatives(emb, anchors, k=5)
    rows = out.collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    a_labels = {r["anchor_id"]: None for r in rows}
    anchor_lab = {
        r["anchor_id"]: r["label"]
        for r in anchors.select("anchor_id", "label").collect()
    }
    for r in rows:
        assert labels[r["neighbor_id"]] != anchor_lab[r["anchor_id"]]

    # exact vs numpy for anchor 0
    data = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([d["vec_id"] for d in data])
    labs = np.array([d["label"] for d in data])
    X = np.stack([np.asarray(d["embedding"], dtype=np.float64) for d in data])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    a = Xn[list(ids).index(0)]
    sims = Xn @ a
    mask = labs != anchor_lab[0]
    order = np.lexsort((ids[mask], -sims[mask]))[:5]
    want = list(ids[mask][order])
    got = [r["neighbor_id"] for r in sorted(
        (r for r in rows if r["anchor_id"] == 0), key=lambda r: r["rank"]
    )]
    assert got == want


def test_brute_force_topk_guards_driver_collect(spark):
    """An oversized query set must raise BEFORE the driver collect
    (VERDICT r4: the unguarded collect OOMed with no error naming the
    cause); the guard itself collects at most max+1 rows."""
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    q = spark.createDataFrame(
        [(i, [1.0, float(i)]) for i in range(5)], "query_id LONG, embedding ARRAY<DOUBLE>"
    )
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.brute_force_topk(emb, q, k=2, max_query_rows=4)
    # at the ceiling it still runs
    assert sim.brute_force_topk(emb, q, k=2, max_query_rows=5).count() == 10


def test_hard_negatives_guards_driver_collect(spark):
    import pytest

    from architrave_project_apache_nifi_spark.operators.similarity import (
        hard_negatives,
    )

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 2) for i in range(20)],
        "vec_id LONG, embedding ARRAY<DOUBLE>, label INT",
    )
    anchors = spark.createDataFrame(
        [(i, [1.0, float(i)], i % 2) for i in range(6)],
        "anchor_id LONG, embedding ARRAY<DOUBLE>, label INT",
    )
    with pytest.raises(ValueError, match="max_anchors"):
        hard_negatives(corpus, anchors, k=2, max_anchors=5)
    assert hard_negatives(corpus, anchors, k=2, max_anchors=6).count() == 12


def test_ivf_probe_guards_driver_collect(spark):
    """The probe's query-side collect carries full float64 vectors
    (×nprobe once exploded) — a corpus-sized query set must raise
    naming max_query_rows instead of OOMing the driver (VERDICT r4-r6
    carry-over); at the ceiling it still runs and results are
    unchanged vs an uncapped call."""
    import pytest

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3)]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    q = spark.createDataFrame(
        [(i, [1.0, float(i), 0.5]) for i in range(6)],
        "query_id LONG, embedding ARRAY<DOUBLE>",
    )
    index = sim.ivf_build(emb, nlist=4, materialize=False)
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.ivf_probe(index, q, k=2, nprobe=2, max_query_rows=5)
    capped = sorted(
        map(tuple, sim.ivf_probe(index, q, k=2, nprobe=2, max_query_rows=6).collect())
    )
    default = sorted(map(tuple, sim.ivf_probe(index, q, k=2, nprobe=2).collect()))
    assert capped == default and len(capped) > 0
    # wrapper passes the knob through
    with pytest.raises(ValueError, match="max_query_rows"):
        sim.ivf_topk(emb, q, k=2, nlist=4, nprobe=2, max_query_rows=5)


def test_ivf_clustered_corpus_high_recall_at_low_scan(spark):
    """The isotropic-corpus tests above concede recall ≈ scan fraction
    (any space-partitioning index degenerates on directionally uniform
    data). On a CLUSTERED corpus — the shape real embedding models
    produce — the IVF cells track the clusters and a few-percent scan
    recovers the true neighbors: recall@10 ≥ 0.9 at ≤ 10% of the corpus
    scanned (VERDICT r4 #5; sf1 sweep in BASELINE.md §IVF recall)."""
    import numpy as np

    rng = np.random.default_rng(7)
    n_clusters, dim, per = 32, 64, 120
    cents = rng.normal(size=(n_clusters, dim)) * 10.0
    pts = cents.repeat(per, axis=0) + rng.normal(size=(n_clusters * per, dim))
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    q_idx = rng.choice(len(pts), 25, replace=False)
    queries = spark.createDataFrame(
        [
            (int(i), [float(x) for x in pts[i] + rng.normal(size=dim) * 0.5])
            for i in q_idx
        ],
        "query_id LONG, embedding ARRAY<DOUBLE>",
    )
    brute_pairs = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(corpus, queries, k=10).collect()
    }
    index = sim.ivf_build(corpus, nlist=32)
    got_pairs = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_probe(index, queries, k=10, nprobe=2).collect()
    }
    recall = sum(1 for p in brute_pairs if p in got_pairs) / len(brute_pairs)

    # measured scan fraction: replicate the probe's cell ranking
    # (nearest centroids of the normalized query) against the actual
    # cell sizes — not the idealized nprobe/nlist
    sizes = dict(
        (r.list_id, r.n)
        for r in index.assigned.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    C = np.array(index.centroids)
    scans = []
    for (qid, vec) in queries.collect():
        q = np.array(vec)
        qn = q / np.linalg.norm(q)
        d2 = ((qn - C) ** 2).sum(axis=1)
        cells = np.argsort(d2, kind="stable")[:2]
        scans.append(sum(sizes.get(int(c), 0) for c in cells) / len(pts))
    scan_frac = sum(scans) / len(scans)

    assert scan_frac <= 0.10, f"scanned {scan_frac:.1%} of the corpus"
    assert recall >= 0.9, f"recall {recall:.2f} at {scan_frac:.1%} scan"
