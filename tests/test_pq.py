"""Product quantization semantics (operators/quantization.py r10
additions): codebook training, encoding, ADC search, reconstruction.

PQ training is iterative k-means → pytest-gated by documented contract
(same registry treatment as kmeans_fit / the LR quality classifier):
python-reference checks, determinism, quality floors measured against
the exact search path.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.quantization import (
    PqCodebooks,
    pq_encode,
    pq_reconstruction_mse,
    pq_topk,
    pq_train,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def cb(spark, emb):
    return pq_train(emb, "vec_id", "embedding", m=8, ksub=16)


def test_train_shapes_and_determinism(spark, emb, cb):
    assert cb.m == 8 and cb.ksub == 16 and cb.dsub == 8
    C = np.asarray(cb.codebooks)
    assert C.shape == (8, 16, 8)
    again = pq_train(emb.repartition(7), "vec_id", "embedding", m=8, ksub=16)
    assert np.allclose(C, np.asarray(again.codebooks))


def test_train_validates_args(spark, emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, "vec_id", "embedding", m=7)
    with pytest.raises(ValueError, match="ksub"):
        pq_train(emb, "vec_id", "embedding", m=8, ksub=1)


def test_encode_codes_in_range_and_deterministic(spark, emb, cb):
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    rows = codes.select("vec_id", "pq_code").collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["pq_code"]) == 8
        assert all(0 <= c < 16 for c in r["pq_code"])
    again = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(
            emb.repartition(5), "vec_id", "embedding", cb
        ).select("vec_id", "pq_code").collect()
    }
    assert {r["vec_id"]: list(r["pq_code"]) for r in rows} == again


def test_encode_matches_numpy_reference(spark, emb, cb):
    sample = emb.orderBy("vec_id").limit(20).collect()
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(
            emb.orderBy("vec_id").limit(20), "vec_id", "embedding", cb
        ).collect()
    }
    C = np.asarray(cb.codebooks)
    for r in sample:
        x = np.asarray(r["embedding"], dtype=np.float64)
        x /= max(np.linalg.norm(x), 1e-300)
        ref = [
            int(((x[s * 8 : (s + 1) * 8] - C[s]) ** 2).sum(axis=1).argmin())
            for s in range(8)
        ]
        assert got[r["vec_id"]] == ref, r["vec_id"]


def test_reconstruction_better_than_degenerate_codebook(spark, emb, cb):
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    mse = pq_reconstruction_mse(codes, "embedding", cb)
    # degenerate 2-centroid-per-subspace codebook must be worse
    small = pq_train(emb, "vec_id", "embedding", m=8, ksub=2)
    small_codes = pq_encode(emb, "vec_id", "embedding", small)
    mse_small = pq_reconstruction_mse(small_codes, "embedding", small)
    assert 0.0 < mse < mse_small
    # unit vectors have squared norm 1; a random max-distance code
    # would sit near 2.0. The synthetic corpus is near-uniform on the
    # sphere (the hardest case for PQ), so pin a sane ceiling, not a
    # clustered-data fantasy.
    assert mse < 1.0


def test_adc_recall_vs_exact_bruteforce(spark, emb, cb):
    from architrave_project_apache_nifi_spark.operators.similarity import (
        brute_force_topk,
    )

    queries = emb.orderBy("vec_id").limit(12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(emb, queries, k=10)
    approx = pq_topk(
        pq_encode(emb, "vec_id", "embedding", cb),
        queries,
        cb,
        "vec_id",
        k=10,
    )
    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert ex.keys() == ap.keys()
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    # the synthetic corpus is near-UNIFORM on the 64-sphere — the
    # provably hardest case (all cosines ~0, vanishing gaps), where
    # exact-neighbor identity is mostly noise. Random guessing gets
    # k/N = 10/500 = 0.02; require 5x that. The clustered-corpus test
    # below is where real recall is pinned.
    assert sum(recalls) / len(recalls) >= 0.1, recalls


def test_adc_recall_on_clustered_corpus(spark):
    from architrave_project_apache_nifi_spark.operators.similarity import (
        brute_force_topk,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(500):
        c = centers[i % 10]
        v = c + 0.08 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb2 = pq_train(df, "vec_id", "embedding", m=8, ksub=16)
    queries = df.orderBy("vec_id").limit(10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=10)
    approx = pq_topk(
        pq_encode(df, "vec_id", "embedding", cb2), queries, cb2, "vec_id", k=10
    )
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    # clustered data (the realistic shape): ADC must place neighbors
    # in the right cluster — cluster-level recall, not noise ranking
    cluster_of = {i: i % 10 for i in range(500)}
    cluster_hits = [
        sum(1 for n in ap[q] if cluster_of[n] == cluster_of[q]) / 10
        for q in ap
    ]
    assert sum(cluster_hits) / len(cluster_hits) >= 0.9, cluster_hits
    # exact-identity recall within a cluster is bounded by the noise
    # scale vs quantization cell size (PQ is a candidate generator —
    # production re-ranks survivors with exact vectors); pin a floor
    # well above random-within-cluster (10/50 = 0.2)
    assert sum(recalls) / len(recalls) >= 0.25, recalls


def test_adc_scores_match_numpy_reference(spark, emb, cb):
    codes_df = pq_encode(emb, "vec_id", "embedding", cb)
    q = emb.orderBy("vec_id").limit(1)
    out = pq_topk(
        codes_df,
        q.select(F.col("vec_id").alias("query_id"), "embedding"),
        cb,
        "vec_id",
        k=5,
    ).collect()
    C = np.asarray(cb.codebooks)
    qv = np.asarray(q.collect()[0]["embedding"], dtype=np.float64)
    qv /= max(np.linalg.norm(qv), 1e-300)
    codes = {
        r["vec_id"]: np.asarray(r["pq_code"]) for r in codes_df.collect()
    }
    for r in out:
        code = codes[r["neighbor_id"]]
        ref = sum(
            float(qv[s * 8 : (s + 1) * 8] @ C[s][code[s]]) for s in range(8)
        )
        assert abs(r["score"] - round(ref, 6)) < 1e-9


def test_ivfpq_encode_and_search_clustered(spark):
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
    )

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(8, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        v = centers[i % 8] + 0.08 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    cb2 = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, cb2).persist()
    got = enc.collect()
    assert len(got) == 400
    assert all(0 <= r["list_id"] < 8 for r in got)
    assert all(len(r["pq_code"]) == 8 for r in got)
    # cells roughly align with clusters (k-means|| may merge/split a
    # couple); each true cluster still has a clearly dominant cell
    from collections import Counter

    for c in range(8):
        cells = Counter(r["list_id"] for r in got if r["vec_id"] % 8 == c)
        assert cells.most_common(1)[0][1] >= 25  # of 50

    queries = df.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(df, queries, k=10)
    approx = ivfpq_topk(
        enc, queries, index, cb2, "vec_id", k=10, nprobe=2
    )
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert ex.keys() == ap.keys()
    # nprobe=2 of 8 cells scans ~25% of an already-32x-smaller table;
    # on cluster-aligned cells the true neighbors are in the probed
    # cell, so quality matches the full-scan ADC path
    cluster_hits = [
        sum(1 for n in ap[q] if n % 8 == q % 8) / 10 for q in ap
    ]
    assert sum(cluster_hits) / len(cluster_hits) >= 0.8, cluster_hits
    # residual codes (r11): the floor rises from the raw-vector form's
    # 0.2 — measured 0.41 at this (m, ksub, nprobe) on this corpus
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.35, recalls
    enc.unpersist()


def _clustered_df(spark, n=400, ncenters=8, noise=0.08, seed=23):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(ncenters, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = [
        (i, [float(x) for x in centers[i % ncenters] + noise * rng.normal(size=64)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_residual_codes_beat_raw_codes_ab(spark):
    """The r11 A/B (VERDICT r10 #3): at identical (m, ksub), codebooks
    trained on coarse-cell residuals reconstruct the clustered corpus
    strictly better than raw-vector codebooks — the reason IVFPQ codes
    residuals (Jégou 2011 §IV-A). Score error is bounded by
    reconstruction error (Cauchy-Schwarz on q·(u − û)), so the MSE gap
    is the recall mechanism, pinned directly."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_reconstruction_mse,
        ivfpq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
    )

    df = _clustered_df(spark)
    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    cb_res = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    cb_raw = pq_train(df, "vec_id", "embedding", m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, cb_res)
    mse_res = ivfpq_reconstruction_mse(
        df, "embedding", index, cb_res, enc, "vec_id"
    )
    enc_raw = pq_encode(df, "vec_id", "embedding", cb_raw)
    mse_raw = pq_reconstruction_mse(enc_raw, "embedding", cb_raw)
    # measured 0.151 vs 0.246 at this setup — demand a real margin,
    # not a tie-breaker
    assert mse_res < 0.8 * mse_raw, (mse_res, mse_raw)


def test_ivfpq_scores_match_numpy_reference(spark):
    """Residual ADC parity: every returned score equals
    q·centroid[cell] + Σ_s LUT[s, code_s] to 1e-9 (the decomposition
    q·(c + r̂) = q·c + q·r̂ — with the IP metric the LUT is per-query,
    the per-(query, cell) part is the scalar bias)."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
    )

    df = _clustered_df(spark)
    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    cb2 = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, cb2).persist()
    by_id = {r["vec_id"]: r for r in enc.collect()}
    queries = df.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qvecs = {
        r["query_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in queries.collect()
    }
    out = ivfpq_topk(enc, queries, index, cb2, "vec_id", k=5, nprobe=8)
    cells = np.asarray(index.centroids, dtype=np.float64)
    C = np.asarray(cb2.codebooks, dtype=np.float64)
    for r in out.collect():
        qv = qvecs[r["query_id"]]
        qv = qv / np.linalg.norm(qv)
        nb = by_id[r["neighbor_id"]]
        code = list(nb["pq_code"])
        ref = float(qv @ cells[nb["list_id"]]) + sum(
            float(qv[s * 8 : (s + 1) * 8] @ C[s][code[s]]) for s in range(8)
        )
        assert abs(r["score"] - round(ref, 6)) < 1e-9
    enc.unpersist()


def test_ivfpq_probed_cells_only(spark):
    """The isin cell filter must reach the scan: rows outside probed
    cells are never scored (scan-fraction contract, not just recall)."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_topk,
    )

    # hand-built: 2 cells; query probes 1; the other cell's rows can
    # never appear even with perfect scores
    class FakeIndex:
        centroids = [[1.0, 0.0], [-1.0, 0.0]]

    cb2 = PqCodebooks(
        m=1, ksub=2, dsub=2, codebooks=[[[1.0, 0.0], [-1.0, 0.0]]]
    )
    enc = spark.createDataFrame(
        [(1, 0, [0]), (2, 0, [0]), (3, 1, [1])],
        "vec_id long, list_id int, pq_code array<smallint>",
    )
    q = spark.createDataFrame(
        [(99, [1.0, 0.0])], "query_id long, embedding array<double>"
    )
    out = ivfpq_topk(enc, q, FakeIndex(), cb2, "vec_id", k=3, nprobe=1).collect()
    assert {r["neighbor_id"] for r in out} == {1, 2}


def test_pq_save_load_roundtrip(spark, emb, cb, tmp_path):
    from architrave_project_apache_nifi_spark.operators.quantization import (
        pq_load,
        pq_save,
    )

    pq_save(spark, cb, str(tmp_path / "cb"))
    loaded = pq_load(spark, str(tmp_path / "cb"))
    assert (loaded.m, loaded.ksub, loaded.dsub) == (cb.m, cb.ksub, cb.dsub)
    assert np.allclose(np.asarray(loaded.codebooks), np.asarray(cb.codebooks))
    # codes from the reloaded artifact are identical
    a = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, "vec_id", "embedding", cb).collect()
    }
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode(emb, "vec_id", "embedding", loaded).collect()
    }
    assert a == b


def test_pq_train_rejects_sample_smaller_than_ksub(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="sample has 5 rows < ksub"):
        pq_train(df, "vec_id", "embedding", m=1, ksub=16)


def test_pq_codebooks_for_memoizes(spark, emb):
    from architrave_project_apache_nifi_spark.operators.quantization import (
        pq_codebooks_for,
        pq_evict,
    )

    a = pq_codebooks_for(emb, cache_key="/tmp/test-memo")
    b = pq_codebooks_for(emb, cache_key="/tmp/test-memo")
    assert a is b  # cached object, no retrain
    assert pq_evict("/tmp/test-memo") == 1
    c = pq_codebooks_for(emb, cache_key="/tmp/test-memo")
    assert c is not a and np.allclose(
        np.asarray(c.codebooks), np.asarray(a.codebooks)
    )
    pq_evict("/tmp/test-memo")


def test_rerank_exact_recovers_true_topk(spark):
    """Two-stage serving (Jégou 2011 §V): IVFPQ candidates at R ≥ cell
    occupancy + exact re-rank must return EXACTLY the brute-force
    top-k — the ADC stage only generates, the float stage ranks."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        rerank_exact,
    )

    df = _clustered_df(spark)  # 400 rows, 8 clusters -> ~50/cell
    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    cb2 = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, cb2).persist()
    queries = df.orderBy("vec_id").limit(6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = ivfpq_topk(enc, queries, index, cb2, "vec_id", k=60, nprobe=2)
    got = rerank_exact(cand, df, queries, k=10)
    exact = brute_force_topk(df, queries, k=10)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in got.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.95, recalls
    # and the re-ranked scores are the EXACT cosines (not ADC scores)
    by_pair = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in got.collect()
    }
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in df.collect()}
    for (q, nb), c in list(by_pair.items())[:10]:
        u = vecs[q] / np.linalg.norm(vecs[q])
        v = vecs[nb] / np.linalg.norm(vecs[nb])
        assert abs(c - round(float(u @ v), 6)) < 1e-9
    enc.unpersist()


def test_rerank_exact_broadcasts_candidates_not_corpus(spark):
    """Scale contract: the candidate list and the query block broadcast;
    the corpus side joins without an exchange of its own rows into a
    shuffle join (no SortMergeJoin / ShuffledHashJoin in the plan)."""
    from architrave_project_apache_nifi_spark.operators.similarity import (
        rerank_exact,
    )

    corpus = _clustered_df(spark)
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = spark.createDataFrame(
        [(0, 5), (0, 6), (1, 7)], "query_id long, neighbor_id long"
    )
    plan = (
        rerank_exact(cand, corpus, queries, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_ivfpq_save_load_partition_pruning(spark, tmp_path):
    """The disk serving artifact: codes land partitioned by list_id and
    a probe's cell filter prunes PARTITIONS (directory-level, visible
    as PartitionFilters in the scan), then search results equal the
    in-memory path's."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_load,
        ivfpq_save,
        ivfpq_topk,
        ivfpq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
    )

    df = _clustered_df(spark)
    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    cb2 = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, cb2)
    path = str(tmp_path / "ivfpq")
    ivfpq_save(enc, cb2, path)
    codes, cb3 = ivfpq_load(spark, path)
    assert np.allclose(
        np.asarray(cb3.codebooks), np.asarray(cb2.codebooks)
    )
    queries = df.orderBy("vec_id").limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out_disk = ivfpq_topk(codes, queries, index, cb3, "vec_id", k=5, nprobe=2)
    # the pushed isin over the partition column must reach the scan as
    # a PartitionFilters entry on list_id (directory pruning)
    plan = out_disk._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scan and "list_id" in scan[0], plan[:2000]
    out_mem = ivfpq_topk(enc, queries, index, cb2, "vec_id", k=5, nprobe=2)
    as_set = lambda df_: {  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["score"]) for r in df_.collect()
    }
    assert as_set(out_disk) == as_set(out_mem)


def test_codes_memoizers_build_once_and_evict_unpersists(spark):
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_codes_for,
        ivfpq_train,
        pq_codes_for,
        pq_evict,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
    )

    df = _clustered_df(spark, n=100)
    key = "test-codes-memo"
    cb2 = pq_train(df, "vec_id", "embedding", m=8, ksub=16)
    a = pq_codes_for(df, cb2, cache_key=key)
    b = pq_codes_for(df, cb2, cache_key=key)
    assert a is b  # memoized, not rebuilt
    assert a.storageLevel.useMemory  # persisted serving artifact
    index = ivf_build(df, "vec_id", "embedding", nlist=4, materialize=False)
    cb3 = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    c = ivfpq_codes_for(df, index, cb3, cache_key=key)
    assert c is ivfpq_codes_for(df, index, cb3, cache_key=key)
    n = pq_evict(key)
    assert n >= 2  # both codes tables (+ any codebooks) evicted
    assert not a.storageLevel.useMemory and not c.storageLevel.useMemory
    # rebuilt fresh after eviction
    assert pq_codes_for(df, cb2, cache_key=key) is not a
    pq_evict(key)


def test_lut_slab_blocking_is_exact(spark):
    """VERDICT r11 #4: the LUT broadcast bound — tasks rebuild LUT
    slabs of lut_block_rows queries from the broadcast raw query block
    instead of shipping the (nq × m × ksub) LUT. The einsum is exact
    row-chunkable, so a tiny block size must give BIT-IDENTICAL
    results to one covering every query at once, for both pq_topk and
    ivfpq_topk."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
        pq_encode,
        pq_topk,
        pq_train,
    )
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
    )

    df = _clustered_df(spark)
    queries = df.orderBy("vec_id").limit(9).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    cb2 = pq_train(df, "vec_id", "embedding", m=8, ksub=16)
    codes = pq_encode(df, "vec_id", "embedding", cb2).persist()
    a = pq_topk(codes, queries, cb2, "vec_id", k=5, lut_block_rows=2)
    bfull = pq_topk(codes, queries, cb2, "vec_id", k=5, lut_block_rows=10**6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, bfull.collect()))
    codes.unpersist()

    index = ivf_build(df, "vec_id", "embedding", nlist=8, materialize=False)
    rcb = ivfpq_train(df, "vec_id", "embedding", index, m=8, ksub=16)
    enc = ivfpq_encode(df, "vec_id", "embedding", index, rcb).persist()
    c = ivfpq_topk(enc, queries, index, rcb, "vec_id", k=5, nprobe=3,
                   lut_block_rows=2)
    d = ivfpq_topk(enc, queries, index, rcb, "vec_id", k=5, nprobe=3,
                   lut_block_rows=10**6)
    assert sorted(map(tuple, c.collect())) == sorted(map(tuple, d.collect()))
    enc.unpersist()


def test_codes_cache_key_fingerprints_artifacts(spark):
    """ADVICE r11: a retrained codebook (or rebuilt coarse index)
    under the SAME cache_key must produce a fresh codes table, not
    silently return codes encoded under the old artifacts."""
    from architrave_project_apache_nifi_spark.operators.quantization import (
        _PQ_CODES_CACHE,
        pq_codes_for,
        pq_evict,
        pq_train,
    )

    df = _clustered_df(spark)
    key = "fingerprint-test"
    cb_a = pq_train(df, "vec_id", "embedding", m=8, ksub=16, sample_rows=64)
    cb_b = pq_train(df, "vec_id", "embedding", m=8, ksub=16, sample_rows=128)
    assert cb_a.codebooks != cb_b.codebooks  # genuinely different artifacts
    n_before = len(_PQ_CODES_CACHE)
    ca = pq_codes_for(df, cb_a, cache_key=key)
    cb_ = pq_codes_for(df, cb_b, cache_key=key)
    assert len(_PQ_CODES_CACHE) == n_before + 2  # two distinct entries
    assert ca is not cb_
    # same artifact -> same memoized table
    assert pq_codes_for(df, cb_a, cache_key=key) is ca
    pq_evict(key)
