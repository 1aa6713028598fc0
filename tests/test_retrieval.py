from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.retrieval import (
    bm25_scores,
    keyword_topk,
    rrf_fuse,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_matches_straight_line_formula(spark):
    texts = ["spark join data", "join join join", "nothing relevant here", "data"]
    df = _docs(spark, texts)
    got = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["join"]).collect()}

    tok = [t.split() for t in texts]
    N = len(texts)
    avgdl = sum(len(t) for t in tok) / N
    dfreq = sum(1 for t in tok if "join" in t)
    idf = math.log((N - dfreq + 0.5) / (dfreq + 0.5) + 1)
    for i, t in enumerate(tok):
        tf = t.count("join")
        if tf == 0:
            assert i not in got
            continue
        want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(t) / avgdl))
        assert abs(got[i] - want) < 1e-12


def test_bm25_term_saturation_and_length_norm(spark):
    # repeating a term saturates (k1); longer docs are penalized (b)
    df = _docs(spark, ["x", "x x x x x x x x", "x pad pad pad pad pad pad pad"])
    s = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["x"]).collect()}
    assert s[1] < 8 * s[0]  # sublinear in tf
    assert s[2] < s[0]  # same tf, longer doc scores less


def test_keyword_topk_ranks(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = keyword_topk(docs, ["spark", "join"], k=5)
    rows = top.collect()
    assert len(rows) == 5
    assert [r["rank"] for r in sorted(rows, key=lambda r: -r["score"])] == [1, 2, 3, 4, 5]


def test_rrf_prefers_items_on_both_lists(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    fused = {r["doc_id"]: r for r in rrf_fuse([a, b], "doc_id").collect()}
    # 3 appears on both lists → beats 1 (single first place)
    assert fused[3]["rank"] == 1
    assert abs(fused[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-12
    assert fused[1]["rrf_score"] == pytest.approx(1 / 61)


def test_hybrid_pipeline_composes(spark):
    """keyword top-k ∪ vector top-k → RRF — the hybrid retrieval
    stack end-to-end on real tables (doc_id == vec_id)."""
    from architrave_project_apache_nifi_spark.operators.similarity import (
        brute_force_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    kw = keyword_topk(docs, ["spark", "join"], k=10)
    ann = brute_force_topk(
        emb,
        emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=10,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse([kw.select("doc_id", "rank"), ann], "doc_id", topk=10)
    rows = fused.collect()
    assert len(rows) == 10
    assert all(r["rrf_score"] > 0 for r in rows)


def test_rrf_rejects_nonpositive_topk(spark):
    """topk=0 must raise, not silently mean 'no limit' (falsy trap)."""
    a = spark.createDataFrame([(1, 1)], "doc_id long, rank int")
    with pytest.raises(ValueError):
        rrf_fuse([a], "doc_id", topk=0)
    with pytest.raises(ValueError):
        rrf_fuse([a], "doc_id", topk=-3)
