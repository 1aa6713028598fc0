from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.quantization import (
    dequantize_int8,
    quantization_error,
    quantize_int8,
    quantized_topk,
)
from architrave_project_apache_nifi_spark.operators.similarity import (
    brute_force_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_codes_in_symmetric_range(spark, emb):
    q = quantize_int8(emb, "embedding")
    bounds = q.select(
        F.array_max("qvec").alias("hi"), F.array_min("qvec").alias("lo")
    ).agg(F.max("hi"), F.min("lo")).collect()[0]
    assert bounds[0] <= 127 and bounds[1] >= -127  # -128 never used


def test_reconstruction_error_within_bound(spark, emb):
    q = quantize_int8(emb, "embedding")
    errs = quantization_error(q, "embedding").select("max_abs_err", "err_bound")
    # float round-off allowance on top of the scale/2 bound
    viol = errs.filter(F.col("max_abs_err") > F.col("err_bound") * 1.000001).count()
    assert viol == 0


def test_zero_vector_round_trips(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    q = dequantize_int8(quantize_int8(df, "embedding"))
    row = q.collect()[0]
    assert row["qscale"] == 0.0 and list(row["vec"]) == [0.0, 0.0, 0.0]


def test_quantize_matches_numpy(spark, emb):
    rows = quantize_int8(emb.limit(50), "embedding").collect()
    for r in rows:
        x = np.asarray(r["embedding"], dtype=np.float64)
        scale = np.abs(x).max() / 127.0
        expect = np.round(x / scale) if scale else np.zeros_like(x)
        assert np.array_equal(np.asarray(r["qvec"], dtype=np.float64), expect)


def test_quantized_topk_recall_vs_exact(spark, emb):
    """Quantization at 64-dim int8 should barely perturb cosine
    ranking: recall@10 vs the exact float path must stay high."""
    q = quantize_int8(emb, "embedding")
    queries = q.filter(F.col("vec_id") < 5)
    approx = quantized_topk(q, queries, "vec_id", query_id_col="vec_id", k=10)

    exact = brute_force_topk(
        emb,
        emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding")
        ),
        "vec_id",
        "embedding",
        k=10,
    )
    a = {(r["vec_id"], r["neighbor_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"recall {recall}"


def test_quantization_plan_is_map_only(spark, emb):
    plan = (
        quantize_int8(emb, "embedding")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_quantized_codes_compose_with_ivf(spark, emb):
    """int8 codes feed the IVF index unchanged: dequantize → build →
    probe finds the planted exact query among top hits (the
    quantization error is far below cluster granularity)."""
    from architrave_project_apache_nifi_spark.operators.similarity import (
        ivf_build,
        ivf_probe,
    )

    # plant copies of the queries under NEW ids (probe excludes
    # self-ids) — the quantized index must still find them near-exactly
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") < 3).select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
        )
    )
    q = dequantize_int8(quantize_int8(planted, "embedding"), out_col="deq")
    corpus = q.select("vec_id", F.col("deq").alias("embedding"))
    index = ivf_build(corpus, "vec_id", "embedding", nlist=8)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ivf_probe(index, queries, k=5, nprobe=4)
    by_q = {}
    for r in hits.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    for qid, rows in by_q.items():
        assert any(
            r["neighbor_id"] == qid + 10_000 and r["cosine"] > 0.999
            for r in rows
        ), (qid, rows)


def test_quantized_topk_guards_driver_collect(spark):
    """Oversized quantized query block raises instead of OOMing the
    driver (VERDICT r4)."""
    import pytest

    from architrave_project_apache_nifi_spark.operators.quantization import (
        quantize_int8,
        quantized_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0, 1.0]) for i in range(30)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    qz = quantize_int8(emb, "embedding")
    queries = qz.limit(4).withColumnRenamed("vec_id", "query_id")
    with pytest.raises(ValueError, match="max_query_rows"):
        quantized_topk(qz, queries, "vec_id", max_query_rows=3)
    assert (
        quantized_topk(qz, queries, "vec_id", k=3, max_query_rows=4).count()
        == 12
    )
