#!/usr/bin/env python
"""Recall@10 + measured scan fraction for the PQ serving pair
(ann_topk_pq / ann_topk_ivfpq) on the CLUSTERED embedding corpus —
the measure_ivf_recall.py template extended to the r11 residual-coded
IVFPQ (VERDICT r10 #5). Prints one JSON line; numbers recorded in
BASELINE.md §PQ recall.

PQ scans everything (scan_frac 1.0) but at m bytes/vector; IVFPQ
compounds the ~32× byte shrink with the probed-cell scan fraction.
The raw-codebook MSE is printed next to the residual MSE so the
artifact shows the r11 residual win at identical (m, ksub).
"""
from __future__ import annotations

import json
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from architrave_project_apache_nifi_spark.operators import quantization as qz  # noqa: E402
from architrave_project_apache_nifi_spark.operators import similarity as sim  # noqa: E402
from architrave_project_apache_nifi_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/repo/.localdata/sf1"
K = 10
NLIST = 64
N_QUERIES = 50
M, KSUB = 8, 16


def main() -> None:
    spark = get_spark("pq-recall")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings_clustered.parquet").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    queries = (
        emb.orderBy(F.xxhash64("vec_id"))
        .limit(N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    brute_pairs = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=K).collect()
    }

    out = {"n": n, "m": M, "ksub": KSUB, "k": K, "nlist": NLIST}

    # --- PQ: full-scan ADC over raw-vector codes -----------------------
    cb_raw = qz.pq_train(emb, "vec_id", "embedding", m=M, ksub=KSUB)
    codes = qz.pq_encode(emb, "vec_id", "embedding", cb_raw).persist()
    codes.count()
    got = {
        (r.query_id, r.neighbor_id)
        for r in qz.pq_topk(codes, queries, cb_raw, "vec_id", k=K).collect()
    }
    out["pq"] = {
        "recall_at_10": round(
            sum(1 for p in brute_pairs if p in got) / len(brute_pairs), 3
        ),
        "scan_frac": 1.0,
        "mse_raw": round(qz.pq_reconstruction_mse(codes, "embedding", cb_raw), 4),
    }
    codes.unpersist()

    # --- IVF×PQ: residual codes, probed cells only ----------------------
    index = sim.ivf_build(emb, nlist=NLIST)
    cb_res = qz.ivfpq_train(emb, "vec_id", "embedding", index, m=M, ksub=KSUB)
    enc = qz.ivfpq_encode(emb, "vec_id", "embedding", index, cb_res).persist()
    enc.count()
    out["mse_residual"] = round(
        qz.ivfpq_reconstruction_mse(emb, "embedding", index, cb_res, enc, "vec_id"),
        4,
    )
    sizes = {
        r.list_id: r.n
        for r in enc.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    C = np.array(index.centroids)
    qvecs = {r.query_id: np.array(r.embedding) for r in queries.collect()}
    out["ivfpq_sweep"] = {}
    for nprobe in (1, 2, 4, 8, 16):
        got = {
            (r.query_id, r.neighbor_id)
            for r in qz.ivfpq_topk(
                enc, queries, index, cb_res, "vec_id", k=K, nprobe=nprobe
            ).collect()
        }
        recall = sum(1 for p in brute_pairs if p in got) / len(brute_pairs)
        fracs = []
        for q in qvecs.values():
            qn = q / np.linalg.norm(q)
            d2 = ((qn - C) ** 2).sum(axis=1)
            cells = np.argsort(d2, kind="stable")[:nprobe]
            fracs.append(sum(sizes.get(int(c), 0) for c in cells) / n)
        out["ivfpq_sweep"][nprobe] = {
            "recall_at_10": round(recall, 3),
            "scan_frac": round(statistics.mean(fracs), 4),
        }

    # --- two-stage: IVFPQ generates R=150 candidates, exact re-rank ----
    # R must exceed the cell occupancy (~n/nlist = 125 here) at
    # nprobe=1 or candidate generation itself truncates the cluster
    out["ivfpq_rerank"] = {}
    for nprobe in (1, 2):
        cand = qz.ivfpq_topk(
            enc, queries, index, cb_res, "vec_id", k=150, nprobe=nprobe
        )
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.rerank_exact(cand, emb, queries, k=K).collect()
        }
        out["ivfpq_rerank"][nprobe] = {
            "recall_at_10": round(
                sum(1 for p in brute_pairs if p in got) / len(brute_pairs), 3
            ),
            "R": 150,
        }
    enc.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
