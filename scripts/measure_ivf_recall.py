#!/usr/bin/env python
"""Recall@10 vs nprobe for the IVF index on the CLUSTERED embedding
corpus (scripts/gen_scale.py clustered), with the MEASURED scan
fraction (probed cell sizes / corpus, not the idealized nprobe/nlist).
Prints one JSON line; numbers recorded in BASELINE.md §IVF recall.

The regular embeddings table is isotropic random — on it any
space-partitioning index degenerates to recall ≈ scan fraction, which
is a data property, not an index property. This sweep is the honest
recall claim for the clustered shape real encoders produce.
"""
from __future__ import annotations

import json
import statistics
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from architrave_project_apache_nifi_spark.operators import similarity as sim  # noqa: E402
from architrave_project_apache_nifi_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/repo/.localdata/sf1"
K = 10
NLIST = 64
N_QUERIES = 50


def main() -> None:
    spark = get_spark("ivf-recall")
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
    index = sim.ivf_build(emb, nlist=NLIST)
    sizes = {
        r.list_id: r.n
        for r in index.assigned.groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    C = np.array(index.centroids)
    qvecs = {r.query_id: np.array(r.embedding) for r in queries.collect()}

    out = {"n": n, "nlist": NLIST, "k": K, "sweep": {}}
    for nprobe in (1, 2, 4, 8, 16):
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.ivf_probe(index, queries, k=K, nprobe=nprobe).collect()
        }
        recall = sum(1 for p in brute_pairs if p in got) / len(brute_pairs)
        fracs = []
        for q in qvecs.values():
            qn = q / np.linalg.norm(q)
            d2 = ((qn - C) ** 2).sum(axis=1)
            cells = np.argsort(d2, kind="stable")[:nprobe]
            fracs.append(sum(sizes.get(int(c), 0) for c in cells) / n)
        out["sweep"][nprobe] = {
            "recall_at_10": round(recall, 3),
            "scan_frac": round(statistics.mean(fracs), 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
