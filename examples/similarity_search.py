"""End-to-end example: embedding similarity search, exact and indexed.

Run: python examples/similarity_search.py

1. EXACT: brute-force top-k (cosine / dot / l2) — the baseline every
   approximate result is measured against.
2. INDEXED: build the IVF index ONCE (spherical k-means lists), save
   it as a partitioned-parquet artifact, reload, and probe — the
   query path never trains and scans only its probed cells.
3. NEAR-DUP: cosine near-duplicate pairs within LSH buckets.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import dedup as dd
from architrave_project_apache_nifi_spark.operators import similarity as sim
from architrave_project_apache_nifi_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-sim", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    print("— exact top-3 (cosine) —")
    sim.brute_force_topk(emb, queries, k=3).show()
    print("— exact top-3 (dot product / MIPS) —")
    sim.brute_force_topk(emb, queries, k=3, metric="dot").show()

    with tempfile.TemporaryDirectory() as d:
        index = sim.ivf_build(emb, nlist=16)
        sim.ivf_save(index, f"{d}/index")
        loaded = sim.ivf_load(spark, f"{d}/index")
        print("— IVF probe of the reloaded on-disk index (nprobe=4) —")
        sim.ivf_probe(loaded, queries, k=3, nprobe=4).show()

        # 2b. IVF×PQ: the production composition — codebooks train on a
        # bounded sample, the corpus becomes (cell, m-byte code) rows,
        # probes ADC-score only their nprobe cells' codes. Both
        # artifacts reload from disk; the serving path never retrains.
        from architrave_project_apache_nifi_spark.operators import (
            quantization as pq,
        )

        cb = pq.pq_train(emb, "vec_id", "embedding", m=8, ksub=16)
        pq.pq_save(spark, cb, f"{d}/codebooks")
        cb = pq.pq_load(spark, f"{d}/codebooks")
        codes = pq.ivfpq_encode(emb, "vec_id", "embedding", loaded, cb)
        codes.write.partitionBy("list_id").parquet(f"{d}/codes")
        codes_disk = spark.read.parquet(f"{d}/codes")
        print("— IVF×PQ ADC probe of the on-disk codes table (nprobe=4) —")
        pq.ivfpq_topk(
            codes_disk, queries, loaded, cb, "vec_id", k=3, nprobe=4
        ).show()
        index.assigned.unpersist()

    print("— cosine near-dup pairs within LSH buckets —")
    bucketed = sim.lsh_bucket(emb, "embedding", n_planes=6)
    dd.embedding_neardup_pairs(
        bucketed, "vec_id", "embedding", threshold=0.3, block_col="bucket"
    ).show(10)


if __name__ == "__main__":
    main()
