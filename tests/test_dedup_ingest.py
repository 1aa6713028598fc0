"""Streaming dedup-ingest: corpus accumulates only first-seen texts
across micro-batches, replay converges, restart resumes from offsets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.streaming.dedup_ingest import (
    ingest_batch,
    read_corpus,
    read_fingerprints,
    run_dedup_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _write_landing(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_ingest_batches_dedup_across_and_within(spark, tmp_path):
    root = str(tmp_path / "store")
    docs = _docs(spark)
    b0 = docs.filter(F.col("doc_id") < 200)
    # Batch 1 re-carries 50 batch-0 docs under new ids (cross-batch
    # dups) plus genuinely new ones.
    dups = (
        docs.filter(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + 10_000)
    )
    b1 = docs.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 400)).unionByName(
        dups
    )
    ingest_batch(b0, root, "doc_id", "text", 0)
    ingest_batch(b1, root, "doc_id", "text", 1)

    corpus = read_corpus(spark, root)
    # No text appears twice in the accumulated corpus.
    assert corpus.groupBy("text").count().filter(F.col("count") > 1).isEmpty()
    # None of the re-carried dup ids survived.
    assert corpus.filter(F.col("doc_id") >= 10_000).isEmpty()
    # Store fingerprints == distinct kept texts.
    fps = read_fingerprints(spark, root)
    assert fps.count() == corpus.count()


def test_ingest_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "store")
    docs = _docs(spark)
    b0 = docs.filter(F.col("doc_id") < 100)
    ingest_batch(b0, root, "doc_id", "text", 0)
    before = sorted(r["doc_id"] for r in read_corpus(spark, root).collect())
    # Crash-replay of the same micro-batch id converges, not duplicates.
    ingest_batch(b0, root, "doc_id", "text", 0)
    after = sorted(r["doc_id"] for r in read_corpus(spark, root).collect())
    assert before == after


def test_stream_restart_resumes_and_dedups(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark)
    schema = docs.schema

    _write_landing(docs.filter(F.col("doc_id") < 150), landing + "/f0")
    stream = spark.readStream.schema(schema).parquet(landing + "/*")
    q = run_dedup_ingest_stream(stream, root, ckpt)
    q.awaitTermination(120)

    n_first = read_corpus(spark, root).count()
    assert n_first > 0

    # Second tranche: 50 exact re-sends (same text, shifted ids) + new.
    resend = (
        docs.filter(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + 20_000)
    )
    fresh = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 250))
    _write_landing(resend.unionByName(fresh), landing + "/f1")

    stream2 = spark.readStream.schema(schema).parquet(landing + "/*")
    q2 = run_dedup_ingest_stream(stream2, root, ckpt)
    q2.awaitTermination(120)

    corpus = read_corpus(spark, root)
    # Restart consumed only the new files (offsets) and deduped the
    # re-sent texts against the store from the first run.
    assert corpus.filter(F.col("doc_id") >= 20_000).isEmpty()
    assert corpus.count() == n_first + fresh.count()
    assert corpus.groupBy("text").count().filter(F.col("count") > 1).isEmpty()
