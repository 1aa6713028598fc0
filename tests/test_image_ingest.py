"""Streaming perceptual-image near-dup ingest
(streaming/image_ingest.py r12): cross-batch store screen, within-batch
transitive resolution, replay idempotency, streaming wrapper — the
image twin of test_neardup_ingest.py, over the deterministic
perturbed-duplicates fixture (group members are within 1 dHash bit;
distinct groups sit far apart)."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.imagehash import (
    FIXTURE,
    synthetic_neardup_media,
)
from architrave_project_apache_nifi_spark.streaming.image_ingest import (
    ingest_image_batch,
    read_image_corpus,
    run_image_ingest_stream,
)

GS = FIXTURE["group_size"]


def _media(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return synthetic_neardup_media(df)


def test_within_batch_keeps_one_per_group(spark, tmp_path):
    root = str(tmp_path / "store")
    # groups 0..4, all four variants each — transitive min-id keeps
    # exactly the group minimum
    ingest_image_batch(_media(spark, range(20)), root, "doc_id", 0)
    kept = {r["doc_id"] for r in read_image_corpus(spark, root).collect()}
    assert kept == {g * GS for g in range(5)}


def test_store_screen_drops_cross_batch_neardups(spark, tmp_path):
    root = str(tmp_path / "store")
    # batch 0: first two variants of groups 0..2
    b0 = [g * GS + v for g in range(3) for v in (0, 1)]
    ingest_image_batch(_media(spark, b0), root, "doc_id", 0)
    # batch 1: the REMAINING variants of the same groups (near-dups of
    # stored images) + two fresh groups
    b1 = [g * GS + v for g in range(3) for v in (2, 3)] + list(range(12, 20))
    ingest_image_batch(_media(spark, b1), root, "doc_id", 1)
    kept = {r["doc_id"] for r in read_image_corpus(spark, root).collect()}
    # stored groups contributed only their batch-0 minimum; the late
    # variants screened out against the store
    assert kept == {0, 4, 8, 12, 16}


def test_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "store")
    ingest_image_batch(_media(spark, range(8)), root, "doc_id", 0)
    ingest_image_batch(_media(spark, range(8, 16)), root, "doc_id", 1)
    before = sorted(
        r["doc_id"] for r in read_image_corpus(spark, root).collect()
    )
    # replay batch 1 (the exactly-once contract: its own dirs are
    # excluded from the store reads, then overwritten wholesale)
    ingest_image_batch(_media(spark, range(8, 16)), root, "doc_id", 1)
    after = sorted(
        r["doc_id"] for r in read_image_corpus(spark, root).collect()
    )
    assert before == after == [0, 4, 8, 12]


def test_streaming_wrapper_runs(spark, tmp_path):
    root = str(tmp_path / "store")
    landing = str(tmp_path / "landing")
    media = _media(spark, range(24))
    media.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = media.schema
    stream = spark.readStream.schema(schema).parquet(landing)
    q = run_image_ingest_stream(stream, root, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in read_image_corpus(spark, root).collect()}
    assert kept == {g * GS for g in range(6)}


def test_corpus_rows_keep_payload(spark, tmp_path):
    # the kept corpus rows are the ORIGINAL media rows (payload intact),
    # not just ids — a downstream trainer reads them directly
    root = str(tmp_path / "store")
    ingest_image_batch(_media(spark, range(4)), root, "doc_id", 0)
    row = read_image_corpus(spark, root).select(
        "doc_id", F.octet_length("media.payload").alias("n")
    ).collect()
    assert len(row) == 1 and row[0]["n"] > 0
