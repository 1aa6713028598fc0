"""Streaming near-dup ingest: LSH screening against the accumulated
store, within-batch greedy dedup, replay convergence, torn-dir
crash-consistency, and a recall floor on perturbed documents."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.streaming.neardup_ingest import (
    ingest_batch,
    read_corpus,
    run_neardup_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    # keep docs with enough tokens that a 1-word perturbation stays a
    # near-dup at threshold 0.8 (short docs legitimately fall below it)
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return d.filter(F.size(F.split(F.trim("text"), r"\s+")) >= 30)


def _perturbed(docs, id_offset):
    """Same text + one appended token → Jaccard ≈ n/(n+1) ≥ 0.9."""
    return docs.select(
        (F.col("doc_id") + id_offset).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzperturb")).alias("text"),
    )


def test_neardup_across_batches_dropped_fresh_kept(spark, tmp_path):
    root = str(tmp_path / "store")
    docs = _docs(spark).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 150)
    fresh = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 250))
    neardups = _perturbed(b0.filter(F.col("doc_id") < 40), 10_000)
    b1 = fresh.unionByName(neardups)

    ingest_batch(b0, root, "doc_id", "text", 0)
    n0 = read_corpus(spark, root).count()
    ingest_batch(b1, root, "doc_id", "text", 1)
    corpus = read_corpus(spark, root)

    kept_pert = corpus.filter(F.col("doc_id") >= 10_000).count()
    n_pert = neardups.count()
    # LSH+estimator recall floor: the overwhelming majority of the
    # perturbed twins are recognized as near-dups of batch 0
    assert kept_pert <= n_pert * 0.2, f"{kept_pert}/{n_pert} twins survived"
    # genuinely fresh docs kept — the testdata seeds a handful of real
    # near-dup twins across ranges (est Jaccard ≈ 1.0 vs batch 0, e.g.
    # 176↔26), which SHOULD drop; everything else survives
    kept_fresh = corpus.filter(
        (F.col("doc_id") >= 150) & (F.col("doc_id") < 250)
    ).count()
    assert kept_fresh >= fresh.count() * 0.9
    assert corpus.count() >= n0 + kept_fresh


def test_within_batch_neardups_keep_one(spark, tmp_path):
    root = str(tmp_path / "store")
    docs = _docs(spark).select("doc_id", "text").filter(F.col("doc_id") < 30)
    twins = _perturbed(docs, 50_000)
    batch = docs.unionByName(twins)
    ingest_batch(batch, root, "doc_id", "text", 0)
    corpus = read_corpus(spark, root)
    # originals (lower ids) essentially all kept (the testdata seeds
    # the odd real near-dup pair even among originals); twins dropped
    assert corpus.filter(F.col("doc_id") < 30).count() >= docs.count() - 2
    assert corpus.filter(F.col("doc_id") >= 50_000).count() <= docs.count() * 0.2


def test_replay_converges(spark, tmp_path):
    root = str(tmp_path / "store")
    docs = _docs(spark).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    ingest_batch(b0, root, "doc_id", "text", 0)
    ingest_batch(b1, root, "doc_id", "text", 1)
    before = sorted(r.doc_id for r in read_corpus(spark, root).collect())
    ingest_batch(b1, root, "doc_id", "text", 1)  # crash-replay
    after = sorted(r.doc_id for r in read_corpus(spark, root).collect())
    assert after == before


def test_torn_bands_dir_skipped_until_replay(spark, tmp_path):
    """Crash mid-write of the bands dir: the torn dir must not feed
    candidate generation (its batch never committed); replay restores
    full screening."""
    root = str(tmp_path / "store")
    docs = _docs(spark).select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") < 60)
    ingest_batch(b0, root, "doc_id", "text", 0)
    for sub in ("bands", "sigs"):
        os.remove(os.path.join(root, sub, "batch=0", "_SUCCESS"))
    # batch 1 = twins of b0; with batch 0's index torn they pass screening
    twins = _perturbed(b0, 70_000)
    ingest_batch(twins, root, "doc_id", "text", 1)
    n_leaked = read_corpus(spark, root).filter(F.col("doc_id") >= 70_000).count()
    assert n_leaked >= twins.count() * 0.8  # torn index really was skipped

    # replay batch 0 (its write crashed pre-commit) then re-ingest the
    # twins as a NEW batch: now they screen out
    ingest_batch(b0, root, "doc_id", "text", 0)
    twins2 = _perturbed(b0, 90_000)
    ingest_batch(twins2, root, "doc_id", "text", 2)
    n2 = read_corpus(spark, root).filter(F.col("doc_id") >= 90_000).count()
    assert n2 <= twins2.count() * 0.2


def test_streaming_wrapper_runs(spark, tmp_path):
    root = str(tmp_path / "store")
    landing = str(tmp_path / "landing")
    docs = _docs(spark).select("doc_id", "text").filter(F.col("doc_id") < 80)
    docs.coalesce(1).write.mode("overwrite").parquet(landing)
    stream = spark.readStream.schema("doc_id long, text string").parquet(landing)
    q = run_neardup_ingest_stream(
        stream, root, str(tmp_path / "ckpt"), "doc_id", "text"
    )
    q.awaitTermination(120)
    # within-batch screen may drop the odd seeded near-dup pair
    assert read_corpus(spark, root).count() >= docs.count() - 2


def test_minhash_index_bands_equal_batch_lsh_band_keys(spark):
    """The streaming store's band keys (minhash_index, computed from
    the materialized signature) must be IDENTICAL to the batch path's
    (minhash_lsh_candidates, folded straight from the shingle array) —
    else a streaming-ingested corpus and a batch-deduped corpus would
    disagree on candidates. Both fold xxhash64 chains over the same
    per-band minima; this pins that they can't drift apart."""
    from architrave_project_apache_nifi_spark.operators.dedup import (
        _shingle_sets,
        minhash_index,
    )
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    num_hashes, bands, rpb = 64, 16, 4
    via_index = (
        minhash_index(docs, "doc_id", "text", num_hashes, bands)
        .select("doc_id", F.posexplode("bands").alias("band", "h"))
    )
    # replicate minhash_lsh_candidates' internal band fold verbatim
    shs = _shingle_sets(docs, "doc_id", "text", 3)
    direct_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.aggregate(
            F.transform(
                F.sequence(b * rpb, (b + 1) * rpb - 1),
                lambda i: F.array_min(
                    F.transform(F.col("__shs"), lambda h: F.xxhash64(h, i))
                ),
            ),
            F.lit(0).cast("long"),
            lambda acc, m: F.xxhash64(acc, m),
        ),
    )
    via_direct = shs.select(
        F.col("__id").alias("doc_id"), direct_arr.alias("bands")
    ).select("doc_id", F.posexplode("bands").alias("band", "h"))

    a = {(r.doc_id, r.band, r.h) for r in via_index.collect()}
    b = {(r.doc_id, r.band, r.h) for r in via_direct.collect()}
    assert a == b


def test_within_batch_chain_keeps_component_min(spark, tmp_path):
    """Transitive resolution (ADVICE r4): doc C bridges A and B (C is
    near-dup of both; A !~ B). The pre-fix per-pair rule ("higher id of
    every verified pair drops") kept BOTH A and B; connected-components
    resolution keeps exactly one representative (the min id) per
    near-dup cluster — the dedup_cluster_canonical convention."""
    a_text = " ".join(f"alpha{i}" for i in range(40))
    b_text = " ".join(f"beta{i}" for i in range(40))
    c_text = a_text + " " + b_text
    # shingle-space Jaccard: J(A,C)=J(B,C)=38/78≈0.49, J(A,B)=0.
    uniques = [
        (100 + i, " ".join(f"uniq{i}_{j}" for j in range(40)))
        for i in range(8)
    ]
    batch = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, c_text), *uniques],
        "doc_id LONG, text STRING",
    )
    root = str(tmp_path / "store")
    ingest_batch(
        batch, root, "doc_id", "text", 0,
        threshold=0.35, num_hashes=128, bands=64,
    )
    kept = {r.doc_id for r in read_corpus(spark, root).collect()}
    assert kept == {1, *(100 + i for i in range(8))}, kept
