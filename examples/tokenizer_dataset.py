"""End-to-end example: context-window dataset with a learned tokenizer.

Run: python examples/tokenizer_dataset.py   (reads testdata, prints a report)

Chains the round-3 operator families: SemDeDup semantic dedup over the
embedding table → unit-level first-occurrence dedup of the surviving
text → fixed-token-budget chunking → BPE tokenizer trained on the
clean corpus → per-chunk subword counts → weighted PPS sample of
chunks (longer chunks drawn proportionally more often) — the assembly
line that turns a raw scrape + embeddings into tokenizer-ready context
windows, here on the sf0.001 tables.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.bpe import (
    bpe_token_count,
    bpe_train,
    word_freqs,
)
from architrave_project_apache_nifi_spark.operators.chunking import (
    chunk_documents,
    dedup_units,
    derived_units,
    reassemble,
)
from architrave_project_apache_nifi_spark.operators.sampling import weighted_sample
from architrave_project_apache_nifi_spark.operators.semdedup import semdedup_prune
from architrave_project_apache_nifi_spark.session import get_spark


def main() -> None:
    spark = get_spark("example-tokenizer", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n0 = docs.count()

    # 1. semantic dedup on the embedding side (doc_id == vec_id here)
    kept = semdedup_prune(emb, "vec_id", "embedding", k=8, threshold=0.35)
    docs = docs.join(
        kept.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    n1 = docs.count()

    # 2. unit-level first-occurrence dedup (10-token derived units)
    units = derived_units(docs, "doc_id", "text", unit_tokens=10)
    clean = reassemble(dedup_units(units, "doc_id"), "doc_id", " ")
    n2 = clean.count()

    # 3. train the tokenizer on the CLEAN corpus (dedup before counting
    # frequencies, or duplicated text skews the merges)
    merges = bpe_train(word_freqs(clean, "text"), n_merges=100)

    # 4. chunk into overlapping context windows, count subwords per chunk
    chunks = chunk_documents(clean, "doc_id", "text", size=32, stride=24)
    counted = bpe_token_count(chunks, "chunk_text", merges)
    n3 = counted.count()

    # 5. weighted sample: longer chunks proportionally more often
    counted = counted.withColumn(
        "chunk_uid", F.col("doc_id") * 10_000 + F.col("chunk_id")
    )
    sample = weighted_sample(
        counted.withColumn("w", F.col("n_bpe_tokens").cast("double")),
        "chunk_uid",
        "w",
        min(200, n3),
    )
    n4 = sample.count()
    total_tokens = sample.agg(F.sum("n_bpe_tokens")).collect()[0][0]

    # 6. BYTE-level (GPT-2-style) recount (r12): production budgets are
    # specified in model tokens — byte-level BPE counts every byte
    # (no OOV, case preserved, spaces ride inside the pretoken), so
    # the same sample costs differently than the word-level count
    from architrave_project_apache_nifi_spark.operators.bpe import (
        byte_bpe_token_count,
        byte_bpe_train,
        byte_word_freqs,
    )

    bmerges = byte_bpe_train(byte_word_freqs(clean, "text"), n_merges=100)
    bcounted = byte_bpe_token_count(
        sample.drop("n_bpe_tokens"), "chunk_text", bmerges, out_col="n_bytes_bpe"
    )
    total_byte_tokens = bcounted.agg(F.sum("n_bytes_bpe")).collect()[0][0]

    print(f"documents in: {n0}")
    print(f"after semantic dedup: {n1}")
    print(f"after unit dedup: {n2}")
    print(f"learned merges: {len(merges)} (first: {merges[0]})")
    print(f"context windows: {n3}")
    print(f"sampled windows: {n4} carrying {total_tokens} BPE tokens")
    print(
        f"byte-level recount: {total_byte_tokens} GPT-2-style tokens "
        "for the same sample"
    )
    spark.stop()


if __name__ == "__main__":
    main()
