"""Property tests for the dedup family (SURVEY.md §2.9).

The approximate operators (minhash-LSH, simhash) have no SQL oracle —
these tests pin their contracts instead: LSH candidates must cover the
high-Jaccard pairs found by the exact operator, identical docs must
always collide, and unrelated docs must not.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import dedup as dd

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_dedup_exact_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id LONG, text STRING"
    )
    rows = {r.keep_id: r.n_copies for r in dd.dedup_exact(df, "text", "doc_id").collect()}
    assert rows == {1: 2, 3: 1}


def test_shingles_short_text_falls_back_to_whole_text(spark):
    df = spark.createDataFrame([(1, "one"), (2, "")], "doc_id LONG, text STRING")
    out = df.select(dd.shingles(F.col("text"), 3).alias("s")).collect()
    assert out[0].s == ["one"]
    assert out[1].s == [""]


def test_minhash_identical_docs_always_collide(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "completely different words entirely here now")],
        "doc_id LONG, text STRING",
    )
    pairs = {(r.id_a, r.id_b) for r in
             dd.minhash_lsh_candidates(df, "doc_id", "text", 64, 16, 2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_covers_exact_high_jaccard_pairs(spark):
    """Recall contract: with 16 bands of 4 rows, a pair at J≥0.8 has
    collision probability 1-(1-J^4)^16 ≥ 0.9998 — on the test corpus
    every exact pair at that threshold must be a candidate."""
    docs = _docs(spark)
    exact = {
        (r.id_a, r.id_b)
        for r in dd.ngram_jaccard_pairs(docs, "doc_id", "text", 0.8, 2).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in dd.minhash_lsh_candidates(docs, "doc_id", "text", 64, 16, 2).collect()
    }
    assert exact <= cand, f"missed pairs: {exact - cand}"


def test_ngram_jaccard_values_and_ordering(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "p q r s")], "doc_id LONG, text STRING"
    )
    # bigrams: doc1 {ab,bc,cd}, doc2 {ab,bc,ce}: |∩|=2, |∪|=4 → J=0.5
    rows = dd.ngram_jaccard_pairs(df, "doc_id", "text", 0.1, 2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert abs(r.jaccard - 0.5) < 1e-9


def test_simhash_identical_text_same_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon zeta")],
        "doc_id LONG, text STRING",
    )
    fp = {r.doc_id: r.simhash for r in dd.simhash(df, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]
    groups = dd.simhash_dup_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1 and groups[0].n_docs == 2 and groups[0].keep_id == 1


def test_embedding_neardup_matches_manual_cosine(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.1], 0),
            (3, [0.0, 1.0], 0),
            (4, [1.0, 0.0], 1),  # other block — never paired with 1
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )
    rows = {
        (r.id_a, r.id_b): r.cosine
        for r in dd.embedding_neardup_pairs(df, "vec_id", "embedding", 0.9, "label").collect()
    }
    assert set(rows) == {(1, 2)}
    import math

    expected = 1.0 / math.sqrt(1.01)
    assert abs(rows[(1, 2)] - round(expected, 6)) < 1e-9

def test_embedding_neardup_unblocked_guard(spark):
    """block_col=None over a big input must raise (one O(n²) gram
    matrix on one executor), small inputs still work, and an explicit
    bound override disarms the guard."""
    import pytest

    big = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="block_col"):
        dd.embedding_neardup_pairs(
            big, "vec_id", "embedding", 0.9, max_unblocked_rows=10
        )
    small = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.1])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    assert (
        len(dd.embedding_neardup_pairs(small, "vec_id", "embedding", 0.9).collect())
        == 1
    )
    # explicit override runs the unblocked path on the "big" input
    assert (
        dd.embedding_neardup_pairs(
            big, "vec_id", "embedding", 0.9, max_unblocked_rows=100
        ).count()
        > 0
    )
