"""Deduplication operators (driver-mandated extension, SURVEY.md §2.9).

Not in the reference (its only uniqueness mechanism is the SCD2
``Is_current`` protocol); these are the dedup family a 100 TB training-
data pipeline needs. All hot paths are native Column expressions —
shingling, hashing, banding all run JVM-side inside codegen; no Python
UDFs.

Scale design:
- exact dedup: one shuffle on the dedup key (hash aggregate).
- MinHash-LSH: signatures are computed map-side (explode shingles →
  one hash-agg per doc), banding converts O(n²) pair search into a
  self-equi-join on (band, band_hash) — only colliding docs meet.
  At 100 TB tune ``num_hashes``/``bands`` and salt hot bands.
- SimHash: one 64-bit fingerprint per doc; near-dups = equal fingerprint
  (or small Hamming distance via band rotation); one shuffle.
- n-gram Jaccard: exact verification on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings: ``transform(sequence(...))``
    stays in codegen; slice+concat_ws builds each shingle."""
    t = tokens(text)
    return F.when(
        F.size(t) < n, F.array(F.concat_ws(" ", t))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per identical text. One hash
    aggregate; at scale pre-hash the text (``xxhash64``) so the shuffle
    key is 8 bytes, not the document."""
    return (
        df.groupBy(F.col(text_col))
        .agg(
            F.min(F.col(id_col)).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per document.

    ``xxhash64(shingle, seed_i)`` per hash function; ``min`` per doc =
    the classic min-wise estimator. Implemented as explode(shingles) →
    one grouped aggregation producing all ``num_hashes`` minima in a
    single shuffle (partial aggregation map-side keeps shuffle volume
    at one row per doc)."""
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh")
    ).dropDuplicates([id_col, "__sh"])
    aggs = [
        F.min(F.xxhash64(F.col("__sh"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH: docs agreeing on any
    full band of ``num_hashes/bands`` minhashes collide. Returns
    distinct (id_a < id_b) pairs."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band),
                            lambda h: h.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    |A∩B| via shingle-equality self-join + count; |A∪B| = |A|+|B|−|A∩B|.
    At 100 TB this runs AFTER LSH candidate generation (pass the
    candidate pairs in and semi-join); standalone it is quadratic only
    in docs sharing a shingle."""
    sh = (
        df.select(F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"))
        .dropDuplicates([id_col, "sh"])
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash fingerprint: per-token 64-bit hash, per-bit majority vote.

    Folds the token-hash list with ``aggregate``/``zip_with`` into a
    64-dim vote vector — all inside codegen, one row per doc, no
    shuffle beyond the final projection."""
    tok_hashes = F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    # One fold over the token hashes producing all 64 bit-votes at once
    # (shift amounts must be Python ints, so the bit loop is unrolled
    # into the expression — still a single pass, still codegen).
    votes = F.aggregate(
        tok_hashes,
        F.array(*[F.lit(0).cast("long") for _ in range(bits)]),
        lambda acc, h: F.array(
            *[
                acc[b]
                + F.when(
                    F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for b in range(bits)
            ]
        ),
    )
    fingerprint = F.lit(0).cast("long")
    for b in range(bits):
        fingerprint = fingerprint.bitwiseOR(
            F.when(votes[b] > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return df.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Docs sharing an identical simhash (near-dup buckets)."""
    s = simhash(df, id_col, text_col)
    return (
        s.groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine similarity.

    ``block_col`` bounds the pair space (compare only within a block —
    a label, an LSH bucket from similarity.lsh_bucket, a shard). The
    dot product is ``aggregate(zip_with(...))`` — JVM-side, left-to-right
    deterministic order (reproducible doubles)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    base = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        (v).alias("__v"),
        norm.alias("__n"),
    )
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    dot = F.aggregate(
        F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sim = dot / (F.col("a.__n") * F.col("b.__n"))
    return (
        a.join(b, cond)
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
