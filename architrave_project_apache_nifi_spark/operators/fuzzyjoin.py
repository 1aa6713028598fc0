"""Blocked fuzzy join (record linkage / entity resolution on edit
distance) — driver-mandated extension family, SURVEY.md §2.9.

The reference's only join is an exact key lookup (LookupRecord,
FT §2.4); a standalone engine also needs the approximate form: match
records whose string keys differ by typos ("Jon Smith" ↔ "John
Smith"). All-pairs edit distance is O(n²) — the classic solution is
BLOCKING: compare only pairs sharing at least one cheap block key,
then verify candidates with the exact distance. This is the same
candidates→verify architecture as the MinHash-LSH family
(`dedup.py`), applied to edit distance:

- candidate generation: one equi-join per blocking key (prefix,
  suffix, length band, phonetic…), unioned and deduped — every join
  is a plain hash join on a short key, never a cartesian product;
- verification: `levenshtein` (JVM codegen; ANSI-SQL — the DuckDB
  oracle runs the identical function) ≤ max_dist.

Blocking is recall-lossy by construction (a pair sharing NO block key
is never compared). The loss is measured, not assumed: the tests
compute recall against brute-force all-pairs on test data, and
`block_prefix`/`block_suffix`/`block_length_band` compose so callers
can buy recall with more passes — the standard multi-pass blocking
design from the record-linkage literature (Fellegi-Sunter tradition).

Scale notes: each blocking pass shuffles one row per record keyed by
a ≤8-byte block key; candidate verification is linear in candidates.
Skewed blocks (every name starting with "a") are ordinary skewed
joins — `operators/skew.py` salting applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_prefix(col: Column, n: int = 3) -> Column:
    """First-n-characters block key (catches typos past position n)."""
    return F.substring(col, 1, n)


def block_suffix(col: Column, n: int = 3) -> Column:
    """Last-n-characters block key (catches typos before the tail)."""
    return F.substring(col, -n, n)


def block_length_band(col: Column, band: int = 4) -> Column:
    """Length-band key: |len(a) − len(b)| ≤ d pairs with d < band can
    only straddle adjacent bands — pair with prefix/suffix keys for a
    cheap necessary-condition pass."""
    return F.floor(F.length(col) / band)


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    blockers: list | None = None,
) -> DataFrame:
    """Self-join: pairs (id_a < id_b) whose ``text_col`` values are
    within ``max_dist`` edits AND share at least one block key.
    Output: (id_a, id_b, text_a, text_b, dist).

    ``blockers`` is a list of Column-functions (default: 3-prefix and
    3-suffix). Candidates from all passes are unioned and deduped
    BEFORE verification, so each surviving pair pays levenshtein
    once."""
    if blockers is None:
        blockers = [block_prefix, block_suffix]
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    )
    cand = None
    for blk in blockers:
        a = base.select("__id", "__t", blk(F.col("__t")).alias("__k"))
        b = a.select(
            F.col("__id").alias("__id2"),
            F.col("__t").alias("__t2"),
            F.col("__k"),
        )
        pairs = a.join(b, "__k").filter(F.col("__id") < F.col("__id2")).select(
            "__id", "__id2", "__t", "__t2"
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    verified = (
        cand.distinct()
        .withColumn("dist", F.levenshtein(F.col("__t"), F.col("__t2")))
        .filter(F.col("dist") <= max_dist)
    )
    return verified.select(
        F.col("__id").alias("id_a"),
        F.col("__id2").alias("id_b"),
        F.col("__t").alias("text_a"),
        F.col("__t2").alias("text_b"),
        F.col("dist").cast("int"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 2,
    blockers: list | None = None,
) -> DataFrame:
    """Two-table fuzzy equi-join on edit distance: every (left, right)
    pair sharing a block key and within ``max_dist`` edits. Columns of
    both inputs survive (left's then right's; name collisions are the
    caller's to resolve beforehand, as with any Spark join)."""
    if blockers is None:
        blockers = [block_prefix, block_suffix]
    overlap = set(left.columns) & set(right.columns)
    if overlap:
        raise ValueError(
            f"fuzzy_join: rename overlapping columns first: {sorted(overlap)}"
        )
    cand = None
    for blk in blockers:
        a = left.withColumn("__k", blk(F.col(left_col)))
        b = right.withColumn("__k", blk(F.col(right_col)))
        pairs = a.join(b, "__k").drop("__k")
        cand = pairs if cand is None else cand.unionByName(pairs)
    return (
        cand.distinct()
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col(right_col)))
        .filter(F.col("dist") <= max_dist)
    )
