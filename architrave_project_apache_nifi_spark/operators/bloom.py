"""Broadcast bitmap (Bloom-style) runtime join filter (SURVEY.md §2.7
"custom rules needed vs built-in" — the engine-level counterpart of
Spark's own runtime row-level filtering, expressed with public
DataFrame ops so the plan is assertable and portable).

Problem shape at 100 TB: ``fact ⋈ dim`` where the dim is too big to
broadcast-join outright but its KEY SET is small after filtering.
Shuffling the full fact to discover that 95% of its rows have no
partner is the single biggest avoidable cost in a selective join.
Fix: build a compact bitmap over ``hash(key) mod m`` from the dim
side (one partial-aggregatable hash agg → at most ``m/64`` longs),
broadcast it, and semi-filter the fact BEFORE its exchange. False
positives only ever let extra rows through to the real join (which
removes them) — the composed result is bit-identical to the plain
join, which is exactly what the DuckDB oracle checks.

The filter itself is one broadcast hash join on the word index + a
bit test — JVM codegen end to end, no UDFs, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Default 2^20 bits = 16 K longs ≈ 128 KB broadcast — negligible.
# With k=1 hash, fp ≈ n_keys / m: <1% up to ~10^4 distinct keys,
# ~10% at 10^5. Size m_bits ≥ 100 × n_keys for a <1% rate; false
# positives only cost extra rows into the real join, never wrong
# results.
DEFAULT_M_BITS = 1 << 20


def _slot(key: Column, m_bits: int) -> tuple[Column, Column]:
    h = F.pmod(F.xxhash64(key), F.lit(m_bits))
    return (h / 64).cast("long").alias("__word"), F.pmod(h, F.lit(64)).alias("__bit")


def keyset_bitmap(dim: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """(``__word``, ``__mask``) — the set bits of ``hash(key) mod m``
    packed 64 per row. At most ``m/64`` rows regardless of dim size;
    the aggregation is map-side partial (bit_or is associative), so
    the exchange moves at most ``m/64`` rows per task."""
    word, bit = _slot(F.col(key_col), m_bits)
    # shiftleft with a COLUMN shift amount needs the SQL form (the
    # Python helper only accepts a literal int).
    return (
        dim.select(word, bit)
        .groupBy("__word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bit AS INT))")
            ).alias("__mask")
        )
    )


def bloom_prune(
    fact: DataFrame,
    bitmap: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Drop fact rows whose key cannot exist in the dim: broadcast
    join the (word → mask) table and test the bit. Inner join on the
    word is the membership test's first half (a missing word means no
    dim key hashed anywhere in those 64 slots); the bit test is the
    second. Map-only relative to the fact — no fact exchange."""
    word, bit = _slot(F.col(key_col), m_bits)
    pruned = (
        fact.withColumn("__word", word)
        .withColumn("__bit", bit)
        .join(F.broadcast(bitmap), "__word")
        .filter(F.expr("(shiftright(__mask, CAST(__bit AS INT)) & 1) = 1"))
        .drop("__word", "__bit", "__mask")
    )
    return pruned


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    how: str = "inner",
) -> DataFrame:
    """``fact ⋈ dim`` with the fact side pre-pruned by the dim's key
    bitmap. Equivalent to the plain join for ``inner``/``left_semi``
    (false positives are removed by the join itself; true keys are
    never filtered — the bitmap is exact-or-over-inclusive by
    construction). Asymptotics: the fact exchange now carries only
    rows whose key *might* match — for a 1%-selective dim that is a
    ~100× smaller shuffle bought with a 128 KB broadcast."""
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom_pruned_join only preserves semantics for inner/left_semi "
            f"joins (got {how!r}): outer joins must keep unmatched fact rows, "
            "which the prune would drop."
        )
    bitmap = keyset_bitmap(dim, dim_key, m_bits)
    pruned = bloom_prune(fact, bitmap, fact_key, m_bits)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
