"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark document set.

This is the standard eval-leakage guard in LLM training-data pipelines
(n-gram overlap decontamination, typically 8-13-gram): any training
document containing a verbatim n-gram from the held-out benchmark is
flagged (and usually dropped). The reference NiFi flow has no analog —
this is §2.9 LLM-data-pipeline extension surface (SURVEY.md §2.9).

Scale shape (100 TB corpus, small benchmark): benchmark n-gram sets
are tiny relative to the corpus (eval suites are at most millions of
n-grams), so the benchmark side is hashed to 8-byte longs, dedup'd,
and **broadcast** — the corpus never shuffles for the match, and each
corpus partition streams its exploded n-grams against the in-memory
hash set. The only wide operation is the per-document count
aggregation, hash-partitioned on the doc id. If a benchmark set ever
outgrows the broadcast threshold, drop the `broadcast()` hint and the
same plan degrades gracefully to a shuffled hash join.

N-grams are hashed with ``xxhash64`` before the join: matching on the
8-byte hash equals matching on the string up to the accepted 2^-64
per-pair collision odds, and the broadcast table holds longs instead
of n-word strings (~5-10× smaller).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_sets


def _doc_ngram_hashes(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """One row per distinct (doc, n-gram-hash).

    Routed through ``dedup._shingle_sets`` so the hashed distinct-gram
    ARRAY materializes behind an exchange barrier before the explode —
    a bare ``explode(array_distinct(shingles(...)))`` lets Catalyst
    collapse the projection into the generator and re-evaluate the
    whole split+slice+concat tree once per exploded output row
    (the documented 36× trap; measured minutes-vs-seconds at sf1 on
    this operator), and a single-file corpus would additionally run it
    on one input split."""
    shs = _shingle_sets(df, id_col, text_col, n)
    return shs.select(
        F.col("__id").alias(id_col), F.explode("__shs").alias("__gh")
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-corpus-document contamination report: (``doc_id``,
    ``n_ngrams``, ``n_contaminated``, ``is_contaminated``).

    ``n_contaminated`` counts the document's distinct n-grams that
    appear verbatim anywhere in ``benchmark``; ``is_contaminated`` is
    the 0/1 drop flag. One corpus scan, one broadcast join, one
    aggregation shuffle on the doc id.
    """
    bench_g = (
        _doc_ngram_hashes(benchmark, id_col, text_col, n)
        .select("__gh")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus_g = _doc_ngram_hashes(corpus, id_col, text_col, n)
    return (
        corpus_g.join(F.broadcast(bench_g), "__gh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_contaminated",
            (F.col("n_contaminated") > 0).cast("int").alias("is_contaminated"),
        )
    )


def semantic_decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the PARAPHRASE
    complement of :func:`ngram_decontaminate`: n-gram overlap misses a
    benchmark item that was reworded, but its embedding still sits next
    to the benchmark's. Every corpus vector gets its max cosine against
    the benchmark set (rounded, so the flag is reproducible across
    engines) and ``is_contaminated = max_cosine >= threshold``.

    Shape: ``crossJoin(broadcast(bench))`` + one max-agg keyed by the
    corpus id — benchmark suites are thousands of items (a few MB of
    vectors), so the small side broadcasts and the corpus never
    shuffles; per-row work is |bench| dot products inside codegen
    (zip_with/aggregate — no Python). This is the EXACT baseline; at
    100 TB with a large benchmark union, prune candidates first with
    the ANN family (ivf/pq probe against the bench set) and run this
    exact pass on survivors only — same compose-then-verify pattern as
    LSH→verify dedup."""
    from .similarity import _unit

    # An empty benchmark makes the crossJoin yield ZERO rows — every
    # corpus doc would silently vanish from the output instead of
    # scoring 0.0. That is never what a decontamination pass means;
    # fail loudly (mirrors pq_topk's empty-query guard). bench is
    # broadcast-small by contract, so the extra action is one tiny job.
    if bench.isEmpty():
        raise ValueError(
            "semantic_decontaminate: empty benchmark set — the "
            "crossJoin would drop every corpus doc; pass >=1 bench row"
        )

    # Normalize each side ONCE, before the join — not per (corpus ×
    # bench) pair, which would redo the norm aggregate |bench| times
    # per row — and via _unit, whose zero-norm contract (a padding row
    # / failed encoder stays the zero vector) makes the cosine 0.0
    # instead of a NULL that would drop the doc from BOTH routes of an
    # is_contaminated == 0/1 filter downstream.
    left = corpus.select(
        F.col(id_col), _unit(F.col(vec_col)).alias("__cu")
    )
    right = F.broadcast(
        bench.select(_unit(F.col(vec_col)).alias("__bu"))
    )
    cos = F.aggregate(
        F.zip_with(F.col("__cu"), F.col("__bu"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # A NULL corpus embedding (a failed encoder can emit NULL as easily
    # as a zero vector) makes every pairwise cosine NULL, so the max
    # aggregates to NULL and is_contaminated would be NULL — the very
    # both-routes-of-a-filter drop the zero-norm contract exists to
    # prevent. Coalesce the per-doc max to 0.0 so every input id
    # appears with a definite 0/1 flag.
    scored = (
        left.crossJoin(right)
        .groupBy(id_col)
        .agg(
            F.round(
                F.coalesce(F.max(cos), F.lit(0.0)), round_digits
            ).alias("max_cosine")
        )
    )
    return scored.select(
        id_col,
        "max_cosine",
        (F.col("max_cosine") >= threshold).cast("int").alias("is_contaminated"),
    )
