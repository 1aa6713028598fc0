"""Keyword search (BM25) + reciprocal-rank fusion — hybrid retrieval
over the corpus: the lexical complement to the vector path
(`similarity.py`), fused the standard way (RRF), so the engine serves
the retrieve-side of a RAG stack end-to-end.

BM25 (Robertson et al.; the Lucene-practical variant — public):

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    idf(t) = ln( (N − df + 0.5) / (df + 0.5) + 1 )

RRF (Cormack et al., 2009 — public): fused(d) = Σ_lists 1/(K + rank_d)
— rank fusion with no score calibration needed, which is exactly why
it is the default hybrid combiner.

Scale notes: document length + term frequencies are one tokenize pass
(map-side explode + partial agg); df and avgdl are tiny aggregates
broadcast back; scoring is map-only per document; top-k is distributed
TakeOrdered. The query terms ship as literals — no corpus join against
a query table until you batch queries (then it is one broadcast join).
Fusion joins two ≤k-row rank lists — driver-trivial at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(id, score) for every document with a non-zero BM25 score
    against ``query_terms``. Stats (df per term, avgdl, N) come from
    the scored corpus itself — freeze them on a reference corpus and
    pass precomputed stats for incremental serving (same formula)."""
    if not query_terms:
        raise ValueError("bm25_scores: empty query")
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # per-term document frequency: one pass, term-presence flags summed
    df_aggs = [
        F.sum(
            F.array_contains(F.col("__toks"), t).cast("int")
        ).alias(f"__df_{i}")
        for i, t in enumerate(query_terms)
    ]
    dfs = base.agg(*df_aggs)
    scored = base.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfs))
    score = F.lit(0.0)
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter(F.col("__toks"), lambda x: x == F.lit(t))).cast(
            "double"
        )
        idf = F.log(
            (F.col("__n") - F.col(f"__df_{i}") + 0.5)
            / (F.col(f"__df_{i}") + 0.5)
            + 1.0
        )
        denom = tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        score = score + idf * tf * (k1 + 1) / denom
    return (
        scored.withColumn("score", score)
        .filter(F.col("score") > 0)
        .select(id_col, "score")
    )


def keyword_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k: (id, score, rank). orderBy+limit plans as
    distributed TakeOrdered; ties break by id ascending."""
    s = bm25_scores(docs, query_terms, id_col, text_col)
    top = s.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    # the rank window runs over ≤ k survivor rows
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_const: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion over any number of (id, rank) lists:
    fused score = Σ 1/(k_const + rank); ids absent from a list simply
    contribute nothing from it. Output: (id, rrf_score, rank)."""
    if not ranked_lists:
        raise ValueError("rrf_fuse: no lists")
    if topk is not None and topk <= 0:
        raise ValueError(f"rrf_fuse: topk must be positive, got {topk}")
    parts = [
        r.select(
            F.col(id_col),
            (1.0 / (F.lit(k_const) + F.col(rank_col))).alias("__c"),
        )
        for r in ranked_lists
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    fused = allc.groupBy(id_col).agg(F.sum("__c").alias("rrf_score"))
    out = fused.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
        ),
    )
    return out.filter(F.col("rank") <= topk) if topk is not None else out
