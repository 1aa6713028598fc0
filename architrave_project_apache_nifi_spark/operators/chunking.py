"""Document chunking + unit-level (line/paragraph) dedup
(driver-mandated extension family, SURVEY.md §2.9: training-data
pipeline operators).

Two classic pretraining-corpus transforms the reference has no
equivalent for (its unit of work is a whole CDC event row —
FT:4295-4301 pins one event per FlowFile):

- ``chunk_documents``: split each document into fixed-token-budget
  (optionally overlapping) context windows — the "pack long docs into
  model context" step that precedes tokenization.
- ``split_units`` / ``dedup_units`` / ``reassemble``: explode documents
  into ordered units (lines / paragraphs / derived token groups), keep
  only the globally-first occurrence of each distinct unit (C4-style
  line-level dedup), and rebuild the surviving text in original order.

Everything is pure Column expressions (codegen, zero UDFs) and every
formula is ANSI-SQL-expressible so the DuckDB oracle can replay it
exactly (queries.py pairs each registry entry with its oracle).

Scale notes (100 TB): chunking is a map-side 1→N generator — no
shuffle at all; its output row count is bounded by
``ceil(tokens/stride)`` per doc. Unit dedup shuffles one row per UNIT
twice (window keep-first over the unit hash, then re-group by doc) —
the shuffle key is an 8-byte ``xxhash64`` of the unit, never the unit
text, and re-assembly groups by doc id, so both exchanges are
row-sized. No collect, no state on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 16,
    stride: int = 8,
) -> DataFrame:
    """Fixed-token-budget context windows: chunk ``c`` starts at token
    offset ``c * stride`` (0-based) and carries the next ``size``
    whitespace tokens (the final chunks are shorter when the document
    runs out). ``stride < size`` gives overlapping windows (the usual
    eval-harness setting); ``stride == size`` gives a partition.

    Output: (id, chunk_id, chunk_text, n_tokens) — one row per chunk,
    ordered-by-construction via ``chunk_id``.

    Plan: ``sequence(0, n-1, stride)`` + ``posexplode`` is a map-side
    generator; the whole operator is one narrow stage, no exchange.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("chunk_documents: size and stride must be positive")
    # split('') yields [''] — filter empty tokens so an empty or
    # whitespace-only document carries ZERO tokens (consistent with
    # bpe_token_count) and emits ZERO chunks, not one empty chunk.
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))
    starts = F.when(
        F.size(toks) > 0,
        F.sequence(F.lit(0), F.size(toks) - 1, F.lit(stride)),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, size)
    return out.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("int").alias("n_tokens"),
    )


def split_units(
    df: DataFrame, id_col: str, text_col: str, sep_regex: str = r"\n"
) -> DataFrame:
    """Explode a document into ordered units (lines by default,
    paragraphs with ``sep_regex=r"\\n\\n"``): (id, pos, unit). Empty
    units (consecutive separators, leading/trailing) are kept so
    ``reassemble`` can round-trip the text exactly; callers that want
    them gone filter ``unit != ''``. Map-side generator, no shuffle."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep_regex)).alias("pos", "unit"),
    )


def derived_units(
    df: DataFrame, id_col: str, text_col: str, unit_tokens: int = 10
) -> DataFrame:
    """Units for corpora with no line structure: consecutive
    ``unit_tokens``-token groups (a non-overlapping chunking) as the
    dedup unit — the standard fallback when scraped text arrives
    whitespace-flattened. Same output contract as ``split_units``."""
    return chunk_documents(
        df, id_col, text_col, size=unit_tokens, stride=unit_tokens
    ).select(
        F.col(id_col),
        F.col("chunk_id").alias("pos"),
        F.col("chunk_text").alias("unit"),
    )


def dedup_units(units: DataFrame, id_col: str) -> DataFrame:
    """Global first-occurrence unit dedup (C4 line-dedup semantics):
    for each distinct unit string, the single occurrence with the
    smallest (doc id, pos) survives; every other occurrence anywhere in
    the corpus is dropped. Deterministic — (id, pos) is unique.

    The window partitions by ``xxhash64(unit)`` so the exchange moves
    an 8-byte key + row ids, not unit text (collision odds 2^-64 —
    the accepted rate everywhere else in the dedup family)."""
    w = Window.partitionBy(F.xxhash64(F.col("unit"))).orderBy(
        F.col(id_col), F.col("pos")
    )
    return (
        units.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def reassemble(
    units: DataFrame, id_col: str, sep: str = "\n"
) -> DataFrame:
    """Rebuild (id, text) from surviving units in original ``pos``
    order: sort_array over (pos, unit) structs keeps the order stable
    inside one hash-agg — one shuffle keyed by doc id. Documents whose
    every unit was dropped vanish (standard C4 behavior)."""
    return (
        units.groupBy(F.col(id_col))
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("pos"), F.col("unit")))
                    ),
                    lambda s: s["unit"],
                ),
                sep,
            ).alias("text"),
            F.count(F.lit(1)).cast("int").alias("n_units"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep_regex: str = r"\n",
    sep: str = "\n",
) -> DataFrame:
    """The composed pipeline: split → global first-occurrence dedup →
    reassemble. Two row-sized shuffles total (unit-hash window, doc-id
    regroup); text moves through the exchanges only as the surviving
    unit strings."""
    units = split_units(df, id_col, text_col, sep_regex).filter(F.col("unit") != "")
    return reassemble(dedup_units(units, id_col), id_col, sep)
