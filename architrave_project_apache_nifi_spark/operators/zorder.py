"""Z-order (Morton-curve) layout for multi-dimensional data skipping.

Sorted layout (`bucketing.write_sorted`) gives tight parquet row-group
min/max on ONE key; queries filtering a second column still scan
everything. Interleaving the bits of two quantized keys (the Morton
code) makes file/row-group bounding boxes small on BOTH dimensions at
once — the standard lakehouse data-skipping layout (public: the
Z-order curve, Morton 1966; used by Delta/Iceberg OPTIMIZE ZORDER).

Everything is pure Column expressions: quantization is closed-form
min/max scaling (the 2-row bounds aggregate broadcasts), and the bit
interleave unrolls to a fixed static expression tree (``bits`` terms,
whole-stage codegen) — ANSI-SQL-replayable, so the code itself is
oracle-checkable.

Scale notes: one bounds agg (2 doubles to the driver) + ONE range
exchange on the code at write — the same budget as a plain sorted
write. Readers pay nothing: pruning happens in the parquet scan from
footer statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_minmax(x: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale x into [0, 2^bits - 1] by the column's (lo, hi) bounds:
    ``floor((x - lo) / (hi - lo) * (2^bits - 1))``, clamped (x == hi
    lands exactly on the top cell; a constant column degenerates to
    cell 0)."""
    top = F.lit((1 << bits) - 1)
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(span == 0.0, F.lit(0)).otherwise(
        F.floor((x.cast("double") - lo.cast("double")) / span * top.cast("double"))
    )
    return F.least(F.greatest(scaled.cast("long"), F.lit(0)), top.cast("long"))


def morton_interleave_n(qs: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of n quantized keys: bit i of
    key j lands at position ``i*n + j``. Unrolled to a static sum of
    masked shifts — stays in codegen, no UDF, and the identical
    arithmetic runs in ANSI SQL. Requires ``n*bits <= 62`` (the code
    must fit a positive BIGINT)."""
    n = len(qs)
    if n < 2:
        raise ValueError("morton_interleave_n: need at least 2 keys")
    if n * bits > 62:
        raise ValueError(
            f"morton_interleave_n: {n} keys × {bits} bits = {n * bits} "
            "code bits exceeds the 62-bit BIGINT budget — lower bits"
        )
    terms = []
    for i in range(bits):
        for j, q in enumerate(qs):
            terms.append(
                F.shiftleft(F.shiftright(q, i).bitwiseAND(F.lit(1)), i * n + j)
            )
    code = terms[0]
    for t in terms[1:]:
        code = code.bitwiseOR(t)
    return code


def morton_interleave(qa: Column, qb: Column, bits: int) -> Column:
    """Two-key special case of :func:`morton_interleave_n` (bit i of
    ``qa`` at position 2i, of ``qb`` at 2i+1)."""
    return morton_interleave_n([qa, qb], bits)


def with_zorder_code_n(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "zcode"
) -> DataFrame:
    """Append the Morton code over any number of layout columns.
    Bounds come from one tiny aggregate crossed back in (broadcast —
    1 row); everything else is map-only."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    bounds = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(bounds))
    qs = [
        quantize_minmax(F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits)
        for c in cols
    ]
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    return joined.withColumn(out_col, morton_interleave_n(qs, bits)).drop(*drop)


def with_zorder_code(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, out_col: str = "zcode"
) -> DataFrame:
    """Two-column convenience form of :func:`with_zorder_code_n`."""
    return with_zorder_code_n(df, [col_a, col_b], bits, out_col)


def write_zorder(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """Write parquet laid out along the Z-curve: range-partition by the
    Morton code (disjoint code ranges per file → small bounding boxes
    on BOTH columns), sort within partitions so row groups inherit the
    locality, and drop the code — the layout IS the artifact; readers
    prune from ordinary column statistics with no schema change."""
    coded = with_zorder_code(df, col_a, col_b, bits)
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        coded.repartitionByRange(parts, F.col("zcode"))
        .sortWithinPartitions("zcode")
        .drop("zcode")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zorder_n(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int | None = None,
) -> None:
    """n-column :func:`write_zorder` (e.g. (tenant, day, user) — three
    predicate dimensions pruned from one layout). Same budget: one
    bounds agg + one range exchange."""
    coded = with_zorder_code_n(df, cols, bits)
    parts = n_files or df.sparkSession.sparkContext.defaultParallelism
    (
        coded.repartitionByRange(parts, F.col("zcode"))
        .sortWithinPartitions("zcode")
        .drop("zcode")
        .write.mode("overwrite")
        .parquet(path)
    )
