"""Distribution-drift detection between two dataset versions —
the monitoring counterpart of `quality.py`'s one-shot constraint
checks. A training pipeline re-ingesting a source weekly needs to
know when the NEW batch stopped looking like the OLD one before the
model does.

Population Stability Index (PSI — the standard model-monitoring drift
score, public credit-scoring literature):

    PSI = Σ_bins (p_new − p_old) · ln(p_new / p_old)

with the bin grid FROZEN on the reference (old) dataset — fixed-width
over the reference min/max for numeric columns, category identity for
categorical ones. Conventional reading: <0.1 stable, 0.1-0.25 drifting,
>0.25 shifted.

Scale notes: one pass over each side — binning is a map-side closed-
form expression (no quantile job), counts partial-aggregate, and the
two ≤(bins+2)-row count tables join broadcast. Empty bins get a
configurable epsilon so the logarithm is defined (standard practice);
out-of-range new values land in dedicated underflow/overflow bins —
drift BEYOND the reference range is exactly what must not be silently
clipped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EPS = 1e-6


def _numeric_bin(x: Column, lo: Column, hi: Column, bins: int) -> Column:
    """Bin index in [0, bins-1] over [lo, hi]; -1 = underflow,
    ``bins`` = overflow; NULLs → bin -2 (their own category — a NULL
    rate change is drift too)."""
    span = hi - lo
    # a constant reference column (lo == hi) degenerates to one bin:
    # guard the divisor (ANSI mode raises on /0) and send in-range
    # values — necessarily == lo — to bin 0
    safe_span = F.when(span == 0, F.lit(1.0)).otherwise(span)
    raw = F.floor((x - lo) / safe_span * bins)
    idx = (
        F.when(x.isNull(), F.lit(-2))
        .when(x < lo, F.lit(-1))
        .when(x > hi, F.lit(bins))
        .otherwise(F.least(raw.cast("long"), F.lit(bins - 1)))
    )
    return idx


def _shares(df: DataFrame, bin_col: Column, alias: str) -> DataFrame:
    # localCheckpoint (r12 optimization): counts is ≤(bins+2) rows but
    # referenced twice (total and the share projection) — un-truncated
    # lineage re-ran the corpus bin-aggregate per reference
    counts = df.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("__n")
    ).localCheckpoint(eager=True)
    total = counts.agg(F.sum("__n").alias("__t"))
    return counts.crossJoin(F.broadcast(total)).select(
        "bin", (F.col("__n") / F.col("__t")).alias(alias)
    )


def psi_numeric(
    old: DataFrame, new: DataFrame, col: str, bins: int = 10
) -> DataFrame:
    """Per-bin PSI contributions for a numeric column; grid frozen on
    ``old``'s min/max. Returns (bin, p_old, p_new, psi) — sum ``psi``
    for the headline score (``psi_report`` does)."""
    # localCheckpoint (r12): the 1-row grid bounds are broadcast into
    # BOTH sides — un-truncated, the old-side min/max scan ran twice
    b = old.agg(
        F.min(col).cast("double").alias("__lo"),
        F.max(col).cast("double").alias("__hi"),
    ).localCheckpoint(eager=True)
    o = old.crossJoin(F.broadcast(b))
    n = new.crossJoin(F.broadcast(b))
    ob = _shares(
        o, _numeric_bin(F.col(col).cast("double"), F.col("__lo"), F.col("__hi"), bins),
        "p_old",
    )
    nb = _shares(
        n, _numeric_bin(F.col(col).cast("double"), F.col("__lo"), F.col("__hi"), bins),
        "p_new",
    )
    joined = ob.join(nb, "bin", "full_outer").select(
        "bin",
        F.coalesce("p_old", F.lit(0.0)).alias("p_old"),
        F.coalesce("p_new", F.lit(0.0)).alias("p_new"),
    )
    po = F.greatest(F.col("p_old"), F.lit(EPS))
    pn = F.greatest(F.col("p_new"), F.lit(EPS))
    return joined.withColumn("psi", (pn - po) * F.log(pn / po))


def psi_categorical(old: DataFrame, new: DataFrame, col: str) -> DataFrame:
    """Per-category PSI contributions; categories absent on one side
    get share 0 (→ epsilon). NULL is its own category."""
    key = F.coalesce(F.col(col).cast("string"), F.lit("__null__"))
    ob = _shares(old, key, "p_old").withColumnRenamed("bin", "category")
    nb = _shares(new, key, "p_new").withColumnRenamed("bin", "category")
    joined = ob.join(nb, "category", "full_outer").select(
        "category",
        F.coalesce("p_old", F.lit(0.0)).alias("p_old"),
        F.coalesce("p_new", F.lit(0.0)).alias("p_new"),
    )
    po = F.greatest(F.col("p_old"), F.lit(EPS))
    pn = F.greatest(F.col("p_new"), F.lit(EPS))
    return joined.withColumn("psi", (pn - po) * F.log(pn / po))


def psi_report(
    old: DataFrame,
    new: DataFrame,
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    bins: int = 10,
) -> DataFrame:
    """One row per monitored column: (column, psi, verdict). Verdict
    thresholds follow the conventional 0.1 / 0.25 bands. Each column
    costs two scans' worth of counts; all columns could share one pass
    via a single multi-column agg — split per column here for clarity,
    and because monitoring runs off sampled sides anyway."""
    parts = []
    for c in numeric_cols or []:
        parts.append(
            psi_numeric(old, new, c, bins).agg(
                F.lit(c).alias("column"), F.sum("psi").alias("psi")
            )
        )
    for c in categorical_cols or []:
        parts.append(
            psi_categorical(old, new, c).agg(
                F.lit(c).alias("column"), F.sum("psi").alias("psi")
            )
        )
    if not parts:
        raise ValueError("psi_report: no columns given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "verdict",
        F.when(F.col("psi") < 0.1, F.lit("stable"))
        .when(F.col("psi") < 0.25, F.lit("drifting"))
        .otherwise(F.lit("shifted")),
    )


def ks_statistic(old: DataFrame, new: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance: max |F_old(v) − F_new(v)|
    over the pooled values — the binning-free companion to PSI (PSI
    localizes drift to bins; KS gives the distribution-free distance a
    significance table understands).

    Distributed without the textbook global sort: per-distinct-value
    (count_old, count_new) aggregate once; INCLUSIVE cumulative counts
    build with the value-range sharded prefix sum (local cumsum per
    shard + ≤n_shards broadcast offsets); the max-abs-difference of
    the two ECDFs reduces in one final 1-row aggregate. NULLs are
    excluded (KS is defined over ordered values).

    Returns a 1-row DataFrame: (ks_stat, n_old, n_new)."""
    from pyspark.sql import Window

    o = old.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    n = new.select(F.col(col).alias("__v")).filter(F.col("__v").isNotNull())
    tagged = o.withColumn("__is_new", F.lit(0)).unionByName(
        n.withColumn("__is_new", F.lit(1))
    )
    # localCheckpoint (r12 optimization): counts is distinct-value-
    # sized but referenced four ways below (bounds, the sharded cumsum,
    # the shard offsets, totals) — un-truncated lineage replayed the
    # corpus scan+union+aggregate per reference (10 scans in one plan)
    counts = tagged.groupBy("__v").agg(
        F.sum(1 - F.col("__is_new")).alias("__co"),
        F.sum("__is_new").alias("__cn"),
    ).localCheckpoint(eager=True)
    parts = tagged.sparkSession.sparkContext.defaultParallelism
    bounds = counts.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    sharded = counts.crossJoin(F.broadcast(bounds)).withColumn(
        "__shard",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * parts
                ).cast("long"),
                F.lit(parts - 1),
            )
        ),
    )
    w_in = Window.partitionBy("__shard").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = sharded.withColumn("__cum_o_l", F.sum("__co").over(w_in)).withColumn(
        "__cum_n_l", F.sum("__cn").over(w_in)
    )
    offs = (
        sharded.groupBy("__shard")
        .agg(F.sum("__co").alias("__so"), F.sum("__cn").alias("__sn"))
        .withColumn(
            "__off_o",
            F.coalesce(
                F.sum("__so").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "__off_n",
            F.coalesce(
                F.sum("__sn").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__off_o", "__off_n")
    )
    totals = counts.agg(
        F.sum("__co").alias("__no"), F.sum("__cn").alias("__nn")
    )
    ecdf = (
        local.join(F.broadcast(offs), "__shard")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "__d",
            F.abs(
                (F.col("__off_o") + F.col("__cum_o_l")) / F.col("__no")
                - (F.col("__off_n") + F.col("__cum_n_l")) / F.col("__nn")
            ),
        )
    )
    return ecdf.agg(
        F.max("__d").alias("ks_stat"),
        F.first("__no").alias("n_old"),
        F.first("__nn").alias("n_new"),
    )
