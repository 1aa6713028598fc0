"""Data-quality constraint checking (Deequ-style, Spark-first).

The reference flow has no validation stage — malformed events simply
corrupt the history (SURVEY.md §2.8 Bugs 1-3 are partly data-quality
failures). This module turns declarative constraints into ONE
aggregation pass producing a violation report, the guard a pipeline
runs before committing a batch to the SCD2 store or a training corpus.

Scale: every row-level rule compiles to a conditional count inside one
hash aggregate — adding rules adds expressions, not passes or
shuffles. Uniqueness is the one rule that genuinely needs its own
shuffle (a groupBy on the key columns); it is a separate function so
the caller pays for it explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (``rule``, ``n_rows``, ``n_violations``,
    ``passed``). Each rule is a boolean Column where True = row OK;
    NULL counts as a violation (unknown is not OK — the Deequ
    convention). All rules evaluate in a single aggregation pass."""
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    reports = [
        wide.select(
            F.lit(name).alias("rule"),
            F.col("n_rows"),
            F.col(f"__v_{name}").cast("bigint").alias("n_violations"),
            (F.col(f"__v_{name}") == 0).cast("int").alias("passed"),
        )
        for name in rules
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness constraint as the same report shape: one row
    (``rule`` = 'unique(<cols>)') counting rows that share their key
    with at least one other row. One shuffle on the key columns."""
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_violations")
        )
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        total.join(F.broadcast(dup_rows))
        .select(
            F.lit(f"unique({','.join(cols)})").alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )
    )


def winsorize(
    df: DataFrame,
    col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization) — the feature-prep pass
    that tames heavy tails before normalization: values below the
    ``p_lo`` exact percentile clamp up to it, above ``p_hi`` clamp
    down. NULLs pass through.

    One exact-percentile aggregate (1 row) broadcast back + a map-only
    clamp — the same plan shape as the adaptive quality floor; at
    100 TB substitute ``approx_percentile(ε)`` for the exact one
    (identical plan, stated error bound)."""
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError(f"winsorize: need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    bounds = df.agg(
        F.percentile(F.col(col), F.lit(p_lo)).alias("__lo"),
        F.percentile(F.col(col), F.lit(p_hi)).alias("__hi"),
    )
    target = out_col or col
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            target,
            F.when(F.col(col).isNull(), F.lit(None))
            .otherwise(F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))),
        )
        .drop("__lo", "__hi")
    )


def quantile_transform(
    df: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """Exact empirical-CDF normalization (SQL ``percent_rank``
    semantics): each value maps to (#rows strictly below) / (n − 1),
    ties sharing their quantile — the rank-based feature scaling that
    is immune to outliers where min/max scaling is not. NULLs pass
    through untouched.

    Distributed without a corpus-wide window (the classic
    ``percent_rank() OVER (ORDER BY v)`` is a single-reducer sort):
    per-distinct-value counts aggregate once, the cumulative
    below-count builds with the sharded prefix-sum decomposition
    (value-range shards rank locally; ≤ n_shards totals broadcast
    back — packing.py's trick on the value axis), and rows join their
    quantile back on the 8-byte value key. Two row-sized shuffles
    (distinct-value agg + join back)."""
    from pyspark.sql import Window

    target = out_col or f"{col}_q"
    nonnull = df.filter(F.col(col).isNotNull())
    n = nonnull.count()
    if n < 2:
        raise ValueError("quantile_transform: need >= 2 non-null rows")
    counts = nonnull.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    parts = df.sparkSession.sparkContext.defaultParallelism
    bounds = counts.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    sharded = counts.crossJoin(F.broadcast(bounds)).withColumn(
        "__shard",
        F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
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
    in_shard = Window.partitionBy("__shard").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = sharded.withColumn(
        "__below_local", F.coalesce(F.sum("__c").over(in_shard), F.lit(0))
    )
    offsets = (
        sharded.groupBy("__shard")
        .agg(F.sum("__c").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__offset")
    )
    quantiles = (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn(
            "__q",
            (F.col("__offset") + F.col("__below_local"))
            / F.lit(float(n - 1)),
        )
        .select("__v", "__q")
    )
    return (
        df.join(quantiles, df[col] == quantiles["__v"], "left")
        .withColumn(target, F.col("__q"))
        .drop("__v", "__q")
    )
