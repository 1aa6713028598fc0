"""Score calibration and lift analysis — the model-evaluation readout
(decile lift chart, calibration table, cumulative gains) an event
pipeline produces once a model's scores land next to outcomes.

All closed-form DataFrame ops: ``ntile`` over the score order buckets
the population into equal-count bins; per-bin outcome rates against
the global base rate give lift; running sums give gains. One sort-free
keyed aggregate after the ntile window.

Scale notes: ``ntile`` is a window over the score order — a GLOBAL
order. For the exact form below that is one range-partitioned sort
(Spark plans global windows through a single partition; at true 100 TB
swap the ntile for closed-form binning on the score's approximate
quantiles — `approx_percentile` bounds + map-side bucketing, identical
downstream arithmetic, stated error bound). The per-bin aggregate and
lift arithmetic are bin-count-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def lift_table(
    df: DataFrame,
    score: Column,
    label: Column,
    tiebreak: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Per-decile (bin 1 = highest scores) readout: population count,
    positives, outcome rate, lift vs base rate, cumulative capture of
    all positives (gains). ``label`` is boolean; ``tiebreak`` (a
    unique id) pins the ntile assignment of tied scores so the
    bucketing is deterministic and cross-engine reproducible."""
    base = df.select(
        score.alias("__s"), label.cast("int").alias("__y"), tiebreak.alias("__t")
    )
    w = Window.orderBy(F.col("__s").desc(), F.col("__t").asc())
    binned = base.withColumn("bin", F.ntile(n_bins).over(w))
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("positives"),
    )
    totals = per_bin.agg(
        F.sum("n").alias("__tn"), F.sum("positives").alias("__tp")
    )
    cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .withColumn("rate", F.col("positives") / F.col("n"))
        .withColumn(
            "lift",
            (F.col("positives") / F.col("n"))
            / (F.col("__tp") / F.col("__tn")),
        )
        .withColumn(
            "cum_capture",
            F.sum("positives").over(cum) / F.col("__tp"),
        )
        .drop("__tn", "__tp")
    )


def calibration_table(
    df: DataFrame, score: Column, label: Column, tiebreak: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability curve input: equal-count score bins with mean
    predicted score vs observed outcome rate — a calibrated model has
    the two tracking each other."""
    base = df.select(
        score.alias("__s"), label.cast("int").alias("__y"), tiebreak.alias("__t")
    )
    w = Window.orderBy(F.col("__s").asc(), F.col("__t").asc())
    binned = base.withColumn("bin", F.ntile(n_bins).over(w))
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("__s").alias("mean_score"),
        F.avg("__y").alias("observed_rate"),
    )


def roc_auc(df: DataFrame, score: Column, label: Column) -> DataFrame:
    """Exact ROC-AUC via the Mann–Whitney rank identity:

        AUC = (Σ_pos midrank − n_pos·(n_pos+1)/2) / (n_pos · n_neg)

    with MIDRANKS for tied scores (the textbook-correct tie handling).
    Distributed without a global sort: per-distinct-score
    (count, positives) aggregate, the strictly-below cumulative count
    from the value-range sharded prefix sum (quality.quantile_transform's
    decomposition), then midrank = below + (count+1)/2 and two scalar
    reductions. Returns one row: (auc, n_pos, n_neg)."""
    base = df.select(score.alias("__s"), label.cast("int").alias("__y"))
    # localCheckpoint (r12 optimization): g is distinct-score-sized but
    # referenced by bounds, the sharded cumsum and the shard offsets —
    # un-truncated lineage re-ran the corpus aggregate per reference
    # (the same fix as drift.ks_statistic / quality.quantile_transform)
    g = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("__c"), F.sum("__y").alias("__p")
    ).localCheckpoint(eager=True)
    parts = df.sparkSession.sparkContext.defaultParallelism
    bounds = g.agg(F.min("__s").alias("__lo"), F.max("__s").alias("__hi"))
    sharded = g.crossJoin(F.broadcast(bounds)).withColumn(
        "__shard",
        F.when(F.col("__hi") == F.col("__lo"), F.lit(0)).otherwise(
            F.least(
                F.floor(
                    (F.col("__s") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * parts
                ).cast("long"),
                F.lit(parts - 1),
            )
        ),
    )
    w_in = Window.partitionBy("__shard").orderBy("__s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = sharded.withColumn(
        "__below_local", F.coalesce(F.sum("__c").over(w_in), F.lit(0))
    )
    offs = (
        sharded.groupBy("__shard")
        .agg(F.sum("__c").alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__off")
    )
    ranked = local.join(F.broadcast(offs), "__shard").withColumn(
        "__midrank",
        F.col("__off") + F.col("__below_local") + (F.col("__c") + 1) / 2.0,
    )
    return ranked.agg(
        (
            (
                F.sum(F.col("__p") * F.col("__midrank"))
                - F.sum("__p") * (F.sum("__p") + 1) / 2.0
            )
            / (F.sum("__p") * (F.sum("__c") - F.sum("__p")))
        ).alias("auc"),
        F.sum("__p").cast("long").alias("n_pos"),
        (F.sum("__c") - F.sum("__p")).cast("long").alias("n_neg"),
    )
