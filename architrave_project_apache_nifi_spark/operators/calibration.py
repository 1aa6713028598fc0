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
