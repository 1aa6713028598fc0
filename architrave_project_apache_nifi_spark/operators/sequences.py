"""Sequential-pattern operators over event streams: per-entity ordered
n-grams and Markov transition statistics — the behavioral-analytics
family (path mining, next-event modeling) the event table invites.

Both are one keyed window (per-entity order) + one hash aggregate —
the same shuffle budget as sessionization; n-gram construction is
``lag`` expressions inside the window, so the pattern length adds
expressions, not passes.

Scale notes: the window partitions by the entity key (user) — state is
one entity's events per task, the standard sessionization layout; the
aggregate's key space is |event types|^n (tiny) for patterns and
|types|² for transitions, so the second shuffle is negligible. No
collect, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_ngrams(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-entity ordered n-grams of ``value_col``: one row per
    occurrence position, ``gram`` = the n consecutive values joined
    with '>'. Positions with fewer than n predecessors emit nothing
    (complete grams only — the standard convention)."""
    if n < 2:
        raise ValueError("event_ngrams: n must be >= 2")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    lags = [F.lag(value_col, n - 1 - i).over(w) for i in range(n)]
    out = df.withColumn("__gram_parts", F.array(*lags))
    return (
        out.filter(~F.array_contains(F.transform(
            F.col("__gram_parts"), lambda x: x.isNull()
        ), True))
        .withColumn("gram", F.array_join(F.col("__gram_parts"), ">"))
        .drop("__gram_parts")
    )


def ngram_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 3,
) -> DataFrame:
    """Corpus-wide pattern frequencies: (gram, occurrences, distinct
    entities carrying it)."""
    grams = event_ngrams(df, key_col, order_cols, value_col, n)
    return grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct(key_col).alias("n_entities"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
) -> DataFrame:
    """First-order Markov transition statistics: for each observed
    (from_state, to_state) pair, the count and the row-normalized
    probability P(to | from). One window + one agg + a broadcast-sized
    per-state total joined back."""
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.withColumn("__from", F.lag(value_col, 1).over(w))
        .filter(F.col("__from").isNotNull())
        .select(F.col("__from").alias("from_state"), F.col(value_col).alias("to_state"))
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .withColumn("p", F.col("n") / F.col("__tot"))
        .drop("__tot")
    )
