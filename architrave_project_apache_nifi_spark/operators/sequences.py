"""Sequential-pattern operators over event streams: per-entity ordered
n-grams and Markov transition statistics — the behavioral-analytics
family (path mining, next-event modeling) the event table invites.

Both are one keyed window (per-entity order) + one hash aggregate —
the same shuffle budget as sessionization; n-gram construction is
``lag`` expressions inside the window, so the pattern length adds
expressions, not passes.

Scale notes: the window partitions by the entity key (user) — the
standard sessionization layout, and therefore the standard
sessionization FAILURE: AQE never splits a skewed window partition, so
one bot-grade entity serializes its whole history in one task. Since
r7 both entry points carry the same ``skew_protection="auto"`` contract
as sessionize/running_window (operators/skew_windows): a hot entity's
rows spread over per-key time-range buckets and the ``lag(j)`` values a
bucket-first row needs come from a per-(key, bucket) TAIL summary — the
last ``min(count, m)`` values of each bucket, concatenated over
preceding buckets (≤ n_ts_buckets × m elements). Walking back from any
row, each earlier bucket contributes either its full content (when it
holds < m rows) or at least the m values any lag ≤ m can reach, so the
concatenation's suffix equals the true global-predecessor suffix and
index-from-end arithmetic is EXACT — including across near-empty
buckets. The aggregate's key space is |event types|^n (tiny), so the
second shuffle is negligible. No collect, no iteration.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _global_lag_parts(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    m: int,
    hot_key_rows: int,
    n_ts_buckets: int,
    hot_edges: DataFrame | None,
) -> tuple[DataFrame, list[Column], list[str]]:
    """Shared carry machinery: returns ``(joined, lag_cols, drop_cols)``
    where ``lag_cols[j-1]`` evaluates to the PER-KEY global
    ``lag(value_col, j)`` (j = 1..m) on ``joined`` — exact across
    bucket boundaries. Same harvested/lazy split as the other twins
    (see sessionize_skewed): harvested edges are bounded + broadcast-
    hinted, so the tail summary reads hot keys' rows only from a
    column-pruned inner join; lazy keeps the all-keys shape whose
    identical subtree AQE stage-reuses."""
    from .skew_windows import (
        BUCKET,
        _bucket_rows,
        _bucketed_exchange,
        _hot_edges_agg,
    )

    keys = [key_col]
    oc0 = order_cols[0]
    harvested = hot_edges is not None
    if not harvested:
        hot_edges = _hot_edges_agg(
            df, keys, oc0, hot_key_rows, n_ts_buckets, ()
        )
    bucketed = _bucketed_exchange(
        _bucket_rows(df, keys, oc0, hot_edges, "left"), keys
    )
    w = Window.partitionBy(key_col, BUCKET).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )

    # per-(key, bucket) chronological tail of the last min(count, m)
    # values. Structs are collected (collect_list skips NULL elements —
    # a NULL value must survive as a lag result) and sort_array orders
    # them by the order_cols prefix.
    # harvested: hot keys' rows via a SEMI join against the broadcast
    # edge keys ABOVE the shared (key, bucket) exchange — the tail
    # window reuses the main stream's exchange (broadcast semi joins
    # preserve partitioning; joins do not push below
    # RepartitionByExpression, so this cannot re-trigger the r7
    # filter-pushdown subtree-mismatch trap), adding ZERO extra scans
    # or shuffles, and the straggler protection is the exchange the
    # main window already needs. A separate pruned-scan inner-join
    # pipeline (the sessionize shape) costs an extra scan + exchange
    # here because the tail pass needs a per-row WINDOW, not a pure
    # agg (measured: 12.5 s vs 8.1 s on the 20M-row hot corpus).
    src = (
        bucketed.join(hot_edges.select(*keys), keys, "semi")
        if harvested else bucketed
    )
    wt = Window.partitionBy(key_col, BUCKET).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    tails = (
        src.withColumn("__rd", F.row_number().over(wt))
        .filter(F.col("__rd") <= m)
        .groupBy(key_col, BUCKET)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(
                    *[F.col(c) for c in order_cols],
                    F.col(value_col).alias("__v"),
                ))
            ).alias("__tail_s")
        )
        .select(
            key_col,
            BUCKET,
            F.transform("__tail_s", lambda s: s["__v"]).alias("__tail"),
        )
    )
    # carry-in: preceding buckets' tails concatenated in bucket order
    # (collect_list over an ordered window preserves frame order);
    # bounded at n_ts_buckets × m elements per row
    wk = Window.partitionBy(key_col).orderBy(BUCKET)
    carry = tails.withColumn(
        "__cin",
        F.flatten(
            F.collect_list("__tail").over(
                wk.rowsBetween(Window.unboundedPreceding, -1)
            )
        ),
    ).select(key_col, BUCKET, "__cin")
    joined = bucketed.join(carry, [key_col, BUCKET], "left")

    rn = F.row_number().over(w)

    def lag_j(j: int) -> Column:
        # local predecessor when the bucket has one; else the carry's
        # (j - rn + 1)-th element from the end. size(NULL) = -1 and a
        # too-deep lag both drive idx < 1 → NULL, the plain lag's
        # no-such-row answer; the when() guard keeps element_at away
        # from index 0 (which throws even with ANSI off).
        idx = F.size("__cin") - j + rn
        return F.when(rn > j, F.lag(value_col, j).over(w)).otherwise(
            F.when(idx >= 1, F.element_at("__cin", idx))
        )

    return joined, [lag_j(j) for j in range(1, m + 1)], [BUCKET, "__cin"]


def event_ngrams(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 3,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Per-entity ordered n-grams of ``value_col``: one row per
    occurrence position, ``gram`` = the n consecutive values joined
    with '>'. Positions with fewer than n predecessors emit nothing
    (complete grams only — the standard convention).

    ``skew_protection="auto"`` (r7, same contract as
    :func:`~.temporal.sessionize`): one bounded sampled detection job;
    an entity above ``hot_key_rows`` routes through
    :func:`event_ngrams_skewed` (identical grams, hot entities spread
    over time buckets); cold corpora keep exactly this plan. Auto
    requires ``order_cols[0]`` to be numeric/timestamp (the bucket
    edges' domain) — other types silently keep the plain window."""
    if n < 2:
        raise ValueError("event_ngrams: n must be >= 2")
    from .skew_windows import order_bucketable, resolve_skew_protection

    if skew_protection and order_bucketable(df, order_cols[0]):
        engaged, edges = resolve_skew_protection(
            df, key_col, order_cols[0], skew_protection, hot_key_rows,
            n_ts_buckets, sample_salt_cols=order_cols[1:],
        )
        if engaged:
            return event_ngrams_skewed(
                df, key_col, order_cols, value_col, n,
                hot_key_rows, n_ts_buckets, hot_edges=edges,
            )
    elif skew_protection is True:
        raise ValueError(
            "event_ngrams: skew_protection=True needs a numeric or "
            f"timestamp order_cols[0], got {dict(df.dtypes)[order_cols[0]]}"
        )
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


def event_ngrams_skewed(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 3,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """:func:`event_ngrams`, identical output, hot entities spread over
    per-key time-range buckets (see the module docstring for the tail
    carry that makes cross-bucket lags exact)."""
    if n < 2:
        raise ValueError("event_ngrams_skewed: n must be >= 2")
    joined, lags, drop = _global_lag_parts(
        df, key_col, order_cols, value_col, n - 1,
        hot_key_rows, n_ts_buckets, hot_edges,
    )
    # oldest part first, current value last — the plain form's order
    parts = [*reversed(lags), F.col(value_col)]
    out = joined.withColumn("__gram_parts", F.array(*parts))
    return (
        out.filter(~F.array_contains(F.transform(
            F.col("__gram_parts"), lambda x: x.isNull()
        ), True))
        .withColumn("gram", F.array_join(F.col("__gram_parts"), ">"))
        .drop("__gram_parts", *drop)
    )


def ngram_counts(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    n: int = 3,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Corpus-wide pattern frequencies: (gram, occurrences, distinct
    entities carrying it)."""
    grams = event_ngrams(
        df, key_col, order_cols, value_col, n,
        skew_protection, hot_key_rows, n_ts_buckets,
    )
    return grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.countDistinct(key_col).alias("n_entities"),
    )


def _transition_stats(pairs: DataFrame) -> DataFrame:
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_state").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_state")
        .withColumn("p", F.col("n") / F.col("__tot"))
        .drop("__tot")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """First-order Markov transition statistics: for each observed
    (from_state, to_state) pair, the count and the row-normalized
    probability P(to | from). One window + one agg + a broadcast-sized
    per-state total joined back. Same ``skew_protection`` contract as
    :func:`event_ngrams` (the lag(1) window is the straggler)."""
    from .skew_windows import order_bucketable, resolve_skew_protection

    if skew_protection and order_bucketable(df, order_cols[0]):
        engaged, edges = resolve_skew_protection(
            df, key_col, order_cols[0], skew_protection, hot_key_rows,
            n_ts_buckets, sample_salt_cols=order_cols[1:],
        )
        if engaged:
            return transition_matrix_skewed(
                df, key_col, order_cols, value_col,
                hot_key_rows, n_ts_buckets, hot_edges=edges,
            )
    elif skew_protection is True:
        raise ValueError(
            "transition_matrix: skew_protection=True needs a numeric or "
            f"timestamp order_cols[0], got {dict(df.dtypes)[order_cols[0]]}"
        )
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pairs = (
        df.withColumn("__from", F.lag(value_col, 1).over(w))
        .filter(F.col("__from").isNotNull())
        .select(F.col("__from").alias("from_state"), F.col(value_col).alias("to_state"))
    )
    return _transition_stats(pairs)


def transition_matrix_skewed(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
    hot_edges: DataFrame | None = None,
) -> DataFrame:
    """:func:`transition_matrix`, identical output, hot entities spread
    over per-key time-range buckets (n=2 case of the tail carry)."""
    joined, lags, _drop = _global_lag_parts(
        df, key_col, order_cols, value_col, 1,
        hot_key_rows, n_ts_buckets, hot_edges,
    )
    pairs = (
        joined.withColumn("__from", lags[0])
        .filter(F.col("__from").isNotNull())
        .select(
            F.col("__from").alias("from_state"),
            F.col(value_col).alias("to_state"),
        )
    )
    return _transition_stats(pairs)
