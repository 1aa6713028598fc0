"""RFM user segmentation — the canonical behavioral feature table:
per-user Recency (time since last event), Frequency (event count),
Monetary (summed value), each scored into quintiles, concatenated
into the familiar '555'-style segment label.

One pass: the per-user aggregate reduces events to one row per user;
the three quintile scores are ntile windows over the USER table
(users ≪ events — the window input is already the reduced table; for
billions of users swap in the `quality.quantile_transform` sharded
decomposition, identical semantics). Ties pin on user id so the
scoring is deterministic and cross-engine reproducible.

Scoring convention: 5 is best in every dimension — most recent,
most frequent, highest spend (recency ntile runs over recency
ASCENDING so the smallest gap lands in the top score).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rfm_features(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(user, recency_s, frequency, monetary): recency in seconds
    against the corpus max timestamp (one 1-row agg broadcast back —
    the deterministic 'now' for a batch snapshot)."""
    per_user = events.groupBy(F.col(user_col).alias("user")).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(value_col).alias("monetary"),
    )
    anchor = events.agg(F.max(ts_col).alias("__now"))
    return (
        per_user.crossJoin(F.broadcast(anchor))
        .withColumn(
            # exact epoch-microsecond difference: engine-portable
            # (timestampdiff truncates sub-second parts differently
            # across engines; unix_micros is exact integer arithmetic)
            "recency_s",
            F.floor(
                (F.unix_micros(F.col("__now").cast("timestamp"))
                 - F.unix_micros(F.col("__last").cast("timestamp"))) / 1_000_000
            ).cast("long"),
        )
        .drop("__last", "__now")
    )


def rfm_scores(features: DataFrame, n_tiles: int = 5) -> DataFrame:
    """Quintile scores (1..n, n best) + the concatenated segment
    label. Deterministic: every ntile orders with the user id as the
    final tiebreak."""
    w_r = Window.orderBy(F.col("recency_s").asc(), F.col("user"))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("user"))
    w_m = Window.orderBy(F.col("monetary").desc(), F.col("user"))
    scored = (
        features.withColumn("r_score", F.lit(n_tiles + 1) - F.ntile(n_tiles).over(w_r))
        .withColumn("f_score", F.lit(n_tiles + 1) - F.ntile(n_tiles).over(w_f))
        .withColumn("m_score", F.lit(n_tiles + 1) - F.ntile(n_tiles).over(w_m))
    )
    # each ordering puts the BEST users in ntile bucket 1; the
    # (n+1 − bucket) flip yields the conventional n-is-best scores
    return scored.withColumn(
        "segment",
        F.concat_ws("", F.col("r_score"), F.col("f_score"), F.col("m_score")),
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """The composed pipeline: features → scores → segment."""
    return rfm_scores(rfm_features(events, user_col, ts_col, value_col), n_tiles)
