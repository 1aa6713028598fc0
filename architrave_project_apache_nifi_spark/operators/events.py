"""Event-sequence analytics: funnels, dense time grids, anomaly flags.

Extension operators over the ``events`` stream (no reference
counterpart — SURVEY.md §2.9 family). All pure DataFrame compositions:
funnels are staged conditional aggregations, gap-filling is a
generated date grid left-joined to observed activity, anomaly flags
are one stats aggregate broadcast back over the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel timestamps per user: for stages [A, B, C], the
    earliest A, the earliest B strictly after that A, the earliest C
    strictly after that B — NULL once a stage is never reached (and
    all later stages NULL with it, by construction).

    One staged aggregation per funnel step: stage k's events are
    prefiltered by type (pushed to the scan), aggregated to one row
    per user, and joined to the accumulating funnel row. Each pass
    shuffles only the single stage's events + one row per user —
    funnel depth multiplies passes, never pair space. At 100 TB the
    per-user rows broadcast when small; otherwise they hash-join on
    the already-partitioned user key.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    first = stages[0]
    out = (
        events.filter(F.col(type_col) == first)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("stage_1_ts"))
    )
    for i, stage in enumerate(stages[1:], start=2):
        prev = f"stage_{i - 1}_ts"
        cur = f"stage_{i}_ts"
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(out.select(user_col, prev), user_col)
            .filter(F.col("__ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(cur))
        )
        out = out.join(nxt, user_col, "left")
    return out


def gapfill_daily_counts(
    events: DataFrame,
    start_date: str,
    end_date: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Dense per-user daily activity: one row per (user, day) for EVERY
    day in [start_date, end_date], zero-filled where the user was
    silent — the resampling step before any time-series model.

    The grid is users × ``sequence(start, end)`` — a generator off the
    distinct-user set (small side), never a shuffle of the events; the
    observed counts aggregate once on (user, day) and left-join the
    grid on the same key.
    """
    days = F.sequence(
        F.lit(start_date).cast("date"), F.lit(end_date).cast("date")
    )
    grid = (
        events.select(user_col)
        .distinct()
        .withColumn("day", F.explode(days))
    )
    counts = (
        events.withColumn("day", F.to_date(ts_col))
        .filter(
            (F.col("day") >= F.lit(start_date).cast("date"))
            & (F.col("day") <= F.lit(end_date).cast("date"))
        )
        .groupBy(user_col, "day")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        grid.join(counts, [user_col, "day"], "left")
        .select(
            user_col,
            "day",
            F.coalesce("__n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


def anomaly_zscore(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier flags: one stats aggregate (mean +
    sample stddev per group — a handful of rows) broadcast back over
    the stream; the flagging itself is map-only. Rounded to 6 decimals
    so the value-hash is stable across float summation orders."""
    stats = events.groupBy(group_col).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_samp(value_col).alias("__sigma"),
    )
    z = (F.col(value_col) - F.col("__mu")) / F.col("__sigma")
    return (
        events.join(F.broadcast(stats), group_col)
        .select(
            "event_id",
            group_col,
            value_col,
            F.round(z, 6).alias("zscore"),
            (F.abs(z) > z_threshold).cast("int").alias("is_anomaly"),
        )
    )
