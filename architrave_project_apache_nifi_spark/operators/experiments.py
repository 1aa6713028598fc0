"""A/B experiment analysis: per-variant metric summaries, effect size,
and Welch's t statistic — the experimentation readout an event
pipeline owes its users (deterministic closed-form arithmetic; no RNG,
no iteration, fully SQL-replayable).

    Welch t = (m_a − m_b) / sqrt(s²_a/n_a + s²_b/n_b)
    df (Welch–Satterthwaite) = (s²_a/n_a + s²_b/n_b)²
        / ((s²_a/n_a)²/(n_a−1) + (s²_b/n_b)²/(n_b−1))
    Cohen's d = (m_a − m_b) / s_pooled,
    s_pooled = sqrt(((n_a−1)s²_a + (n_b−1)s²_b) / (n_a+n_b−2))

The p-value needs the t CDF (no closed form in either engine's SQL) —
consumers look the statistic up; the engine's job is the exact
statistic at corpus scale: ONE hash aggregate over the events (both
variants in the same pass via conditional aggregation), everything
else scalar arithmetic on a 1-row frame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ab_metrics(
    df: DataFrame, variant: Column, metric: Column
) -> DataFrame:
    """One-row experiment readout. ``variant`` must be a boolean
    Column (True = treatment A); NULL metrics are excluded from both
    arms (SQL aggregate semantics)."""
    a = F.when(variant, metric)
    b = F.when(~variant, metric)
    agg = df.agg(
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
        F.avg(a).alias("mean_a"),
        F.avg(b).alias("mean_b"),
        F.var_samp(a).alias("var_a"),
        F.var_samp(b).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    pooled = F.sqrt(
        ((F.col("n_a") - 1) * F.col("var_a") + (F.col("n_b") - 1) * F.col("var_b"))
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    diff = F.col("mean_a") - F.col("mean_b")
    return agg.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        diff.alias("diff"),
        (diff / pooled).alias("cohens_d"),
        (diff / F.sqrt(se_a + se_b)).alias("welch_t"),
        (
            (se_a + se_b) * (se_a + se_b)
            / (
                se_a * se_a / (F.col("n_a") - 1)
                + se_b * se_b / (F.col("n_b") - 1)
            )
        ).alias("welch_df"),
    )


def ab_metrics_by(
    df: DataFrame, segment_cols: list[str], variant: Column, metric: Column
) -> DataFrame:
    """Segmented readout: the same statistics per segment (one row per
    segment) — still ONE conditional hash aggregate, now keyed."""
    a = F.when(variant, metric)
    b = F.when(~variant, metric)
    agg = df.groupBy(*segment_cols).agg(
        F.count(a).alias("n_a"),
        F.count(b).alias("n_b"),
        F.avg(a).alias("mean_a"),
        F.avg(b).alias("mean_b"),
        F.var_samp(a).alias("var_a"),
        F.var_samp(b).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    pooled = F.sqrt(
        ((F.col("n_a") - 1) * F.col("var_a") + (F.col("n_b") - 1) * F.col("var_b"))
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    diff = F.col("mean_a") - F.col("mean_b")
    return agg.select(
        *segment_cols,
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        diff.alias("diff"),
        (diff / pooled).alias("cohens_d"),
        (diff / F.sqrt(se_a + se_b)).alias("welch_t"),
    )


def cuped_adjust(
    per_user: DataFrame,
    pre_col: str = "pre",
    post_col: str = "post",
) -> DataFrame:
    """CUPED variance reduction (Deng et al., 2013 — public): adjust
    each unit's post-period metric by its pre-period covariate,

        y_adj = y − θ·(x − x̄),   θ = cov(x, y) / var(x)

    which preserves the treatment-effect estimate while shrinking
    variance by the pre/post correlation². θ and x̄ come from ONE
    aggregate over all units (pooled across arms — the standard,
    assignment-independent choice); the adjustment is map-only.

    Input: one row per unit with (pre, post). Output: input +
    ``adjusted``. Compose with ``ab_metrics`` on ``adjusted`` for the
    tightened readout."""
    stats = per_user.agg(
        F.covar_samp(F.col(pre_col), F.col(post_col)).alias("__cov"),
        F.var_samp(F.col(pre_col)).alias("__var"),
        F.avg(F.col(pre_col)).alias("__xbar"),
    )
    theta = F.when(F.col("__var") > 0, F.col("__cov") / F.col("__var")).otherwise(
        F.lit(0.0)
    )
    return (
        per_user.crossJoin(F.broadcast(stats))
        .withColumn(
            "adjusted",
            F.col(post_col) - theta * (F.col(pre_col) - F.col("__xbar")),
        )
        .drop("__cov", "__var", "__xbar")
    )
