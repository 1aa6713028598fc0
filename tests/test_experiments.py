from __future__ import annotations

import math

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.experiments import ab_metrics


def test_matches_straight_line_statistics(spark):
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [2.0, 4.0, 6.0]
    rows = [(x, True) for x in a] + [(x, False) for x in b]
    df = spark.createDataFrame(rows, "v double, grp boolean")
    got = ab_metrics(df, F.col("grp"), F.col("v")).collect()[0]

    def mean(xs):
        return sum(xs) / len(xs)

    def var(xs):
        m = mean(xs)
        return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

    ma, mb, va, vb = mean(a), mean(b), var(a), var(b)
    na, nb = len(a), len(b)
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["mean_a"] - ma) < 1e-12 and abs(got["mean_b"] - mb) < 1e-12
    sp = math.sqrt(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2))
    assert abs(got["cohens_d"] - (ma - mb) / sp) < 1e-12
    se = va / na + vb / nb
    assert abs(got["welch_t"] - (ma - mb) / math.sqrt(se)) < 1e-12
    dfree = se * se / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert abs(got["welch_df"] - dfree) < 1e-9


def test_null_metrics_excluded_and_identical_arms_zero_effect(spark):
    # value depends on i//2 so both arms observe the identical multiset
    rows = [(float((i // 2) % 10), i % 2 == 0) for i in range(200)] + [(None, True)]
    df = spark.createDataFrame(rows, "v double, grp boolean")
    got = ab_metrics(df, F.col("grp"), F.col("v")).collect()[0]
    assert got["n_a"] == 100 and got["n_b"] == 100
    assert abs(got["diff"]) < 1e-12 and abs(got["welch_t"]) < 1e-12


def test_segmented_readout(spark):
    rows = [(float(i % 7), i % 2 == 0, "s" + str(i % 3)) for i in range(300)]
    df = spark.createDataFrame(rows, "v double, grp boolean, seg string")
    from architrave_project_apache_nifi_spark.operators.experiments import (
        ab_metrics_by,
    )

    out = ab_metrics_by(df, ["seg"], F.col("grp"), F.col("v"))
    rows_out = out.collect()
    assert {r["seg"] for r in rows_out} == {"s0", "s1", "s2"}
    for r in rows_out:
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_cuped_preserves_mean_and_reduces_variance(spark):
    import random

    from architrave_project_apache_nifi_spark.operators.experiments import (
        cuped_adjust,
    )

    rng = random.Random(7)
    # post strongly correlated with pre → big variance reduction
    rows = []
    for u in range(500):
        pre = rng.gauss(10, 3)
        post = pre * 1.5 + rng.gauss(0, 1)
        rows.append((u, pre, post))
    df = spark.createDataFrame(rows, "u long, pre double, post double")
    adj = cuped_adjust(df, "pre", "post")
    stats = adj.agg(
        F.avg("post").alias("m0"),
        F.avg("adjusted").alias("m1"),
        F.var_samp("post").alias("v0"),
        F.var_samp("adjusted").alias("v1"),
    ).collect()[0]
    assert abs(stats["m0"] - stats["m1"]) < 1e-9  # mean preserved
    assert stats["v1"] < 0.2 * stats["v0"]  # correlation² ≈ 0.95+ removed


def test_cuped_constant_pre_is_noop(spark):
    from architrave_project_apache_nifi_spark.operators.experiments import (
        cuped_adjust,
    )

    df = spark.createDataFrame(
        [(1, 5.0, 2.0), (2, 5.0, 4.0)], "u long, pre double, post double"
    )
    out = {r["u"]: r["adjusted"] for r in cuped_adjust(df).collect()}
    assert out == {1: 2.0, 2: 4.0}
