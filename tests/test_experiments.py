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
