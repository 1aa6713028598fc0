from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.drift import (
    psi_categorical,
    psi_numeric,
    psi_report,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_identical_distributions_score_zero(spark, events):
    out = psi_numeric(events, events, "value").agg(F.sum("psi")).collect()[0][0]
    assert abs(out) < 1e-9
    cat = (
        psi_categorical(events, events, "event_type")
        .agg(F.sum("psi")).collect()[0][0]
    )
    assert abs(cat) < 1e-9


def test_shifted_distribution_scores_high(spark, events):
    shifted = events.withColumn("value", F.col("value") * 3 + 100)
    out = psi_numeric(events, shifted, "value").agg(F.sum("psi")).collect()[0][0]
    assert out > 0.25


def test_matches_reference_formula(spark):
    old = spark.createDataFrame(
        [(float(i % 10),) for i in range(1000)], "x double"
    )
    new = spark.createDataFrame(
        [(float(i % 5),) for i in range(1000)], "x double"
    )
    got = psi_numeric(old, new, "x", bins=5).agg(F.sum("psi")).collect()[0][0]
    # straight-line recompute: grid over old's [0,9], 5 bins of width 1.8
    def binify(x):
        return min(int((x - 0.0) / 9.0 * 5), 4)

    from collections import Counter

    co = Counter(binify(i % 10) for i in range(1000))
    cn = Counter(binify(i % 5) for i in range(1000))
    want = 0.0
    for b in set(co) | set(cn):
        po = max(co.get(b, 0) / 1000, 1e-6)
        pn = max(cn.get(b, 0) / 1000, 1e-6)
        want += (pn - po) * math.log(pn / po)
    assert abs(got - want) < 1e-9


def test_out_of_range_and_null_bins(spark):
    old = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    new = spark.createDataFrame([(99.0,), (None,)], "x double")
    bins = {r["bin"]: r for r in psi_numeric(old, new, "x", bins=4).collect()}
    assert bins[4]["p_new"] == 0.5  # overflow bin
    assert bins[-2]["p_new"] == 0.5  # null bin
    assert all(b["p_old"] == 0.0 for k, b in bins.items() if k in (4, -2))


def test_categorical_new_category_detected(spark):
    old = spark.createDataFrame([("a",), ("b",)], "c string")
    new = spark.createDataFrame([("a",), ("z",)], "c string")
    rows = {r["category"]: r for r in psi_categorical(old, new, "c").collect()}
    assert rows["z"]["p_old"] == 0.0 and rows["z"]["psi"] > 0


def test_report_verdicts(spark, events):
    drifted = events.withColumn("value", F.col("value") + 1000).withColumn(
        "event_type", F.lit("only_this")
    )
    rep = {
        r["column"]: r["verdict"]
        for r in psi_report(
            events, events, ["value"], ["event_type"]
        ).collect()
    }
    assert rep == {"value": "stable", "event_type": "stable"}
    rep2 = {
        r["column"]: r["verdict"]
        for r in psi_report(
            events, drifted, ["value"], ["event_type"]
        ).collect()
    }
    assert rep2["value"] == "shifted" and rep2["event_type"] == "shifted"


def test_ks_statistic_matches_scipy_free_reference(spark):
    """KS vs a straight-line numpy ECDF recompute on a known pair."""
    import numpy as np
    from architrave_project_apache_nifi_spark.operators.drift import ks_statistic

    a = [float(x) for x in range(100)]
    b = [float(x) * 1.5 + 10 for x in range(80)]
    o = spark.createDataFrame([(x,) for x in a], "x double")
    n = spark.createDataFrame([(x,) for x in b], "x double")
    got = ks_statistic(o, n, "x").collect()[0]
    assert got["n_old"] == 100 and got["n_new"] == 80

    va, vb = np.asarray(a), np.asarray(b)
    pooled = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(np.sort(va), pooled, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), pooled, side="right") / len(vb)
    want = float(np.abs(fa - fb).max())
    assert abs(got["ks_stat"] - want) < 1e-12


def test_ks_zero_for_identical_and_one_for_disjoint(spark):
    from architrave_project_apache_nifi_spark.operators.drift import ks_statistic

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    same = ks_statistic(events, events, "value").collect()[0]["ks_stat"]
    assert abs(same) < 1e-12
    lo = events.filter(F.col("value") < 50)
    hi = events.filter(F.col("value") >= 50)
    disjoint = ks_statistic(lo, hi, "value").collect()[0]["ks_stat"]
    assert abs(disjoint - 1.0) < 1e-12
