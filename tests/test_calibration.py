from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.calibration import (
    calibration_table,
    lift_table,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "id long, score double, y boolean")


def test_perfect_model_concentrates_lift_in_top_bin(spark):
    # 100 rows; top 10 scores are exactly the positives
    rows = [(i, float(100 - i), i < 10) for i in range(100)]
    df = _scored(spark, rows)
    lt = {r["bin"]: r for r in lift_table(
        df, F.col("score"), F.col("y"), F.col("id"), n_bins=10
    ).collect()}
    assert lt[1]["positives"] == 10 and lt[1]["rate"] == 1.0
    assert abs(lt[1]["lift"] - 10.0) < 1e-12  # base rate 0.1 → lift 10
    assert lt[1]["cum_capture"] == 1.0
    assert all(lt[b]["positives"] == 0 for b in range(2, 11))


def test_random_model_lift_near_one_everywhere(spark):
    rows = [(i, float((i * 37) % 101), i % 4 == 0) for i in range(400)]
    df = _scored(spark, rows)
    lt = lift_table(df, F.col("score"), F.col("y"), F.col("id")).collect()
    for r in lt:
        assert 0.0 <= r["lift"] <= 3.0  # loose sanity, no concentration
    assert abs(sum(r["positives"] for r in lt) - 100) < 1e-9


def test_cum_capture_monotone_to_one(spark):
    rows = [(i, float(i % 50), i % 3 == 0) for i in range(300)]
    df = _scored(spark, rows)
    lt = sorted(
        lift_table(df, F.col("score"), F.col("y"), F.col("id")).collect(),
        key=lambda r: r["bin"],
    )
    caps = [r["cum_capture"] for r in lt]
    assert all(b >= a - 1e-12 for a, b in zip(caps, caps[1:]))
    assert abs(caps[-1] - 1.0) < 1e-12


def test_calibration_bins_track_score_order(spark):
    rows = [(i, i / 100.0, (i % 100) < i // 10) for i in range(100)]
    df = _scored(spark, rows)
    ct = sorted(
        calibration_table(
            df, F.col("score"), F.col("y"), F.col("id"), n_bins=5
        ).collect(),
        key=lambda r: r["bin"],
    )
    scores = [r["mean_score"] for r in ct]
    assert scores == sorted(scores)  # ascending bins → ascending scores
    assert sum(r["n"] for r in ct) == 100


def test_roc_auc_perfect_random_and_ties(spark):
    from architrave_project_apache_nifi_spark.operators.calibration import roc_auc

    # perfect separation → AUC 1; inverted → 0
    rows = [(i, float(i), i >= 50) for i in range(100)]
    df = _scored(spark, rows)
    r = roc_auc(df, F.col("score"), F.col("y")).collect()[0]
    assert abs(r["auc"] - 1.0) < 1e-12 and r["n_pos"] == 50 and r["n_neg"] == 50
    inv = roc_auc(df, -F.col("score"), F.col("y")).collect()[0]
    assert abs(inv["auc"] - 0.0) < 1e-12
    # constant score → all tied → AUC exactly 0.5 via midranks
    const = _scored(spark, [(i, 1.0, i % 2 == 0) for i in range(100)])
    c = roc_auc(const, F.col("score"), F.col("y")).collect()[0]
    assert abs(c["auc"] - 0.5) < 1e-12


def test_roc_auc_matches_pair_counting(spark):
    import itertools

    from architrave_project_apache_nifi_spark.operators.calibration import roc_auc

    rows = [(i, float((i * 7) % 13), i % 3 == 0) for i in range(60)]
    df = _scored(spark, rows)
    got = roc_auc(df, F.col("score"), F.col("y")).collect()[0]["auc"]
    pos = [s for (_, s, y) in rows if y]
    neg = [s for (_, s, y) in rows if not y]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    want = wins / (len(pos) * len(neg))
    assert abs(got - want) < 1e-12
