from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.rfm import (
    rfm_features,
    rfm_segments,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_features_and_best_worst_segments(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: recent, frequent, big spender → 555
    for i in range(10):
        rows.append((1, t0 + dt.timedelta(days=9), 100.0))
    # user 2: stale, single, tiny → 111 (with >=5 users per tier)
    rows.append((2, t0, 1.0))
    # filler users in between
    for u in range(3, 11):
        for i in range(u):
            rows.append((u, t0 + dt.timedelta(days=u - 2), float(u)))
    df = _events(spark, rows)

    feats = {r["user"]: r for r in rfm_features(df).collect()}
    assert feats[1]["recency_s"] == 0
    assert feats[1]["frequency"] == 10
    assert feats[1]["monetary"] == 1000.0
    assert feats[2]["recency_s"] == 9 * 86400

    segs = {r["user"]: r for r in rfm_segments(df).collect()}
    assert segs[1]["segment"] == "555"
    assert segs[2]["segment"] == "111"
    for r in segs.values():
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_scores_deterministic_across_runs(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    a = sorted(map(tuple, rfm_segments(events).collect()))
    b = sorted(map(tuple, rfm_segments(events).collect()))
    assert a == b
