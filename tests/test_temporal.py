"""Hand-computable fixtures for the temporal operators
(operators/temporal.py): as-of join, binned range join, sessionization."""

from __future__ import annotations

import datetime as dt

from architrave_project_apache_nifi_spark.operators.temporal import (
    asof_join,
    range_join_binned,
    sessionize,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute, 0)


def test_asof_join_backward_inclusive_with_ties(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(30)), (2, 102, _ts(5))],
        "k INT, lid INT, ts TIMESTAMP",
    )
    right = spark.createDataFrame(
        [
            (1, 1, _ts(10), 11.0),   # same instant as lid=100 → inclusive
            (1, 2, _ts(10), 22.0),   # tie: larger rid wins
            (1, 3, _ts(20), 33.0),   # latest before lid=101
            (3, 4, _ts(1), 44.0),    # other key
        ],
        "k INT, rid INT, ts TIMESTAMP, price DOUBLE",
    )
    out = asof_join(
        left, right, "k", "ts", "ts",
        right_value_cols=("price",), right_order_cols=("rid",),
    )
    got = {r.lid: r.asof_price for r in out.collect()}
    assert got == {100: 22.0, 101: 33.0, 102: None}


def test_range_join_binned_exact_bounds(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(30))], "k INT, lid INT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [
            (1, 1, dt.datetime(2024, 1, 1, 9, 29, 59)),   # 1s too early
            (1, 2, dt.datetime(2024, 1, 1, 9, 30, 0)),    # exactly -1h
            (1, 3, _ts(0)),                               # inside
            (1, 4, _ts(30)),                              # exactly 0
            (1, 5, dt.datetime(2024, 1, 1, 10, 30, 1)),   # 1s too late
            (2, 6, _ts(0)),                               # wrong key
        ],
        "k INT, rid INT, ts TIMESTAMP",
    )
    out = range_join_binned(left, right, "k", "ts", "ts", -3600.0, 0.0)
    assert sorted(r.rid_r if hasattr(r, "rid_r") else r.rid for r in out.collect()) == [2, 3, 4]


def test_range_join_no_duplicate_pairs_across_bins(spark):
    # right rows sitting exactly on a bin edge must appear once
    left = spark.createDataFrame(
        [(1, i, _ts(i)) for i in range(0, 50, 5)], "k INT, lid INT, ts TIMESTAMP"
    )
    right = spark.createDataFrame(
        [(1, 100 + i, _ts(i)) for i in range(50)], "k INT, rid INT, ts TIMESTAMP"
    )
    out = range_join_binned(left, right, "k", "ts", "ts", -600.0, 0.0).collect()
    pairs = [(r.lid, r.rid) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate pairs from bin overlap"
    # each left sees right rows within the preceding 10 minutes inclusive
    for lid in range(0, 50, 5):
        expect = {100 + j for j in range(max(0, lid - 10), lid + 1)}
        assert {rid for l, rid in pairs if l == lid} == expect


def test_range_join_rejects_sub_microsecond_span(spark):
    import pytest

    from architrave_project_apache_nifi_spark.operators.temporal import (
        range_join_binned,
    )

    df = spark.createDataFrame([(1, None)], "k INT, ts TIMESTAMP")
    with pytest.raises(ValueError, match="microsecond"):
        range_join_binned(df, df, "k", "ts", "ts", 0.0, 5e-7)


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [
            (1, 1, _ts(0)),
            (1, 2, _ts(10)),   # gap 10m → same session
            (1, 3, _ts(45)),   # gap 35m → new session
            (2, 4, _ts(0)),    # other key restarts at 1
        ],
        "user_id INT, event_id INT, ts TIMESTAMP",
    )
    out = sessionize(df, "user_id", "ts", gap_s=1800.0, order_cols=("event_id",))
    got = {r.event_id: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_asof_forward_mirrors_backward(spark):
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join_forward,
    )

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 25, 101), (2, 5, 102)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 10, 7.0, 1), (1, 20, 8.0, 2), (1, 30, 9.0, 3), (2, 1, 5.0, 4)],
        "k long, ts long, v double, seq long",
    )
    out = {
        r["lid"]: r["next_v"]
        for r in asof_join_forward(
            left, right, "k", "ts", "ts",
            right_value_cols=("v",), right_order_cols=("seq",),
        ).collect()
    }
    assert out[100] == 7.0  # inclusive: right at ts=10 matches left ts=10
    assert out[101] == 9.0  # next at-or-after 25 is ts=30
    assert out[102] is None  # no right at-or-after ts=5 for key 2


def test_asof_forward_tie_resolves_to_smallest_seq(spark):
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join_forward,
    )

    left = spark.createDataFrame([(1, 10, 100)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 1.0, 9), (1, 10, 2.0, 3)], "k long, ts long, v double, seq long"
    )
    out = asof_join_forward(
        left, right, "k", "ts", "ts",
        right_value_cols=("v",), right_order_cols=("seq",),
    ).collect()[0]
    assert out["next_v"] == 2.0  # seq 3 < seq 9
