"""Plan goldens for the ENGAGED auto-skew-gate paths (VERDICT r7 #5).

tests/plan_goldens.json pins every registry query's plan at sf0.001 —
where the auto gate stays COLD (no hot key at the production 5M
threshold), so the engaged twin shapes were protected only by the
r7 timing measurements (BASELINE.md r7 addenda). These goldens pin the
engaged shapes themselves on a small synthetic hot corpus, so a
planner-behavior change cannot silently re-introduce the three
measured r7 traps:

(a) harvested local-relation edges have unknown stats — without the
    F.broadcast hint the planner broadcast the 20M-row pruned SCAN
    (5.6x wall). Guard: broadcast_hash_join / broadcast_exchange
    counts in the signature (a flipped build side changes both).
(b) a __hot filter on the shared left-joined stream pushes
    isnotnull(__e0) through the join, the branch subtree stops
    matching the main branch, and AQE stage reuse dies (98 s vs 17 s).
    Guard: no `isnotnull(__e0` anywhere in the engaged plan (the
    hot-only summaries come from a pruned-scan inner join / semi join,
    never an edge-null filter).
(c) the auto gate must hand its harvested edges to the twin — zero
    partial_percentile_approx nodes in the engaged plan (in-plan
    re-detection means the gate's job was wasted and the un-cached
    lineage is scanned twice).

On an INTENTIONAL plan change, re-run this file with
`--regen-engaged-goldens` semantics: copy the printed signature from
the assertion message into GOLDENS below and review the diff — every
changed count is a changed shuffle/join/sort on the hot path.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.plans.inspect import (
    formatted_plan,
    plan_signature,
)

HOT_KEY_ROWS = 500


@pytest.fixture(scope="module")
def hot(spark):
    """One key (id 0) carries ~37% of rows — engages every auto gate at
    hot_key_rows=500. Deterministic local relation: unknown-stats
    leaves, exactly the r7 trap-(a) environment where the edge join's
    broadcast side is decided by the hint, not by size estimates."""
    rows = [
        (0, i, float(i), dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 7))
        for i in range(1200)
    ] + [
        (1 + (i % 200), 100_000 + i, float(i),
         dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 3))
        for i in range(2000)
    ]
    return spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )


def _build(name, hot):
    if name == "scd2_build":
        from architrave_project_apache_nifi_spark.operators.scd2 import scd2_build

        return scd2_build(
            hot, "ProductID", "change_ts", ("seq",),
            hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=8,
        )
    if name == "sessionize":
        from architrave_project_apache_nifi_spark.operators.temporal import sessionize

        return sessionize(
            hot, "ProductID", "change_ts", 600.0, ("seq",),
            hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
        )
    if name == "running_window":
        from architrave_project_apache_nifi_spark.operators.skew_windows import (
            running_window,
        )

        return running_window(
            hot, "ProductID", "change_ts", "Price", ("seq",),
            hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
        )
    if name in ("asof_join", "asof_join_forward"):
        from architrave_project_apache_nifi_spark.operators import temporal

        right = hot.select(
            "ProductID",
            F.col("change_ts").alias("r_ts"),
            F.col("Price").alias("r_val"),
            F.col("seq").alias("r_seq"),
        )
        fn = getattr(temporal, name)
        return fn(
            hot, right, "ProductID", "change_ts", "r_ts", ["r_val"],
            ["r_seq"], hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
        )
    if name == "trailing_range_window":
        from architrave_project_apache_nifi_spark.operators.skew_windows import (
            trailing_range_window,
        )

        return trailing_range_window(
            hot, "ProductID", "change_ts", "Price", 3600,
            hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=5,
        )
    if name in ("event_ngrams", "transition_matrix"):
        from architrave_project_apache_nifi_spark.operators import sequences

        typed = hot.withColumn(
            "etype", F.concat(F.lit("t"), (F.col("seq") % 5).cast("string"))
        )
        if name == "event_ngrams":
            return sequences.event_ngrams(
                typed, "ProductID", ["change_ts", "seq"], "etype", 3,
                hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
            )
        return sequences.transition_matrix(
            typed, "ProductID", ["change_ts", "seq"], "etype",
            hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
        )
    if name == "token_budget_filter":
        from architrave_project_apache_nifi_spark.operators import sampling

        return sampling.token_budget_filter(
            hot, ["ProductID"], "seq", (F.col("seq") % 7 + 1).cast("int"),
            5000, hot_key_rows=HOT_KEY_ROWS, n_ts_buckets=6,
        )
    raise AssertionError(name)


# Engaged-plan signatures captured on the corpus above (r8). Reviewed:
# every edge/summary join is a BroadcastHashJoin (trap a), the single
# SortMergeJoin per stream join is the bucketed main-stream join, and
# exchanges stay O(1) per window pass.
GOLDENS = {
    "scd2_build": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 2, "sort": 3, "sort_merge_join": 1,
        "broadcast_hash_join": 2, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 2,
    },
    "sessionize": {
        "exchange_hash": 10, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 4, "sort": 10, "sort_merge_join": 3,
        "broadcast_hash_join": 4, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 6,
    },
    "running_window": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 2, "sort": 6, "sort_merge_join": 1,
        "broadcast_hash_join": 2, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 2,
    },
    "asof_join": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 3, "sort": 5, "sort_merge_join": 1,
        "broadcast_hash_join": 3, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 2,
    },
    "asof_join_forward": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 3, "sort": 5, "sort_merge_join": 1,
        "broadcast_hash_join": 3, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 2,
    },
    "trailing_range_window": {
        "exchange_hash": 19, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 10, "sort": 17, "sort_merge_join": 4,
        "broadcast_hash_join": 10, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 8,
    },
    "event_ngrams": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 3, "sort": 5, "sort_merge_join": 1,
        "broadcast_hash_join": 3, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 4,
    },
    "transition_matrix": {
        "exchange_hash": 11, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 7, "sort": 10, "sort_merge_join": 2,
        "broadcast_hash_join": 7, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 8,
    },
    "token_budget_filter": {
        "exchange_hash": 4, "exchange_range": 0, "exchange_single": 0,
        "broadcast_exchange": 2, "sort": 4, "sort_merge_join": 1,
        "broadcast_hash_join": 2, "shuffled_hash_join": 0,
        "broadcast_nl_join": 0, "cartesian_product": 0, "window": 2,
    },
}


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_engaged_plan_matches_golden(spark, hot, name):
    df = _build(name, hot)
    plan = formatted_plan(df)
    assert "__b" in plan, f"{name}: auto gate did not engage on the hot corpus"
    # trap (c): harvested edges reach the twin — no in-plan re-detection
    assert "partial_percentile_approx" not in plan, (
        f"{name}: engaged plan re-detects in-plan (harvest lost)"
    )
    # trap (b): no edge-null hot filter pushed through the shared join
    assert "isnotnull(__e0" not in plan, (
        f"{name}: isnotnull(__e0) filter found — AQE stage reuse will die"
    )
    got = plan_signature(df)
    assert got == GOLDENS[name], (
        f"{name}: engaged plan shape drifted.\n got: {got}\n"
        f" want: {GOLDENS[name]}\n"
        "If intentional, update GOLDENS in this file and review the diff."
    )


@pytest.mark.parametrize("name", ["scd2_build", "sessionize", "running_window"])
def test_engaged_plan_reuses_exchanges_at_runtime(spark, hot, name):
    """The 98 s trap was RUNTIME: AQE stage reuse dying when branch
    subtrees stop matching (a pushed isnotnull(__e0) filter rewrote one
    branch's join). The static golden guards the shape; this guards the
    behavior — after execution, the AQE-final plan of each engaged
    summary pipeline must contain ReusedExchange nodes (measured
    deterministic on this corpus: sessionize shows 6)."""
    df = _build(name, hot)
    df.collect()
    plan = formatted_plan(df)
    assert "AdaptiveSparkPlan" in plan
    n = plan.count("ReusedExchange")
    assert n >= 1, (
        f"{name}: no ReusedExchange in the executed engaged plan — "
        "branch subtrees no longer match and every branch re-executes "
        "its scan+bucket lineage (the measured 98s-vs-17s trap)"
    )
