from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.incremental_agg import (
    agg_state,
    finalize,
    incremental_refresh,
    merge_states,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _canon(df):
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v for v in r)
        for r in df.collect()
    )


def test_split_merge_equals_full(spark, events):
    """state(A ∪ B) == merge(state(A), state(B)) — the associativity
    invariant, over an arbitrary 3-way split."""
    parts = [events.filter(F.col("event_id") % 3 == i) for i in range(3)]
    full = agg_state(events, ["event_type"], ["value"])
    merged = merge_states(
        merge_states(
            agg_state(parts[0], ["event_type"], ["value"]),
            agg_state(parts[1], ["event_type"], ["value"]),
            ["event_type"],
            ["value"],
        ),
        agg_state(parts[2], ["event_type"], ["value"]),
        ["event_type"],
        ["value"],
    )
    assert _canon(full.select(sorted(full.columns))) == _canon(
        merged.select(sorted(merged.columns))
    )


def test_groups_on_one_side_only_pass_through(spark):
    a = spark.createDataFrame([("x", 1.0)], "k string, v double")
    b = spark.createDataFrame([("y", 2.0), ("y", 4.0)], "k string, v double")
    m = merge_states(
        agg_state(a, ["k"], ["v"]), agg_state(b, ["k"], ["v"]), ["k"], ["v"]
    )
    rows = {r["k"]: r for r in m.collect()}
    assert rows["x"]["v_sum"] == 1.0 and rows["x"]["n_rows"] == 1
    assert rows["y"]["v_sum"] == 6.0 and rows["y"]["n_rows"] == 2


def test_nulls_follow_sql_semantics(spark):
    df = spark.createDataFrame(
        [("g", None), ("g", 3.0), ("g", None)], "k string, v double"
    )
    st = finalize(agg_state(df, ["k"], ["v"]), ["v"]).collect()[0]
    assert st["n_rows"] == 3 and st["v_count"] == 1
    assert st["v_sum"] == 3.0 and st["v_avg"] == 3.0
    all_null = spark.createDataFrame([("g", None)], "k string, v double")
    st2 = finalize(agg_state(all_null, ["k"], ["v"]), ["v"]).collect()[0]
    assert st2["v_count"] == 0 and st2["v_avg"] is None and st2["v_sum"] is None


def test_refresh_bootstrap_then_fold(spark, events):
    old = events.filter(F.col("event_id") % 2 == 0)
    new = events.filter(F.col("event_id") % 2 == 1)
    s0 = incremental_refresh(None, old, ["event_type"], ["value"])
    s1 = incremental_refresh(s0, new, ["event_type"], ["value"])
    full = agg_state(events, ["event_type"], ["value"])
    assert _canon(s1.select(sorted(s1.columns))) == _canon(
        full.select(sorted(full.columns))
    )


def test_merge_shuffles_state_rows_not_facts(spark, events):
    """The merge plan's exchanges hash-partition the state tables (by
    the group key), and the fact scan feeds only the delta's own
    partial agg — no second scan of history facts."""
    old_state = agg_state(
        events.filter(F.col("event_id") % 2 == 0), ["event_type"], ["value"]
    )
    delta = events.filter(F.col("event_id") % 2 == 1)
    plan = (
        incremental_refresh(old_state, delta, ["event_type"], ["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # partial agg before every exchange: HashAggregate appears both
    # below (partial) and above (final) the exchanges
    assert plan.count("HashAggregate") >= 4


def test_distinct_sketch_split_merge_equals_direct(spark, events):
    """The HLL distinct state (r7) obeys the same split+merge == direct
    invariant: estimates from a 3-way split folded with hll_union_agg
    equal the direct single-pass sketch's estimates exactly (sketch
    union is order- and split-invariant)."""
    keys, dc = ["event_type"], ["user_id"]
    parts = [
        events.filter(F.pmod(F.col("event_id"), 3) == i) for i in range(3)
    ]
    folded = None
    for p in parts:
        folded = incremental_refresh(folded, p, keys, [], dc)
    direct = agg_state(events, keys, [], dc)
    got = _canon(
        finalize(folded, [], dc).select("event_type", "user_id_approx_distinct")
    )
    want = _canon(
        finalize(direct, [], dc).select("event_type", "user_id_approx_distinct")
    )
    assert got == want


def test_distinct_sketch_estimate_accuracy_and_exact_small(spark, events):
    """Estimate quality: per-group approx distinct within 3% of the
    exact count at sf0.001 scale; a group whose true cardinality sits
    below the sketch's coupon threshold is EXACT."""
    state = agg_state(events, ["event_type"], [], ["user_id"])
    est = {
        r.event_type: r.user_id_approx_distinct
        for r in finalize(state, [], ["user_id"]).collect()
    }
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1, 0.03 * n), (k, est[k], n)

    # tiny cardinality: exact
    small = spark.createDataFrame(
        [("a", i % 7) for i in range(500)], "g STRING, v INT"
    )
    out = finalize(agg_state(small, ["g"], [], ["v"]), [], ["v"]).collect()
    assert out[0].v_approx_distinct == 7


def test_distinct_sketch_nulls_ignored_and_binary_state(spark):
    """NULL values are not counted (SQL count-distinct semantics) and
    the persisted state column is a bounded BINARY sketch."""
    df = spark.createDataFrame(
        [("a", None), ("a", 1), ("a", 1), ("a", 2), ("b", None)],
        "g STRING, v INT",
    )
    state = agg_state(df, ["g"], [], ["v"])
    assert dict(state.dtypes)["v_hll"] == "binary"
    got = {
        r.g: r.v_approx_distinct
        for r in finalize(state, [], ["v"]).collect()
    }
    assert got == {"a": 2, "b": 0}


def test_distinct_sketch_nondefault_lgk_refresh(spark, events):
    """code-review r7: hll_lgk threads through incremental_refresh so
    a non-default-lgK state folds instead of crashing on the first
    delta (hll_union_agg rejects mixed lgConfigK)."""
    keys, dc = ["event_type"], ["user_id"]
    b0 = events.filter(F.pmod(F.col("event_id"), 2) == 0)
    b1 = events.filter(F.pmod(F.col("event_id"), 2) == 1)
    state = incremental_refresh(None, b0, keys, [], dc, hll_lgk=14)
    state = incremental_refresh(state, b1, keys, [], dc, hll_lgk=14)
    got = _canon(
        finalize(state, [], dc).select("event_type", "user_id_approx_distinct")
    )
    want = _canon(
        finalize(agg_state(events, keys, [], dc, hll_lgk=14), [], dc)
        .select("event_type", "user_id_approx_distinct")
    )
    assert got == want
