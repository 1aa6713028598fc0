"""Skewed-key stress for the SCD2/window core (VERDICT r4 #4).

SCALE.md's original claim — "AQE handles skewed keys" for the one
unavoidable key shuffle — is FALSE for window partitions: AQE splits
oversized shuffle partitions for sort-merge JOINS, not for windows.
These tests (a) measure the skew a hot key actually produces under
key-hash partitioning, (b) prove the two mitigations shipped in r5:

- ``window_latest_event_per_user`` rewritten as an algebraic
  ``max(struct(...))`` aggregate — partial-aggregated map-side, so a
  hot key reduces to one row per input task before the shuffle;
- ``scd2_build_skewed`` — per-key time-range salting of the chain
  window, exact-equal to ``scd2_build`` (also DuckDB-oracled as the
  overflow entry ``scd2_build_skew_salted``).
"""

from __future__ import annotations

import datetime as dt
import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.plans.inspect import formatted_plan

from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_build,
    scd2_build_skewed,
    scd2_invariants,
)

N_PARTS = 32


def _spread(df, *cols):
    """max/median row count over the partitions a key-hash exchange on
    ``cols`` produces — exactly the distribution the window's internal
    Exchange hashpartitioning(cols) feeds its sort tasks."""
    counts = [
        r.n
        for r in df.repartition(N_PARTS, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return max(counts) / statistics.median(counts)


def _hot_events(spark, n_hot=3000, n_cold=7000, n_keys=200):
    """One key (id 0) carries ~30% of all events."""
    rows = [
        (0, i, float(i), dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 7))
        for i in range(n_hot)
    ] + [
        (1 + (i % n_keys), 100_000 + i, float(i),
         dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 3))
        for i in range(n_cold)
    ]
    return spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )


def _norm(df):
    return sorted(
        tuple(str(v) for v in row) for row in df.collect()
    )


def test_hot_key_skews_window_exchange_and_bucketing_flattens_it(spark):
    """MEASUREMENT: key-hash partitioning puts the hot key's 30% of
    rows in one partition (>4x median — the straggler AQE will NOT
    split); adding the time-bucket to the partition key flattens the
    spread back under 4x."""
    ev = _hot_events(spark)
    plain = _spread(ev, "ProductID")
    assert plain > 4.0, f"hot key did not skew the exchange ({plain:.1f}x)"

    bucketed = ev.withColumn(
        "__b",
        F.ntile(32).over(  # proxy for the percentile edges: even ts split
            Window.partitionBy("ProductID").orderBy("change_ts")
        ),
    )
    flat = _spread(bucketed, "ProductID", "__b")
    assert flat <= 4.0, f"bucketed exchange still skewed ({flat:.1f}x)"


def test_scd2_build_skewed_equals_plain_on_hot_corpus(spark):
    ev = _hot_events(spark, n_hot=1500, n_cold=3000)
    plain = scd2_build(ev, "ProductID", "change_ts", ("seq",))
    salted = scd2_build_skewed(
        ev, "ProductID", "change_ts", ("seq",),
        hot_key_rows=100, n_ts_buckets=8,
    )
    assert _norm(salted) == _norm(plain)
    assert scd2_invariants(salted, "ProductID").count() == 0


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key (0 is hot-ish)
            st.integers(min_value=0, max_value=50),  # minute (ties likely)
            st.floats(min_value=0, max_value=100, allow_nan=False),
            st.booleans(),                           # tombstone
        ),
        min_size=1, max_size=60,
    ),
    threshold=st.integers(min_value=0, max_value=10),
    buckets=st.integers(min_value=2, max_value=6),
)
def test_scd2_build_skewed_property_equality(spark, events, threshold, buckets):
    """ADVERSARIAL: any key/ts/tie/tombstone mix, any hot threshold
    (0 = every key takes the bucketed path), any bucket count — the
    salted build must equal the plain build exactly."""
    rows = [
        (k, dt.datetime(2026, 1, 1, 8, m), p, i, tomb)
        for i, (k, m, p, tomb) in enumerate(events)
    ]
    schema = (
        "ProductID INT, change_ts TIMESTAMP, Price DOUBLE, seq LONG,"
        " deleted BOOLEAN"
    )
    df = spark.createDataFrame(rows, schema)
    plain = scd2_build(
        df, "ProductID", "change_ts", ("seq",), tombstone_col="deleted"
    )
    salted = scd2_build_skewed(
        df, "ProductID", "change_ts", ("seq",), tombstone_col="deleted",
        hot_key_rows=threshold, n_ts_buckets=buckets,
    )
    assert _norm(salted) == _norm(plain)


def test_latest_per_user_aggregate_is_partial_aggregated(spark):
    """The r5 argmax rewrite must show a partial_ hash aggregate BEFORE
    the exchange (map-side combine = skew immunity) and no window."""
    from architrave_project_apache_nifi_spark.queries import REGISTRY

    df = REGISTRY["window_latest_event_per_user"].fn(
        spark, "/root/testdata/sf0.001"
    )
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert "partial_max" in plan, plan


# ---------------------------------------------------------------------------
# Generalized skew-window toolkit (operators/skew_windows.py)

from architrave_project_apache_nifi_spark.operators.skew_windows import (  # noqa: E402
    running_window_skewed,
    sessionize_skewed,
)
from architrave_project_apache_nifi_spark.operators.temporal import (  # noqa: E402
    sessionize,
)


def test_sessionize_skewed_bit_identical(spark):
    """Session ids are integers — the bucketed form must be EXACTLY the
    plain form on a hot-key corpus (threshold forces the hot path for
    every key), including gap-on-boundary and tie cases."""
    ev = _hot_events(spark, n_hot=900, n_cold=1500, n_keys=40)
    # widen gaps so sessions actually break: scale seconds to minutes
    ev = ev.withColumn(
        "change_ts",
        F.timestamp_seconds(
            F.unix_timestamp("change_ts") * 40 % 100_000_000
        ),
    )
    plain = sessionize(ev, "ProductID", "change_ts", 600.0, ("seq",))
    salted = sessionize_skewed(
        ev, "ProductID", "change_ts", 600.0, ("seq",),
        hot_key_rows=10, n_ts_buckets=7,
    )
    cols = ["ProductID", "seq", "session_id"]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )


def test_running_window_skewed_matches_plain(spark):
    """Row numbers / ntiles / lag deltas exact; running sums within FP
    reassociation tolerance."""
    ev = _hot_events(spark, n_hot=700, n_cold=900, n_keys=25)
    w = Window.partitionBy("ProductID").orderBy("change_ts", "seq")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    plain = {
        (r.ProductID, r.seq): (r.run, r.delta, r.tile)
        for r in ev.select(
            "ProductID", "seq",
            F.sum("Price").over(wcum).alias("run"),
            (F.col("Price") - F.lag("Price").over(w)).alias("delta"),
            F.ntile(4).over(w).alias("tile"),
        ).collect()
    }
    salted = {
        (r.ProductID, r.seq): (r.running_sum, r.delta_vs_prev, r.tile)
        for r in running_window_skewed(
            ev, "ProductID", "change_ts", "Price", ("seq",),
            hot_key_rows=10, n_ts_buckets=6,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k, (run, delta, tile) in plain.items():
        srun, sdelta, stile = salted[k]
        assert stile == tile, (k, stile, tile)
        assert (sdelta is None) == (delta is None)
        if delta is not None:
            assert abs(sdelta - delta) < 1e-9
        assert abs(srun - run) <= 1e-6 * max(1.0, abs(run)), (k, srun, run)


def test_sessionize_skewed_null_ts_and_single_ts(spark):
    """Degenerate shapes: NULL event times (bucket 0, sort-first) and a
    hot key with ONE distinct timestamp (unsplittable by contract) must
    still be bit-identical to the plain form."""
    import datetime as dt2

    rows = (
        [(1, i, 1.0, None) for i in range(5)]
        + [(2, 100 + i, 2.0, dt2.datetime(2026, 1, 1, 9, 0)) for i in range(50)]
        + [(3, 200 + i, 3.0, dt2.datetime(2026, 1, 1, 9, i % 45)) for i in range(60)]
    )
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    plain = sessionize(ev, "ProductID", "change_ts", 60.0, ("seq",))
    salted = sessionize_skewed(
        ev, "ProductID", "change_ts", 60.0, ("seq",),
        hot_key_rows=3, n_ts_buckets=4,
    )
    cols = ["ProductID", "seq", "session_id"]
    assert sorted(map(tuple, plain.select(*cols).collect())) == sorted(
        map(tuple, salted.select(*cols).collect())
    )


def test_asof_join_skewed_bit_identical(spark):
    """Backward as-of with the hot path forced on every key — including
    a key whose matching rights live only in earlier buckets (carry
    must fill across right-less buckets) — must equal temporal.asof_join
    exactly."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        asof_join_skewed,
    )
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join,
    )

    ev = _hot_events(spark, n_hot=800, n_cold=1200, n_keys=30)
    purchases = ev.filter(F.col("seq") % 3 == 0).select(
        "ProductID", F.col("seq").alias("p_seq"), "change_ts", "Price"
    )
    clicks = ev.filter(F.col("seq") % 3 != 0).select(
        "ProductID", "change_ts", F.col("seq").alias("event_id"),
        F.col("Price").alias("value"),
    )
    kw = dict(
        key_cols="ProductID", left_ts="change_ts", right_ts="change_ts",
        right_value_cols=("value", "event_id"),
        right_order_cols=("event_id",), prefix="last_",
    )
    plain = asof_join(purchases, clicks, **kw)
    salted = asof_join_skewed(
        purchases, clicks, **kw, hot_key_rows=10, n_ts_buckets=6
    )
    cols = ["ProductID", "p_seq", "last_value", "last_event_id"]
    assert sorted(
        map(tuple, plain.select(*cols).collect())
    ) == sorted(map(tuple, salted.select(*cols).collect()))


def test_running_and_asof_skewed_null_ts(spark):
    """NULL event times (bucket 0, NULLS FIRST ordering) must not
    diverge from the plain forms for the remaining family members."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        asof_join_skewed,
        running_window_skewed,
    )
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join,
    )

    rows = [
        (1, i, float(i), None if i % 7 == 0 else
         dt2.datetime(2026, 1, 1, 8, 0) + dt2.timedelta(minutes=i))
        for i in range(80)
    ] + [(2, 100 + i, float(i), dt2.datetime(2026, 1, 1, 9, i % 50))
         for i in range(30)]
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    w = Window.partitionBy("ProductID").orderBy("change_ts", "seq")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    plain_run = {
        (r.ProductID, r.seq): (r.run, r.tile)
        for r in ev.select(
            "ProductID", "seq",
            F.sum("Price").over(wcum).alias("run"),
            F.ntile(4).over(w).alias("tile"),
        ).collect()
    }
    got_run = {
        (r.ProductID, r.seq): (r.running_sum, r.tile)
        for r in running_window_skewed(
            ev, "ProductID", "change_ts", "Price", ("seq",),
            hot_key_rows=5, n_ts_buckets=4,
        ).collect()
    }
    assert set(plain_run) == set(got_run)
    for k, (run, tile) in plain_run.items():
        assert got_run[k][1] == tile
        assert abs(got_run[k][0] - run) < 1e-9

    left = ev.filter(F.col("seq") % 2 == 0).select(
        "ProductID", F.col("seq").alias("p_seq"), "change_ts"
    )
    right = ev.filter(F.col("seq") % 2 == 1).select(
        "ProductID", "change_ts", F.col("seq").alias("event_id"),
        F.col("Price").alias("value"),
    )
    kw = dict(
        key_cols="ProductID", left_ts="change_ts", right_ts="change_ts",
        right_value_cols=("value",), right_order_cols=("event_id",),
    )
    a = sorted(map(tuple, asof_join(left, right, **kw)
                   .select("ProductID", "p_seq", "asof_value").collect()))
    b = sorted(map(tuple, asof_join_skewed(
        left, right, **kw, hot_key_rows=5, n_ts_buckets=4
    ).select("ProductID", "p_seq", "asof_value").collect()))
    assert a == b


def test_scd2_build_skewed_null_ts_rows_match_plain(spark):
    """Hot key with MULTIPLE NULL event times (code-review r5): a NULL
    lead(ts) must not be mistaken for 'no next row' — only genuinely
    last rows may take the next bucket's boundary timestamp."""
    import datetime as dt2

    rows = (
        [(1, i, float(i), None) for i in range(4)]  # several NULL ts
        + [(1, 10 + i, float(i), dt2.datetime(2026, 1, 1, 8, i))
           for i in range(40)]
        + [(2, 100 + i, float(i), dt2.datetime(2026, 1, 1, 9, i % 30))
           for i in range(30)]
    )
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    plain = scd2_build(ev, "ProductID", "change_ts", ("seq",))
    salted = scd2_build_skewed(
        ev, "ProductID", "change_ts", ("seq",),
        hot_key_rows=5, n_ts_buckets=4,
    )
    assert _norm(salted) == _norm(plain)


def test_running_window_skewed_null_values_match_plain(spark):
    """NULL VALUES (not timestamps; code-review r5): sum skips NULLs,
    lag does not — delta must be NULL after a NULL-valued predecessor
    and the running sum must stay NULL only while the whole prefix is
    NULL-valued."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        running_window_skewed,
    )

    rows = [
        (1, i,
         None if i in (0, 1, 7, 20, 21) else float(i),
         dt2.datetime(2026, 1, 1, 8, 0) + dt2.timedelta(minutes=i))
        for i in range(60)
    ] + [(2, 100 + i, None, dt2.datetime(2026, 1, 1, 9, i))
         for i in range(10)]  # all-NULL key
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    w = Window.partitionBy("ProductID").orderBy("change_ts", "seq")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    plain = {
        (r.ProductID, r.seq): (r.run, r.delta)
        for r in ev.select(
            "ProductID", "seq",
            F.sum("Price").over(wcum).alias("run"),
            (F.col("Price") - F.lag("Price").over(w)).alias("delta"),
        ).collect()
    }
    got = {
        (r.ProductID, r.seq): (r.running_sum, r.delta_vs_prev)
        for r in running_window_skewed(
            ev, "ProductID", "change_ts", "Price", ("seq",),
            hot_key_rows=5, n_ts_buckets=5,
        ).collect()
    }
    assert set(plain) == set(got)
    for k, (run, delta) in plain.items():
        srun, sdelta = got[k]
        assert (srun is None) == (run is None), (k, srun, run)
        if run is not None:
            assert abs(srun - run) < 1e-9, (k, srun, run)
        assert (sdelta is None) == (delta is None), (k, sdelta, delta)
        if delta is not None:
            assert abs(sdelta - delta) < 1e-9


def test_asof_join_forward_skewed_bit_identical(spark):
    """Forward mirror: earliest right at-or-after, smallest-order tie
    break, carry inherited from HIGHER time buckets — exact equality
    with temporal.asof_join_forward under the forced hot path,
    including NULL left timestamps."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        asof_join_forward_skewed,
    )
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join_forward,
    )

    ev = _hot_events(spark, n_hot=800, n_cold=1200, n_keys=30)
    left = ev.filter(F.col("seq") % 3 == 0).select(
        "ProductID", F.col("seq").alias("p_seq"),
        F.when(F.col("seq") % 9 == 0, F.lit(None)).otherwise(
            F.col("change_ts")
        ).alias("change_ts"),
    )
    right = ev.filter(F.col("seq") % 3 != 0).select(
        "ProductID", "change_ts", F.col("seq").alias("event_id"),
        F.col("Price").alias("value"),
    )
    kw = dict(
        key_cols="ProductID", left_ts="change_ts", right_ts="change_ts",
        right_value_cols=("value", "event_id"),
        right_order_cols=("event_id",),
    )
    a = sorted(map(tuple, asof_join_forward(left, right, **kw)
                   .select("ProductID", "p_seq", "next_value",
                           "next_event_id").collect()))
    b = sorted(map(tuple, asof_join_forward_skewed(
        left, right, **kw, hot_key_rows=10, n_ts_buckets=6
    ).select("ProductID", "p_seq", "next_value",
             "next_event_id").collect()))
    assert a == b


def test_apply_late_skewed_rebuild_matches_plain(spark):
    """scd2_apply_late(skewed_rebuild=True) must equal the plain splice
    (the bucketed rebuild is exact) on a hot-key backfill."""
    from architrave_project_apache_nifi_spark.operators.scd2 import (
        scd2_apply_late,
    )

    ev = _hot_events(spark, n_hot=600, n_cold=900, n_keys=20)
    first = ev.filter(F.col("seq") % 2 == 0)
    late = ev.filter(F.col("seq") % 2 == 1)
    hist = scd2_build(first, "ProductID", "change_ts", ("seq",))
    plain = scd2_apply_late(hist, late, "ProductID", "change_ts", ("seq",))
    salted = scd2_apply_late(
        hist, late, "ProductID", "change_ts", ("seq",),
        skewed_rebuild=True, hot_key_rows=50, n_ts_buckets=6,
    )
    assert _norm(salted) == _norm(plain)
    assert scd2_invariants(salted, "ProductID").count() == 0


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=5),   # minute — heavy ties
            st.floats(min_value=0, max_value=9, allow_nan=False),
        ),
        min_size=1, max_size=40,
    ),
    buckets=st.integers(min_value=2, max_value=5),
)
def test_sessionize_and_running_skewed_property(spark, events, buckets):
    """ADVERSARIAL ties (code-review hardening): many rows share the
    same timestamp, so bucket edges constantly fall ON tied values —
    the equal-ts-same-bucket invariant and the tie ordering across
    summaries must hold for ANY draw. Threshold 0 forces the hot path
    for every key."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        running_window_skewed,
        sessionize_skewed,
    )
    from architrave_project_apache_nifi_spark.operators.temporal import (
        sessionize,
    )

    rows = [
        (k, i, v, dt2.datetime(2026, 1, 1, 8, m))
        for i, (k, m, v) in enumerate(events)
    ]
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    plain_s = sessionize(ev, "ProductID", "change_ts", 90.0, ("seq",))
    got_s = sessionize_skewed(
        ev, "ProductID", "change_ts", 90.0, ("seq",),
        hot_key_rows=0, n_ts_buckets=buckets,
    )
    cols = ["ProductID", "seq", "session_id"]
    assert sorted(map(tuple, plain_s.select(*cols).collect())) == sorted(
        map(tuple, got_s.select(*cols).collect())
    )

    w = Window.partitionBy("ProductID").orderBy("change_ts", "seq")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    plain_r = {
        (r.ProductID, r.seq): (r.run, r.delta, r.tile)
        for r in ev.select(
            "ProductID", "seq",
            F.sum("Price").over(wcum).alias("run"),
            (F.col("Price") - F.lag("Price").over(w)).alias("delta"),
            F.ntile(4).over(w).alias("tile"),
        ).collect()
    }
    got_r = {
        (r.ProductID, r.seq): (r.running_sum, r.delta_vs_prev, r.tile)
        for r in running_window_skewed(
            ev, "ProductID", "change_ts", "Price", ("seq",),
            hot_key_rows=0, n_ts_buckets=buckets,
        ).collect()
    }
    assert set(plain_r) == set(got_r)
    for k, (run, delta, tile) in plain_r.items():
        srun, sdelta, stile = got_r[k]
        assert stile == tile
        assert (sdelta is None) == (delta is None)
        if delta is not None:
            assert abs(sdelta - delta) < 1e-9
        assert abs(srun - run) < 1e-9


def test_trailing_range_window_skewed_matches_plain(spark):
    """Trailing RANGE frame as a difference of two skew-resilient
    prefix reads: NULL values, tied epoch seconds, and a hot key must
    all match the plain rangeBetween window exactly."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        trailing_range_window_skewed,
    )

    rows = [
        (k, k * 1000 + i,
         None if i % 6 == 0 else float(i % 9),
         dt2.datetime(2026, 1, 1) + dt2.timedelta(hours=(i * 5) % 200))
        for k in range(4)
        for i in range(120 if k == 0 else 30)   # key 0 hot
    ]
    rows += [(0, 5000 + i, 2.0, dt2.datetime(2026, 1, 1, 3, 0, 30))
             for i in range(4)]  # tied second on the hot key
    ev = spark.createDataFrame(
        rows, "user_id INT, event_id LONG, value DOUBLE, ts TIMESTAMP"
    )
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(sec).rangeBetween(-86400, 0)
    plain = {
        (r.user_id, r.event_id): (r.s, r.c)
        for r in ev.select(
            "user_id", "event_id",
            F.sum("value").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        ).collect()
    }
    got = {
        (r.user_id, r.event_id): (r.trail_sum, r.trail_cnt)
        for r in trailing_range_window_skewed(
            ev, "user_id", "ts", "value", 86400,
            hot_key_rows=20, n_ts_buckets=5,
        ).collect()
    }
    assert set(plain) == set(got)
    for k, (s, c) in plain.items():
        gs, gc = got[k]
        assert gc == c, (k, gc, c)
        assert (gs is None) == (s is None), (k, gs, s)
        if s is not None:
            assert abs(gs - s) < 1e-9


def test_trailing_range_window_skewed_subsecond_ties(spark):
    """ADVICE r5 (high): the RANGE frame ties on epoch seconds, so the
    buckets must be a function of the epoch second. With sub-second
    timestamps dense enough that a percentile edge lands mid-second,
    the old micros-bucketed form split same-second tie groups across
    buckets and undercounted trail_sum/trail_cnt for the earlier rows
    (repro: 400 events 100 ms apart, hot_key_rows=50, n_ts_buckets=7
    -> 33/400 rows wrong). Must match the plain window exactly."""
    import datetime as dt2

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        trailing_range_window_skewed,
    )

    base = dt2.datetime(2026, 1, 1)
    rows = [
        (1, i, float(i % 7),
         base + dt2.timedelta(milliseconds=100 * i))
        for i in range(400)
    ]
    # second key, cold, sparse sub-second ties
    rows += [
        (2, 1000 + i, 1.0, base + dt2.timedelta(milliseconds=250 * i))
        for i in range(20)
    ]
    ev = spark.createDataFrame(
        rows, "user_id INT, event_id LONG, value DOUBLE, ts TIMESTAMP"
    )
    win_s = 5
    sec = F.col("ts").cast("long")
    w = (
        Window.partitionBy("user_id").orderBy(sec).rangeBetween(-win_s, 0)
    )
    plain = {
        (r.user_id, r.event_id): (r.s, r.c)
        for r in ev.select(
            "user_id", "event_id",
            F.sum("value").over(w).alias("s"),
            F.count(F.lit(1)).over(w).alias("c"),
        ).collect()
    }
    got = {
        (r.user_id, r.event_id): (r.trail_sum, r.trail_cnt)
        for r in trailing_range_window_skewed(
            ev, "user_id", "ts", "value", win_s,
            hot_key_rows=50, n_ts_buckets=7,
        ).collect()
    }
    assert set(plain) == set(got)
    bad = [
        k for k, (s, c) in plain.items()
        if got[k][1] != c or abs((got[k][0] or 0.0) - (s or 0.0)) > 1e-9
    ]
    assert not bad, f"{len(bad)} rows wrong, e.g. {bad[:5]}"


# ---------------------------------------------------------------------------
# skew_protection="auto" (r7): the plain entry points detect and route


def test_auto_skew_protection_routes_hot_corpus(spark):
    """The r5-r6 gap: a user calling the PLAIN scd2_build / sessionize
    / running_window on a skewed corpus hit the measured 9.9x window
    straggler unless they knew to pick the _skewed twin. With
    skew_protection='auto' (the default) one bounded sampled job
    detects the hot key and the call routes through the bucketed twin
    — same output, time-bucketed plan."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        engage_skew_protection,
        has_hot_keys,
        running_window,
    )
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _hot_events(spark, n_hot=1200, n_cold=2000)
    assert has_hot_keys(
        ev, "ProductID", "change_ts", hot_key_rows=500, n_ts_buckets=4
    )
    # production threshold (5M): this corpus is cold
    assert not has_hot_keys(ev, "ProductID", "change_ts")

    # scd2_build: auto engages (bucket column in the plan) and output
    # equals the unprotected form
    off = scd2_build(
        ev, "ProductID", "change_ts", ("seq",), skew_protection=False
    )
    auto = scd2_build(
        ev, "ProductID", "change_ts", ("seq",),
        hot_key_rows=500, n_ts_buckets=8,
    )
    # cold corpus (default 5M threshold): plan shape identical to off —
    # signatures taken BEFORE any collect (an executed df explains its
    # AQE-final plan, not the deterministic initial one)
    cold_auto = scd2_build(ev, "ProductID", "change_ts", ("seq",))
    assert plan_signature(cold_auto) == plan_signature(off)
    assert "__b" not in formatted_plan(cold_auto)
    assert "__b" in formatted_plan(auto), "auto did not take the bucketed path"
    assert _norm(auto) == _norm(off)

    # sessionize: integer session ids bit-identical through the gate
    sess_off = sessionize(
        ev, "ProductID", "change_ts", 600.0, ("seq",), skew_protection=False
    )
    sess_auto = sessionize(
        ev, "ProductID", "change_ts", 600.0, ("seq",),
        hot_key_rows=500, n_ts_buckets=6,
    )
    assert "__b" in formatted_plan(sess_auto)
    cols = ["ProductID", "seq", "session_id"]
    assert sorted(map(tuple, sess_auto.select(*cols).collect())) == sorted(
        map(tuple, sess_off.select(*cols).collect())
    )

    # running_window: integers exact, running sum within reassociation
    run_off = {
        (r.ProductID, r.seq): (r.running_sum, r.delta_vs_prev, r.tile)
        for r in running_window(
            ev, "ProductID", "change_ts", "Price", ("seq",),
            skew_protection=False,
        ).collect()
    }
    auto_df = running_window(
        ev, "ProductID", "change_ts", "Price", ("seq",),
        hot_key_rows=500, n_ts_buckets=6,
    )
    assert "__b" in formatted_plan(auto_df)
    run_auto = {
        (r.ProductID, r.seq): (r.running_sum, r.delta_vs_prev, r.tile)
        for r in auto_df.collect()
    }
    assert set(run_off) == set(run_auto)
    for k, (run, delta, tile) in run_off.items():
        arun, adelta, atile = run_auto[k]
        assert atile == tile
        assert (adelta is None) == (delta is None)
        if delta is not None:
            assert abs(adelta - delta) < 1e-9
        assert abs(arun - run) <= 1e-6 * max(1.0, abs(run))

    # mode validation
    import pytest

    with pytest.raises(ValueError, match="skew_protection"):
        engage_skew_protection(ev, "ProductID", "change_ts", "always", 5, 4)


def test_hot_detection_sampled_branch_and_salt(spark):
    """ADVICE r6: exercise the SAMPLED detection branch (denom > 1,
    i.e. hot_key_rows >= 100 * n_ts_buckets) end-to-end, and the
    sample_salt_cols wiring: a hot key with row-distinct timestamps is
    detected straight from the 1% hash sample; a hot key whose rows
    tie on TWO coarse timestamps is all-or-nothing per (key, ts) draw
    (the documented under-detection) until the per-row salt column is
    mixed into the sampling hash."""
    import datetime as dt

    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        has_hot_keys,
        hot_ts_buckets,
    )

    base = dt.datetime(2026, 3, 1)
    fine = spark.createDataFrame(
        [
            (0, i, base + dt.timedelta(seconds=i))
            for i in range(2000)
        ],
        "ProductID INT, seq LONG, change_ts TIMESTAMP",
    )
    # hot_key_rows=200 >= 100*n_ts_buckets(2) -> denom=100 (sampled);
    # ~20 sampled rows estimate the key at ~2000 >> 200
    assert has_hot_keys(
        fine, "ProductID", "change_ts", hot_key_rows=200, n_ts_buckets=2
    )
    bucketed = hot_ts_buckets(
        fine, "ProductID", "change_ts", hot_key_rows=200, n_ts_buckets=2
    )
    n_buckets = bucketed.select("__b").distinct().count()
    assert n_buckets == 2, f"sampled detection did not bucket ({n_buckets})"

    # coarse ties: 2 distinct ts x 1000 rows — the (key, ts) hash has
    # two draws at 1%; with THESE timestamps neither lands in the
    # sample (pinned deterministic data), so the unsalted estimate
    # under-detects; the per-row salt makes the sample per-row again
    coarse = spark.createDataFrame(
        [
            (0, i, base + dt.timedelta(hours=i % 2))
            for i in range(2000)
        ],
        "ProductID INT, seq LONG, change_ts TIMESTAMP",
    )
    unsalted = has_hot_keys(
        coarse, "ProductID", "change_ts", hot_key_rows=200, n_ts_buckets=2
    )
    salted = has_hot_keys(
        coarse, "ProductID", "change_ts", hot_key_rows=200, n_ts_buckets=2,
        sample_salt_cols=("seq",),
    )
    assert salted, "per-row salt failed to detect the tie-coarse hot key"
    assert not unsalted, (
        "expected the pinned coarse-ts corpus to dodge the unsalted "
        "sample (update the pinned timestamps if the hash changed)"
    )

    # parity with EXACT counting (VERDICT r7 #4): hot_key_rows=200 <
    # 100*n_ts_buckets(4) -> denom=1, no sampling — the salted sampled
    # decision above must agree with the exact one
    exact = has_hot_keys(
        coarse, "ProductID", "change_ts", hot_key_rows=200, n_ts_buckets=4
    )
    assert exact == salted, "sampled+salted detection diverged from exact"


def test_auto_skew_protection_asof_both_directions(spark):
    """asof_join / asof_join_forward share the auto gate (r7): the
    detection probe is the UNION of both sides' (key, ts) projections
    — what the as-of window actually partitions — so a hot key on
    EITHER side engages the bucketed twin; output bit-identical, cold
    plans unchanged."""
    from architrave_project_apache_nifi_spark.operators.temporal import (
        asof_join,
        asof_join_forward,
    )
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _hot_events(spark, n_hot=800, n_cold=1200, n_keys=30)
    purchases = ev.filter(F.col("seq") % 3 == 0).select(
        "ProductID", F.col("seq").alias("p_seq"), "change_ts", "Price"
    )
    clicks = ev.filter(F.col("seq") % 3 != 0).select(
        "ProductID", "change_ts", F.col("seq").alias("event_id"),
        F.col("Price").alias("value"),
    )
    for fn, pfx in ((asof_join, "asof_"), (asof_join_forward, "next_")):
        kw = dict(
            key_cols="ProductID", left_ts="change_ts", right_ts="change_ts",
            right_value_cols=("value", "event_id"),
            right_order_cols=("event_id",),
        )
        off = fn(purchases, clicks, **kw, skew_protection=False)
        cold = fn(purchases, clicks, **kw)  # 5M threshold: no hot key
        auto = fn(purchases, clicks, **kw, hot_key_rows=300, n_ts_buckets=5)
        assert plan_signature(cold) == plan_signature(off)
        assert "__b" not in formatted_plan(cold)
        assert "__b" in formatted_plan(auto), f"{pfx} auto did not engage"
        cols = ["ProductID", "p_seq", f"{pfx}value", f"{pfx}event_id"]
        assert sorted(map(tuple, auto.select(*cols).collect())) == sorted(
            map(tuple, off.select(*cols).collect())
        )


def test_auto_gate_hands_edges_to_twin(spark):
    """code-review r7: the auto gate must not pay detection twice — the
    engaged plan joins the HARVESTED local edges (no percentile_approx
    node), while the forced twin (skew_protection=True, lazy by
    contract) still detects in-plan."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        detect_hot_edges,
    )

    ev = _hot_events(spark, n_hot=1200, n_cold=2000)
    auto = scd2_build(
        ev, "ProductID", "change_ts", ("seq",),
        hot_key_rows=500, n_ts_buckets=8,
    )
    forced = scd2_build(
        ev, "ProductID", "change_ts", ("seq",),
        skew_protection=True, hot_key_rows=500, n_ts_buckets=8,
    )
    assert "percentile_approx" not in formatted_plan(auto), (
        "auto re-detects in-plan — the detect_hot_edges harvest was lost"
    )
    assert "percentile_approx" in formatted_plan(forced)
    assert _norm(auto) == _norm(forced)

    # adversarial fallback: a hot set larger than max_hot_keys falls
    # back to lazy in-plan detection instead of collecting unbounded
    engaged, edges = detect_hot_edges(
        ev, "ProductID", "change_ts", hot_key_rows=5, n_ts_buckets=4,
        max_hot_keys=3,
    )
    assert engaged and edges is None


def test_auto_skew_protection_trailing_range(spark):
    """trailing_range_window (r7): the plain RANGE-frame form with the
    auto gate — probe runs on the epoch-second image (the twin buckets
    on seconds) salted with the raw ts; engaged output equals the
    unprotected frame exactly, cold plans identical."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        trailing_range_window,
    )
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _hot_events(spark, n_hot=900, n_cold=1400, n_keys=30)
    kw = dict(key_cols="ProductID", ts_col="change_ts", value_col="Price",
              window_s=3600)
    off = trailing_range_window(ev, **kw, skew_protection=False)
    cold = trailing_range_window(ev, **kw)
    auto = trailing_range_window(ev, **kw, hot_key_rows=300, n_ts_buckets=5)
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        trailing_range_window_skewed,
    )

    forced = trailing_range_window_skewed(
        ev, "ProductID", "change_ts", "Price", 3600,
        hot_key_rows=300, n_ts_buckets=5,
    )
    assert plan_signature(cold) == plan_signature(off)
    assert "__b" not in formatted_plan(cold)
    assert "__b" in formatted_plan(auto)
    # the harvested edges reach BOTH the main bucketing and the twin's
    # internal as-of composition (any monotone split is correct; edges
    # only steer balance — r7), so the auto plan carries ZERO in-plan
    # detection aggregates while the forced twin still detects lazily
    n_auto = formatted_plan(auto).count("partial_percentile_approx")
    n_forced = formatted_plan(forced).count("partial_percentile_approx")
    assert n_auto == 0, n_auto
    assert n_forced > 0, n_forced
    got_off = {
        (r.ProductID, r.seq): (r.trail_sum, r.trail_cnt)
        for r in off.collect()
    }
    got_auto = {
        (r.ProductID, r.seq): (r.trail_sum, r.trail_cnt)
        for r in auto.collect()
    }
    assert set(got_off) == set(got_auto)
    for k, (s, c) in got_off.items():
        as_, ac = got_auto[k]
        assert ac == c, k
        assert abs((as_ or 0.0) - (s or 0.0)) <= 1e-9, k


def _typed_hot_events(spark, n_hot=900, n_cold=1400, n_keys=30):
    """_hot_events plus a categorical value column with NULL holes —
    the sequences family's input shape (lag targets may be NULL)."""
    rows = [
        (0, i, None if i % 11 == 3 else f"t{i % 5}",
         dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 7))
        for i in range(n_hot)
    ] + [
        (1 + (i % n_keys), 100_000 + i, f"t{i % 4}",
         dt.datetime(2026, 1, 1) + dt.timedelta(seconds=i * 3))
        for i in range(n_cold)
    ]
    return spark.createDataFrame(
        rows, "ProductID INT, seq LONG, etype STRING, change_ts TIMESTAMP"
    )


def test_sequences_skewed_match_plain(spark):
    """event_ngrams_skewed / transition_matrix_skewed (r7): identical
    output to the plain per-key lag windows on a hot corpus, including
    NULL values carried across bucket boundaries (a NULL lag target
    must stay NULL — gram rows drop, transition rows drop — not be
    skipped over)."""
    from architrave_project_apache_nifi_spark.operators.sequences import (
        event_ngrams,
        event_ngrams_skewed,
        transition_matrix,
        transition_matrix_skewed,
    )

    ev = _typed_hot_events(spark)
    plain = event_ngrams(
        ev, "ProductID", ["change_ts", "seq"], "etype", 3,
        skew_protection=False,
    )
    twin = event_ngrams_skewed(
        ev, "ProductID", ["change_ts", "seq"], "etype", 3,
        hot_key_rows=300, n_ts_buckets=6,
    )
    assert "__b" in formatted_plan(twin)
    cols = ["ProductID", "seq", "gram"]
    assert _norm(twin.select(*cols)) == _norm(plain.select(*cols))

    tm_plain = transition_matrix(
        ev, "ProductID", ["change_ts", "seq"], "etype",
        skew_protection=False,
    )
    tm_twin = transition_matrix_skewed(
        ev, "ProductID", ["change_ts", "seq"], "etype",
        hot_key_rows=300, n_ts_buckets=6,
    )
    got_p = {(r.from_state, r.to_state): (r.n, r.p) for r in tm_plain.collect()}
    got_t = {(r.from_state, r.to_state): (r.n, r.p) for r in tm_twin.collect()}
    assert set(got_p) == set(got_t)
    for k, (n_, p_) in got_p.items():
        tn, tp = got_t[k]
        assert tn == n_, k
        assert abs(tp - p_) < 1e-12, k


def test_sequences_carry_walks_back_across_sparse_buckets(spark):
    """The tail carry's index-from-end arithmetic must stay exact when
    the immediately previous buckets hold FEWER than n-1 rows each:
    handcrafted edges isolate the first rows into single-row buckets,
    so a 4-gram's lags walk back through three buckets."""
    from architrave_project_apache_nifi_spark.operators.sequences import (
        event_ngrams,
        event_ngrams_skewed,
    )

    base = dt.datetime(2026, 1, 1)
    rows = [
        (0, i, f"v{i}", base + dt.timedelta(seconds=i)) for i in range(12)
    ]
    ev = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, etype STRING, change_ts TIMESTAMP"
    )
    # numeric edges (unix_micros doubles) slicing rows 0|1|2|3..11 —
    # buckets 0-2 hold ONE row each; schema mirrors _hot_edges_agg
    us = [
        float((base + dt.timedelta(seconds=i)).replace(
            tzinfo=dt.timezone.utc
        ).timestamp() * 1_000_000)
        for i in range(12)
    ]
    edges = spark.createDataFrame(
        [(0, us[0], us[1], us[2])],
        "ProductID INT, __e0 DOUBLE, __e1 DOUBLE, __e2 DOUBLE",
    )
    plain = event_ngrams(
        ev, "ProductID", ["change_ts", "seq"], "etype", 4,
        skew_protection=False,
    )
    twin = event_ngrams_skewed(
        ev, "ProductID", ["change_ts", "seq"], "etype", 4,
        n_ts_buckets=4, hot_edges=F.broadcast(edges),
    )
    cols = ["ProductID", "seq", "gram"]
    assert _norm(twin.select(*cols)) == _norm(plain.select(*cols))
    # sanity: the edges really did split (4 distinct buckets)
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        _bucket_rows,
    )
    n_buckets = (
        _bucket_rows(ev, ["ProductID"], "change_ts", edges, "left")
        .select("__b").distinct().count()
    )
    assert n_buckets == 4


def test_auto_skew_protection_sequences(spark):
    """The sequences entry points carry the standard auto contract:
    hot corpus engages the bucketed twin, cold corpus keeps a plan
    signature identical to skew_protection=False, and a
    non-bucketable order column falls back to plain under auto but
    raises under forced True."""
    import pytest

    from architrave_project_apache_nifi_spark.operators.sequences import (
        ngram_counts,
        transition_matrix,
    )
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _typed_hot_events(spark)
    off = ngram_counts(
        ev, "ProductID", ["change_ts", "seq"], "etype", 3,
        skew_protection=False,
    )
    cold = ngram_counts(ev, "ProductID", ["change_ts", "seq"], "etype", 3)
    auto = ngram_counts(
        ev, "ProductID", ["change_ts", "seq"], "etype", 3,
        hot_key_rows=300, n_ts_buckets=6,
    )
    assert plan_signature(cold) == plan_signature(off)
    assert "__b" not in formatted_plan(cold)
    assert "__b" in formatted_plan(auto)
    assert _norm(auto) == _norm(off)

    tm_auto = transition_matrix(
        ev, "ProductID", ["change_ts", "seq"], "etype",
        hot_key_rows=300, n_ts_buckets=6,
    )
    assert "__b" in formatted_plan(tm_auto)

    # string order col: auto silently keeps the plain window; forced
    # True names the problem
    ev_s = ev.withColumn("okey", F.format_string("k%09d", "seq"))
    plain_s = ngram_counts(
        ev_s, "ProductID", ["okey"], "etype", 3, hot_key_rows=300
    )
    assert "__b" not in formatted_plan(plain_s)
    with pytest.raises(ValueError, match="order_cols"):
        ngram_counts(
            ev_s, "ProductID", ["okey"], "etype", 3, skew_protection=True
        )


def test_topk_per_key_salted_matches_plain(spark):
    """topk_per_key (r7): the two-phase salted rank equals the plain
    row_number top-k exactly (superset-prune argument), the auto gate
    keeps cold corpora on the plain single-window plan, and forcing
    protection puts the salt in the plan."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        topk_per_key,
    )
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _hot_events(spark, n_hot=1200, n_cold=2000)
    order = [F.col("Price").desc(), F.col("seq")]
    off = topk_per_key(
        ev, "ProductID", order, 7, salt_cols=["seq"], skew_protection=False
    )
    forced = topk_per_key(
        ev, "ProductID", order, 7, salt_cols=["seq"], skew_protection=True,
        n_salts=8,
    )
    auto_cold = topk_per_key(ev, "ProductID", order, 7, salt_cols=["seq"])
    auto_hot = topk_per_key(
        ev, "ProductID", order, 7, salt_cols=["seq"], hot_key_rows=500,
        n_salts=8,
    )
    assert plan_signature(auto_cold) == plan_signature(off)
    assert "__salt" not in formatted_plan(auto_cold)
    assert "__salt" in formatted_plan(forced)
    assert "__salt" in formatted_plan(auto_hot)
    cols = ["ProductID", "seq", "rank"]
    want = _norm(off.select(*cols))
    assert _norm(forced.select(*cols)) == want
    assert _norm(auto_hot.select(*cols)) == want
    # k larger than some shards' row counts: still exact
    small = topk_per_key(
        ev, "ProductID", order, 300, salt_cols=["seq"],
        skew_protection=True, n_salts=8,
    )
    plain300 = topk_per_key(
        ev, "ProductID", order, 300, salt_cols=["seq"], skew_protection=False
    )
    assert _norm(small.select(*cols)) == _norm(plain300.select(*cols))

    import pytest

    with pytest.raises(ValueError, match="salt_cols"):
        topk_per_key(ev.select("ProductID"), "ProductID", order, 5)


def test_cooccurrence_heavy_user_cap_is_skew_safe(spark):
    """user_item_matrix's heavy-user cap and recommend_items' ranking
    route through topk_per_key — identical output to the plain window
    (pinned against a hand-rolled row_number), salted plan only when a
    user is hot."""
    from architrave_project_apache_nifi_spark.operators.cooccurrence import (
        user_item_matrix,
    )

    ev = _hot_events(spark, n_hot=1200, n_cold=2000).select(
        F.col("ProductID").alias("user_id"),
        (F.col("seq") % 37).alias("item_id"),
    )
    got = user_item_matrix(ev, max_items_per_user=5)
    ui = ev.groupBy(
        F.col("user_id").alias("user"), F.col("item_id").alias("item")
    ).agg(F.count(F.lit(1)).alias("n_interactions"))
    w = Window.partitionBy("user").orderBy(
        F.col("n_interactions").desc(), F.col("item")
    )
    want = (
        ui.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= 5)
        .drop("__r")
    )
    assert _norm(got) == _norm(want)


def test_token_budget_auto_skew_protection(spark):
    """token_budget_filter (r7): at 100 TB every stratum exceeds one
    task, so the per-stratum prefix sum carries the standard auto
    contract — the bucketed integer sum is BIT-exact vs the plain
    window, and cold corpora keep the plain plan signature."""
    from architrave_project_apache_nifi_spark.operators import sampling as sp
    from architrave_project_apache_nifi_spark.plans.inspect import plan_signature

    ev = _hot_events(spark, n_hot=1200, n_cold=2000).select(
        F.col("ProductID").alias("source"),
        F.col("seq").alias("doc_id"),
        (F.col("seq") % 97 + 1).alias("n"),
    )
    off = sp.token_budget_filter(
        ev, ["source"], "doc_id", F.col("n"), 5000, skew_protection=False
    )
    cold = sp.token_budget_filter(ev, ["source"], "doc_id", F.col("n"), 5000)
    auto = sp.token_budget_filter(
        ev, ["source"], "doc_id", F.col("n"), 5000,
        hot_key_rows=300, n_ts_buckets=6,
    )
    assert plan_signature(cold) == plan_signature(off)
    assert "__b" not in formatted_plan(cold)
    assert "__b" in formatted_plan(auto)
    assert _norm(auto) == _norm(off)  # integers: bit-exact, not approx


def test_token_budget_skewed_null_token_counts(spark):
    """code-review r7: a bucket whose LEADING rows have NULL token
    counts must carry the prior buckets' total forward (plain sum()
    skips NULLs), not poison cum_tokens to NULL — and an all-NULL
    prefix must still be NULL, exactly like the plain window."""
    from architrave_project_apache_nifi_spark.operators import sampling as sp

    rows = [
        # hot stratum 0: NULL tokens in runs of 2 every 5 rows, so
        # percentile bucket boundaries land on NULL-leading rows
        (0, i, None if i % 5 < 2 else (i % 97 + 1)) for i in range(1200)
    ] + [
        # stratum 1: ALL NULL (cum must stay NULL throughout)
        (1, i, None) for i in range(40)
    ] + [
        (2 + (i % 20), 10_000 + i, i % 50 + 1) for i in range(800)
    ]
    ev = spark.createDataFrame(rows, "source INT, doc_id LONG, n INT")
    off = sp.token_budget_filter(
        ev, ["source"], "doc_id", F.col("n"), 5000, skew_protection=False
    )
    auto = sp.token_budget_filter(
        ev, ["source"], "doc_id", F.col("n"), 5000,
        hot_key_rows=300, n_ts_buckets=6,
    )
    assert "__b" in formatted_plan(auto)
    assert _norm(auto) == _norm(off)

    # forced protection on a non-bucketable id must raise, not
    # silently keep the plain window
    import pytest

    ev_s = ev.withColumn("sid", F.format_string("d%09d", "doc_id"))
    with pytest.raises(ValueError, match="id_col"):
        sp.token_budget_filter(
            ev_s, ["source"], "sid", F.col("n"), 5000, skew_protection=True
        )


# provably-small short-circuit (VERDICT r7 #1): zero probe jobs when a
# parquet footer bound proves no key can reach hot_key_rows


def test_row_count_upper_bound_parquet_chain(spark):
    """The bound is exact on the shapes the plain entry points feed the
    auto gate — scan, scan+project+filter, sort/limit/repartition — and
    refuses (None) any shape that could multiply rows or hide the
    count: joins, unions, aggregates, createDataFrame (LogicalRDD)."""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        row_count_upper_bound,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = ev.count()
    assert row_count_upper_bound(ev, 10**9) == n
    chain = (
        ev.select("user_id", "ts", "value")
        .filter(F.col("user_id").isNotNull())
        .sort("ts")
        .repartition(4)
    )
    assert row_count_upper_bound(chain, 10**9) == n
    # early exit: once the running footer total reaches stop_at the
    # driver stops reading and returns the stop_at SENTINEL ("not
    # provably below"), never a partial total a caller could mistake
    # for a row estimate (r9 contract)
    assert row_count_upper_bound(ev, 5) == 5

    # union (the as-of gate's probe shape): inputFiles dedupes the
    # shared file, so the bound is footer-total x n_leaves — an upper
    # bound (here exact because both branches scan the whole file)
    assert row_count_upper_bound(ev.union(ev), 10**9) == 2 * n

    # unsafe shapes -> None (probe must run)
    assert (
        row_count_upper_bound(
            ev.alias("a").join(ev.alias("b"), "user_id"), 10**9
        )
        is None
    )
    assert row_count_upper_bound(ev.groupBy("user_id").count(), 10**9) is None
    local = spark.createDataFrame([(1,)], "x INT")
    assert row_count_upper_bound(local, 10**9) is None
    # explode multiplies rows -> must refuse
    arr = ev.select(F.array(F.lit(1), F.lit(2)).alias("a"))
    assert row_count_upper_bound(arr.select(F.explode("a")), 10**9) is None


def test_auto_gate_short_circuits_on_small_parquet(spark, monkeypatch):
    """has_hot_keys / _detect_hot_keys on a footer-bounded input return
    False WITHOUT running the sampled probe (the fix for
    window_running_spend's 2.02x: probe cost ~= query cost at sf0.1).
    Patching the sample constructor to raise proves zero probe work;
    the same call with a sub-bound threshold still runs and detects."""
    import architrave_project_apache_nifi_spark.operators.skew_windows as sw

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = ev.count()

    def _boom(*a, **k):
        raise AssertionError("probe ran despite a provably-small input")

    monkeypatch.setattr(sw, "_detection_sample", _boom)
    assert sw.has_hot_keys(ev, "user_id", "ts", hot_key_rows=n) is False
    engaged, hot = sw._detect_hot_keys(
        ev, ["user_id"], ["ts"], hot_key_rows=n, n_salts=8
    )
    assert engaged is False and hot is None
    monkeypatch.undo()

    # threshold below the bound: the probe DOES run (exact, denom=1)
    # and the hot key in this corpus is only as hot as its true count
    per_key_max = (
        ev.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
    )
    assert sw.has_hot_keys(
        ev, "user_id", "ts", hot_key_rows=per_key_max - 1, n_ts_buckets=2
    )
    assert not sw.has_hot_keys(
        ev, "user_id", "ts", hot_key_rows=per_key_max, n_ts_buckets=2
    )


from hypothesis import HealthCheck as _HC  # noqa: E402
from hypothesis import given as _given, settings as _settings  # noqa: E402
from hypothesis import strategies as _st  # noqa: E402


@_settings(
    max_examples=12, deadline=None,
    suppress_health_check=[_HC.too_slow, _HC.function_scoped_fixture],
)
@_given(
    ops=_st.lists(
        _st.sampled_from(
            ["filter", "project", "sort", "limit", "repartition",
             "distinct", "union_self", "withcol"]
        ),
        min_size=0, max_size=5,
    ),
    lim=_st.integers(min_value=0, max_value=2000),
)
def test_row_count_upper_bound_is_sound(spark, ops, lim):
    """PROPERTY: whatever chain of whitelisted ops is stacked on a
    parquet scan, row_count_upper_bound is either None (refused) or a
    TRUE upper bound on the actual count — the one invariant every
    footer-gated decision (skew probe skip, broadcast proof, band
    impl, gram guard) rests on. (stop_at here is far above any test
    count, so the early-exit sentinel — which is deliberately NOT a
    bound — never fires; its behavior is pinned in
    test_row_count_upper_bound_parquet_chain.)"""
    from architrave_project_apache_nifi_spark.operators.skew_windows import (
        row_count_upper_bound,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for op in ops:
        if op == "filter":
            df = df.filter(F.col("event_id") % 3 != 0)
        elif op == "project":
            df = df.select("event_id", "user_id", "ts")
        elif op == "sort":
            df = df.sort("event_id")
        elif op == "limit":
            df = df.limit(lim)
        elif op == "repartition":
            df = df.repartition(3)
        elif op == "distinct":
            df = df.distinct()
        elif op == "union_self":
            df = df.union(df)
        elif op == "withcol":
            df = df.withColumn("__x", F.col("event_id") * 2)
    bound = row_count_upper_bound(df, 10**9)
    if bound is not None:
        assert bound >= df.count()
