"""SCD2 core: golden scenario (FIXTURES.md F4), merge==rebuild property,
invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.tables import load
from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_apply,
    scd2_build,
    scd2_current,
    scd2_invariants,
    scd2_stamp_new,
)
from tests.conftest import SF_DIR


def _changes(spark):
    rows = [
        (9012, 106.0, dt.datetime(2023, 9, 27, 10, 1), 1),
        (9013, 77.0, dt.datetime(2023, 9, 27, 10, 2), 2),
        (9014, 56.0, dt.datetime(2023, 9, 27, 10, 3), 3),
        (9014, 100.0, dt.datetime(2023, 9, 27, 10, 4), 4),
        (9014, 120.0, dt.datetime(2023, 9, 27, 10, 5), 5),
    ]
    return spark.createDataFrame(
        rows, "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG"
    )


def test_scd2_build_golden(spark):
    hist = scd2_build(_changes(spark), "ProductID", "change_ts", ("seq",))
    rows = {
        (r.ProductID, r.Price): (r.valid_from, r.valid_until, r.is_current)
        for r in hist.collect()
    }
    assert len(rows) == 5
    # 9014: three chained versions, reference's multi-update bug fixed
    t3, t4, t5 = (dt.datetime(2023, 9, 27, 10, m) for m in (3, 4, 5))
    assert rows[(9014, 56.0)] == (t3, t4, "N")
    assert rows[(9014, 100.0)] == (t4, t5, "N")
    assert rows[(9014, 120.0)] == (t5, None, "Y")
    assert rows[(9012, 106.0)][2] == "Y" and rows[(9012, 106.0)][1] is None


def test_scd2_apply_equals_rebuild(spark):
    """Merging the second half of a change stream into the history built
    from the first half must equal building from the whole stream."""
    changes = _changes(spark)
    cutoff = dt.datetime(2023, 9, 27, 10, 3, 30)
    first = changes.filter(F.col("change_ts") < cutoff)
    second = changes.filter(F.col("change_ts") >= cutoff)

    merged = scd2_apply(
        scd2_build(first, "ProductID", "change_ts", ("seq",)),
        second,
        "ProductID",
        "change_ts",
        ("seq",),
    )
    rebuilt = scd2_build(changes, "ProductID", "change_ts", ("seq",))
    key = lambda r: (r.ProductID, r.Price, r.valid_from, r.valid_until, r.is_current)
    assert sorted(map(key, merged.collect())) == sorted(map(key, rebuilt.collect()))


def test_scd2_apply_multiple_batches_invariants(spark):
    """Apply three sequential batches; invariants must hold after each
    (the reference corrupts history on the 2nd update, README.md:186)."""
    changes = _changes(spark).orderBy("seq").collect()
    hist = None
    for row in changes:
        batch = _changes(spark).filter(F.col("seq") == row.seq)
        if hist is None:
            hist = scd2_build(batch, "ProductID", "change_ts", ("seq",))
        else:
            hist = scd2_apply(hist, batch, "ProductID", "change_ts", ("seq",))
        assert scd2_invariants(hist, "ProductID").count() == 0
    cur = {r.ProductID: r.Price for r in scd2_current(hist).collect()}
    assert cur == {9012: 106.0, 9013: 77.0, 9014: 120.0}


def test_scd2_tombstones_close_without_successor(spark):
    """Soft deletes: a tombstone closes the predecessor at the delete
    timestamp and emits no row; delete-then-reinsert starts a fresh
    version; a key whose last event is a tombstone has NO current row."""
    t = lambda m: dt.datetime(2023, 9, 27, 10, m)  # noqa: E731
    rows = [
        # key 1: insert, delete, re-insert → two versions, gap at delete
        (1, 10.0, t(1), 1, False),
        (1, None, t(2), 2, True),
        (1, 30.0, t(3), 3, False),
        # key 2: insert, delete (last) → one closed version, no current
        (2, 20.0, t(1), 4, False),
        (2, None, t(4), 5, True),
        # key 3: plain insert → current
        (3, 5.0, t(1), 6, False),
    ]
    changes = spark.createDataFrame(
        rows, "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG, tomb BOOLEAN"
    )
    hist = scd2_build(changes, "ProductID", "change_ts", ("seq",), tombstone_col="tomb")
    got = {
        (r.ProductID, r.Price): (r.valid_from, r.valid_until, r.is_current)
        for r in hist.collect()
    }
    assert len(got) == 4  # tombstones emit nothing
    assert got[(1, 10.0)] == (t(1), t(2), "N")  # closed AT the delete ts
    assert got[(1, 30.0)] == (t(3), None, "Y")  # fresh chain after re-insert
    assert got[(2, 20.0)] == (t(1), t(4), "N")  # deleted key: closed, no current
    assert got[(3, 5.0)] == (t(1), None, "Y")
    assert not [k for k, v in got.items() if k[0] == 2 and v[2] == "Y"]


def test_scd2_apply_tombstones_incremental_matches_rebuild(spark):
    """Applying a delete-carrying batch to an existing history equals
    the full rebuild with the same tombstones."""
    t = lambda m: dt.datetime(2023, 9, 27, 10, m)  # noqa: E731
    all_rows = [
        (1, 10.0, t(1), 1, False),
        (2, 20.0, t(1), 2, False),
        (1, None, t(5), 3, True),   # delete key 1 in batch 2
        (2, 25.0, t(6), 4, False),  # update key 2 in batch 2
        (1, 40.0, t(7), 5, False),  # re-insert key 1 in batch 2
    ]
    schema = "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG, tomb BOOLEAN"
    full = spark.createDataFrame(all_rows, schema)
    first = full.filter(F.col("seq") <= 2)
    second = full.filter(F.col("seq") > 2)
    hist = scd2_build(first, "ProductID", "change_ts", ("seq",), tombstone_col="tomb")
    merged = scd2_apply(
        hist, second, "ProductID", "change_ts", ("seq",), tombstone_col="tomb"
    )
    rebuilt = scd2_build(full, "ProductID", "change_ts", ("seq",), tombstone_col="tomb")
    canon = lambda df: sorted(  # noqa: E731
        (r.ProductID, r.Price, r.valid_from, r.valid_until, r.is_current)
        for r in df.collect()
    )
    assert canon(merged) == canon(rebuilt)


def test_scd2_apply_broadcast_auto_both_paths_identical(spark):
    """The auto-sized broadcast decision may only change the physical
    plan: forcing the shuffle path (max_broadcast_keys=0) must produce
    the identical history, and the auto path on a small batch must
    actually broadcast (history never shuffles)."""
    from architrave_project_apache_nifi_spark.plans import inspect as pi

    changes = _changes(spark)
    first = changes.filter(F.col("seq") <= 3)
    second = changes.filter(F.col("seq") > 3)
    hist = scd2_build(first, "ProductID", "change_ts", ("seq",))

    auto = scd2_apply(hist, second, "ProductID", "change_ts", ("seq",))
    key = lambda r: (r.ProductID, r.valid_from, r.Price)  # noqa: E731
    a = sorted(((key(r), r.valid_until, r.is_current) for r in auto.collect()))
    pi.assert_broadcast_join(auto)

    # force the over-threshold path AND keep Catalyst from silently
    # re-broadcasting the tiny summary on its own
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        forced_shuffle = scd2_apply(
            hist, second, "ProductID", "change_ts", ("seq",), max_broadcast_keys=0
        )
        b = sorted(
            ((key(r), r.valid_until, r.is_current) for r in forced_shuffle.collect())
        )
        assert "BroadcastHashJoin" not in pi.formatted_plan(forced_shuffle)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert a == b


def test_scd2_invariants_flags_null_until_with_successor(spark):
    """A non-current row whose valid_until is NULL but that HAS a later
    version is a broken chain — the null-safe comparison must flag it
    (a plain != yields NULL and silently passes such histories)."""
    t = dt.datetime(2023, 9, 27, 10, 0)
    rows = [
        (1, 10.0, t, None, "N"),  # buggy writer forgot to close the interval
        (1, 20.0, t.replace(minute=5), None, "Y"),
    ]
    hist = spark.createDataFrame(
        rows,
        "ProductID INT, Price DOUBLE, valid_from TIMESTAMP, "
        "valid_until TIMESTAMP, is_current STRING",
    )
    violations = {r.violation for r in scd2_invariants(hist, "ProductID").collect()}
    assert "broken_interval_chain" in violations


def test_scd2_stamp_new_matches_reference_defaults(spark):
    df = spark.createDataFrame([(1, 10.0)], "ProductID INT, Price DOUBLE")
    out = scd2_stamp_new(df).collect()[0]
    assert out.valid_until is None
    assert out.is_current == "Y"
    assert out.valid_from is not None


def test_scd2_build_on_events_table(spark):
    """Real testdata: version each user's event stream."""
    events = load(spark, "events", SF_DIR)
    hist = scd2_build(events, "user_id", "ts", ("event_id",))
    assert hist.count() == events.count()
    assert scd2_invariants(hist, "user_id").count() == 0
    n_users = events.select("user_id").distinct().count()
    assert scd2_current(hist).count() == n_users


def test_scd2_as_of_point_in_time(spark):
    """As-of lookup: version containing the instant; half-open bounds
    (an event AT the instant wins); tombstone-deleted keys absent; a
    Column timestamp correlates per row."""
    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_as_of

    t = lambda m: dt.datetime(2023, 9, 27, 10, m)  # noqa: E731
    rows = [
        (1, 10.0, t(0), 1, False),
        (1, 20.0, t(5), 2, False),   # exactly at the probe instant
        (2, 30.0, t(1), 3, False),
        (2, None, t(4), 4, True),    # deleted before the probe
        (3, 40.0, t(8), 5, False),   # born after the probe
    ]
    hist = scd2_build(
        spark.createDataFrame(
            rows,
            "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG, tomb BOOLEAN",
        ),
        "ProductID", "change_ts", ("seq",), tombstone_col="tomb",
    )
    got = {r.ProductID: r.Price for r in scd2_as_of(hist, t(5)).collect()}
    assert got == {1: 20.0}  # key 2 deleted, key 3 not yet born, 1@t5 wins

    earlier = {r.ProductID: r.Price for r in scd2_as_of(hist, t(2)).collect()}
    assert earlier == {1: 10.0, 2: 30.0}

    # column mode: each probe row carries its own instant — join first so
    # the timestamp column is in scope, then the same interval predicate
    probes = spark.createDataFrame(
        [(1, t(2)), (1, t(6)), (3, t(9))], "pid INT, at TIMESTAMP"
    )
    joined = probes.join(hist, F.col("pid") == F.col("ProductID"), "left")
    j2 = scd2_as_of(joined, F.col("at"), ts_is_col=True).select(
        "pid", "at", "Price"
    )
    got2 = {(r.pid, r.at): r.Price for r in j2.collect()}
    assert got2 == {(1, t(2)): 10.0, (1, t(6)): 20.0, (3, t(9)): 40.0}


def test_scd2_invariants_allow_gaps_for_tombstoned_history(spark):
    """allow_gaps: a delete-then-reinsert gap is healthy; an OVERLAP is
    still flagged in both modes."""
    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_invariants

    t = lambda m: dt.datetime(2023, 9, 27, 10, m)  # noqa: E731
    rows = [
        (1, 10.0, t(1), 1, False),
        (1, None, t(2), 2, True),   # delete → gap before re-insert
        (1, 30.0, t(5), 3, False),
    ]
    hist = scd2_build(
        spark.createDataFrame(
            rows,
            "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG, tomb BOOLEAN",
        ),
        "ProductID", "change_ts", ("seq",), tombstone_col="tomb",
    )
    # strict mode flags the legal tombstone gap; gap-aware mode is clean
    assert scd2_invariants(hist, "ProductID").count() == 1
    assert scd2_invariants(hist, "ProductID", allow_gaps=True).count() == 0

    # an overlapping pair is broken in BOTH modes
    bad = spark.createDataFrame(
        [
            (2, 1.0, t(0), t(9), "N"),   # overlaps its successor
            (2, 2.0, t(4), None, "Y"),
        ],
        "ProductID INT, Price DOUBLE, valid_from TIMESTAMP, valid_until TIMESTAMP, is_current STRING",
    )
    assert scd2_invariants(bad, "ProductID", allow_gaps=True).count() == 1
    assert scd2_invariants(bad, "ProductID").count() == 1


def test_scd2_apply_evolved_new_column_widens_history(spark):
    from architrave_project_apache_nifi_spark.operators.scd2 import (
        scd2_apply_evolved,
        scd2_build,
        scd2_invariants,
    )

    old = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0), (1, "2024-01-02 00:00:00", 11.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_build(old, "user_id", "ts")
    # The batch carries a column history has never seen (CDC schema
    # drift — the MySQL table gained `region`), and lacks none.
    batch = spark.createDataFrame(
        [(1, "2024-01-03 00:00:00", 12.0, "eu")],
        "user_id long, ts string, value double, region string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    merged = scd2_apply_evolved(hist, batch, "user_id", "ts")
    assert "region" in merged.columns
    rows = {r["valid_from"].isoformat(): r for r in merged.collect()}
    # Closed/old rows backfill NULL; the new version carries the value.
    assert rows["2024-01-01T00:00:00"]["region"] is None
    assert rows["2024-01-03T00:00:00"]["region"] == "eu"
    assert rows["2024-01-03T00:00:00"]["is_current"] == "Y"
    assert scd2_invariants(merged, "user_id").isEmpty()
    # And equals the full rebuild over the widened union.
    from architrave_project_apache_nifi_spark.operators.scd2 import widen_like

    full = scd2_build(
        widen_like(old, batch, exclude=("valid_from", "valid_until", "is_current")).unionByName(batch),
        "user_id",
        "ts",
    )
    assert sorted(
        (r["valid_from"], r["value"], r["region"]) for r in full.collect()
    ) == sorted((r["valid_from"], r["value"], r["region"]) for r in merged.collect())


def test_scd2_apply_evolved_rejects_missing_protocol_columns(spark):
    import pytest

    from architrave_project_apache_nifi_spark.operators.scd2 import (
        scd2_apply_evolved,
        scd2_build,
    )

    old = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hist = scd2_build(old, "user_id", "ts")
    batch_no_key = spark.createDataFrame(
        [("2024-01-03 00:00:00", 12.0)], "ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="protocol columns"):
        scd2_apply_evolved(hist, batch_no_key, "user_id", "ts")


def test_fits_broadcast_footer_shortcircuit(spark):
    """_fits_broadcast (r8): a parquet-backed changes frame whose
    footer row bound is under max_keys gates the broadcast with ZERO
    jobs (the summary's count() is never called); unknowable inputs
    (local relations) fall back to the measured summary count."""
    from architrave_project_apache_nifi_spark.operators.scd2 import (
        _fits_broadcast,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n = ev.count()

    class _Boom:
        def count(self):
            raise AssertionError("summary count ran despite footer proof")

    assert _fits_broadcast(ev, _Boom(), n) is True
    # bound over the threshold -> falls back to the summary count
    summary = ev.select("user_id").distinct()
    n_keys = summary.count()
    assert _fits_broadcast(ev, summary, n - 1) is (n_keys <= n - 1)
    # local relation: unknowable -> measured
    local = spark.createDataFrame([(1,)], "user_id INT")
    assert _fits_broadcast(local, local.distinct(), 0) is False
    assert _fits_broadcast(local, local.distinct(), 5) is True
