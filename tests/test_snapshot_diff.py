from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_build,
    scd2_current,
)
from architrave_project_apache_nifi_spark.operators.snapshot_diff import (
    scd2_from_snapshots,
    snapshot_diff,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, price double")


def test_diff_classifies_all_transitions(spark):
    old = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (5, None, 5.0)])
    new = _snap(spark, [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0), (5, "e", 5.0)])
    out = {r["k"]: r for r in snapshot_diff(old, new, "k").collect()}
    assert 1 not in out  # unchanged
    assert out[2]["event_type"] == "update" and out[2]["name"] == "B"
    assert out[2]["changed_cols"] == "name"
    assert out[3]["event_type"] == "delete" and out[3]["name"] == "c"
    assert out[4]["event_type"] == "insert" and out[4]["price"] == 4.0
    # NULL → value is an update (null-safe compare)
    assert out[5]["event_type"] == "update" and out[5]["changed_cols"] == "name"


def test_diff_multi_column_change_list_sorted(spark):
    old = _snap(spark, [(1, "x", 1.0)])
    new = _snap(spark, [(1, "y", 9.0)])
    r = snapshot_diff(old, new, "k").collect()[0]
    assert r["changed_cols"] == "name,price"


def test_diff_round_trip_reconstructs_new(spark):
    """old + changeset == new: apply inserts/updates over old minus
    deletes must equal the new snapshot exactly."""
    old = _snap(spark, [(i, f"n{i}", float(i)) for i in range(50)])
    new = _snap(
        spark,
        [(i, f"n{i}" if i % 3 else "CHANGED", float(i)) for i in range(5, 55)],
    )
    diff = snapshot_diff(old, new, "k")
    upserts = diff.filter(F.col("event_type") != "delete").select(
        "k", "name", "price"
    )
    deleted = diff.filter(F.col("event_type") == "delete").select("k")
    changed_keys = diff.select("k")
    reconstructed = (
        old.join(changed_keys, "k", "left_anti")  # untouched rows
        .unionByName(upserts)
    )
    assert reconstructed.exceptAll(new).count() == 0
    assert new.exceptAll(reconstructed).count() == 0
    assert deleted.count() == 5  # keys 0-4 vanished


def test_empty_diff_for_identical_snapshots(spark):
    s = _snap(spark, [(1, "a", 1.0), (2, None, 2.0)])
    assert snapshot_diff(s, s, "k").count() == 0


def test_explicit_value_cols_subset(spark):
    old = _snap(spark, [(1, "a", 1.0)])
    new = _snap(spark, [(1, "a", 99.0)])
    # comparing only 'name' sees no change
    assert snapshot_diff(old, new, "k", value_cols=["name"]).count() == 0


def test_scd2_from_snapshots_builds_history(spark):
    s1 = _snap(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    s2 = _snap(spark, [(1, "a2", 1.0), (2, "b", 2.0), (3, "c", 3.0)])
    s3 = _snap(spark, [(1, "a2", 1.0), (3, "c", 3.5)])  # key 2 deleted
    changes = scd2_from_snapshots([(100, s1), (200, s2), (300, s3)], "k")
    hist = scd2_build(
        changes.select("k", "name", "price", "snapshot_ts", "is_delete"),
        "k",
        "snapshot_ts",
        tombstone_col="is_delete",
    )
    cur = {r["k"]: r for r in scd2_current(hist).collect()}
    assert set(cur) == {1, 3}
    assert cur[1]["name"] == "a2"
    assert cur[3]["price"] == 3.5
    # key 1 has two versions (a → a2); the old one is closed
    v1 = hist.filter(F.col("k") == 1).collect()
    assert len(v1) == 2
    assert sum(1 for r in v1 if r["is_current"] == "Y") == 1
