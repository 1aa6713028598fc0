"""Property-based tests for snapshot diff and PSI drift: structural
invariants that must hold for ARBITRARY table versions and
distributions, not just the fixture shapes."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.drift import psi_numeric
from architrave_project_apache_nifi_spark.operators.snapshot_diff import (
    snapshot_diff,
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

_ROW = st.tuples(
    st.integers(0, 15),  # key
    st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),  # name
    st.one_of(st.none(), st.floats(-5, 5, allow_nan=False, width=32)),
)
_SNAP = st.lists(_ROW, max_size=12, unique_by=lambda r: r[0])


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, name string, v double")


@_SETTINGS
@given(old=_SNAP, new=_SNAP)
def test_old_plus_diff_equals_new(spark, old, new):
    """The defining invariant: applying the changeset to the old
    snapshot reconstructs the new one exactly, for any pair of keyed
    tables including NULLs on either side."""
    o, n = _df(spark, old), _df(spark, new)
    diff = snapshot_diff(o, n, "k")
    upserts = diff.filter(F.col("event_type") != "delete").select("k", "name", "v")
    touched = diff.select("k")
    reconstructed = o.join(touched, "k", "left_anti").unionByName(upserts)
    assert reconstructed.exceptAll(n).count() == 0
    assert n.exceptAll(reconstructed).count() == 0


@_SETTINGS
@given(old=_SNAP, new=_SNAP)
def test_diff_is_antisymmetric_on_insert_delete(spark, old, new):
    """Swapping the snapshots swaps inserts and deletes (updates stay
    updates)."""
    o, n = _df(spark, old), _df(spark, new)
    fwd = {r["k"]: r["event_type"] for r in snapshot_diff(o, n, "k").collect()}
    bwd = {r["k"]: r["event_type"] for r in snapshot_diff(n, o, "k").collect()}
    assert set(fwd) == set(bwd)
    flip = {"insert": "delete", "delete": "insert", "update": "update"}
    for k, et in fwd.items():
        assert bwd[k] == flip[et]


@_SETTINGS
@given(
    old=st.lists(st.floats(0, 100, allow_nan=False, width=32), min_size=2, max_size=30),
    new=st.lists(st.floats(-50, 200, allow_nan=False, width=32), min_size=1, max_size=30),
)
def test_psi_is_nonnegative_and_zero_iff_same(spark, old, new):
    """Every PSI term (p_new − p_old)·ln(p_new/p_old) is ≥ 0 (same
    sign factors), so the total is ≥ 0 for ANY pair of samples; a
    sample compared with itself scores ~0."""
    o = spark.createDataFrame([(x,) for x in old], "x double")
    n = spark.createDataFrame([(x,) for x in new], "x double")
    total = psi_numeric(o, n, "x", bins=5).agg(F.sum("psi")).collect()[0][0]
    assert total >= -1e-12
    self_total = psi_numeric(o, o, "x", bins=5).agg(F.sum("psi")).collect()[0][0]
    assert abs(self_total) < 1e-9
