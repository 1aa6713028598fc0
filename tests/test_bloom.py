from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.bloom import (
    bloom_prune,
    bloom_pruned_join,
    keyset_bitmap,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


def test_bitmap_is_bounded(spark, customer):
    bm = keyset_bitmap(customer, "c_custkey", m_bits=1 << 12)
    assert bm.count() <= (1 << 12) // 64


def test_prune_never_drops_true_matches(spark, orders, customer):
    dim = customer.filter(F.col("c_mktsegment") == "BUILDING")
    bm = keyset_bitmap(dim, "c_custkey", m_bits=1 << 16)
    pruned = bloom_prune(orders, bm, "o_custkey", m_bits=1 << 16)
    true_matches = orders.join(
        dim, orders["o_custkey"] == dim["c_custkey"], "left_semi"
    )
    # every true match survives the prune
    assert true_matches.join(
        pruned.select("o_orderkey"), "o_orderkey", "left_anti"
    ).count() == 0


def test_prune_is_selective(spark, orders, customer):
    dim = customer.filter(F.col("c_custkey") % 100 == 0)  # ~1% of keys
    bm = keyset_bitmap(dim, "c_custkey")
    pruned = bloom_prune(orders, bm, "o_custkey")
    # with m=2^20 and ~15 keys, false positives are ~0 — the pruned
    # fact should shrink to roughly the true-match count
    n_true = orders.join(dim, orders["o_custkey"] == dim["c_custkey"], "left_semi").count()
    n_pruned = pruned.count()
    assert n_true <= n_pruned <= max(2 * n_true, n_true + 50)


def test_pruned_join_equals_plain_join(spark, orders, customer):
    dim = customer.filter(F.col("c_mktsegment") == "AUTOMOBILE")
    ours = bloom_pruned_join(orders, dim, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey"
    )
    plain = orders.join(dim, orders["o_custkey"] == dim["c_custkey"]).select(
        "o_orderkey", "c_custkey"
    )
    assert ours.exceptAll(plain).count() == 0
    assert plain.exceptAll(ours).count() == 0


def test_outer_join_rejected(spark, orders, customer):
    with pytest.raises(ValueError):
        bloom_pruned_join(orders, customer, "o_custkey", "c_custkey", how="left")


def test_prune_plan_has_no_fact_exchange(spark, orders, customer):
    """The prune itself must not shuffle the fact: one broadcast join."""
    bm = keyset_bitmap(customer, "c_custkey")
    plan = (
        bloom_prune(orders, bm, "o_custkey")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the only Exchange allowed is the broadcast of the bitmap + the
    # bitmap's own tiny aggregation; the fact side must stream map-only
    assert "Exchange hashpartitioning(o_" not in plan
