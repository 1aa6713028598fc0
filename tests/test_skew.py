"""Salting (operators/skew.py): results must be IDENTICAL to the
unsalted join/agg — salting may only change the physical distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import skew
from architrave_project_apache_nifi_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _skewed(spark):
    # 1000 rows of key 1 (the hot key) + 50 spread keys
    return spark.range(1050).select(
        F.when(F.col("id") < 1000, F.lit(1)).otherwise(F.col("id") - 998).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 10).alias("d"))
    plain = sorted((r.k, r.v, r.d) for r in big.join(dim, "k").collect())
    salted = sorted((r.k, r.v, r.d) for r in skew.salted_join(big, dim, "k").collect())
    assert salted == plain
    assert skew.SALT not in skew.salted_join(big, dim, "k").columns


def test_salted_join_left_outer(spark):
    big = _skewed(spark)
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    plain = sorted((r.k, r.v, r.d) for r in big.join(dim, "k", "left").collect())
    salted = sorted(
        (r.k, r.v, r.d) for r in skew.salted_join(big, dim, "k", how="left").collect()
    )
    assert salted == plain


def test_salted_join_semi_anti_parity(spark):
    """left_semi / left_anti never emit small-side rows, so salting is
    safe — results must equal the unsalted joins."""
    big = _skewed(spark)
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    for how in ("left_semi", "left_anti"):
        plain = sorted((r.k, r.v) for r in big.join(dim, "k", how).collect())
        salted = sorted(
            (r.k, r.v)
            for r in skew.salted_join(big, dim, "k", how=how).collect()
        )
        assert salted == plain, how


def test_salted_join_rejects_replication_unsafe_how(spark):
    """right/full would emit each unmatched small-side row once per salt
    replica — the join must refuse them."""
    big = _skewed(spark)
    dim = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    for how in ("right", "full", "outer", "full_outer", "cross"):
        with pytest.raises(ValueError, match="replication-safe"):
            skew.salted_join(big, dim, "k", how=how)


def test_salted_agg_matches_plain_agg(spark):
    events = load(spark, "events", SF_DIR)
    plain = {
        r.user_id: (r.n, r.s, r.lo, r.hi)
        for r in events.groupBy("user_id")
        .agg(
            F.count("event_id").alias("n"),
            F.round(F.sum("value"), 6).alias("s"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    }
    salted_df = skew.salted_agg(
        events,
        ["user_id"],
        {
            "n": ("count", "event_id"),
            "s": ("sum", "value"),
            "lo": ("min", "value"),
            "hi": ("max", "value"),
        },
        n_salts=8,
    ).withColumn("s", F.round("s", 6))
    got = {r.user_id: (r.n, r.s, r.lo, r.hi) for r in salted_df.collect()}
    assert got == plain


def test_salted_agg_rejects_non_algebraic(spark):
    events = load(spark, "events", SF_DIR)
    with pytest.raises(ValueError, match="non-algebraic"):
        skew.salted_agg(events, ["user_id"], {"m": ("median", "value")})


def test_salted_join_spreads_hot_key_across_partitions(spark):
    """The point of salting: the hot key's rows must land in more than
    one shuffle partition of the join."""
    big = _skewed(spark)
    dim = spark.range(60).select(F.col("id").alias("k"), F.lit(1).alias("d"))
    joined = skew.salted_join(big, dim, "k", n_salts=8)
    n_parts = (
        joined.filter(F.col("k") == 1)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts > 1, "hot key stayed on one partition — salt ineffective"
