from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.cooccurrence import (
    item_cosine_similarity,
    recommend_items,
    user_item_matrix,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, item_id long")


def test_cosine_matches_hand_computation(spark):
    # items: 1 touched by users {a,b,c}, 2 by {a,b}, 3 by {c}
    ev = _events(
        spark,
        [(10, 1), (11, 1), (12, 1), (10, 2), (11, 2), (12, 3), (10, 1)],
    )
    ui = user_item_matrix(ev, "user_id", "item_id")
    sim = {(r["item_a"], r["item_b"]): r for r in item_cosine_similarity(ui).collect()}
    assert sim[(1, 2)]["co_users"] == 2
    assert abs(sim[(1, 2)]["cosine"] - 2 / math.sqrt(3 * 2)) < 1e-12
    assert sim[(1, 3)]["co_users"] == 1
    assert (2, 3) not in sim  # no common user


def test_heavy_user_cap_is_deterministic(spark):
    ev = _events(spark, [(1, i) for i in range(10)] + [(1, 0)])
    ui = user_item_matrix(ev, "user_id", "item_id", max_items_per_user=3)
    items = sorted(r["item"] for r in ui.collect())
    # item 0 has 2 interactions (kept first); then items 1, 2 by id
    assert items == [0, 1, 2]


def test_recommendations_exclude_seen_and_rank(spark):
    # u1 saw {1,2}; u2 saw {1,3}; item 2 and 3 are both similar to 1
    ev = _events(spark, [(1, 1), (1, 2), (2, 1), (2, 3), (3, 2), (3, 3)])
    ui = user_item_matrix(ev, "user_id", "item_id")
    sim = item_cosine_similarity(ui)
    recs = recommend_items(ui, sim, k=2)
    by_user = {}
    for r in recs.collect():
        by_user.setdefault(r["user"], []).append(r)
    # u1 must not be recommended 1 or 2 (seen); 3 is reachable via both
    u1 = {r["item"] for r in by_user[1]}
    assert 1 not in u1 and 2 not in u1 and 3 in u1
    for rows in by_user.values():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(ranks) + 1))


def test_on_real_events_props_item(spark):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("item_id", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("item_id").isNotNull())
    )
    ui = user_item_matrix(events, "user_id", "item_id", max_items_per_user=20)
    sim = item_cosine_similarity(ui)
    assert sim.filter((F.col("cosine") <= 0) | (F.col("cosine") > 1.0 + 1e-12)).count() == 0
    recs = recommend_items(ui, sim, k=5)
    # no user is recommended an item they already saw
    leaked = recs.join(ui, ["user", "item"], "left_semi").count()
    assert leaked == 0
