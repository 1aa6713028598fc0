"""Item co-occurrence similarity + item-based collaborative filtering
— the interaction-graph counterpart of the embedding similarity path
(`similarity.py` ranks by content; this ranks by who-interacted).

Classic item-item CF (Sarwar et al., 2001 — public): two items are
similar when the same users touch both; a user's recommendations are
the items most similar to the ones they touched, minus what they
already saw.

    cosine(i, j) = co(i, j) / sqrt(n_i · n_j)        (binary
    interactions: co = users touching both, n_i = users touching i)

Scale notes: the pair generation is a self-join ON THE USER — the pair
space is Σ_u c_u² for c_u items per user, the known CF cost. The
``max_items_per_user`` cap bounds it (heavy users contribute little
signal per pair and quadratic cost — capping them is the standard
practice, applied deterministically by interaction count then item
id). Similarity and recommendation joins key on item ids; item
cardinality ≪ interactions, so those are broadcast-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def user_item_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item_id",
    max_items_per_user: int | None = None,
) -> DataFrame:
    """(user, item, n_interactions) — deduped interaction matrix. With
    ``max_items_per_user``, keep each user's top items by interaction
    count (ties by item id) — the deterministic heavy-user cap."""
    from .skew_windows import topk_per_key

    ui = events.groupBy(
        F.col(user_col).alias("user"), F.col(item_col).alias("item")
    ).agg(F.count(F.lit(1)).alias("n_interactions"))
    if max_items_per_user is None:
        return ui
    # the heavy-user cap must itself survive a heavy user: skew-safe
    # top-k (auto-salted two-phase rank — a bot touching millions of
    # distinct items would otherwise serialize one row_number task).
    # The gate probes the RAW events (per-user event rows upper-bound
    # distinct items), so it costs one scan, not a re-run of the
    # dedup aggregate (code-review r7)
    return topk_per_key(
        ui,
        "user",
        [F.col("n_interactions").desc(), F.col("item")],
        max_items_per_user,
        rank_col="__r",
        salt_cols=["item"],
        probe=events.select(
            F.col(user_col).alias("user"), F.col(item_col).alias("item")
        ),
    ).drop("__r")


def item_cosine_similarity(ui: DataFrame) -> DataFrame:
    """(item_a < item_b, co_users, cosine) over binary interactions:
    one user-keyed self-join for co-counts + a broadcast of the tiny
    per-item user counts."""
    a = ui.select("user", F.col("item").alias("item_a"))
    b = ui.select("user", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("co_users"))
    )
    n = ui.groupBy("item").agg(F.count(F.lit(1)).alias("__n"))
    return (
        co.join(F.broadcast(n.withColumnRenamed("item", "item_a")), "item_a")
        .withColumnRenamed("__n", "__na")
        .join(F.broadcast(n.withColumnRenamed("item", "item_b")), "item_b")
        .withColumnRenamed("__n", "__nb")
        .withColumn(
            "cosine", F.col("co_users") / F.sqrt(F.col("__na") * F.col("__nb"))
        )
        .select("item_a", "item_b", "co_users", "cosine")
    )


def recommend_items(
    ui: DataFrame,
    sim: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Item-based CF top-k: per user, score unseen items by the SUM of
    their similarity to the user's items, drop already-seen, rank.
    (user, item, score, rank). Joins key on item ids; the seen-set
    anti-join is a semi-structure the optimizer broadcasts when item
    cardinality is small."""
    edges = sim.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("other"), "cosine"
    ).unionByName(
        sim.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("other"), "cosine"
        )
    )
    scored = (
        ui.select("user", "item")
        .join(edges, "item")
        .groupBy("user", F.col("other").alias("item"))
        .agg(F.sum("cosine").alias("score"))
    )
    from .skew_windows import topk_per_key

    unseen = scored.join(ui.select("user", "item"), ["user", "item"], "left_anti")
    # same skew-safe top-k as the user_item_matrix cap — FORCED, not
    # auto (code-review r7): the input lineage here is the pairwise
    # scoring join, so an auto probe would execute the module's
    # heaviest stage twice; forced salting costs one extra window over
    # the <= n_salts x k survivors per user instead, and per-user
    # candidate counts (items similar to anything touched) are
    # unbounded anyway, so the salted plan is the one you'd want at
    # scale regardless
    return topk_per_key(
        unseen,
        "user",
        [F.col("score").desc(), F.col("item")],
        k,
        salt_cols=["item"],
        skew_protection=True,
    )
