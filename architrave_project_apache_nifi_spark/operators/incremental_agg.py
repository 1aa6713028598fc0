"""Incremental aggregate maintenance (materialized-rollup upkeep):
keep a per-group aggregate STATE table and fold delta batches into it
without ever rescanning history.

The reference's flow maintains its history table incrementally (each
CDC event touches one key — README.md:102-123); this module is the
aggregation counterpart the engine needs at 100 TB: a nightly/streaming
rollup over an append-only fact stream costs O(delta + groups) per
refresh instead of O(history).

Works for the decomposable (self-merging) aggregates — count, sum,
min, max, and everything derivable from them (avg, rate, range). The
state for group g is one row of bounded width; merging two states is
the same hash aggregate as building one, so:

    state(A ∪ B) == merge(state(A), state(B))    (associative)

which is the invariant the oracle checks (full recompute == split +
merge, to the stated rounding). Non-decomposable exacts (median,
count-distinct) need sketches — see ``sketch_approx_aggs`` (HLL++/GK),
whose sketch states are likewise mergeable.

Scale notes: building a state shuffles the batch once on the group
key with map-side partial combine; merging shuffles STATE ROWS (one
per group per side), never facts. Store the state bucketed by the
group key and the merge is Exchange-free on the stored side
(operators/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Per-group decomposable state: ``n_rows`` + per-measure
    (count, sum, min, max). Nulls follow SQL semantics (not counted,
    ignored by min/max/sum)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.count(F.col(m)).alias(f"{m}_count"),
            F.sum(F.col(m)).alias(f"{m}_sum"),
            F.min(F.col(m)).alias(f"{m}_min"),
            F.max(F.col(m)).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    a: DataFrame, b: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Fold two state tables into one: union + the same hash agg with
    the merge combiners (sum of counts/sums, min of mins, max of
    maxes). Groups present in only one side pass through unchanged —
    union semantics, no outer-join null plumbing. The shuffle carries
    one state row per group per side."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def finalize(state: DataFrame, measures: list[str]) -> DataFrame:
    """Derive the presentation aggregates (avg = sum/count; count-0
    groups yield NULL avg like plain SQL AVG over all-null input)."""
    out = state
    for m in measures:
        out = out.withColumn(
            f"{m}_avg",
            F.when(
                F.col(f"{m}_count") > 0, F.col(f"{m}_sum") / F.col(f"{m}_count")
            ),
        )
    return out


def incremental_refresh(
    state: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
) -> DataFrame:
    """One maintenance step: aggregate the delta batch and fold it
    into the stored state (or bootstrap from the delta when no state
    exists yet). Cost: O(delta) + one state-row shuffle."""
    delta_state = agg_state(delta, keys, measures)
    if state is None:
        return delta_state
    return merge_states(state, delta_state, keys, measures)
