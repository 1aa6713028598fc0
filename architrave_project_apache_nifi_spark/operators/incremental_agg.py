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
merge, to the stated rounding). COUNT DISTINCT is not decomposable
exactly, but it IS decomposable approximately: ``distinct_cols`` (r7)
maintains one Apache DataSketches HLL sketch per group per column
(``hll_sketch_agg`` — a bounded BINARY state column), merged with
``hll_union_agg`` and finalized to ``{col}_approx_distinct`` via
``hll_sketch_estimate``. Sketch union is order- and split-invariant,
so the same split+merge == direct invariant holds (pinned exactly in
tests — below the sketch's coupon-promotion threshold the estimate is
the exact distinct count). Exact medians/distincts on demand remain
the one-shot ``sketch_approx_aggs`` query path.

Scale notes: building a state shuffles the batch once on the group
key with map-side partial combine; merging shuffles STATE ROWS (one
per group per side), never facts. Store the state bucketed by the
group key and the merge is Exchange-free on the stored side
(operators/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame,
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] = [],
    hll_lgk: int = 12,
) -> DataFrame:
    """Per-group decomposable state: ``n_rows`` + per-measure
    (count, sum, min, max) + one mergeable HLL sketch per
    ``distinct_cols`` entry (``{col}_hll``, BINARY). Nulls follow SQL
    semantics (not counted, ignored by min/max/sum/sketch)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        aggs += [
            F.count(F.col(m)).alias(f"{m}_count"),
            F.sum(F.col(m)).alias(f"{m}_sum"),
            F.min(F.col(m)).alias(f"{m}_min"),
            F.max(F.col(m)).alias(f"{m}_max"),
        ]
    for c in distinct_cols:
        aggs.append(
            F.hll_sketch_agg(F.col(c), F.lit(hll_lgk)).alias(f"{c}_hll")
        )
    return df.groupBy(*keys).agg(*aggs)


def merge_states(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] = [],
) -> DataFrame:
    """Fold two state tables into one: union + the same hash agg with
    the merge combiners (sum of counts/sums, min of mins, max of
    maxes, ``hll_union_agg`` of sketches). Groups present in only one
    side pass through unchanged — union semantics, no outer-join null
    plumbing. The shuffle carries one state row per group per side."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_count").alias(f"{m}_count"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    for c in distinct_cols:
        aggs.append(F.hll_union_agg(F.col(f"{c}_hll")).alias(f"{c}_hll"))
    return a.unionByName(b).groupBy(*keys).agg(*aggs)


def finalize(
    state: DataFrame,
    measures: list[str],
    distinct_cols: list[str] = [],
) -> DataFrame:
    """Derive the presentation aggregates (avg = sum/count; count-0
    groups yield NULL avg like plain SQL AVG over all-null input;
    ``{col}_approx_distinct`` from the HLL sketch — exact below the
    sketch's coupon threshold, ~2% stderr beyond at lgK=12)."""
    out = state
    for m in measures:
        out = out.withColumn(
            f"{m}_avg",
            F.when(
                F.col(f"{m}_count") > 0, F.col(f"{m}_sum") / F.col(f"{m}_count")
            ),
        )
    for c in distinct_cols:
        out = out.withColumn(
            f"{c}_approx_distinct",
            F.hll_sketch_estimate(F.col(f"{c}_hll")),
        )
    return out


def incremental_refresh(
    state: DataFrame | None,
    delta: DataFrame,
    keys: list[str],
    measures: list[str],
    distinct_cols: list[str] = [],
    hll_lgk: int = 12,
) -> DataFrame:
    """One maintenance step: aggregate the delta batch and fold it
    into the stored state (or bootstrap from the delta when no state
    exists yet). Cost: O(delta) + one state-row shuffle. ``hll_lgk``
    must match the value the stored state was built with —
    ``hll_union_agg`` rejects mixed-lgK sketches by design (code-review
    r7: the delta used to hard-code the default, crashing any
    non-default-lgK state on its first refresh)."""
    delta_state = agg_state(delta, keys, measures, distinct_cols, hll_lgk)
    if state is None:
        return delta_state
    return merge_states(state, delta_state, keys, measures, distinct_cols)
