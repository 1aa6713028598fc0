"""Skew mitigation for joins and aggregations (100 TB design surface).

The reference runs serially on one node (SURVEY.md §4.1 "Partitioning /
shuffle: none") so skew cannot exist there; at cluster scale a hot key
(one user producing 1% of all events) turns a shuffle join or agg into
a single straggler task. Two standard remedies, both pure DataFrame:

- **AQE skew-join** (first resort): ``spark.sql.adaptive.enabled`` +
  ``skewJoin.enabled`` (set in session.ENGINE_CONF) splits oversized
  shuffle partitions at runtime. Zero code — but it only covers
  sort-merge joins, not aggregations, and needs runtime stats.
- **Salting** (this module, deterministic): spread each hot key over
  ``n_salts`` synthetic sub-keys.
  - ``salted_join``: the big side gets a uniform random-ish salt from
    ``pmod(xxhash64(monotonically_increasing_id()), n)`` (stable within
    a job); the small side is exploded ×n so every (key, salt) pair
    still meets its match. Result set identical to the unsalted join.
  - ``salted_agg``: two-phase aggregation — partial agg on
    (key, salt), final agg on key. Identical results for any
    algebraic aggregate (sum/count/min/max); the first shuffle spreads
    the hot key over n reducers, the second moves n rows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


# joins where an unmatched SMALL-side row can never reach the output —
# the only modes salting is correct for: the small side is replicated
# ×n_salts, so right/full/outer would emit every unmatched small row
# once per replica.
_SAFE_HOW = {
    "inner": "inner",
    "left": "left",
    "leftouter": "left",
    "left_outer": "left",
    "semi": "left_semi",
    "leftsemi": "left_semi",
    "left_semi": "left_semi",
    "anti": "left_anti",
    "leftanti": "left_anti",
    "left_anti": "left_anti",
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    ``n_salts``×. Use when the small side is too big to broadcast and
    the key histogram is skewed. Output columns = big ∪ small minus the
    duplicate key (like ``join(..., on=str)``; semi/anti keep only the
    big side's columns).

    Only ``inner``/``left``/``left_semi``/``left_anti`` are accepted:
    these never emit unmatched small-side rows, so the ×``n_salts``
    replication cannot surface duplicates. ``right``/``full`` would —
    salt the other input (swap the arguments) instead."""
    resolved = _SAFE_HOW.get(how.lower())
    if resolved is None:
        raise ValueError(
            f"salted_join(how={how!r}) is not replication-safe: unmatched "
            "small-side rows would appear once per salt replica. Allowed: "
            "inner, left, left_semi, left_anti (salt the other side for "
            "right/full semantics)."
        )
    big_s = big.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_r = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_r, [on, SALT], resolved)
    return out.drop(SALT)


_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
# final-phase combiner per aggregate: counts re-combine by summing
_FINAL = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output name → ``(fn, column)`` with fn in
    sum/count/min/max. Phase 1 aggregates on (keys, salt) — the hot key
    spreads over ``n_salts`` reducers; phase 2 re-combines on keys
    alone, moving only ``n_salts`` rows per key. Results are identical
    to a single-phase agg. Non-algebraic aggregates (median,
    collect_list) cannot be salted — use the sketch path
    (queries.py `sketch_approx_aggs`) instead."""
    for name, (fn, _) in aggs.items():
        if fn not in _PARTIAL:
            raise ValueError(
                f"non-algebraic aggregate {fn!r} for {name!r} cannot be "
                "salted; use an approximate sketch or a single-phase agg"
            )
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, SALT).agg(
        *[_PARTIAL[fn](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_FINAL[fn](name).alias(name) for name, (fn, _) in aggs.items()]
    )
