"""Stream-stream joins with watermark-bounded state (the streaming twin
of the batch interval/as-of joins in operators/temporal.py).

Spark buffers BOTH sides of a stream-stream join in state; unbounded
buffering is the 100 TB failure mode. The contract here makes the
bound explicit: each side carries a watermark, and the join condition
carries the time interval, so Spark derives a state-eviction horizon —
rows older than (watermark − interval) are dropped from state. State
size ≈ input rate × (delay + interval), independent of stream length.

Reference parity: the NiFi flow has no stream-stream join (its lookup
is stream→static, FT:3200 block — covered by operators/lookup.py);
this module is part of the §2.7 engine floor for streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "10 minutes",
    watermark: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events to left-side events with the same ``key``
    where ``right_ts`` lands in ``(left_ts, left_ts + max_delay]`` —
    e.g. purchases (right) attributed to the click (left) at most
    ``max_delay`` before them.

    Both sides get ``watermark``; the interval bound lets Spark evict
    left state once the right watermark passes ``left_ts + max_delay``
    and vice versa. ``how`` may be ``inner`` or ``leftOuter`` (outer
    emits unmatched left rows once their state expires — so outer
    results arrive only after the watermark passes; tests must feed a
    newer batch to close the horizon)."""
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"interval_join supports inner/leftOuter, got {how!r}")
    # Payload columns pass through under their own names, so they must
    # be disjoint across sides (and must not collide with the
    # left_<ts>/right_<ts> outputs) — otherwise the final select would
    # raise an opaque ambiguous-reference error deep in Catalyst.
    # Validate up front with an actionable message instead.
    l_payload = [c for c in left.columns if c not in (key, left_ts)]
    r_payload = [c for c in right.columns if c not in (key, right_ts)]
    clash = sorted(set(l_payload) & set(r_payload))
    if clash:
        raise ValueError(
            f"interval_join: column(s) {clash} exist on both sides; "
            "rename one side (e.g. right.withColumnRenamed) before joining"
        )
    reserved = {f"left_{left_ts}", f"right_{right_ts}"}
    taken = sorted(reserved & set(l_payload + r_payload))
    if taken:
        raise ValueError(
            f"interval_join: column(s) {taken} collide with the "
            "left_/right_ timestamp outputs; rename them before joining"
        )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__lts"),
        *[c for c in left.columns if c not in (key, left_ts)],
    ).withWatermark("__lts", watermark)
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[c for c in right.columns if c not in (key, right_ts)],
    ).withWatermark("__rts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("__rts") > F.col("__lts"))
        & (F.col("__rts") <= F.col("__lts") + F.expr(f"INTERVAL {max_delay}"))
    )
    out = l.join(r, cond, how)
    return out.select(
        F.col("__k").alias(key),
        F.col("__lts").alias(f"left_{left_ts}"),
        F.col("__rts").alias(f"right_{right_ts}"),
        *[c for c in out.columns if not c.startswith("__")],
    )
