"""Snapshot diff — derive a CDC changeset from two table versions.

The reference CONSUMES a change stream (CaptureChangeMySQL,
FT:4368-4382); this module is the inverse the engine needs when no
binlog exists: given yesterday's and today's snapshot of a keyed
table, emit the insert/update/delete events that transform one into
the other. The output speaks the engine's own CDC dialect (an
``event_type`` column with insert/update/delete), so it feeds
``scd2_build``/``scd2_apply`` directly — snapshot-shipping sources
get full SCD2 history without a log.

Semantics (keyed, whole-row compare over the chosen value columns):

- key only in ``new``                    → ``insert``
- key in both, any value column differs  → ``update`` (new values)
- key only in ``old``                    → ``delete`` (old values)
- key in both, all values equal          → no event

NULL-safe equality (``<=>``) throughout — a NULL→value transition is
an update, NULL==NULL is unchanged.

Scale notes: one full-outer join on the key — co-bucket both
snapshots by the key (operators/bucketing.py) and the join is
Exchange-free; the comparison is map-side column equality, and
``changed_cols`` is a static expression over the value columns, not a
per-row loop. At 100 TB this is THE standard daily-snapshot diff
shape (one shuffle of each side, or zero with bucketed layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Changeset turning ``old`` into ``new``. Output: key columns +
    value columns (new side for insert/update, old side for delete) +
    ``event_type`` + ``changed_cols`` (comma-joined sorted names of
    differing value columns; empty for insert/delete)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if value_cols is None:
        value_cols = [c for c in new.columns if c not in keys]
        missing = [c for c in value_cols if c not in old.columns]
        if missing:
            raise ValueError(
                f"snapshot_diff: value columns absent from old snapshot: "
                f"{missing} — pass value_cols explicitly for evolved schemas"
            )
    vals = list(value_cols)

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(v).alias(f"__ov_{v}") for v in vals],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(v).alias(f"__nv_{v}") for v in vals],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")

    diffs: list[Column] = [
        F.when(
            ~F.col(f"__ov_{v}").eqNullSafe(F.col(f"__nv_{v}")), F.lit(v)
        )
        for v in vals
    ]
    changed = F.array_join(
        F.array_sort(F.filter(F.array(*diffs), lambda x: x.isNotNull())), ","
    )

    etype = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(changed != "", F.lit("update"))
    )
    out = joined.withColumn("event_type", etype).filter(
        F.col("event_type").isNotNull()
    )
    key_out = [
        F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k) for k in keys
    ]
    val_out = [
        F.when(F.col("event_type") == "delete", F.col(f"__ov_{v}"))
        .otherwise(F.col(f"__nv_{v}"))
        .alias(v)
        for v in vals
    ]
    return out.select(
        *key_out,
        *val_out,
        F.col("event_type"),
        F.when(F.col("event_type") == "update", changed)
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def scd2_from_snapshots(
    snapshots: Sequence[tuple], key_cols: str | Sequence[str],
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Fold an ordered sequence of ``(ts, snapshot_df)`` into one CDC
    change stream: the first snapshot is all-inserts, every later one
    contributes its diff vs the previous, each stamped with its
    snapshot timestamp. Feed the result to ``scd2_build`` (with
    ``tombstone_col='is_delete'``) for full history — snapshot
    shipping becomes SCD2 without a binlog."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not snapshots:
        raise ValueError("scd2_from_snapshots: need at least one snapshot")
    out = None
    prev = None
    for ts, snap in snapshots:
        if prev is None:
            vals = (
                list(value_cols)
                if value_cols is not None
                else [c for c in snap.columns if c not in keys]
            )
            delta = snap.select(*keys, *vals).withColumn(
                "event_type", F.lit("insert")
            ).withColumn("changed_cols", F.lit(""))
        else:
            delta = snapshot_diff(prev, snap, keys, value_cols)
        delta = delta.withColumn("snapshot_ts", F.lit(ts)).withColumn(
            "is_delete", F.col("event_type") == "delete"
        )
        out = delta if out is None else out.unionByName(delta)
        prev = snap
    return out
