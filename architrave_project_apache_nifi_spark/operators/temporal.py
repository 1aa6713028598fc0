"""Temporal join / windowing operators the reference lacks but a
large-scale event pipeline needs (task extension list: as-of join,
range join; sessionization is the streaming-adjacent classic).

All three are compositions of native DataFrame ops — one shuffle on the
key, no UDFs, no per-key driver loops:

- ``asof_join``: union-then-window. Tagging both sides and running one
  ``last(..., ignorenulls)`` window over the merged timeline costs ONE
  shuffle and never builds the O(left×right) pair space a naive
  inequality join would (Spark plans non-equi joins as broadcast
  nested-loop — quadratic work at scale).
- ``range_join_binned``: equi-join on (key, time-bin) with the exact
  range predicate applied post-join. Each left row lands in ≤2 bins of
  width = the range span, so the pair space is bounded by true matches
  per bin — turning Catalyst's nested-loop fallback into a hash join.
- ``sessionize``: gap-based session ids via lag + running sum — the
  batch twin of Structured Streaming's ``session_window``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_list(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    left_order_cols: Sequence[str] = (),
    right_order_cols: Sequence[str] = (),
    prefix: str = "asof_",
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """For each left row, the latest right row with
    ``right_ts <= left_ts`` per key (backward, inclusive).

    Ties on the timestamp resolve to the right row greatest under
    ``right_order_cols`` (pass the event sequence id for determinism).
    Right values are packed into one struct before the window, so a
    right row whose value column is genuinely NULL still matches
    (``last(..., ignorenulls)`` skips only absent rows, not null
    fields).

    ``skew_protection="auto"`` (default since r7, same contract as
    :func:`sessionize`): one bounded sampled detection job over the
    UNION of both sides' (key, ts) projections — the union is what the
    as-of window actually partitions — routes a hot-key corpus through
    :func:`~.skew_windows.asof_join_skewed` (bit-identical); cold
    corpora keep this plan."""
    keys = _as_list(key_cols)
    if skew_protection:
        from .skew_windows import asof_join_skewed, resolve_skew_protection

        probe = left.select(
            *keys, F.col(left_ts).alias("__ts")
        ).unionByName(right.select(*keys, F.col(right_ts).alias("__ts")))
        engaged, edges = resolve_skew_protection(
            probe, keys, "__ts", skew_protection, hot_key_rows, n_ts_buckets
        )
        if engaged:
            return asof_join_skewed(
                left, right, keys, left_ts, right_ts, right_value_cols,
                right_order_cols, prefix, hot_key_rows, n_ts_buckets,
                hot_edges=edges,
            )
    rv = F.struct(*[F.col(c) for c in right_value_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_order_cols],
        rv.alias("__rv"),
    ).withColumn("__is_left", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    # at equal (ts, side), later right rows win — order_cols ascending
    order += [F.col(c).asc() for c in right_order_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("__last_rv", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop("__rv", "__ts", "__is_left", *[c for c in right_order_cols if c not in left.columns])
    )
    for c in right_value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("__last_rv").getField(c))
    return out.drop("__last_rv")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """All (left, right) pairs with
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` per key.

    Each left row emits its interval's ≤2 covering bins of width
    ``upper_s - lower_s``; right rows land in exactly one bin, so the
    equi-join on (key, bin) finds every qualifying pair exactly once
    and the exact BETWEEN predicate prunes bin edges. Returns left
    columns + right columns suffixed ``_r`` on collision."""
    assert upper_s > lower_s
    keys = _as_list(key_cols)
    # round, don't truncate, and enforce microsecond granularity: a span
    # under 1 µs would yield width_us == 0 (division by zero in the bin
    # expressions), and truncation would skew bins for non-integral-µs
    # spans.
    width_us = round((upper_s - lower_s) * 1_000_000)
    if width_us < 1:
        raise ValueError(
            f"range_join_binned span {upper_s - lower_s}s is below the "
            "1-microsecond timestamp granularity"
        )
    lo_us = round(lower_s * 1_000_000)
    hi_us = round(upper_s * 1_000_000)

    lts = F.unix_micros(F.col(left_ts))
    rts = F.unix_micros(F.col(right_ts))

    overlap = set(left.columns) & set(right.columns)
    r = right
    for c in overlap:
        r = r.withColumnRenamed(c, f"{c}_r")
    rkeys = [f"{k}_r" if k in overlap else k for k in keys]
    rts_col = f"{right_ts}_r" if right_ts in overlap else right_ts

    l_binned = left.withColumn(
        "__bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lts + lo_us) / width_us),
                    F.floor((lts + hi_us) / width_us),
                )
            )
        ),
    )
    r_binned = r.withColumn("__bin", F.floor(F.unix_micros(F.col(rts_col)) / width_us))
    joined = l_binned.join(
        r_binned,
        on=[
            *[l_binned[k] == r_binned[rk] for k, rk in zip(keys, rkeys)],
            l_binned["__bin"] == r_binned["__bin"],
        ],
    )
    exact = (F.unix_micros(F.col(rts_col)) >= F.unix_micros(F.col(left_ts)) + lo_us) & (
        F.unix_micros(F.col(rts_col)) <= F.unix_micros(F.col(left_ts)) + hi_us
    )
    return joined.filter(exact).drop("__bin")


def sessionize(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    gap_s: float,
    order_cols: Sequence[str] = (),
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Assign gap-based session ids per key: a new session starts when
    the time since the previous event exceeds ``gap_s``. One shuffle
    (the window partition); ids are 1-based and dense per key.

    ``skew_protection="auto"`` (default since r7): one bounded sampled
    detection job; a key above ``hot_key_rows`` routes the whole call
    through :func:`~.skew_windows.sessionize_skewed` (bit-identical
    session ids, hot keys spread over time buckets — AQE never splits
    a skewed window partition); cold corpora keep exactly this plan.
    ``False`` skips the detection job, ``True`` forces the bucketed
    form."""
    from .skew_windows import resolve_skew_protection, sessionize_skewed

    engaged, edges = resolve_skew_protection(
        df, key_cols, ts_col, skew_protection, hot_key_rows, n_ts_buckets,
        sample_salt_cols=order_cols,  # per-row sample despite coarse ts
    )
    if engaged:
        return sessionize_skewed(
            df, key_cols, ts_col, gap_s, order_cols, hot_key_rows,
            n_ts_buckets, hot_edges=edges,
        )
    keys = _as_list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    gap_us = int(gap_s * 1_000_000)
    # cast: unix_micros rejects TIMESTAMP_NTZ (e.g. DuckDB-written
    # parquet); the ntz→ltz reinterpretation is monotone under the
    # session's pinned UTC, which is all gap arithmetic needs
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    new_sess = (prev.isNull() | (ts_us - prev > F.lit(gap_us))).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: Sequence[str],
    right_order_cols: Sequence[str] = (),
    prefix: str = "next_",
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row with
    ``right_ts >= left_ts`` per key (the "next event after" join —
    e.g. each impression picks the user's next purchase). Mirror of
    :func:`asof_join`: the union scans in DESCENDING time order, so
    the last right seen at a left row is the nearest one at-or-after
    it. Ties on the timestamp resolve to the right row SMALLEST under
    ``right_order_cols`` (pass the event sequence id for
    determinism). Same budget: one keyed shuffle, no pair space.
    ``skew_protection`` has :func:`asof_join`'s contract (skewed twin:
    :func:`~.skew_windows.asof_join_forward_skewed`)."""
    keys = _as_list(key_cols)
    if skew_protection:
        from .skew_windows import (
            asof_join_forward_skewed,
            resolve_skew_protection,
        )

        probe = left.select(
            *keys, F.col(left_ts).alias("__ts")
        ).unionByName(right.select(*keys, F.col(right_ts).alias("__ts")))
        engaged, edges = resolve_skew_protection(
            probe, keys, "__ts", skew_protection, hot_key_rows, n_ts_buckets
        )
        if engaged:
            return asof_join_forward_skewed(
                left, right, keys, left_ts, right_ts, right_value_cols,
                right_order_cols, prefix, hot_key_rows, n_ts_buckets,
                hot_edges=edges,
            )
    rv = F.struct(*[F.col(c) for c in right_value_cols])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in right_order_cols],
        rv.alias("__rv"),
    ).withColumn("__is_left", F.lit(0))
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    merged = l.unionByName(r, allowMissingColumns=True)

    # descending time; rights before lefts at equal ts (inclusive
    # match); equal-ts rights ordered DESC so the smallest order_col
    # is seen last and wins the `last()` scan
    order = [F.col("__ts").desc(), F.col("__is_left").asc()]
    order += [F.col(c).desc() for c in right_order_cols]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        merged.withColumn("__last_rv", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .drop(
            "__rv", "__ts", "__is_left",
            *[c for c in right_order_cols if c not in left.columns],
        )
    )
    for c in right_value_cols:
        out = out.withColumn(f"{prefix}{c}", F.col("__last_rv").getField(c))
    return out.drop("__last_rv")
