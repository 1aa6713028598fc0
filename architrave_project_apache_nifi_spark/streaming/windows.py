"""Event-time windowed aggregation for streams (SURVEY.md §2.7 rows
"Streaming: watermark / late data" and "Streaming: windows").

The reference has neither: NiFi processes FlowFiles in arrival order
and trusts binlog order (SURVEY.md §2.7). A 100 TB event pipeline
cannot — late data is normal, and unbounded per-window state is not.
These operators are the standard Structured Streaming formulation:

- watermark bounds state: windows older than (max event time − delay)
  are finalized, emitted (append mode), and their state dropped. A
  later event for a finalized window is discarded — the documented,
  deterministic late-data policy the reference lacks.
- tumbling/sliding via ``window()``, activity sessions via
  ``session_window()`` — both partial-aggregated map-side before the
  single shuffle on (key, window), so state per key·window is O(1).

The batch twins (`windowed_event_counts`, `sessionize_events` in
queries.py) are DuckDB-oracled; these streaming forms are tested by
feeding the same rows through micro-batches and asserting parity plus
the late-drop behavior (tests/test_stream_windows.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` differs from ``window``)
    event-time counts per key with a late-data watermark."""
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Activity sessions: a session extends while events arrive within
    ``gap`` of the previous one. ``session_window`` keeps state only for
    open sessions; the watermark closes (and emits) sessions whose gap
    has provably expired. Streaming twin of operators/temporal.sessionize."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
        )
    )
