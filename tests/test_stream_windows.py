"""Event-time windows + watermark late-data policy (streaming/windows.py).

Feeds JSON events through a file stream one file per micro-batch so
event-time order and arrival order diverge on purpose; asserts
(a) windowed counts match the batch computation of the same rows,
(b) an event arriving after its window's watermark expiry is dropped,
(c) session windows merge events within the gap and split across it.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from architrave_project_apache_nifi_spark.streaming import windows as W

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _write_file(path, rows, order: int = 0):
    """The file source micro-batches in modification-time order; pin
    distinct mtimes so arrival order is deterministic across filesystems."""
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order * 10, base + order * 10))


def _run_stream(spark, src, out_df_fn, tmp_path, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        out_df_fn(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_window_counts_match_batch(spark, tmp_path):
    src = tmp_path / "in"
    rows1 = [
        {"event_id": 1, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:05:00", "value": 1.0},
        {"event_id": 2, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:20:00", "value": 2.0},
        {"event_id": 3, "user_id": 2, "event_type": "view", "ts": "2026-01-01T11:10:00", "value": 3.0},
    ]
    rows2 = [
        {"event_id": 4, "user_id": 2, "event_type": "click", "ts": "2026-01-01T11:40:00", "value": 4.0},
        # advance watermark far past every earlier window so they emit
        {"event_id": 5, "user_id": 3, "event_type": "view", "ts": "2026-01-01T20:00:00", "value": 5.0},
    ]
    _write_file(src / "f1.json", rows1, order=0)
    _write_file(src / "f2.json", rows2, order=1)
    got = _run_stream(
        spark, src, lambda s: W.windowed_counts(s, watermark="10 minutes"),
        tmp_path, "tumbling",
    ).collect()
    batch = spark.createDataFrame(
        [tuple(r.values()) for r in rows1 + rows2], "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in W.windowed_counts(batch, watermark="10 minutes").collect()
    }
    emitted = {(r.window_start, r.event_type): (r.n_events, r.sum_value) for r in got}
    # append mode withholds windows the watermark has not passed: the
    # 20:00 window is still open, everything earlier must have emitted
    assert all(k in expected and expected[k] == v for k, v in emitted.items())
    assert sum(n for n, _ in emitted.values()) == 4  # events 1-4; 5 unemitted


def test_late_event_past_watermark_is_dropped(spark, tmp_path):
    src = tmp_path / "in"
    _write_file(
        src / "f1.json",
        [
            {"event_id": 1, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:05:00", "value": 1.0},
            {"event_id": 2, "user_id": 1, "event_type": "click", "ts": "2026-01-01T15:00:00", "value": 1.0},
        ],
        order=0,
    )
    # one more batch so the 14:50 watermark becomes the LATE-EVENT filter
    # (Spark's watermarkForLateEvents lags eviction by one batch)
    _write_file(
        src / "f2.json",
        [{"event_id": 3, "user_id": 1, "event_type": "click", "ts": "2026-01-01T15:05:00", "value": 1.0}],
        order=1,
    )
    # arrives after watermark (15:00 − 10 min) has passed its 10:00 window
    _write_file(
        src / "f3.json",
        [{"event_id": 4, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:30:00", "value": 7.0}],
        order=2,
    )
    # closes the 15:00 window so it emits too
    _write_file(
        src / "f4.json",
        [{"event_id": 5, "user_id": 1, "event_type": "click", "ts": "2026-01-01T23:00:00", "value": 1.0}],
        order=3,
    )
    got = _run_stream(
        spark, src, lambda s: W.windowed_counts(s, watermark="10 minutes"),
        tmp_path, "late_drop",
    ).collect()
    by_start = {r.window_start.isoformat(): r.n_events for r in got}
    assert by_start.get("2026-01-01T10:00:00") == 1  # late event 4 dropped
    assert by_start.get("2026-01-01T15:00:00") == 2  # events 2 + 3


def test_session_window_merges_and_splits(spark, tmp_path):
    src = tmp_path / "in"
    _write_file(
        src / "f1.json",
        [
            {"event_id": 1, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:00:00", "value": 1.0},
            {"event_id": 2, "user_id": 1, "event_type": "click", "ts": "2026-01-01T10:10:00", "value": 2.0},
            # > 30 min gap → new session
            {"event_id": 3, "user_id": 1, "event_type": "click", "ts": "2026-01-01T12:00:00", "value": 4.0},
        ],
        order=0,
    )
    _write_file(
        src / "f2.json",
        [{"event_id": 4, "user_id": 2, "event_type": "view", "ts": "2026-01-02T09:00:00", "value": 8.0}],
        order=1,
    )
    got = _run_stream(
        spark, src, lambda s: W.session_windows(s), tmp_path, "sessions"
    ).collect()
    u1 = sorted(
        ((r.session_start, r.n_events, r.sum_value) for r in got if r.user_id == 1)
    )
    assert len(u1) == 2
    assert u1[0][1] == 2 and u1[0][2] == 3.0  # events 1+2 merged
    assert u1[1][1] == 1 and u1[1][2] == 4.0  # event 3 alone
