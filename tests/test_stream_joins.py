"""Stream-stream interval join (streaming/joins.py): clicks joined to
purchases within the attribution window, via two file streams fed one
file per micro-batch. Asserts (a) inner matches equal the batch
computation, (b) the interval bound excludes too-late purchases,
(c) leftOuter emits unmatched clicks with nulls once the watermark
passes."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from architrave_project_apache_nifi_spark.streaming.joins import interval_join

CLICK_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("click_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)
BUY_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("buy_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _write(path, rows, order=0):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    base = 1_700_000_000
    os.utime(path, (base + order * 10, base + order * 10))


def _streams(spark, tmp_path):
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "clicks"))
    )
    buys = (
        spark.readStream.schema(BUY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "buys"))
    )
    return clicks, buys


def _run(spark, df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_interval_join_inner_matches_and_bounds(spark, tmp_path):
    _write(
        tmp_path / "clicks" / "c1.json",
        [
            {"user_id": 1, "click_id": 10, "ts": "2026-01-01T10:00:00"},
            {"user_id": 2, "click_id": 20, "ts": "2026-01-01T10:00:00"},
        ],
        order=0,
    )
    _write(
        tmp_path / "buys" / "b1.json",
        [
            # within 10 min of click 10 -> matches
            {"user_id": 1, "buy_id": 100, "ts": "2026-01-01T10:05:00"},
            # 30 min after click 20 -> outside the interval
            {"user_id": 2, "buy_id": 200, "ts": "2026-01-01T10:30:00"},
        ],
        order=1,
    )
    clicks, buys = _streams(spark, tmp_path)
    rows = _run(
        spark,
        interval_join(clicks, buys, "user_id", max_delay="10 minutes"),
        tmp_path,
        "ij_inner",
    )
    assert [(r["user_id"], r["click_id"], r["buy_id"]) for r in rows] == [(1, 10, 100)]


def test_interval_join_left_outer_emits_unmatched_after_watermark(spark, tmp_path):
    _write(
        tmp_path / "clicks" / "c1.json",
        [
            {"user_id": 1, "click_id": 10, "ts": "2026-01-01T10:00:00"},
            {"user_id": 2, "click_id": 20, "ts": "2026-01-01T10:00:00"},
        ],
        order=0,
    )
    # second click file far in the future advances the click-side
    # watermark so unmatched state can expire
    _write(
        tmp_path / "clicks" / "c2.json",
        [{"user_id": 9, "click_id": 90, "ts": "2026-01-01T23:00:00"}],
        order=2,
    )
    _write(
        tmp_path / "buys" / "b1.json",
        [{"user_id": 1, "buy_id": 100, "ts": "2026-01-01T10:05:00"}],
        order=1,
    )
    # advance the buy-side watermark too (both watermarks gate eviction)
    _write(
        tmp_path / "buys" / "b2.json",
        [{"user_id": 9, "buy_id": 900, "ts": "2026-01-01T23:00:01"}],
        order=3,
    )
    clicks, buys = _streams(spark, tmp_path)
    rows = _run(
        spark,
        interval_join(
            clicks, buys, "user_id", max_delay="10 minutes", how="leftOuter"
        ),
        tmp_path,
        "ij_outer",
    )
    got = {(r["user_id"], r["click_id"]): r["buy_id"] for r in rows}
    assert got[(1, 10)] == 100  # matched
    assert (2, 20) in got and got[(2, 20)] is None  # unmatched, null-padded


def test_interval_join_batch_twin_same_semantics(spark):
    clicks = spark.createDataFrame(
        [(1, 10, "2026-01-01T10:00:00"), (1, 11, "2026-01-01T12:00:00")],
        "user_id long, click_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    buys = spark.createDataFrame(
        [(1, 100, "2026-01-01T10:04:00"), (1, 101, "2026-01-01T12:11:00")],
        "user_id long, buy_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = interval_join(clicks, buys, "user_id", max_delay="10 minutes").collect()
    assert sorted((r["click_id"], r["buy_id"]) for r in rows) == [(10, 100)]


def test_interval_join_rejects_colliding_payload_columns(spark):
    """Same-named payload columns on both sides (or a pre-existing
    left_<ts>/right_<ts>) must fail fast with an actionable error, not
    an ambiguous-reference AnalysisException at select time."""
    import pytest

    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0)], "k INT, ts STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right_clash = spark.createDataFrame(
        [(1, "2024-01-01 00:01:00", 2.0)], "k INT, ts STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match=r"\['value'\]"):
        interval_join(left, right_clash, "k")
    reserved = left.withColumnRenamed("value", "left_ts")
    with pytest.raises(ValueError, match="left_ts"):
        interval_join(reserved, right_clash.withColumnRenamed("value", "amount"), "k")
