#!/usr/bin/env python
"""Measure straggler-task spread for the SCD2/window core under a hot
key (VERDICT r4 #4): run each variant on events_hot.parquet (one user
carrying 30% of 1M events, scripts/gen_scale.py hot) and pull per-task
durations from the Spark UI REST API. Prints one JSON line:

    {"variant": {"wall_s": .., "max_task_s": .., "median_task_s": ..,
                 "cpu_spread"/"row_spread": max/median over the worst stage}}

The dominant stage is the one with the largest max task time — for the
plain window build that is the post-exchange sort/window stage holding
the hot key's partition.

Run AFTER `python scripts/gen_scale.py` (or `... gen_scale.py hot` if
sf1 already exists). Numbers land in BASELINE.md §Skewed-key stress.
"""
from __future__ import annotations

import json
import statistics
import sys
import time
import urllib.request

import pyspark.sql.window as WinMod

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from architrave_project_apache_nifi_spark.operators.scd2 import (  # noqa: E402
    scd2_build,
    scd2_build_skewed,
)
from architrave_project_apache_nifi_spark.operators.skew_windows import (  # noqa: E402
    asof_join_skewed,
    running_window_skewed,
    sessionize_skewed,
)
from architrave_project_apache_nifi_spark.operators.temporal import (  # noqa: E402
    asof_join,
    sessionize,
)
from architrave_project_apache_nifi_spark.session import ENGINE_CONF  # noqa: E402

SF_DIR = "/root/repo/.localdata/sf1"


def _spark():
    b = (
        SparkSession.builder.master("local[32]")
        .appName("measure-skew")
        .config("spark.ui.enabled", "true")  # REST task metrics
        .config("spark.ui.port", "4049")
        # At 100 TB every post-shuffle partition exceeds the advisory
        # size, so AQE's coalescer never merges them; at this corpus's
        # 1M rows it would collapse the window stage to 2-3 tasks and
        # MASK the skew being measured. Disable it here only.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    )
    for k, v in ENGINE_CONF.items():
        if k != "spark.ui.enabled":
            b = b.config(k, v)
    return b.getOrCreate()


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4049/api/v1/{path}") as r:
        return json.load(r)


def _task_spread(app_id: str, after_stage: int) -> dict:
    """The WORST max/median task-duration spread over this query's
    multi-task (≥8) stages — uniform stages (scan, shuffle write) have
    spread ≈ 1; a skewed window partition shows up as one task several
    times the median of its stage."""
    stages = [
        s for s in _rest(f"applications/{app_id}/stages?status=complete")
        if s["stageId"] > after_stage and s["numCompleteTasks"] >= 8
    ]
    best = None
    for s in stages:
        tasks = _rest(
            f"applications/{app_id}/stages/{s['stageId']}"
            f"/{s['attemptId']}/taskList?length=5000&withInternalMetrics=true"
        )
        cpu = [
            t["taskMetrics"]["executorCpuTime"] / 1e9
            for t in tasks
            if "taskMetrics" in t
        ]
        rows = [
            t["taskMetrics"]["shuffleReadMetrics"]["recordsRead"]
            for t in tasks
            if "taskMetrics" in t
        ]
        if len(cpu) < 8:
            continue
        rec = {
            "stage": s["stageId"],
            "n_tasks": len(cpu),
            "max_task_cpu_s": round(max(cpu), 3),
            "median_task_cpu_s": round(statistics.median(cpu), 4),
            "max_task_rows": max(rows),
            "median_task_rows": int(statistics.median(rows)),
        }
        rec["cpu_spread"] = round(
            rec["max_task_cpu_s"] / max(rec["median_task_cpu_s"], 1e-4), 1
        )
        rec["row_spread"] = round(
            rec["max_task_rows"] / max(rec["median_task_rows"], 1), 1
        )
        if best is None or rec["cpu_spread"] > best["cpu_spread"]:
            best = rec
    return best or {}


def main() -> None:
    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    ev = spark.read.parquet(f"{SF_DIR}/events_hot.parquet")
    ev.count()  # warm the scan

    variants = {
        "scd2_build_plain_window": lambda d: scd2_build(
            d, "user_id", "ts", ("event_id",)
        ),
        "scd2_build_skewed": lambda d: scd2_build_skewed(
            d, "user_id", "ts", ("event_id",),
            hot_key_rows=1_000_000, n_ts_buckets=32,
        ),
        "latest_window_rownumber": lambda d: (
            d.withColumn(
                "rn",
                F.row_number().over(
                    WinMod.Window.partitionBy("user_id")
                    .orderBy(F.col("ts").desc(), F.col("event_id").desc())
                ),
            ).filter("rn = 1")
        ),
        "latest_aggmax": lambda d: (
            d.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_id", "value")).alias("m"))
        ),
        "sessionize_plain_window": lambda d: sessionize(
            d, "user_id", "ts", 1800.0, ("event_id",)
        ),
        "sessionize_skewed": lambda d: sessionize_skewed(
            d, "user_id", "ts", 1800.0, ("event_id",),
            hot_key_rows=1_000_000, n_ts_buckets=32,
        ),
        "running_plain_window": lambda d: (
            d.select(
                "user_id", "event_id",
                F.sum("value").over(
                    WinMod.Window.partitionBy("user_id")
                    .orderBy("ts", "event_id")
                    .rowsBetween(WinMod.Window.unboundedPreceding,
                                 WinMod.Window.currentRow)
                ).alias("run"),
            )
        ),
        "running_skewed": lambda d: running_window_skewed(
            d, "user_id", "ts", "value", ("event_id",),
            hot_key_rows=1_000_000, n_ts_buckets=32,
        ),
        "asof_plain": lambda d: asof_join(
            d.filter("event_id % 3 = 0").select(
                "user_id", F.col("event_id").alias("left_id"), "ts"
            ),
            d.filter("event_id % 3 != 0").select(
                "user_id", "ts", "event_id", "value"
            ),
            "user_id", "ts", "ts",
            right_value_cols=("value",), right_order_cols=("event_id",),
        ),
        "asof_skewed": lambda d: asof_join_skewed(
            d.filter("event_id % 3 = 0").select(
                "user_id", F.col("event_id").alias("left_id"), "ts"
            ),
            d.filter("event_id % 3 != 0").select(
                "user_id", "ts", "event_id", "value"
            ),
            "user_id", "ts", "ts",
            right_value_cols=("value",), right_order_cols=("event_id",),
            hot_key_rows=1_000_000, n_ts_buckets=32,
        ),
    }
    out = {}
    for name, fn in variants.items():
        last_stage = max(
            (s["stageId"] for s in _rest(f"applications/{app_id}/stages")),
            default=-1,
        )
        t = time.time()
        fn(ev).write.mode("overwrite").format("noop").save()
        wall = round(time.time() - t, 2)
        time.sleep(1.0)  # let the UI ingest task events
        out[name] = {"wall_s": wall, **_task_spread(app_id, last_stage)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
