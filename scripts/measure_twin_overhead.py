#!/usr/bin/env python
"""Reproduce the BASELINE.md r7-late-addendum twin-overhead table:
each auto-protected operator run end-to-end (noop write, min of 2
passes) on the hot corpus with skew_protection off vs auto.

Run AFTER `python scripts/gen_scale.py` (needs
.localdata/sf1/events_hot.parquet — one key carrying ~30% of 20M
events). Local wall is the HONEST local cost of protection; the
straggler elimination it buys is measured separately by
scripts/measure_skew.py (per-task spreads). Prints one line per
(operator, mode).

All cases share one JVM, so later rows carry accumulated heap/GC
pressure and read ~10-30% worse than a fresh-session run of the same
case — compare off-vs-auto WITHIN a row; for absolute numbers
(BASELINE.md table) run the case alone in a fresh session at
loadavg ≤ 2.

Usage: python scripts/measure_twin_overhead.py [trailing]
  — pass `trailing` to include trailing_range_window's OFF pass
    (439.6 s at r7: the plain RANGE frame rebuilds its sliding
    aggregation buffer per lower-bound move, O(rows × frame) on the
    hot key — excluded by default to keep the run under ~3 min).
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from architrave_project_apache_nifi_spark.operators.scd2 import (  # noqa: E402
    scd2_build,
)
from architrave_project_apache_nifi_spark.operators.sequences import (  # noqa: E402
    ngram_counts,
    transition_matrix,
)
from architrave_project_apache_nifi_spark.operators.skew_windows import (  # noqa: E402
    running_window,
    topk_per_key,
    trailing_range_window,
)
from architrave_project_apache_nifi_spark.operators.temporal import (  # noqa: E402
    asof_join,
    sessionize,
)
from architrave_project_apache_nifi_spark.session import ENGINE_CONF  # noqa: E402

HOT = "/root/repo/.localdata/sf1/events_hot.parquet"


def main() -> None:
    b = SparkSession.builder.master("local[32]").appName("twin-overhead")
    for k, v in ENGINE_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(HOT)
    clicks = df.filter(F.col("event_type") == "click")
    purchases = df.filter(F.col("event_type") == "purchase")

    def run(tag: str, fn) -> None:
        best = None
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{tag}: {best:.2f}s", flush=True)

    cases = {
        "sessionize": lambda sp: sessionize(
            df, "user_id", "ts", 1800, ("event_id",), skew_protection=sp
        ),
        "running_window": lambda sp: running_window(
            df, "user_id", "ts", "value", ("event_id",), skew_protection=sp
        ),
        "scd2_build": lambda sp: scd2_build(
            df.withColumnRenamed("value", "Price"), "user_id", "ts",
            ("event_id",), skew_protection=sp,
        ),
        "asof_join": lambda sp: asof_join(
            purchases, clicks, "user_id", "ts", "ts",
            right_value_cols=("event_id", "value"),
            right_order_cols=("event_id",), skew_protection=sp,
        ),
        "event_ngrams(3)": lambda sp: ngram_counts(
            df, "user_id", ["ts", "event_id"], "event_type", 3,
            skew_protection=sp,
        ),
        "transition_matrix": lambda sp: transition_matrix(
            df, "user_id", ["ts", "event_id"], "event_type",
            skew_protection=sp,
        ),
        "topk_per_key(7)": lambda sp: topk_per_key(
            df, "user_id", [F.col("value").desc(), F.col("event_id")], 7,
            salt_cols=["event_id"], skew_protection=sp,
        ),
    }
    for name, mk in cases.items():
        run(f"{name:18s} off ", lambda mk=mk: mk(False))
        run(f"{name:18s} auto", lambda mk=mk: mk("auto"))

    run("trailing           auto", lambda: trailing_range_window(
        df, "user_id", "ts", "value", 86400, skew_protection="auto"
    ))
    if "trailing" in sys.argv[1:]:
        run("trailing           off ", lambda: trailing_range_window(
            df, "user_id", "ts", "value", 86400, skew_protection=False
        ))
    spark.stop()


if __name__ == "__main__":
    main()
