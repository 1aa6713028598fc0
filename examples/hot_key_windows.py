"""End-to-end example: a hot business key vs the per-key window core.

Run: python examples/hot_key_windows.py   (in-memory data, no files)

A CDC stream with a degenerate key — a catch-all SKU, a null-ish user
id, a bot account — concentrates a large share of all events on ONE
key. Every per-key window (SCD2 chaining, sessionization, running
aggregates, as-of joins) hash-partitions on that key, and AQE does NOT
split skewed window partitions (it only splits joins): the hot key
becomes one straggler task holding its whole history. Measured at 20M
rows: 9.9x the median rows / 4.7-11.3x the median CPU in one task
(BASELINE.md §Skewed-key stress).

The remedy (operators/skew_windows.py): detect hot keys from a sampled
count, split their rows into per-key TIME-RANGE buckets (percentile
edges — equal timestamps never separate, so tie order is safe), window
over (key, bucket), and carry the cross-bucket state (chain boundary
timestamps, session counters, running offsets, as-of carries) through
a tiny per-bucket summary. Cold keys ride bucket 0 — identical plans,
identical results. Every form below is an EXACT twin of its plain
counterpart (DuckDB-oracled as the *_skew_salted gate entries).
"""

from __future__ import annotations

import datetime as dt
import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_build,
    scd2_build_skewed,
)
from architrave_project_apache_nifi_spark.operators.skew_windows import (
    running_window_skewed,
    sessionize_skewed,
)
from architrave_project_apache_nifi_spark.operators.temporal import sessionize


def main() -> None:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("hot-key-windows")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one product carries 40% of the change stream
    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (0, i, 10.0 + i % 5, t0 + dt.timedelta(minutes=3 * i))
        for i in range(2000)
    ] + [
        (1 + i % 60, 10_000 + i, 5.0 + i % 3,
         t0 + dt.timedelta(minutes=2 * i))
        for i in range(3000)
    ]
    events = spark.createDataFrame(
        rows, "ProductID INT, seq LONG, Price DOUBLE, change_ts TIMESTAMP"
    )
    share = events.filter("ProductID = 0").count() / events.count()
    print(f"hot key share of stream: {share:.0%}")

    # 1. SCD2 build — exact equality, hot key spread over 16 tasks
    plain = scd2_build(events, "ProductID", "change_ts", ("seq",))
    salted = scd2_build_skewed(
        events, "ProductID", "change_ts", ("seq",),
        hot_key_rows=500, n_ts_buckets=16,
    )
    same = (
        plain.exceptAll(salted).isEmpty()
        and salted.exceptAll(plain).isEmpty()
    )
    print(f"scd2_build_skewed equals scd2_build: {same}")

    # 2. Sessionization — integer session ids, bit-identical
    a = sessionize(events, "ProductID", "change_ts", 600.0, ("seq",))
    b = sessionize_skewed(
        events, "ProductID", "change_ts", 600.0, ("seq",),
        hot_key_rows=500, n_ts_buckets=16,
    )
    cols = ["ProductID", "seq", "session_id"]
    same = sorted(map(tuple, a.select(*cols).collect())) == sorted(
        map(tuple, b.select(*cols).collect())
    )
    print(f"sessionize_skewed equals sessionize: {same}")

    # 3. Running window — the hot key's cumulative spend, tiles exact
    run = running_window_skewed(
        events, "ProductID", "change_ts", "Price", ("seq",),
        hot_key_rows=500, n_ts_buckets=16,
    )
    top = (
        run.filter("ProductID = 0")
        .orderBy(F.col("running_sum").desc())
        .select("seq", F.round("running_sum", 2).alias("running_sum"), "tile")
        .first()
    )
    print(
        f"hot key final running_sum={top.running_sum} (tile {top.tile}) "
        f"computed across 16 balanced tasks"
    )
    spark.stop()


if __name__ == "__main__":
    main()
