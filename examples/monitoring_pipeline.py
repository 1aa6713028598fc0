"""End-to-end example: monitored streaming ingestion with admission
control and an incrementally-maintained rollup.

Run: python examples/monitoring_pipeline.py   (prints a report)

Chains the monitoring/maintenance families: landing drops stream in →
the PSI drift gate quarantines a shifted drop whole (with its
per-column report) → accepted batches fold into a batch-id-addressed
rollup state at O(delta + groups) → a snapshot diff of the rollup's
presentation view before/after shows exactly which groups moved —
the observability loop a production ingest runs.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.incremental_agg import (
    agg_state,
    finalize,
)
from architrave_project_apache_nifi_spark.operators.snapshot_diff import (
    snapshot_diff,
)
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.streaming.drift_gate import (
    drift_gate_batch,
)
from architrave_project_apache_nifi_spark.streaming.rollup_stream import (
    read_rollup,
    rollup_batch,
)


def main() -> None:
    spark = get_spark("example-monitoring", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    work = tempfile.mkdtemp(prefix="monitoring-")
    gate_root = os.path.join(work, "gate")
    rollup_root = os.path.join(work, "rollup")

    reference = events.filter(F.col("event_id") % 3 == 0)  # frozen sample
    drops = [
        events.filter(F.col("event_id") % 3 == 1),           # clean
        events.withColumn("value", F.col("value") * 8 + 900),  # shifted!
        events.filter(F.col("event_id") % 3 == 2),           # clean
    ]

    admitted = 0
    for bid, drop in enumerate(drops):
        ok = drift_gate_batch(drop, reference, gate_root, bid, ["value"], None)
        verdict = "accepted" if ok else "QUARANTINED"
        print(f"drop {bid}: {verdict}")
        if ok:
            before = (
                read_rollup(spark, rollup_root, ["value"])
                .select("event_type", "n_rows", "value_sum")
                if admitted
                else None
            )
            rollup_batch(drop, rollup_root, ["event_type"], ["value"], bid)
            admitted += 1
            if before is not None:
                after = read_rollup(spark, rollup_root, ["value"]).select(
                    "event_type", "n_rows", "value_sum"
                )
                moved = snapshot_diff(before, after, "event_type")
                print(
                    f"  rollup groups changed by drop {bid}: "
                    f"{moved.count()} (all flagged 'update' — counts grew)"
                )

    final = finalize(
        agg_state(
            spark.read.parquet(os.path.join(gate_root, "accepted", "batch=*")),
            ["event_type"],
            ["value"],
        ),
        ["value"],
    )
    check = read_rollup(spark, rollup_root, ["value"])
    same = (
        final.select("event_type", "n_rows").exceptAll(
            check.select("event_type", "n_rows")
        ).count()
        == 0
    )
    print(f"accepted drops: {admitted} of {len(drops)}")
    print(f"rollup equals recompute over accepted batches: {same}")
    spark.stop()


if __name__ == "__main__":
    main()
