"""End-to-end example: late CDC events (binlog replay / source
backfill) against an SCD2 history — the three policies.

Run: python examples/late_events.py   (writes under /tmp, reads nothing)

The reference trusts binlog arrival order outright (SURVEY.md §1.5) —
a replayed or backfilled change silently corrupts its history. This
engine makes the choice explicit:

1. COMPAT  — scd2_apply: trust arrival order (reference parity).
2. QUARANTINE — the stream routes un-appendable changes to a
   side-channel instead of corrupting the chain (late_policy=
   "quarantine"), shown here with the batch-level scd2_split_late.
3. SPLICE — scd2_apply_late rebuilds only the affected keys' chains
   with the late rows in their correct temporal position; the result
   is identical to having seen every event in order (order-free,
   replay-idempotent — property-tested in test_scd2_properties.py).
"""

from __future__ import annotations

import datetime as dt
import sys

sys.path.insert(0, ".")

from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_apply_late,
    scd2_build,
    scd2_invariants,
    scd2_split_late,
)
from architrave_project_apache_nifi_spark.session import get_spark


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 9, minute)


def main() -> None:
    spark = get_spark("late-events-example")
    spark.sparkContext.setLogLevel("ERROR")
    schema = "ProductID INT, Price DOUBLE, change_ts TIMESTAMP, seq LONG"

    # History: product 1 priced 10 -> 20 -> 30 at minutes 0, 10, 20.
    hist = scd2_build(
        spark.createDataFrame(
            [(1, 10.0, ts(0), 0), (1, 20.0, ts(10), 1), (1, 30.0, ts(20), 2)],
            schema,
        ),
        "ProductID", "change_ts", ("seq",),
    )

    # A later batch: one fresh change (minute 40) and one BACKFILLED
    # change the binlog replayed (minute 15 — between two versions).
    batch = spark.createDataFrame(
        [(1, 40.0, ts(40), 3), (1, 15.0, ts(15), 4)], schema
    )

    on_time, late = scd2_split_late(hist, batch, "ProductID", "change_ts")
    print("quarantine split:")
    print("  on_time seqs:", sorted(r.seq for r in on_time.collect()))
    print("  late seqs:   ", sorted(r.seq for r in late.collect()))

    spliced = scd2_apply_late(hist, batch, "ProductID", "change_ts", ("seq",))
    chain = sorted(spliced.collect(), key=lambda r: r.valid_from)
    print("spliced chain:")
    for r in chain:
        until = r.valid_until.strftime("%H:%M") if r.valid_until else "open"
        print(
            f"  {r.valid_from:%H:%M} -> {until}  price={r.Price}"
            f"  current={r.is_current}"
        )
    n_bad = scd2_invariants(spliced, "ProductID").count()
    print(f"invariant violations after splice: {n_bad}")

    spark.stop()


if __name__ == "__main__":
    main()
