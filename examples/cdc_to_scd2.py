"""End-to-end example: CDC envelope feed → SCD2 history, three ways.

Run: python examples/cdc_to_scd2.py   (writes under /tmp, reads testdata)

1. BATCH: build the full history from a change table.
2. STREAMING → parquet store: the production path (incremental
   manifest-committed store, exactly-once per micro-batch).
3. STREAMING → JDBC: the reference's actual topology (live
   products_catalog_history table), one atomic transaction per batch.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.scd2 import (
    scd2_as_of,
    scd2_build,
    scd2_current,
)
from architrave_project_apache_nifi_spark.session import get_spark
from architrave_project_apache_nifi_spark.sources import cdc
from architrave_project_apache_nifi_spark.sources.sinks import read_history
from architrave_project_apache_nifi_spark.streaming.scd2_stream import (
    run_scd2_stream,
)


def main() -> None:
    spark = get_spark("example-scd2", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    # -- 1. batch build over the driver-generated events table ----------
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hist = scd2_build(events, "user_id", "ts", ("event_id",))
    print("batch history rows:", hist.count())
    print("current rows:", scd2_current(hist).count())
    print(
        "as-of 2024-01-16:",
        scd2_as_of(hist, "2024-01-16 00:00:00").count(),
    )

    # -- 2. streaming merge of the golden CDC scenario ------------------
    with tempfile.TemporaryDirectory() as d:
        src, store, ckpt = f"{d}/in", f"{d}/store", f"{d}/ckpt"
        cdc.write_golden_scenario(src, files=2)
        q = run_scd2_stream(spark, src, store, ckpt)
        q.awaitTermination(60)
        merged = read_history(spark, store)
        print("streamed history rows:", merged.count())
        merged.filter(F.col("ProductID") == 9014).orderBy("valid_from").show()


if __name__ == "__main__":
    main()
