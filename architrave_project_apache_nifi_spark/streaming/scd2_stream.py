"""Streaming SCD2 — the full reference dataflow as one streaming query.

Reference DAG (SURVEY.md §2.6): CaptureChangeMySQL → RouteOnAttribute →
[insert: flatten → SCD2-stamp → INSERT] / [update: flatten → (Task 1
insert new) + (Task 2 lookup old current → expire UPDATE)].

Engine: one ``foreachBatch`` running the deterministic batch merge
(operators/scd2.scd2_apply) against the parquet history store. This
collapses the reference's two racing sinks into one atomic
rewrite-per-micro-batch, fixing Bugs 1-3 (SURVEY.md §2.8):

- within-batch multi-updates to one key chain correctly (window lead);
- expire-then-insert is one plan — no race;
- replay of a micro-batch after failure converges to the same store
  (merge inputs = checkpointed offsets + last committed store →
  effectively exactly-once, vs the reference's at-least-once self-loop
  retries).

The checkpoint directory carries source offsets — the reference's
DistributedMapCache binlog position (final_template.xml:1519).

State note: history lives in the store, not in streaming state, so no
``applyInPandasWithState`` and no unbounded state growth; a watermark on
event time is only needed if late events must be *rejected* — the
reference trusts binlog arrival order (SURVEY.md §2.7 streaming rows),
we order by ``cdc_sequence_id`` within each batch instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.scd2 import scd2_apply, scd2_build
from ..sources import cdc
from ..sources.sinks import read_history, write_history


def _merge_batch(
    spark: SparkSession, batch: DataFrame, history_path: str, key: str, ts_col: str
) -> None:
    changes = (
        cdc.flatten_events(
            batch.filter(F.col("type").isin("insert", "update")),
        )
        .withColumn(ts_col, F.timestamp_millis(F.col("timestamp")))
        .drop("type", "timestamp")
    )
    if not changes.head(1):
        return
    try:
        history = read_history(spark, history_path)
        merged = scd2_apply(history, changes, key, ts_col, order_cols=("cdc_sequence_id",))
    except Exception:  # first batch — no store yet
        merged = scd2_build(changes, key, ts_col, order_cols=("cdc_sequence_id",))
    # Write-then-swap: parquet overwrite of a path we're reading needs a
    # staging hop (same-path read/write is undefined). At scale this
    # becomes a transactional table format commit (Delta/Iceberg) or a
    # partition-scoped overwrite of only touched is_current partitions.
    staging = history_path.rstrip("/") + ".staging"
    write_history(merged, staging, mode="overwrite")
    final = read_history(spark, staging)
    write_history(final, history_path, mode="overwrite")


def run_scd2_stream_from(
    spark: SparkSession,
    stream: DataFrame,
    history_path: str,
    checkpoint_path: str,
    key: str = "ProductID",
    ts_col: str = "change_ts",
    await_termination_s: float | None = None,
    processing_time: str | None = None,
) -> StreamingQuery:
    """Wire ANY envelope-shaped streaming DataFrame (file source, Kafka,
    the custom ``cdc_replay`` Python DataSource) into the SCD2 merge
    sink — the source is pluggable, the merge is one code path.

    ``processing_time``: use a continuous micro-batch trigger instead of
    availableNow (Python DataSources don't implement availableNow; the
    caller stops the query — the reference's always-on 200 ms poll)."""
    os.makedirs(checkpoint_path, exist_ok=True)

    def sink(batch: DataFrame, _batch_id: int) -> None:
        _merge_batch(spark, batch, history_path, key, ts_col)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_path
    )
    if processing_time is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    query = writer.start()
    if await_termination_s is not None:
        query.awaitTermination(await_termination_s)
    return query


def run_scd2_stream(
    spark: SparkSession,
    input_path: str,
    history_path: str,
    checkpoint_path: str,
    key: str = "ProductID",
    ts_col: str = "change_ts",
    max_files_per_trigger: int | None = 1,
    await_termination_s: float | None = None,
) -> StreamingQuery:
    """Wire the CDC file stream into the SCD2 merge sink."""
    stream = cdc.read_envelope_stream(spark, input_path, max_files_per_trigger)
    return run_scd2_stream_from(
        spark, stream, history_path, checkpoint_path, key, ts_col,
        await_termination_s,
    )
