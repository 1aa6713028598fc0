"""Streaming SCD2 — the full reference dataflow as one streaming query.

Reference DAG (SURVEY.md §2.6): CaptureChangeMySQL → RouteOnAttribute →
[insert: flatten → SCD2-stamp → INSERT] / [update: flatten → (Task 1
insert new) + (Task 2 lookup old current → expire UPDATE)].

Engine: one ``foreachBatch`` running the deterministic batch merge
(operators/scd2.scd2_apply) against the incremental manifest-committed
history store (history_store.Scd2Store: immutable per-batch closed-row
directories + a replaced current-rows snapshot — O(|current|+|batch|)
I/O per micro-batch, never O(|history|)). This collapses the
reference's two racing sinks into one atomic commit-per-micro-batch,
fixing Bugs 1-3 (SURVEY.md §2.8):

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

from ..operators.scd2 import scd2_apply, scd2_build, scd2_split_late
from ..sources import cdc
from .history_store import Scd2Store

#: Late-event policies for the streaming merge. "compat" trusts
#: arrival order like the reference (binlog order, SURVEY.md §1.5 /
#: FT:4295-4301). "quarantine" routes changes whose event time
#: precedes the key's current valid_from to a side-channel instead of
#: corrupting the interval chain. "splice" (scd2_apply_late) is
#: deliberately NOT offered here: it rewrites affected keys' closed
#: versions, and the store's closed segments are immutable append-only
#: by contract (history_store.py) — splicing is a batch-side operation
#: over full-history tables (operators/scd2.scd2_apply_late).
LATE_POLICIES = ("compat", "quarantine")


def _merge_batch(
    spark: SparkSession,
    batch: DataFrame,
    history_path: str,
    key: str,
    ts_col: str,
    batch_id: int,
    n_buckets: int = 16,
    handle_deletes: bool = False,
    compact_every: int | None = None,
    retain_snapshots: int = 1,
    flatten_fn=None,
    late_policy: str = "compat",
) -> None:
    """Merge one micro-batch into the incremental history store.

    ``flatten_fn(batch, keep)`` overrides the envelope→columns pivot
    (default: the products_catalog flatten, ``cdc.flatten_events``) —
    the hook the multi-table demux (multi_table.py) uses to give each
    routed table its own column set and types.

    Closed SCD2 rows are immutable, so the merge runs against the
    current-rows snapshot only (``scd2_apply`` never modifies
    ``is_current='N'`` rows — they would pass through verbatim) — and
    only against the key-hash BUCKETS the batch actually touches: the
    touched-bucket set (≤ n_buckets ints) is computed from the batch's
    keys, the store scans exactly those bucket directories, and the
    commit rewrites exactly those buckets while untouched buckets carry
    forward by manifest reference. Per-batch I/O is
    O(|touched-bucket current rows| + |batch|) — independent of both
    accumulated history and total live-key count.

    Exactly-once: the store records the committed batch id; a replayed
    micro-batch (crash between store commit and checkpoint commit) is
    detected by ``version >= batch_id`` and skipped — the store and the
    checkpoint form a pair (wiping one requires wiping the other).
    A missing store is detected EXPLICITLY via the manifest; a corrupt
    or unreadable store raises and fails the batch instead of being
    silently rebuilt from one micro-batch.
    """
    if late_policy not in LATE_POLICIES:
        raise ValueError(
            f"late_policy must be one of {LATE_POLICIES}, got {late_policy!r}"
            " — 'splice' is batch-side only (scd2_apply_late), see"
            " LATE_POLICIES"
        )
    store = Scd2Store(
        history_path, key_col=key, n_buckets=n_buckets,
        retain_snapshots=retain_snapshots,
    )
    if store.exists() and store.manifest()["version"] >= batch_id:
        return  # replayed, already committed — idempotent no-op
    wanted = ("insert", "update", "delete") if handle_deletes else (
        "insert", "update"
    )
    flatten = flatten_fn if flatten_fn is not None else cdc.flatten_events
    changes = (
        flatten(
            batch.filter(F.col("type").isin(*wanted)),
            keep=("type", "timestamp", "cdc_sequence_id"),
        )
        .withColumn(ts_col, F.timestamp_millis(F.col("timestamp")))
        .withColumn("__tomb", F.col("type") == "delete")
        .drop("type", "timestamp")
    )
    tombstone_col = "__tomb" if handle_deletes else None
    if not handle_deletes:
        changes = changes.drop("__tomb")
    # persist: the batch lineage otherwise re-runs source-read + flatten
    # four times (empty probe, touched-bucket collect, the merge's
    # auto-broadcast key count, and the commit materialization) — on a
    # 200 ms-trigger hot path that quadruples per-batch input cost
    changes = _pinned = changes.persist()
    try:
        touched: list[int] = []
        if store.exists():
            # tiny by construction (≤ n_buckets values): the collect is
            # what turns the current-rows read into a pruned listing —
            # and it doubles as the empty-batch probe (an empty batch
            # touches zero buckets), saving one job per micro-batch on
            # the hot path (measured: per-batch cost is fixed-overhead
            # dominated, ~2.4 s at 32 threads regardless of batch size)
            touched = [
                r.b
                for r in changes.select(store.bucket_expr().alias("b"))
                .distinct()
                .collect()
            ]
            if not touched:
                return
        elif not changes.head(1):
            return
        if touched and store.has_buckets(touched):
            current = store.read_current(spark, buckets=touched)
            if late_policy == "quarantine":
                # A change whose event time precedes its key's current
                # valid_from would invert the interval chain; route it
                # to the side-channel and merge only the appendable
                # remainder. A key with no current row (all-new or
                # tombstoned) is always appendable. A replay of a batch
                # whose store commit succeeded never reaches this split
                # (the version >= batch_id guard above returns first),
                # so quarantine dirs are written at most once per
                # committed batch — it cannot be re-classified against
                # post-merge current rows. Only a batch whose store
                # commit itself failed replays here, against the same
                # pre-merge state, overwriting batch=<id> idempotently.
                changes, late = scd2_split_late(current, changes, key, ts_col)
                if late.head(1):
                    late.write.mode("overwrite").parquet(
                        os.path.join(
                            history_path.rstrip("/") + "_quarantine",
                            f"batch={batch_id}",
                        )
                    )
                if not changes.head(1):
                    return  # everything was late; nothing to merge
            # skew_protection off: a micro-batch is bounded by the
            # trigger (maxFilesPerTrigger), so per-key skew within one
            # batch is batch-sized, and an extra eager detection job
            # per batch would tax the 200 ms-class latency budget
            # broadcast_changes=True skips the auto-sizing count job:
            # a micro-batch is bounded by the trigger, so its per-key
            # summary always fits a broadcast — one fewer job per batch
            merged = scd2_apply(
                current, changes, key, ts_col, order_cols=("cdc_sequence_id",),
                tombstone_col=tombstone_col, skew_protection=False,
                broadcast_changes=True,
            )
        else:
            # first batch, or every touched bucket is virgin (all-new
            # keys): there are no current rows to merge against
            merged = scd2_build(
                changes, key, ts_col, order_cols=("cdc_sequence_id",),
                tombstone_col=tombstone_col, skew_protection=False,
            )
        merged = merged.persist()  # one evaluation feeds both commit writes
        try:
            store.commit(
                new_current=merged.filter(F.col("is_current") == "Y"),
                closed_delta=merged.filter(F.col("is_current") == "N"),
                batch_id=batch_id,
                touched_buckets=touched or None,
            )
        finally:
            merged.unpersist()
    finally:
        _pinned.unpersist()
    if compact_every:
        # post-commit maintenance in the same single-writer thread:
        # folds accumulated per-batch closed dirs once enough pile up
        store.compact_closed(spark, min_batches=compact_every)


def splice_quarantine(
    spark: SparkSession,
    history_path: str,
    out_path: str,
    key: str = "ProductID",
    ts_col: str = "change_ts",
    order_col: str = "cdc_sequence_id",
    n_buckets: int = 16,
) -> int:
    """OFFLINE maintenance: fold the quarantine side-channel back into
    the history by SPLICING, materializing a fresh store at
    ``out_path`` (the live store's append-only closed segments cannot
    be rewritten in place — LATE_POLICIES). Table-rewrite semantics,
    like an OPTIMIZE/rewrite in a lakehouse format: the caller swaps
    paths and resets the stream checkpoint with it (the store and the
    checkpoint are a pair).

    The merge is ``scd2_apply_late`` — order-free and replay-idempotent
    (a quarantined exact duplicate of an existing version converges
    instead of forking the chain), so re-running over the same
    quarantine is safe. Returns the number of quarantined rows folded
    in; raises if the quarantine is empty (nothing to splice is a
    caller bug, not a silent no-op)."""
    from ..operators.scd2 import scd2_apply_late
    from ..sources.sinks import read_history
    from .commitdirs import committed_batch_dirs

    qdirs = [
        p
        for _, p in committed_batch_dirs(
            history_path.rstrip("/") + "_quarantine"
        )
    ]
    if not qdirs:
        raise FileNotFoundError(
            f"no committed quarantine batches under "
            f"{history_path.rstrip('/')}_quarantine"
        )
    late = spark.read.parquet(*qdirs)
    n_late = late.count()
    history = read_history(spark, history_path)
    merged = scd2_apply_late(
        history, late, key, ts_col, order_cols=(order_col,)
    )
    out_store = Scd2Store(out_path, key_col=key, n_buckets=n_buckets)
    if out_store.exists():
        raise FileExistsError(f"splice target already exists: {out_path}")
    merged = merged.persist()
    try:
        out_store.commit(
            new_current=merged.filter(F.col("is_current") == "Y"),
            closed_delta=merged.filter(F.col("is_current") == "N"),
            batch_id=0,
        )
    finally:
        merged.unpersist()
    return n_late


def run_scd2_stream_from(
    spark: SparkSession,
    stream: DataFrame,
    history_path: str,
    checkpoint_path: str,
    key: str = "ProductID",
    ts_col: str = "change_ts",
    await_termination_s: float | None = None,
    processing_time: str | None = None,
    n_buckets: int = 16,
    handle_deletes: bool = False,
    compact_every: int | None = None,
    retain_snapshots: int = 1,
    late_policy: str = "compat",
) -> StreamingQuery:
    """Wire ANY envelope-shaped streaming DataFrame (file source, Kafka,
    socket, the custom ``cdc_replay`` Python DataSource) into the SCD2
    merge sink — the source is pluggable, the merge is one code path.

    ``processing_time``: use a continuous micro-batch trigger instead of
    availableNow (Python DataSources don't implement availableNow; the
    caller stops the query — the reference's always-on 200 ms poll).
    ``n_buckets``: current-snapshot bucket count, fixed at store
    creation (size so one bucket's current rows fit one task).
    ``handle_deletes=False`` matches the reference (delete events are
    dropped, README.md:28); True soft-closes the deleted key's current
    row at the delete timestamp (scd2 tombstones) — beyond-reference.
    ``compact_every=N`` runs closed-batch compaction after any commit
    that leaves ≥ N per-batch closed dirs pending (the small-files
    maintenance a 200 ms-trigger stream needs; see
    ``Scd2Store.compact_closed``). ``retain_snapshots=K`` keeps the
    last K committed snapshots readable (``Scd2Store.read_snapshot`` —
    time travel); 1 = latest only.
    ``late_policy``: "compat" (default) trusts arrival order like the
    reference; "quarantine" routes changes whose event time precedes
    the key's current ``valid_from`` (binlog replay / source backfill)
    to ``<history_path>_quarantine/batch=<id>`` instead of corrupting
    the chain — see ``LATE_POLICIES`` for why splice is batch-only."""
    os.makedirs(checkpoint_path, exist_ok=True)

    def sink(batch: DataFrame, batch_id: int) -> None:
        _merge_batch(
            spark, batch, history_path, key, ts_col, batch_id, n_buckets,
            handle_deletes, compact_every, retain_snapshots,
            late_policy=late_policy,
        )

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


def run_scd2_stream_to_jdbc(
    spark: SparkSession,
    stream: DataFrame,
    url: str,
    table: str,
    checkpoint_path: str,
    key: str = "ProductID",
    ts_col: str = "change_ts",
    properties: dict[str, str] | None = None,
    processing_time: str | None = None,
    await_termination_s: float | None = None,
    handle_deletes: bool = False,
) -> StreamingQuery:
    """The reference's ACTUAL topology, made correct: stream the CDC
    envelope into a live JDBC history table (`products_catalog_history`
    — the table both reference sinks write, final_template.xml:4721),
    one atomic transaction per micro-batch.

    Where the reference races PutSQL INSERT against PutDatabaseRecord
    UPDATE per event (§2.8 bugs), each micro-batch here is ONE
    ``sinks.jdbc_scd2_commit``: expire-UPDATE + version-INSERT commit
    together, with the Structured Streaming batch id as the commit
    marker — a micro-batch replayed after a crash between the database
    commit and the checkpoint commit is a no-op, so the JDBC table gets
    exactly-once semantics end-to-end (source offsets in the
    checkpoint = the reference's MapCache binlog position, FT:1519;
    batch markers in ``<table>_commits`` = the sink-side dedup).

    The parquet-store variant (``run_scd2_stream_from``) remains the
    scale path — a JDBC dimension table is for serving, not for 100 TB
    history — but both share the same flatten/route/merge semantics."""
    from ..sources.sinks import jdbc_scd2_commit

    os.makedirs(checkpoint_path, exist_ok=True)
    props = properties or {}
    wanted = ("insert", "update", "delete") if handle_deletes else (
        "insert", "update"
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        changes = (
            cdc.flatten_events(
                batch.filter(F.col("type").isin(*wanted)),
                keep=("type", "timestamp", "cdc_sequence_id"),
            )
            .withColumn(ts_col, F.timestamp_millis(F.col("timestamp")))
            .withColumn("__tomb", F.col("type") == "delete")
            .drop("type", "timestamp")
        )
        tombstone_col = "__tomb" if handle_deletes else None
        if not handle_deletes:
            changes = changes.drop("__tomb")
        changes = changes.persist()  # staged twice (expire summary + versions)
        try:
            if not changes.head(1):
                return
            jdbc_scd2_commit(
                changes, url, table, key, ts_col, props,
                order_cols=("cdc_sequence_id",),
                tombstone_col=tombstone_col,
                batch_id=batch_id,
            )
        finally:
            changes.unpersist()

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
    handle_deletes: bool = False,
    late_policy: str = "compat",
) -> StreamingQuery:
    """Wire the CDC file stream into the SCD2 merge sink."""
    stream = cdc.read_envelope_stream(spark, input_path, max_files_per_trigger)
    return run_scd2_stream_from(
        spark, stream, history_path, checkpoint_path, key, ts_col,
        await_termination_s, handle_deletes=handle_deletes,
        late_policy=late_policy,
    )
