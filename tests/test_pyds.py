"""Tests for the custom Python DataSource (sources/pyds.py): batch
snapshot parity, micro-batch rate limiting, and checkpointed restart —
the CaptureChangeMySQL semantics (SURVEY.md §2.1 #1, #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.sources import cdc, pyds


def _golden_dir(tmp_path):
    d = str(tmp_path / "events")
    cdc.write_golden_scenario(d, files=4)
    return d


def test_batch_read_full_snapshot(spark, tmp_path):
    d = _golden_dir(tmp_path)
    pyds.register(spark)
    df = spark.read.format(pyds.FORMAT_NAME).option("path", d).load()
    assert df.schema == cdc.CDC_ENVELOPE_SCHEMA
    rows = df.collect()
    assert len(rows) == 8
    by_type = {r.type for r in rows}
    assert by_type == {"insert", "update", "delete", "begin", "commit"}
    # nested columns array survives the row conversion
    ins = [r for r in rows if r.type == "insert"][0]
    names = [c.name for c in ins.columns]
    assert "ProductID" in names and "Price" in names


def _run_until(spark, path, ckpt, sink, done, max_events=3, timeout_s=90.0):
    """Python stream sources don't support Trigger.AvailableNow (Spark
    falls back to one batch) — drive with a fast processing-time trigger
    and stop once ``done()`` holds."""
    import time

    q = (
        spark.readStream.format(pyds.FORMAT_NAME)
        .option("path", path)
        .option("maxEventsPerBatch", max_events)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline and not done():
            time.sleep(0.2)
        assert done(), "stream did not reach expected state before timeout"
    finally:
        q.stop()


def test_stream_rate_limit_and_offsets(spark, tmp_path):
    d = _golden_dir(tmp_path)
    pyds.register(spark)
    batches: list[int] = []

    def sink(batch, _):
        n = batch.count()
        if n:
            batches.append(n)

    _run_until(
        spark, d, str(tmp_path / "ckpt"), sink,
        done=lambda: sum(batches) >= 8, max_events=3,
    )
    assert sum(batches) == 8
    assert max(batches) <= 3  # the poll budget held per micro-batch


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    d = _golden_dir(tmp_path)
    pyds.register(spark)
    seen: list[int] = []

    def sink(batch, _):
        seen.extend(r.cdc_sequence_id for r in batch.collect())

    ckpt = str(tmp_path / "ckpt2")
    _run_until(spark, d, ckpt, sink, done=lambda: len(seen) >= 8, max_events=5)
    first = sorted(seen)
    assert first == [1, 2, 3, 4, 5, 6, 7, 8]

    # restart on the same checkpoint: committed offsets must not
    # replay. foreachBatch side effects are AT-LEAST-ONCE — if phase
    # 1's stop() raced the final checkpoint commit (observed under a
    # loaded full-suite run), replaying exactly that one uncommitted
    # batch is correct behavior, so the assertion allows at most one
    # batch of duplicates and zero new/lost event ids. End-to-end
    # exactly-once comes from the idempotent SCD2 merge downstream
    # (pinned by the scd2_stream/crash-injection suites), not from the
    # source.
    import time

    # "at most ONE replayed batch" in rows: one batch is bounded by the
    # maxEventsPerBatch option below — derive the duplicate bound from
    # it so the contract stays self-describing if the budget changes.
    max_events_per_batch = 5
    q = (
        spark.readStream.format(pyds.FORMAT_NAME)
        .option("path", d)
        .option("maxEventsPerBatch", max_events_per_batch)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    time.sleep(3)
    q.stop()
    assert set(seen) == set(first), "restart lost or invented events"
    extras = len(seen) - len(first)
    assert extras <= max_events_per_batch, (
        f"{extras} duplicate rows — more than one uncommitted batch "
        "replayed (committed offsets were re-served)"
    )


def test_stream_feeds_flatten_and_route(spark, tmp_path):
    """The parsed stream slots straight into the reference DAG ops."""
    d = _golden_dir(tmp_path)
    pyds.register(spark)
    out: list = []

    def sink(batch, _):
        flat = cdc.flatten_events(batch.filter(F.col("type").isin("insert", "update")))
        out.extend(flat.select("ProductID", "Price").collect())

    _run_until(
        spark, d, str(tmp_path / "ckpt3"), sink,
        done=lambda: len(out) >= 5, max_events=100,
    )
    assert len(out) == 5  # 3 inserts + 2 updates; delete/begin/commit dropped
    assert {r.ProductID for r in out} == {9012, 9013, 9014}


def test_kafka_loopback_stream_reader_offsets_property(tmp_path):
    """Pure-reader property (no Spark needed): for any message layout
    and any per-batch budget, repeatedly calling read() from the last
    committed offset delivers every message EXACTLY once, in
    per-partition offset order, and readBetweenOffsets replays a
    recorded span byte-identically (the crash-replay contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    @settings(max_examples=25, deadline=None)
    @given(
        msgs=st.lists(
            st.tuples(st.binary(min_size=1, max_size=8), st.integers(0, 2)),
            min_size=1,
            max_size=30,
        ),
        budget=st.integers(1, 7),
    )
    def run(msgs, budget):
        import tempfile

        with tempfile.TemporaryDirectory(dir=str(tmp_path)) as broker:
            for value, part in msgs:
                kl.produce(broker, "t", value, partition=part)
            reader = kl._LoopbackStreamReader(broker, ["t"], "earliest", budget)
            offset = reader.initialOffset()
            seen = []
            spans = []
            for _ in range(len(msgs) * 3 + 2):
                rows, nxt = reader.read(offset)
                rows = list(rows)
                if not rows and nxt == offset:
                    break
                spans.append((offset, nxt, rows))
                seen.extend(rows)
                offset = nxt
            assert len(seen) == len(msgs)  # exactly once, all delivered
            # per-partition: dense offsets in order, values match produce order
            by_part = {}
            for r in seen:
                by_part.setdefault(r[3], []).append(r)
            produced = {}
            for value, part in msgs:
                produced.setdefault(part, []).append(value)
            for part, rows in by_part.items():
                assert [r[4] for r in rows] == list(range(len(rows)))
                assert [bytes(r[1]) for r in rows] == produced[part]
            # crash-replay: every recorded span replays identically
            for lo, hi, rows in spans:
                assert list(reader.readBetweenOffsets(lo, hi)) == rows

    run()
