"""Full-engine integration: custom Python DataSource SOURCE (rate-
limited CDC replay) → streaming SCD2 merge (foreachBatch) → parquet
history store → custom Python DataSource SINK (transactional JSON
audit). Every hop of the reference DAG (SURVEY.md §2.6) through this
engine's own custom endpoints in one test."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.sources import cdc, pyds, pyds_sink
from architrave_project_apache_nifi_spark.sources.sinks import read_history
from architrave_project_apache_nifi_spark.streaming.scd2_stream import (
    run_scd2_stream_from,
)


def test_custom_source_to_scd2_to_custom_sink(spark, tmp_path):
    src = str(tmp_path / "in")
    cdc.write_golden_scenario(src, files=2)

    pyds.register(spark)
    pyds_sink.register(spark)

    # rate-limited custom source: 3 events per micro-batch → the golden
    # scenario's 7 events span multiple batches, like the 200 ms poll
    stream = (
        spark.readStream.format("cdc_replay")
        .option("path", src)
        .option("maxEventsPerBatch", 3)
        .load()
    )
    hist_path = str(tmp_path / "hist")
    q = run_scd2_stream_from(
        spark, stream, hist_path, str(tmp_path / "ckpt"),
        processing_time="50 milliseconds",  # Python sources lack availableNow
    )

    def _done() -> bool:
        try:
            return read_history(spark, hist_path).count() == 5
        except Exception:
            return False

    deadline = time.monotonic() + 120
    try:
        while time.monotonic() < deadline and not _done():
            time.sleep(0.3)
    finally:
        q.stop()
    assert _done(), "stream did not converge to the golden history"

    hist = read_history(spark, hist_path)
    rows = hist.collect()
    assert len(rows) == 5
    v9014 = sorted(
        (r for r in rows if r.ProductID == 9014), key=lambda r: r.valid_from
    )
    assert [r.Price for r in v9014] == [56.0, 100.0, 120.0]
    assert [r.is_current for r in v9014] == ["N", "N", "Y"]
    assert v9014[0].valid_until == v9014[1].valid_from

    # audit the final history through the custom transactional sink
    audit = str(tmp_path / "audit")
    hist.withColumn("audited_at", F.lit("r1")).write.format("json_audit").option(
        "path", audit
    ).mode("overwrite").save()
    back = pyds_sink.read_committed(spark, audit)
    assert back.count() == 5
    assert sorted(r.Price for r in back.filter(F.col("ProductID") == 9014).collect()) == [
        56.0, 100.0, 120.0,
    ]


def test_socket_source_to_scd2_merge(spark, tmp_path):
    """Live-connector shape (CaptureChangeMySQL's push feed,
    final_template.xml:4110-4382): envelope JSON over a real TCP socket
    → the SAME pluggable merge. Proves nothing downstream assumes a
    file-backed source."""
    import json
    import socket
    import threading

    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_invariants

    events = cdc.golden_scenario_events()
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve() -> None:
        conn, _ = srv.accept()
        with conn:
            for e in events:
                conn.sendall((json.dumps(e) + "\n").encode())
            stop.wait(120)  # hold the connection open while Spark drains

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    stream = cdc.read_envelope_socket_stream(spark, "127.0.0.1", port)
    hist_path = str(tmp_path / "hist")
    q = run_scd2_stream_from(
        spark, stream, hist_path, str(tmp_path / "ckpt"),
        processing_time="100 milliseconds",  # socket source lacks availableNow
    )

    def _done() -> bool:
        try:
            return read_history(spark, hist_path).count() == 5
        except Exception:
            return False

    deadline = time.monotonic() + 120
    try:
        while time.monotonic() < deadline and not _done():
            time.sleep(0.3)
    finally:
        q.stop()
        stop.set()
        srv.close()
    assert _done(), "socket stream did not converge to the golden history"

    hist = read_history(spark, hist_path)
    assert scd2_invariants(hist, "ProductID").count() == 0
    v9014 = sorted(
        (r for r in hist.collect() if r.ProductID == 9014),
        key=lambda r: r.valid_from,
    )
    assert [r.Price for r in v9014] == [56.0, 100.0, 120.0]
    assert [r.is_current for r in v9014] == ["N", "N", "Y"]


def test_kafka_shaped_source_to_scd2_merge(spark, tmp_path):
    """Production-source shape e2e: envelope JSON produced to a
    (loopback) Kafka topic, consumed by the UNMODIFIED
    read_envelope_kafka_stream → the same pluggable SCD2 merge — with
    a mid-scenario restart proving offsets resume from the streaming
    checkpoint (the reference's DistributedMapCache binlog position,
    final_template.xml:1519) instead of replaying or skipping."""
    import json

    from architrave_project_apache_nifi_spark.operators.scd2 import scd2_invariants
    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    events = cdc.golden_scenario_events()
    # key by primary key (partition-stable ordering per product),
    # 2 partitions like a real CDC topic
    def _produce(evs):
        for e in evs:
            cols = e.get("columns") or []
            pid = next((c["value"] for c in cols if c["name"] == "ProductID"), "none")
            kl.produce(broker, "cdc", json.dumps(e), key=str(pid), n_partitions=2)

    hist_path = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")

    def _run_until(n_rows: int) -> None:
        stream = cdc.read_envelope_kafka_stream(
            spark, broker, "cdc", fmt=kl.FORMAT_NAME
        )
        q = run_scd2_stream_from(
            spark, stream, hist_path, ckpt,
            processing_time="100 milliseconds",  # Python sources lack availableNow
        )

        def _done() -> bool:
            try:
                return read_history(spark, hist_path).count() == n_rows
            except Exception:
                return False

        deadline = time.monotonic() + 120
        try:
            while time.monotonic() < deadline and not _done():
                time.sleep(0.3)
        finally:
            q.stop()
        assert _done(), f"kafka-shaped stream did not reach {n_rows} history rows"

    _produce(events[:3])          # 3 inserts
    _run_until(3)
    _produce(events[3:])          # 2 updates to 9014 + delete/begin/commit (dropped)
    _run_until(5)                 # restart: resumes at offset 3, not 0

    hist = read_history(spark, hist_path)
    assert scd2_invariants(hist, "ProductID").count() == 0
    v9014 = sorted(
        (r for r in hist.collect() if r.ProductID == 9014),
        key=lambda r: r.valid_from,
    )
    assert [r.Price for r in v9014] == [56.0, 100.0, 120.0]
    assert [r.is_current for r in v9014] == ["N", "N", "Y"]
    assert v9014[0].valid_until == v9014[1].valid_from


def test_stream_to_topic_to_stream_scd2(spark, tmp_path):
    """Full duplex through the Kafka-shaped wire: file CDC stream →
    streaming WRITE to a (loopback) topic → read_envelope_kafka_stream
    from that topic → SCD2 merge. Proves the sink half of the loopback
    (per-batch exactly-once producer) and that the engine can relay a
    CDC feed through a broker without touching the merge."""
    import json

    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    src = str(tmp_path / "in")
    cdc.write_golden_scenario(src, files=2)

    # leg 1: file envelope stream → topic (value = envelope JSON)
    env = cdc.read_envelope_stream(spark, src, max_files_per_trigger=1)
    q1 = (
        env.select(F.to_json(F.struct(*env.columns)).alias("value"))
        .writeStream.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("topic", "cdc")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)

    # leg 2: topic → the unmodified Kafka consumer → SCD2 merge
    stream = cdc.read_envelope_kafka_stream(spark, broker, "cdc", fmt=kl.FORMAT_NAME)
    hist_path = str(tmp_path / "hist")
    q2 = run_scd2_stream_from(
        spark, stream, hist_path, str(tmp_path / "ckpt2"),
        processing_time="100 milliseconds",
    )

    def _done() -> bool:
        try:
            return read_history(spark, hist_path).count() == 5
        except Exception:
            return False

    deadline = time.monotonic() + 120
    try:
        while time.monotonic() < deadline and not _done():
            time.sleep(0.3)
    finally:
        q2.stop()
    assert _done(), "relayed stream did not converge to the golden history"
    v9014 = sorted(
        (r for r in read_history(spark, hist_path).collect() if r.ProductID == 9014),
        key=lambda r: r.valid_from,
    )
    assert [r.Price for r in v9014] == [56.0, 100.0, 120.0]
    assert [r.is_current for r in v9014] == ["N", "N", "Y"]

    # sink-side exactly-once: replaying a committed batch id is a no-op
    w = kl._LoopbackStreamWriter(broker, "cdc", 1)
    before = sum(
        1 for _ in open(tmp_path / "broker" / "cdc" / "p0.jsonl")
    )
    committed = sorted(w._committed())
    assert committed, "stream writer recorded no batch ids"
    w.commit([kl._ProducerCommit(rows=[(None, "ZHVw", None, None)])], committed[0])
    after = sum(1 for _ in open(tmp_path / "broker" / "cdc" / "p0.jsonl"))
    assert after == before, "replayed batch id must not append"


def test_streaming_clean_gate_through_topic(spark, tmp_path):
    """The corpus-cleaning gate in STREAMING mode: documents produced
    to a (loopback) topic → readStream → Gopher-rule filter +
    normalization + fingerprint (all map-only Column ops, so they
    compose with any micro-batch) → streaming write to an output
    topic. The streamed survivor set must equal the batch computation
    on the same corpus — streaming and batch share one code path."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from architrave_project_apache_nifi_spark.operators import textanalysis as ta
    from architrave_project_apache_nifi_spark.sources import kafka_loopback as kl

    kl.register(spark)
    broker = str(tmp_path / "broker")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    for r in docs.collect():
        kl.produce(
            broker, "docs",
            _json.dumps({"doc_id": r.doc_id, "text": r.text}),
            key=str(r.doc_id),
        )

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    parsed = (
        spark.readStream.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "docs")
        .load()
        .select(F.from_json(F.col("value").cast("string"), schema).alias("d"))
        .select("d.*")
    )
    cleaned = parsed.filter(ta.gopher_keep(F.col("text"))).select(
        F.col("doc_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                "doc_id",
                ta.normalize_text(F.col("text")).alias("norm_text"),
                ta.fingerprint(F.col("text")).alias("fp"),
            )
        ).alias("value"),
    )
    q = (
        cleaned.writeStream.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("topic", "clean")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = (
        spark.read.format(kl.FORMAT_NAME)
        .option("kafka.bootstrap.servers", broker)
        .option("subscribe", "clean")
        .load()
        .select(F.from_json(F.col("value").cast("string"),
                            "doc_id LONG, norm_text STRING, fp LONG").alias("d"))
        .select("d.*")
    )
    streamed = {(r.doc_id, r.fp) for r in out.collect()}
    batch = {
        (r.doc_id, r.fp)
        for r in docs.filter(ta.gopher_keep(F.col("text")))
        .select("doc_id", ta.fingerprint(F.col("text")).alias("fp"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0
