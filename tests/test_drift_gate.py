from __future__ import annotations

import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.streaming.drift_gate import (
    drift_gate_batch,
    run_drift_gate_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_same_distribution_admits(spark, tmp_path):
    root = str(tmp_path / "gate")
    events = _events(spark)
    ref = events.filter(F.col("event_id") % 2 == 0)
    batch = events.filter(F.col("event_id") % 2 == 1)
    ok = drift_gate_batch(batch, ref, root, 0, ["value"], ["event_type"])
    assert ok
    assert os.path.isdir(os.path.join(root, "accepted", "batch=0"))


def test_shifted_batch_quarantines_with_report(spark, tmp_path):
    root = str(tmp_path / "gate")
    events = _events(spark)
    bad = events.withColumn("value", F.col("value") * 10 + 500)
    ok = drift_gate_batch(bad, events, root, 7, ["value"], None)
    assert not ok
    assert os.path.isdir(os.path.join(root, "quarantine", "batch=7"))
    rep = spark.read.parquet(os.path.join(root, "reports", "batch=7"))
    rows = {r["column"]: r["verdict"] for r in rep.collect()}
    assert rows["value"] == "shifted"
    assert not os.path.isdir(os.path.join(root, "accepted", "batch=7"))
    # quarantine/ holds ONLY data directories (uniform schema), so a
    # partition-discovery read of the whole root works.
    quarantined = spark.read.option("basePath", os.path.join(root, "quarantine")).parquet(
        os.path.join(root, "quarantine", "batch=7")
    )
    assert quarantined.count() == _events(spark).count()


def test_replay_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "gate")
    events = _events(spark)
    drift_gate_batch(events, events, root, 3, ["value"], None)
    first = spark.read.parquet(os.path.join(root, "accepted", "batch=3")).count()
    drift_gate_batch(events, events, root, 3, ["value"], None)
    again = spark.read.parquet(os.path.join(root, "accepted", "batch=3")).count()
    assert first == again == events.count()


def test_stream_routes_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "gate")
    ckpt = str(tmp_path / "ckpt")
    events = _events(spark)
    ref = events.filter(F.col("event_id") % 2 == 0)

    os.makedirs(landing, exist_ok=True)
    # drop 1: same distribution → accept
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "drop0"))
    stream = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q = run_drift_gate_stream(stream, ref, root, ckpt, ["value"], None)
    q.awaitTermination(120)

    # drop 2: shifted → quarantine
    events.withColumn("value", F.col("value") * 10 + 500).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "drop1"))
    stream2 = spark.readStream.schema(events.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q2 = run_drift_gate_stream(stream2, ref, root, ckpt, ["value"], None)
    q2.awaitTermination(120)

    accepted = os.listdir(os.path.join(root, "accepted"))
    quarantined = os.listdir(os.path.join(root, "quarantine"))
    assert len(accepted) == 1 and len(quarantined) == 1
