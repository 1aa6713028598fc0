"""Streaming incremental rollup: per-batch state folds equal the full
recompute, replay converges, restarts resume, snapshots time-travel."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.incremental_agg import (
    agg_state,
    finalize,
)
from architrave_project_apache_nifi_spark.streaming.rollup_stream import (
    prune_snapshots,
    read_rollup,
    read_state,
    rollup_batch,
    run_rollup_stream,
)

SF_DIR = "/root/testdata/sf0.001"

KEYS = ["event_type"]
MEASURES = ["value"]


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def _canon(df):
    return sorted(
        tuple(
            round(v, 9) if isinstance(v, float) else v
            for v in (r[c] for c in sorted(df.columns))
        )
        for r in df.collect()
    )


def test_batch_folds_equal_full_recompute(spark, tmp_path):
    root = str(tmp_path / "rollup")
    events = _events(spark)
    for i in range(3):
        rollup_batch(events.filter(F.col("event_id") % 3 == i), root, KEYS, MEASURES, i)
    got = read_rollup(spark, root, MEASURES)
    want = finalize(agg_state(events, KEYS, MEASURES), MEASURES)
    assert _canon(got) == _canon(want)


def test_replay_converges(spark, tmp_path):
    root = str(tmp_path / "rollup")
    events = _events(spark)
    b0 = events.filter(F.col("event_id") % 2 == 0)
    b1 = events.filter(F.col("event_id") % 2 == 1)
    rollup_batch(b0, root, KEYS, MEASURES, 0)
    rollup_batch(b1, root, KEYS, MEASURES, 1)
    before = _canon(read_rollup(spark, root, MEASURES))
    rollup_batch(b1, root, KEYS, MEASURES, 1)  # crash-replay of batch 1
    assert _canon(read_rollup(spark, root, MEASURES)) == before


def test_time_travel_and_prune(spark, tmp_path):
    root = str(tmp_path / "rollup")
    events = _events(spark)
    b0 = events.filter(F.col("event_id") < 300)
    rollup_batch(b0, root, KEYS, MEASURES, 0)
    rollup_batch(events.filter(F.col("event_id") >= 300), root, KEYS, MEASURES, 1)
    asof0 = read_rollup(spark, root, MEASURES, as_of_batch=0)
    want0 = finalize(agg_state(b0, KEYS, MEASURES), MEASURES)
    assert _canon(asof0) == _canon(want0)
    removed = prune_snapshots(root, keep=1)
    assert removed == 1
    # latest still reads after pruning
    assert read_rollup(spark, root, MEASURES).count() > 0


def test_stream_restart_resumes(spark, tmp_path):
    landing = str(tmp_path / "landing")
    root = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    events = _events(spark)
    schema = events.schema

    os.makedirs(landing, exist_ok=True)
    events.filter(F.col("event_id") < 500).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "drop0"))
    stream = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q = run_rollup_stream(stream, root, ckpt, KEYS, MEASURES)
    q.awaitTermination(120)

    events.filter(F.col("event_id") >= 500).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(landing, "drop1"))
    stream2 = spark.readStream.schema(schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q2 = run_rollup_stream(stream2, root, ckpt, KEYS, MEASURES)
    q2.awaitTermination(120)

    got = read_rollup(spark, root, MEASURES)
    want = finalize(agg_state(events, KEYS, MEASURES), MEASURES)
    assert _canon(got) == _canon(want)
    # the second run resumed from offsets: it folded only drop1
    state_dirs = sorted(os.listdir(os.path.join(root, "state")))
    assert len(state_dirs) >= 2


def test_distinct_sketch_state_round_trips_snapshots(spark, tmp_path):
    """r7: HLL distinct state survives the parquet snapshot round trip
    and batch folds — estimates equal the direct single-pass sketch
    (split-invariance) and, at this cardinality-per-group, the exact
    distinct count; time travel reads finalize historical sketches."""
    root = str(tmp_path / "rollup")
    events = _events(spark)
    dc = ["user_id"]
    for i in range(3):
        rollup_batch(
            events.filter(F.col("event_id") % 3 == i),
            root, KEYS, MEASURES, i, distinct_cols=dc,
        )
    got = read_rollup(spark, root, MEASURES, distinct_cols=dc)
    want = finalize(agg_state(events, KEYS, MEASURES, dc), MEASURES, dc)
    # compare the finalized contract, not the raw sketch bytes: a
    # folded sketch may use a different internal encoding (list/set/hll
    # promotion state) than the direct one while estimating identically
    assert _canon(got.drop("user_id_hll")) == _canon(want.drop("user_id_hll"))
    exact = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in got.collect():
        assert abs(r.user_id_approx_distinct - exact[r.event_type]) <= max(
            1, 0.03 * exact[r.event_type]
        )
    # time travel: the batch-0 snapshot finalizes too
    asof = read_rollup(spark, root, MEASURES, as_of_batch=0, distinct_cols=dc)
    b0 = events.filter(F.col("event_id") % 3 == 0)
    want0 = finalize(agg_state(b0, KEYS, MEASURES, dc), MEASURES, dc)
    assert _canon(asof.drop("user_id_hll")) == _canon(want0.drop("user_id_hll"))
