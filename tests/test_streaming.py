"""Streaming SCD2: file-stream CDC → foreachBatch merge → parquet store.

Covers the reference's end-to-end flow (SURVEY.md §3.2-3.3) including
restart/replay (checkpoint = DistributedMapCache binlog position)."""

from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.sources import cdc
from architrave_project_apache_nifi_spark.sources.sinks import read_history
from architrave_project_apache_nifi_spark.streaming.scd2_stream import run_scd2_stream


def _expect_golden(hist_rows):
    by_key = {}
    for r in hist_rows:
        by_key.setdefault(r.ProductID, []).append(r)
    assert set(by_key) == {9012, 9013, 9014}
    v = sorted(by_key[9014], key=lambda r: r.valid_from)
    assert [x.Price for x in v] == [56.0, 100.0, 120.0]
    assert [x.is_current for x in v] == ["N", "N", "Y"]
    assert v[0].valid_until == v[1].valid_from
    assert v[1].valid_until == v[2].valid_from


def test_stream_single_batch(spark, tmp_path):
    src = tmp_path / "in"
    cdc.write_golden_scenario(str(src), files=1)
    q = run_scd2_stream(
        spark, str(src), str(tmp_path / "hist"), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    hist = read_history(spark, str(tmp_path / "hist"))
    assert hist.count() == 5
    _expect_golden(hist.collect())


def test_stream_multi_microbatch_and_restart(spark, tmp_path):
    """Events split across 4 files, 1 file per trigger — versions of one
    key straddle micro-batches; then a second run over the same source
    (availableNow + same checkpoint) must be a no-op (no duplicates)."""
    src = tmp_path / "in"
    cdc.write_golden_scenario(str(src), files=4)
    hist_path, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    q = run_scd2_stream(spark, str(src), hist_path, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    hist = read_history(spark, hist_path)
    assert hist.count() == 5
    _expect_golden(hist.collect())
    assert hist.filter((F.col("is_current") == "Y") & F.col("valid_until").isNotNull()).count() == 0

    # restart with same checkpoint: no new files → store unchanged
    q2 = run_scd2_stream(spark, str(src), hist_path, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()
    assert read_history(spark, hist_path).count() == 5
