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


def _snapshot_files(root):
    """(path → (size, mtime)) for DATA files under root; _SUCCESS/.crc
    markers are bookkeeping the store may GC with their directory."""
    out = {}
    for dirpath, _dirs, files in __import__("os").walk(root):
        for f in files:
            if not f.startswith("part-") or f.endswith(".crc"):
                continue
            p = __import__("os").path.join(dirpath, f)
            st = __import__("os").stat(p)
            out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_stream_incremental_store_never_rewrites_closed_batches(spark, tmp_path):
    """The scale contract of the incremental store: committed closed-row
    directories are immutable — later micro-batches must not rewrite
    (or even touch) them, and per-batch I/O is O(current + delta)."""
    import json
    import os

    from architrave_project_apache_nifi_spark.sources.cdc import (
        _envelope,
    )

    src = tmp_path / "in"
    cdc.write_golden_scenario(str(src), files=4)
    hist_path, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    q = run_scd2_stream(spark, str(src), hist_path, ckpt, max_files_per_trigger=1)
    q.awaitTermination()
    closed_root = os.path.join(hist_path, "closed")
    current_root = os.path.join(hist_path, "current")
    before = _snapshot_files(closed_root)
    assert before, "expected committed closed batches after the golden run"
    # keys 9012/9013/9014 hash to distinct buckets (2/4/14 of 16), so the
    # next batch (touching only 9014) must carry 9012's and 9013's
    # current-bucket files forward BY REFERENCE — byte-identical
    current_before = {
        p: sig
        for p, sig in _snapshot_files(current_root).items()
        if "__bucket=14" not in p
    }
    assert current_before, "expected untouched current buckets to exist"

    # a new event arrives (another price update to 9014) → one more batch
    with open(src / "events_9999.json", "w") as fh:
        fh.write(json.dumps(_envelope(9, "update", 9014, price=140.0)) + "\n")
    q2 = run_scd2_stream(spark, str(src), hist_path, ckpt, max_files_per_trigger=1)
    q2.awaitTermination()

    after = _snapshot_files(closed_root)
    for path, sig in before.items():
        assert after.get(path) == sig, f"closed file rewritten: {path}"
    assert len(after) > len(before)  # the new batch added its own closed dir

    current_after = _snapshot_files(current_root)
    for path, sig in current_before.items():
        assert current_after.get(path) == sig, f"untouched bucket rewritten: {path}"

    hist = read_history(spark, hist_path).collect()
    v = sorted((r for r in hist if r.ProductID == 9014), key=lambda r: r.valid_from)
    assert [x.Price for x in v] == [56.0, 100.0, 120.0, 140.0]
    assert [x.is_current for x in v] == ["N", "N", "N", "Y"]
    assert v[2].valid_until == v[3].valid_from


def test_stream_handle_deletes_closes_chain(spark, tmp_path):
    """handle_deletes=True: the golden scenario's delete of 9013
    (dropped by the reference, README.md:28) soft-closes its current
    row at the delete timestamp; everything else is unchanged."""
    src = tmp_path / "in"
    cdc.write_golden_scenario(str(src), files=2)
    q = run_scd2_stream(
        spark, str(src), str(tmp_path / "hist"), str(tmp_path / "ckpt"),
        handle_deletes=True,
    )
    q.awaitTermination()
    hist = read_history(spark, str(tmp_path / "hist"))
    rows = hist.collect()
    assert len(rows) == 5
    r9013 = [r for r in rows if r.ProductID == 9013]
    assert len(r9013) == 1
    assert r9013[0].is_current == "N"
    assert r9013[0].valid_until is not None  # closed at the delete ts
    v9014 = sorted((r for r in rows if r.ProductID == 9014), key=lambda r: r.valid_from)
    assert [x.is_current for x in v9014] == ["N", "N", "Y"]
    cur = {r.ProductID for r in rows if r.is_current == "Y"}
    assert cur == {9012, 9014}


def test_stream_corrupt_store_fails_batch_instead_of_rebuilding(spark, tmp_path):
    """A store whose manifest points at unreadable data must FAIL the
    micro-batch (error propagates out of the streaming query) — never
    silently rebuild history from the current batch alone."""
    import json
    import os
    import shutil

    import pytest

    src = tmp_path / "in"
    cdc.write_golden_scenario(str(src), files=1)
    hist_path, ckpt = str(tmp_path / "hist"), str(tmp_path / "ckpt")
    q = run_scd2_stream(spark, str(src), hist_path, ckpt)
    q.awaitTermination()
    assert read_history(spark, hist_path).count() == 5

    # corrupt: delete the current snapshot the manifest references
    with open(os.path.join(hist_path, "_MANIFEST.json")) as fh:
        version = json.load(fh)["version"]
    shutil.rmtree(os.path.join(hist_path, "current", f"v={version}"))

    with open(src / "events_9999.json", "w") as fh:
        from architrave_project_apache_nifi_spark.sources.cdc import _envelope

        fh.write(json.dumps(_envelope(9, "update", 9014, price=140.0)) + "\n")
    q2 = run_scd2_stream(spark, str(src), hist_path, str(tmp_path / "ckpt"))
    with pytest.raises(Exception, match="(?i)path does not exist|PATH_NOT_FOUND"):
        q2.awaitTermination()
