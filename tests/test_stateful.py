"""Custom stateful streaming ops (streaming/stateful.py): state must
carry across micro-batches and survive via the checkpoint."""

from __future__ import annotations

import datetime as dt
import json
import os

from architrave_project_apache_nifi_spark.streaming.stateful import (
    running_user_stats,
    streaming_first_seen,
)

SCHEMA = "event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE"


def _write_batch(d: str, name: str, rows: list[tuple[int, str, int, float]]) -> None:
    os.makedirs(d, exist_ok=True)
    fp = os.path.join(d, f"{name}.json")
    with open(fp, "w") as fh:
        for event_id, ts, user_id, value in rows:
            fh.write(
                json.dumps(
                    {"event_id": event_id, "ts": ts, "user_id": user_id, "value": value}
                )
                + "\n"
            )
    # FileStreamSource orders micro-batches by modification time; files
    # written within the same tick tie — pin mtimes to the b<N> index so
    # batch order matches authoring order.
    idx = int(name.lstrip("b"))
    t = 1_700_000_000 + idx * 60
    os.utime(fp, (t, t))


def _stream(spark, d: str):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )


def _run(spark, df, ckpt: str, out: list, mode: str = "update"):
    q = (
        df.writeStream.outputMode(mode)
        .foreachBatch(lambda b, _: out.extend(b.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_running_stats_accumulate_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files → two micro-batches (maxFilesPerTrigger=1)
    _write_batch(src, "b0", [(1, "2024-01-01T10:00:00", 7, 10.0),
                             (2, "2024-01-01T10:05:00", 7, 5.0),
                             (3, "2024-01-01T10:00:00", 8, 1.0)])
    _write_batch(src, "b1", [(4, "2024-01-01T11:00:00", 7, 2.5)])
    out: list = []
    _run(spark, running_user_stats(_stream(spark, src)), str(tmp_path / "ck"), out)

    last_for_7 = [r for r in out if r.user_id == 7][-1]
    assert last_for_7.n_events == 3
    assert abs(last_for_7.sum_value - 17.5) < 1e-9
    assert last_for_7.last_ts == dt.datetime(2024, 1, 1, 11, 0, 0)
    only_8 = [r for r in out if r.user_id == 8]
    assert only_8[-1].n_events == 1


def test_running_stats_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    _write_batch(src, "b0", [(1, "2024-01-01T10:00:00", 7, 10.0)])
    out: list = []
    _run(spark, running_user_stats(_stream(spark, src)), ckpt, out)
    assert out[-1].n_events == 1

    # new file, NEW query instance, same checkpoint → state restored
    _write_batch(src, "b1", [(2, "2024-01-01T10:30:00", 7, 1.0)])
    out2: list = []
    _run(spark, running_user_stats(_stream(spark, src)), ckpt, out2)
    assert out2[-1].user_id == 7
    assert out2[-1].n_events == 2, "state lost across restart"
    assert abs(out2[-1].sum_value - 11.0) < 1e-9


def test_first_seen_emits_each_key_once(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(src, "b0", [(5, "2024-01-01T10:10:00", 7, 1.0),
                             (2, "2024-01-01T10:00:00", 7, 2.0)])
    _write_batch(src, "b1", [(9, "2024-01-01T12:00:00", 7, 3.0),
                             (1, "2024-01-01T09:00:00", 8, 4.0)])
    out: list = []
    _run(
        spark, streaming_first_seen(_stream(spark, src)), str(tmp_path / "ck"),
        out, mode="append",
    )
    by_user = {r.user_id: r for r in out}
    assert len(out) == 2, f"duplicate emissions: {out}"
    # user 7's earliest event within its first batch wins; the later
    # batch's event (id=9) is suppressed by state
    assert by_user[7].event_id == 2
    assert by_user[8].event_id == 1


def test_dedup_within_watermark_across_batches(spark, tmp_path):
    """The same (user_id, event_id) replayed in a later micro-batch
    within the watermark is suppressed; distinct events all pass."""
    from architrave_project_apache_nifi_spark.streaming.stateful import (
        dedup_within_watermark,
    )

    src = str(tmp_path / "in")
    _write_batch(src, "b0", [
        (10, "2026-01-01T10:00:00", 1, 1.0),
        (20, "2026-01-01T10:01:00", 2, 2.0),
    ])
    _write_batch(src, "b1", [
        (10, "2026-01-01T10:00:00", 1, 1.0),  # replayed duplicate
        (11, "2026-01-01T10:05:00", 1, 3.0),
    ])
    out: list = []
    _run(
        spark,
        dedup_within_watermark(_stream(spark, src), ["user_id", "event_id"]),
        str(tmp_path / "ck"),
        out,
        mode="append",
    )
    got = sorted((r.user_id, r.event_id) for r in out)
    assert got == [(1, 10), (1, 11), (2, 20)]
