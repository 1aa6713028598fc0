"""Streaming CCNet perplexity gate (streaming/ppl_gate.py): frozen
reference-trained artifact, per-batch stream-static scoring, row-level
head+middle/tail routing, idempotent batch-addressed replay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import lm
from architrave_project_apache_nifi_spark.streaming.ppl_gate import (
    fit_ppl_gate,
    gate_batch,
    run_ppl_gate_stream,
    score_batch,
)

REF = [(i, "en", "the cat sat on the mat and the dog sat too") for i in range(4)]
CALIB = [
    (10 + i, "en", "the cat sat on the mat again today friends") for i in range(6)
] + [(20 + i, "en", f"zz{i} qq{i} ww{i} rr{i} ss{i}") for i in range(3)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def model(spark):
    return fit_ppl_gate(
        _df(spark, REF), _df(spark, CALIB), "text", "doc_id", "lang"
    )


def test_score_batch_keeps_every_row_and_buckets(spark, model):
    batch = _df(
        spark,
        [
            (1, "en", "the cat sat on the mat"),  # in-model → low nll
            (2, "en", "xx yy zz aa bb cc"),  # OOV → floor nll (worst)
            (3, "en", "too short"),  # < 3 tokens → tail
            (4, "xx", "the cat sat on the mat"),  # unseen lang → tail
        ],
    )
    out = {r["doc_id"]: r for r in score_batch(
        batch, model, "text", "doc_id", "lang"
    ).collect()}
    assert len(out) == 4
    assert out[1]["ppl_bucket"] == "head"
    assert out[2]["ppl_bucket"] == "tail"
    assert out[3]["nll"] is None and out[3]["ppl_bucket"] == "tail"
    assert out[4]["ppl_bucket"] == "tail"


def test_gate_batch_routes_and_replays_idempotently(spark, model, tmp_path):
    root = str(tmp_path / "gate")
    batch = _df(
        spark,
        [(1, "en", "the cat sat on the mat"), (2, "en", "xx yy zz aa")],
    )
    gate_batch(batch, root, model, "text", "doc_id", "lang", 7)
    acc = spark.read.parquet(os.path.join(root, "accepted", "batch=7"))
    div = spark.read.parquet(os.path.join(root, "diverted", "batch=7"))
    assert [r["doc_id"] for r in acc.collect()] == [1]
    assert [r["doc_id"] for r in div.collect()] == [2]
    # replay the same batch id — overwrite converges, no duplication
    gate_batch(batch, root, model, "text", "doc_id", "lang", 7)
    assert spark.read.parquet(
        os.path.join(root, "accepted", "batch=7")
    ).count() == 1


def test_stream_end_to_end(spark, model, tmp_path):
    landing = str(tmp_path / "landing")
    rows = _df(
        spark,
        [(i, "en", "the cat sat on the mat here") for i in range(5)]
        + [(100 + i, "en", "vv uu tt pp qq mm") for i in range(3)],
    )
    rows.write.parquet(os.path.join(landing, "drop0"))
    stream = spark.readStream.schema(rows.schema).option(
        "recursiveFileLookup", "true"
    ).parquet(landing)
    q = run_ppl_gate_stream(
        stream,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        model,
    )
    q.awaitTermination(120)
    acc = spark.read.option("basePath", str(tmp_path / "out" / "accepted")).parquet(
        str(tmp_path / "out" / "accepted")
    )
    div = spark.read.option("basePath", str(tmp_path / "out" / "diverted")).parquet(
        str(tmp_path / "out" / "diverted")
    )
    assert acc.count() + div.count() == 8
    assert {r["doc_id"] for r in div.collect()} >= {100, 101, 102}


def test_thresholds_are_frozen_not_per_batch(spark, model):
    """The same document must land in the same bucket regardless of
    what else is in its batch — the replay-determinism contract."""
    doc = (1, "en", "the cat sat on the mat")
    alone = score_batch(
        _df(spark, [doc]), model, "text", "doc_id", "lang"
    ).collect()[0]["ppl_bucket"]
    crowded = {
        r["doc_id"]: r["ppl_bucket"]
        for r in score_batch(
            _df(spark, [doc] + [(50 + i, "en", f"aa{i} bb{i} cc{i} dd{i}") for i in range(9)]),
            model,
            "text",
            "doc_id",
            "lang",
        ).collect()
    }
    assert crowded[1] == alone


def test_model_matches_batch_operator_buckets(spark, model):
    """score_batch's bucket for a calibration doc agrees with the
    batch operator's approx bucketer run on the calibration slice
    (same thresholds by construction)."""
    scored = lm.trigram_nll(
        _df(spark, CALIB),
        "text",
        "doc_id",
        _df(spark, REF),
        carry_cols=("lang",),
    )
    batch_buckets = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.ppl_bucket_approx(scored, "nll").collect()
    }
    stream_buckets = {
        r["doc_id"]: r["ppl_bucket"]
        for r in score_batch(
            _df(spark, CALIB), model, "text", "doc_id", "lang"
        ).collect()
    }
    assert stream_buckets == batch_buckets


def test_artifact_save_load_roundtrip(spark, model, tmp_path):
    """A loaded artifact scores every row identically to the in-memory
    one — the deployment contract (fit offline, load in the stream)."""
    from architrave_project_apache_nifi_spark.streaming.ppl_gate import (
        ppl_gate_load,
        ppl_gate_save,
    )

    path = str(tmp_path / "artifact")
    ppl_gate_save(model, path)
    loaded = ppl_gate_load(spark, path)
    batch = _df(
        spark,
        [(1, "en", "the cat sat on the mat"), (2, "en", "xx yy zz aa"),
         (3, "en", "too short"), (4, "xx", "the cat sat on the mat")],
    )
    mem = {
        (r["doc_id"], r["nll"], r["ppl_bucket"])
        for r in score_batch(batch, model, "text", "doc_id", "lang").collect()
    }
    disk = {
        (r["doc_id"], r["nll"], r["ppl_bucket"])
        for r in score_batch(batch, loaded, "text", "doc_id", "lang").collect()
    }
    assert mem == disk
