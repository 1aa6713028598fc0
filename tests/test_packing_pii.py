"""Unit tests for sequence packing (distributed prefix sum) and PII
redaction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.packing import pack_sequences
from architrave_project_apache_nifi_spark.operators.pii import (
    PII_PATTERNS,
    pii_hit_counts,
    redact_pii,
)


def test_pack_sequences_matches_manual_layout(spark):
    # one stream, budget 10: docs of 4,4,4 tokens -> offsets 0,4,8;
    # third doc spans the 10-token boundary
    rows = [(i, "s", " ".join(["w"] * 4)) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, stream string, text string")
    out = {
        r["id"]: r
        for r in pack_sequences(
            df, "id", "stream", F.size(F.split("text", " ")), budget=10, shard_width=2
        ).collect()
    }
    assert (out[0]["seq_id"], out[0]["seq_offset"], out[0]["spans_boundary"]) == (0, 0, False)
    assert (out[1]["seq_id"], out[1]["seq_offset"], out[1]["spans_boundary"]) == (0, 4, False)
    assert (out[2]["seq_id"], out[2]["seq_offset"], out[2]["spans_boundary"]) == (0, 8, True)


def test_pack_sequences_sharded_equals_single_window(spark):
    # 40 docs, 2 streams, random-ish token counts; shard_width 4 forces
    # many shards — result must equal the naive single-window layout
    rows = [(i, f"s{i % 2}", (i * 7) % 13 + 1) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, stream string, tok int")
    got = {
        (r["stream"], r["id"]): (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(
            df, "id", "stream", F.col("tok"), budget=16, shard_width=4
        ).collect()
    }
    # naive reference in Python
    by_stream: dict[str, list[tuple[int, int]]] = {}
    for i, s, t in rows:
        by_stream.setdefault(s, []).append((i, t))
    for s, docs in by_stream.items():
        off = 0
        for i, t in sorted(docs):
            assert got[(s, i)] == (off // 16, off % 16), (s, i)
            off += t


def test_pack_sequences_zero_token_docs_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "s", 0), (2, "s", 5), (3, "s", 0)], "id long, stream string, tok int"
    )
    out = {
        r["id"]: r
        for r in pack_sequences(df, "id", "stream", F.col("tok"), budget=4).collect()
    }
    # zero-token docs occupy no space; doc 2 starts at 0 and spans 4-boundary
    assert (out[1]["seq_id"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["spans_boundary"]) == (0, True)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (1, 1)
    with pytest.raises(ValueError):
        pack_sequences(df, "id", "stream", F.col("tok"), budget=0)


def test_redact_pii_each_category_and_idempotent(spark):
    samples = [
        (1, "mail bob.smith+x@sub.example.co.uk now", "<EMAIL>"),
        (2, "ssn 123-45-6789 ok", "<SSN>"),
        (3, "card 1234 5678 9012 3456 paid", "<CARD>"),
        (4, "host 192.168.001.1 up", "<IP>"),
        (5, "call 555-123-4567 today", "<PHONE>"),
        (6, "plain text with numbers 42 and 2026", None),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "id long, text string"
    )
    once = df.select("id", redact_pii(F.col("text")).alias("r1"))
    twice = once.select("id", redact_pii(F.col("r1")).alias("r2"), "r1")
    rows = {r["id"]: r for r in twice.collect()}
    for i, text, token in samples:
        if token:
            assert token in rows[i]["r1"], (text, rows[i]["r1"])
        else:
            assert rows[i]["r1"] == text
        assert rows[i]["r2"] == rows[i]["r1"]  # idempotent


def test_pii_hit_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io and c@d.org, ssn 123-45-6789")], "id long, text string"
    )
    counts = df.select(
        *[c.alias(n) for n, c in pii_hit_counts(F.col("text")).items()]
    ).collect()[0]
    assert counts["email"] == 2
    assert counts["ssn"] == 1
    assert counts["credit_card"] == 0
    assert len(PII_PATTERNS) == 5
