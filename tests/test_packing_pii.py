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


# ---------------------------------------------------------------------------
# Boundary-respecting bin packing (r9): pack_bins
# ---------------------------------------------------------------------------


def _ffd_ref(items, budget):
    """(id, tokens) list -> {id: bin} via first-fit-decreasing."""
    fills, out = [], {}
    for t, i in sorted(((t, i) for i, t in items), key=lambda x: (-x[0], x[1])):
        if t > budget:
            out[i] = -1
            continue
        for b, f in enumerate(fills):
            if f + t <= budget:
                fills[b] = f + t
                out[i] = b
                break
        else:
            fills.append(t)
            out[i] = len(fills) - 1
    return out


def test_pack_bins_matches_reference_and_invariants(spark):
    import random

    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
    )

    rng = random.Random(13)
    rows = [
        (i, rng.choice(["en", "de"]), rng.choice([30, 60, 100, 250, 511, 600]))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    out = pack_bins(
        df, "doc_id", "lang", F.col("n_tok"), budget=512, shard_width=100
    ).collect()
    got = {r["id"]: r for r in out}
    assert len(got) == 400  # nothing lost, oversize included with flag

    # per-(stream, shard) equality with the python FFD reference
    from collections import defaultdict

    groups = defaultdict(list)
    for i, lang, t in rows:
        groups[(lang, i // 100)].append((i, t))
    for (lang, shard), items in groups.items():
        ref = _ffd_ref(items, 512)
        for i, _t in items:
            assert got[i]["bin_local"] == ref[i], (lang, shard, i)

    # invariants: fills never exceed budget; oversize flagged, never binned
    fills = defaultdict(int)
    for r in out:
        if r["n_tokens"] > 512:
            assert r["is_packed"] == 0 and r["bin_local"] == -1
        else:
            assert r["is_packed"] == 1
            fills[(r["stream"], r["shard"], r["bin_local"])] += r["n_tokens"]
    assert fills and all(v <= 512 for v in fills.values())


def test_pack_bins_deterministic_across_partitioning(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
    )

    df = spark.createDataFrame(
        [(i, "s", (i * 37) % 400 + 1) for i in range(300)],
        "doc_id long, lang string, n_tok long",
    )
    a = sorted(
        map(
            tuple,
            pack_bins(df, "doc_id", "lang", F.col("n_tok"), 512, 64).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pack_bins(
                df.repartition(11), "doc_id", "lang", F.col("n_tok"), 512, 64
            ).collect(),
        )
    )
    assert a == b


def test_pack_bins_waste_beats_naive_inorder(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
        packing_waste,
    )

    # adversarial-for-naive mix: big items first-fit poorly in id order
    rows = []
    sizes = [300, 300, 212, 212, 100, 100, 412, 412] * 25
    for i, t in enumerate(sizes):
        rows.append((i, "s", t))
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok long")
    packed = pack_bins(df, "doc_id", "lang", F.col("n_tok"), 512, 10_000)
    waste = packing_waste(packed, 512).collect()[0]
    # naive next-fit in id order: 300|+212? 300+212=512 fits... build it
    fills, cur = [], 0
    for _i, _s, t in rows:
        if cur + t <= 512:
            cur += t
        else:
            fills.append(cur)
            cur = t
    fills.append(cur)
    naive_waste = 1.0 - sum(fills) / (len(fills) * 512)
    assert waste["n_oversize_dropped"] == 0
    assert waste["waste_frac"] <= naive_waste + 1e-12
    assert waste["waste_frac"] < 0.05  # FFD pairs 300+212 and 412+100


def test_pack_bins_null_tokens_routed_not_fatal(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
        packing_waste,
    )

    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", None), (3, "t", None), (4, "t", None)],
        "doc_id long, lang string, n_tok long",
    )
    out = {
        r["id"]: r
        for r in pack_bins(
            df, "doc_id", "lang", F.col("n_tok"), 512, 100
        ).collect()
    }
    assert len(out) == 4
    assert out[1]["is_packed"] == 1
    for i in (2, 3, 4):
        assert out[i]["is_packed"] == 0 and out[i]["bin_local"] == -1
        assert out[i]["n_tokens"] is None


def test_packing_waste_reports_all_dropped_stream(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
        packing_waste,
    )

    # stream "big": every doc oversize -> 0 bins, but the drop count
    # must still appear in the report
    df = spark.createDataFrame(
        [(1, "ok", 100), (2, "ok", 200), (10, "big", 900), (11, "big", 800)],
        "doc_id long, lang string, n_tok long",
    )
    packed = pack_bins(df, "doc_id", "lang", F.col("n_tok"), 512, 100)
    rep = {r["stream"]: r for r in packing_waste(packed, 512).collect()}
    assert rep["big"]["n_bins"] == 0
    assert rep["big"]["n_oversize_dropped"] == 2
    assert rep["big"]["waste_frac"] == 0.0
    assert rep["ok"]["n_bins"] == 1 and rep["ok"]["n_oversize_dropped"] == 0


def test_packing_waste_splits_null_tokens_from_oversize(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
        packing_waste,
    )

    # one oversize doc and two failed-tokenize (NULL) docs share
    # is_packed=0 but must be reported as different causes
    df = spark.createDataFrame(
        [(1, "s", 100), (2, "s", 900), (3, "s", None), (4, "s", None)],
        "doc_id long, lang string, n_tok long",
    )
    packed = pack_bins(df, "doc_id", "lang", F.col("n_tok"), 512, 100)
    rep = packing_waste(packed, 512).collect()[0]
    assert rep["n_oversize_dropped"] == 1
    assert rep["n_null_tokens"] == 2


def test_pack_bins_accepts_non_string_stream(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
    )

    # integer domain id as the stream column: the Arrow output schema
    # pins `stream string`, so pack_bins must coerce, not crash
    df = spark.createDataFrame(
        [(1, 7, 100), (2, 7, 200), (3, 9, 300)],
        "doc_id long, domain int, n_tok long",
    )
    out = pack_bins(df, "doc_id", "domain", F.col("n_tok"), 512, 100).collect()
    assert {r["stream"] for r in out} == {"7", "9"}
    assert all(r["is_packed"] == 1 for r in out)
