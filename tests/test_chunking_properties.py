"""Property-based tests for chunking + unit dedup: for ARBITRARY
documents (including whitespace runs, unicode, empty-ish text) the
operators must satisfy their structural invariants — these are what
make the fixed-corpus oracles trustworthy beyond the test data's
shape."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.chunking import (
    chunk_documents,
    dedup_units,
    derived_units,
    reassemble,
    split_units,
)

_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# words without whitespace; documents join them with single spaces so
# the tokenizer round-trip is exact. Alphabet pinned to printable
# ASCII: the properties compare Spark's (JVM) lower() against
# Python's, and exotic unicode casefolds can differ between the two —
# that would test the JDK, not the operator.
_WORD = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,;:!?-_#@'\"()[]",
    min_size=1,
    max_size=6,
)
_DOC = st.lists(_WORD, min_size=1, max_size=40).map(" ".join)


@_SETTINGS
@given(docs=st.lists(_DOC, min_size=1, max_size=6), size=st.integers(1, 7),
       stride=st.integers(1, 7))
def test_chunk_partition_covers_exactly(spark, docs, size, stride):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    chunks = chunk_documents(df, "doc_id", "text", size=size, stride=stride)
    rows = chunks.collect()
    for i, d in enumerate(docs):
        toks = d.lower().split()
        mine = sorted(
            (r["chunk_id"], r["chunk_text"], r["n_tokens"])
            for r in rows
            if r["doc_id"] == i
        )
        starts = list(range(0, max(len(toks), 1), stride))
        assert len(mine) == len(starts)
        for (cid, ctext, n), start in zip(mine, starts):
            want = toks[start : start + size]
            assert ctext == " ".join(want)
            assert n == len(want)


@_SETTINGS
@given(docs=st.lists(_DOC, min_size=1, max_size=6))
def test_unit_dedup_idempotent(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    units = derived_units(df, "doc_id", "text", unit_tokens=3)
    once = dedup_units(units, "doc_id")
    twice = dedup_units(once, "doc_id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@_SETTINGS
@given(docs=st.lists(st.lists(_WORD, min_size=1, max_size=5), min_size=1, max_size=5))
def test_split_reassemble_identity_on_line_docs(spark, docs):
    texts = ["\n".join(lines) for lines in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    units = split_units(df, "doc_id", "text", r"\n")
    back = {r["doc_id"]: r["text"] for r in reassemble(units, "doc_id", "\n").collect()}
    assert back == dict(enumerate(texts))


@_SETTINGS
@given(docs=st.lists(_DOC, min_size=2, max_size=6))
def test_dedup_output_units_are_globally_unique(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    kept = dedup_units(derived_units(df, "doc_id", "text", 2), "doc_id")
    n = kept.count()
    assert kept.select("unit").distinct().count() == n
