from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.chunking import (
    chunk_documents,
    dedup_paragraphs,
    dedup_units,
    derived_units,
    reassemble,
    split_units,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_boundaries_and_overlap(spark):
    df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    out = chunk_documents(df, "doc_id", "text", size=4, stride=3).collect()
    chunks = {r["chunk_id"]: (r["chunk_text"], r["n_tokens"]) for r in out}
    # starts at 0,3,6,9 — last chunk is the 1-token tail
    assert chunks[0] == ("t0 t1 t2 t3", 4)
    assert chunks[1] == ("t3 t4 t5 t6", 4)
    assert chunks[2] == ("t6 t7 t8 t9", 4)
    assert chunks[3] == ("t9", 1)
    assert len(chunks) == 4


def test_chunk_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "a b")])
    out = chunk_documents(df, "doc_id", "text", size=16, stride=8).collect()
    assert len(out) == 1 and out[0]["chunk_text"] == "a b"


def test_chunk_rejects_bad_params(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", stride=0)


def test_chunk_coverage_no_token_lost(spark):
    """stride == size partitions the token stream exactly."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    chunks = chunk_documents(docs, "doc_id", "text", size=10, stride=10)
    n_chunk_tokens = chunks.agg(F.sum("n_tokens")).collect()[0][0]
    n_doc_tokens = docs.select(
        F.size(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != F.lit("")
            )
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert n_chunk_tokens == n_doc_tokens


def test_chunk_empty_doc_yields_zero_chunks(spark):
    """Empty / whitespace-only / NULL text must not produce a phantom
    1-token chunk (split('') yields ['']) — zero chunks, consistent
    with bpe_token_count reporting 0 tokens."""
    df = _docs(spark, [(1, ""), (2, "   "), (3, None), (4, "real text")])
    out = chunk_documents(df, "doc_id", "text", size=16, stride=8).collect()
    assert [r["doc_id"] for r in out] == [4]
    assert out[0]["n_tokens"] == 2


def test_split_reassemble_round_trip(spark):
    df = _docs(spark, [(1, "alpha\nbeta\ngamma"), (2, "solo")])
    units = split_units(df, "doc_id", "text", r"\n")
    back = {r["doc_id"]: r["text"] for r in reassemble(units, "doc_id", "\n").collect()}
    assert back == {1: "alpha\nbeta\ngamma", 2: "solo"}


def test_dedup_units_keeps_global_first_occurrence(spark):
    df = _docs(
        spark,
        [
            (1, "dup\nunique1\ndup"),  # intra-doc repeat
            (2, "dup\nunique2"),  # cross-doc repeat
        ],
    )
    out = dedup_paragraphs(df, "doc_id", "text", r"\n", "\n").collect()
    texts = {r["doc_id"]: r["text"] for r in out}
    assert texts[1] == "dup\nunique1"  # second 'dup' dropped
    assert texts[2] == "unique2"  # doc 2 lost its 'dup' to doc 1


def test_dedup_units_drops_empty_docs(spark):
    df = _docs(spark, [(1, "x"), (2, "x")])
    out = dedup_paragraphs(df, "doc_id", "text", r"\n", "\n")
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_derived_units_cover_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    units = derived_units(docs, "doc_id", "text", unit_tokens=10)
    kept = dedup_units(units, "doc_id")
    # keep-first can only drop, never invent
    assert kept.count() <= units.count()
    # every surviving (doc,pos) existed in the input
    assert kept.join(units, ["doc_id", "pos", "unit"], "left_anti").count() == 0


def test_chunking_plan_has_no_exchange(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = chunk_documents(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side generator only
