from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.sequences import (
    event_ngrams,
    ngram_counts,
    transition_matrix,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, t long, e string")


def test_ngrams_respect_order_and_boundaries(spark):
    df = _events(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"), (2, 1, "x"), (2, 2, "y")],
    )
    grams = event_ngrams(df, "u", ["t"], "e", n=3)
    got = sorted(r["gram"] for r in grams.collect())
    # user 1: a>b>c, b>c>d; user 2 has only 2 events → no trigram
    assert got == ["a>b>c", "b>c>d"]
    # bigrams cross no user boundary either
    bi = sorted(r["gram"] for r in event_ngrams(df, "u", ["t"], "e", n=2).collect())
    assert bi == ["a>b", "b>c", "c>d", "x>y"]


def test_ngram_counts_aggregate(spark):
    df = _events(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (2, 1, "a"), (2, 2, "b"), (3, 1, "a"), (3, 2, "c")],
    )
    out = {r["gram"]: (r["occurrences"], r["n_entities"])
           for r in ngram_counts(df, "u", ["t"], "e", n=2).collect()}
    assert out["a>b"] == (2, 2)
    assert out["a>c"] == (1, 1)


def test_transition_matrix_probabilities_sum_to_one(spark):
    df = _events(
        spark,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "c"), (2, 1, "a"), (2, 2, "b")],
    )
    tm = transition_matrix(df, "u", ["t"], "e")
    rows = tm.collect()
    # from 'a': b (2×), c (1×) → P = 2/3, 1/3
    p = {(r["from_state"], r["to_state"]): r["p"] for r in rows}
    assert abs(p[("a", "b")] - 2 / 3) < 1e-12
    assert abs(p[("a", "c")] - 1 / 3) < 1e-12
    sums = tm.groupBy("from_state").agg(F.sum("p").alias("s")).collect()
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-12


def test_ngram_rejects_n1(spark):
    df = _events(spark, [(1, 1, "a")])
    with pytest.raises(ValueError):
        event_ngrams(df, "u", ["t"], "e", n=1)
