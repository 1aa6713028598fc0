from __future__ import annotations

from architrave_project_apache_nifi_spark.operators.textanalysis import (
    quality_features,
)


def test_repetition_signals(spark):
    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),  # one token repeated
            (2, "alpha beta gamma delta epsilon"),  # all distinct
            (3, "ping pong ping pong ping pong"),  # repeated bigrams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in quality_features(docs, "text", "doc_id").collect()
    }
    assert rows[1]["top_token_ratio"] == 1.0
    assert rows[1]["dup_bigram_ratio"] == 0.75  # 4 bigrams, 1 distinct
    assert rows[2]["dup_bigram_ratio"] == 0.0
    assert rows[2]["top_token_ratio"] == 0.2
    # "ping pong" x3: 5 bigrams, 2 distinct -> 0.6 dup ratio
    assert rows[3]["dup_bigram_ratio"] == 0.6
    assert rows[3]["top_token_ratio"] == 0.5


def test_top_token_fold_equals_naive_count(spark):
    """The sorted-run fold behind top_token_ratio must equal the naive
    most-common-token count for arbitrary docs (incl. empty / single /
    all-same / ties)."""
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.dedup import tokens

    docs = spark.createDataFrame(
        [
            (1, "a a a b b c"),
            (2, "x"),
            (3, "t t t t t t t t"),
            (4, "one two three four five six seven"),
            (5, "tie tie breaker breaker"),
            (6, "  leading  and   trailing   "),
        ],
        "doc_id long, text string",
    )
    t = tokens(F.col("text"))
    naive = F.array_max(
        F.transform(
            F.array_distinct(t), lambda d: F.size(F.filter(t, lambda x: x == d))
        )
    )
    q = quality_features(docs, "text", "doc_id").select(
        "doc_id", (F.col("top_token_ratio") * F.col("n_tokens")).alias("fold_count")
    )
    expected = {r["doc_id"]: r["naive"] for r in docs.select("doc_id", naive.alias("naive")).collect()}
    for r in q.collect():
        assert round(r["fold_count"]) == expected[r["doc_id"]], r


def test_subword_token_count_bpe_ish(spark):
    from pyspark.sql import functions as F

    from architrave_project_apache_nifi_spark.operators.textanalysis import (
        subword_token_count,
        token_count,
    )

    df = spark.createDataFrame(
        [
            (1, "hello world"),  # 2 words -> 2 subwords
            (2, "price: $12.50!"),  # price : $ 1 2 . 5 0 ! -> 9
            (3, ""),  # empty
            (4, "a-b"),  # a - b -> 3
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: (r["w"], r["s"])
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("w"),
            subword_token_count(F.col("text")).alias("s"),
        ).collect()
    }
    assert rows[1] == (2, 2)
    assert rows[2] == (2, 9)
    assert rows[3] == (0, 0)
    assert rows[4] == (1, 3)
