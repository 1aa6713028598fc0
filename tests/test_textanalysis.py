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
