from __future__ import annotations

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.decontaminate import (
    ngram_decontaminate,
)
from architrave_project_apache_nifi_spark.operators.sampling import (
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_exact_ngram_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta", "en")])
    corpus = _docs(
        spark,
        [
            (1, "zzz alpha beta gamma qqq", "en"),  # shares trigram
            (2, "alpha gamma beta zzz qqq", "en"),  # same words, no trigram
            (3, "totally different words here", "en"),
        ],
    )
    rows = {
        r["doc_id"]: r
        for r in ngram_decontaminate(corpus, bench, "doc_id", "text", 3).collect()
    }
    assert rows[1]["is_contaminated"] == 1 and rows[1]["n_contaminated"] == 1
    assert rows[2]["is_contaminated"] == 0
    assert rows[3]["is_contaminated"] == 0
    assert rows[1]["n_ngrams"] == 3  # 5 words -> 3 trigrams


def test_decontaminate_short_doc_whole_text_gram(spark):
    # Docs shorter than n collapse to a single whole-text gram (the
    # dedup shingle convention) and still match verbatim copies.
    bench = _docs(spark, [(100, "ab cd", "en")])
    corpus = _docs(spark, [(1, "ab cd", "en"), (2, "ab ce", "en")])
    rows = {
        r["doc_id"]: r["is_contaminated"]
        for r in ngram_decontaminate(corpus, bench, "doc_id", "text", 13).collect()
    }
    assert rows == {1: 1, 2: 0}


def test_stratified_sample_deterministic_and_nested(spark):
    docs = _docs(
        spark,
        [(i, f"doc {i}", "en" if i % 2 == 0 else "de") for i in range(400)],
    )
    rates_hi = spark.createDataFrame(
        [("en", 0.5), ("de", 0.25)], "lang string, rate double"
    )
    rates_lo = spark.createDataFrame(
        [("en", 0.25), ("de", 0.125)], "lang string, rate double"
    )
    s1 = {r["doc_id"] for r in stratified_sample(docs, rates_hi, ["lang"], "doc_id").collect()}
    s2 = {r["doc_id"] for r in stratified_sample(docs, rates_hi, ["lang"], "doc_id").collect()}
    assert s1 == s2  # replayable
    lo = {r["doc_id"] for r in stratified_sample(docs, rates_lo, ["lang"], "doc_id").collect()}
    assert lo <= s1  # halved rates select a nested subset
    # Rates land near target per stratum (LCG uniformity, 200/stratum).
    en = sum(1 for i in s1 if i % 2 == 0) / 200
    de = sum(1 for i in s1 if i % 2 == 1) / 200
    assert 0.35 < en < 0.65 and 0.13 < de < 0.38


def test_stratified_sample_default_rate_zero_drops_unknown_strata(spark):
    docs = _docs(spark, [(i, "x", "zh") for i in range(50)])
    rates = spark.createDataFrame([("en", 1.0)], "lang string, rate double")
    assert stratified_sample(docs, rates, ["lang"], "doc_id").count() == 0
    kept = stratified_sample(
        docs, rates, ["lang"], "doc_id", default_rate=1.0
    ).count()
    assert kept == 50


def test_temperature_rates_flatten_mixture(spark):
    """α-sampling rates: rarest stratum keeps rate 1.0, rates decrease
    with stratum size (α<1 flattens), and α=1 keeps everything."""
    from architrave_project_apache_nifi_spark.operators import sampling as sp

    df = spark.createDataFrame(
        [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
         for i in range(1000)],
        "doc_id LONG, lang STRING",
    )
    rates = {
        r.lang: (r.n_rows, r.rate)
        for r in sp.temperature_rates(df, ["lang"], alpha=0.5).collect()
    }
    assert rates["small"][1] == 1.0  # rarest stratum keeps everything
    assert rates["small"][1] > rates["mid"][1] > rates["big"][1]
    # rate ratio follows (n_small/n_big)^(1-alpha) = sqrt(10/900)
    import math

    assert abs(rates["big"][1] - math.sqrt(10 / 900)) < 1e-12
    flat = {r.lang: r.rate for r in sp.temperature_rates(df, ["lang"], alpha=1.0).collect()}
    assert set(flat.values()) == {1.0}


def test_semantic_decontaminate_flags_paraphrase_neighbors(spark):
    import numpy as np

    from architrave_project_apache_nifi_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    rng = np.random.default_rng(31)
    bench_vecs = rng.normal(size=(5, 16))
    rows_bench = [([float(x) for x in v],) for v in bench_vecs]
    corpus = []
    # ids 0-4: tiny perturbations of bench items (paraphrases);
    # ids 100+: independent random vectors
    for i in range(5):
        corpus.append((i, [float(x) for x in bench_vecs[i] + 0.01 * rng.normal(size=16)]))
    for i in range(100, 140):
        corpus.append((i, [float(x) for x in rng.normal(size=16)]))
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    bdf = spark.createDataFrame(rows_bench, "embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            cdf, bdf, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    assert len(out) == 45
    for i in range(5):
        assert out[i]["is_contaminated"] == 1, out[i]
        assert out[i]["max_cosine"] > 0.99
    # random 16-dim vectors essentially never reach cosine 0.9
    assert all(out[i]["is_contaminated"] == 0 for i in range(100, 140))

    # max_cosine agrees with numpy to the rounding grid
    B = bench_vecs / np.linalg.norm(bench_vecs, axis=1, keepdims=True)
    for i, vec in corpus[:10]:
        v = np.asarray(vec)
        ref = float((v / np.linalg.norm(v) @ B.T).max())
        assert abs(out[i]["max_cosine"] - round(ref, 4)) <= 1e-4


def test_semantic_decontaminate_zero_vector_scores_zero(spark):
    from architrave_project_apache_nifi_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    cdf = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bdf = spark.createDataFrame(
        [([1.0, 0.0, 0.0],)], "embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            cdf, bdf, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    # zero-norm padding row: cosine 0.0 and a REAL flag, never NULL —
    # a NULL would drop the doc from both routes of an == 0/1 filter
    assert out[1]["max_cosine"] == 0.0
    assert out[1]["is_contaminated"] == 0
    assert out[2]["max_cosine"] == 1.0 and out[2]["is_contaminated"] == 1


def test_semantic_decontaminate_null_embedding_scores_zero(spark):
    # a failed encoder can emit NULL as easily as a zero vector; the
    # doc must still appear with a definite 0 flag, not vanish or NULL
    from architrave_project_apache_nifi_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    cdf = spark.createDataFrame(
        [(1, None), (2, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    bdf = spark.createDataFrame(
        [([1.0, 0.0, 0.0],)], "embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(
            cdf, bdf, "vec_id", "embedding", threshold=0.5
        ).collect()
    }
    assert len(out) == 2, "NULL-embedding doc dropped from the output"
    assert out[1]["max_cosine"] == 0.0 and out[1]["is_contaminated"] == 0
    assert out[2]["is_contaminated"] == 1


def test_semantic_decontaminate_empty_bench_raises(spark):
    # an empty benchmark would make the crossJoin drop EVERY corpus doc
    # silently — fail loudly instead (mirrors pq_topk's empty guard)
    import pytest

    from architrave_project_apache_nifi_spark.operators.decontaminate import (
        semantic_decontaminate,
    )

    cdf = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    bdf = spark.createDataFrame([], "embedding array<double>")
    with pytest.raises(ValueError, match="empty benchmark"):
        semantic_decontaminate(cdf, bdf, "vec_id", "embedding")
