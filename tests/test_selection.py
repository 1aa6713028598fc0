"""DSIR importance resampling semantics (operators/selection.py)."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.sampling import (
    _LCG_INC,
    _LCG_MOD,
    _LCG_MUL,
    _LCG_RANGE,
)
from architrave_project_apache_nifi_spark.operators.selection import (
    dsir_logweights,
    dsir_resample,
    gumbel_noise,
)

TARGETY = "the model learns language from curated text"
RAWY = "buy cheap deals now click here free shipping"


def _corpus(spark, texts, langs=None):
    langs = langs or ["x"] * len(texts)
    return spark.createDataFrame(
        [(i, t, lg) for i, (t, lg) in enumerate(zip(texts, langs))],
        "doc_id long, text string, lang string",
    )


def _py_logweights(corpus, target):
    """Pure-python DSIR reference (same smoothing spec)."""
    cw = [(i, w) for i, t in corpus for w in t.lower().split() if w]
    tw = [w for i, t in target for w in t.lower().split() if w]
    n_raw, v = len(cw), len({w for _, w in cw})
    n_tgt = len(tw)
    ct, cr = Counter(tw), Counter(w for _, w in cw)
    out = {}
    for i, _ in corpus:
        ws = [w for j, w in cw if j == i]
        out[i] = sum(
            (math.log(ct.get(w, 0) + 1.0) - math.log(n_tgt + v))
            - (math.log(cr[w] + 1.0) - math.log(n_raw + v))
            for w in ws
        )
    return out


def test_logweights_match_python_reference(spark):
    texts = [TARGETY, RAWY, "the model text", "click free deals", "mixed text deals"]
    corpus = list(enumerate(texts))
    target = [(0, TARGETY), (2, "the model text")]
    cdf = _corpus(spark, texts)
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in dsir_logweights(cdf, tdf, "doc_id", "text").collect()
    }
    ref = _py_logweights(corpus, target)
    for i, t in corpus:
        assert got[i]["n_tokens"] == len(t.split())
        assert abs(got[i]["logweight"] - ref[i]) < 1e-9, i


def test_targety_docs_outweigh_rawy_docs(spark):
    # 10 target-like + 10 raw-like docs; target = the target-like half.
    texts = [TARGETY + f" v{i}" for i in range(10)] + [
        RAWY + f" v{i}" for i in range(10)
    ]
    cdf = _corpus(spark, texts)
    tdf = cdf.filter(F.col("doc_id") < 10).select("doc_id", "text")
    w = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(cdf, tdf, "doc_id", "text").collect()
    }
    assert min(w[i] for i in range(10)) > max(w[i] for i in range(10, 20))


def test_hashed_buckets_equal_raw_when_collision_free(spark):
    # with B >> vocabulary the hashed form IS the raw form (same
    # arithmetic over bijectively-renamed features)
    texts = [TARGETY, RAWY, "the model text", "click free deals"]
    cdf = _corpus(spark, texts)
    tdf = cdf.filter(F.col("doc_id") == 0).select("doc_id", "text")
    raw = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(cdf, tdf, "doc_id", "text").collect()
    }
    hashed = {
        r["doc_id"]: r["logweight"]
        for r in dsir_logweights(
            cdf, tdf, "doc_id", "text", num_buckets=1_000_003
        ).collect()
    }
    # verify no collision actually occurred, then demand equality
    n_vocab = (
        cdf.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .filter("w <> ''")
        .agg(
            F.countDistinct("w"),
            F.countDistinct(F.pmod(F.xxhash64("w"), F.lit(1_000_003))),
        )
        .collect()[0]
    )
    assert n_vocab[0] == n_vocab[1]
    for i in raw:
        assert abs(raw[i] - hashed[i]) < 1e-9


def test_resample_selects_exactly_k_deterministically(spark):
    texts = [f"word{i} filler text" for i in range(50)]
    cdf = _corpus(spark, texts)
    tdf = cdf.filter(F.col("doc_id") < 5).select("doc_id", "text")
    w = dsir_logweights(cdf, tdf, "doc_id", "text")
    out = dsir_resample(w, "doc_id", k=7)
    rows = out.collect()
    assert sum(r["selected"] for r in rows) == 7
    # python replay of the LCG-Gumbel noise + threshold
    scores = {}
    for r in rows:
        h = ((r["doc_id"] % _LCG_MOD) * _LCG_MUL + _LCG_INC) % _LCG_RANGE
        u = (h + 1.0) / (_LCG_RANGE + 1.0)
        scores[r["doc_id"]] = r["logweight"] + (-math.log(-math.log(u)))
        assert abs(scores[r["doc_id"]] - r["gumbel_score"]) < 1e-9
    kth = sorted(scores.values(), reverse=True)[6]
    for r in rows:
        assert r["selected"] == int(scores[r["doc_id"]] >= kth)
    # repartitioning does not change the selection
    again = dsir_resample(
        dsir_logweights(cdf.repartition(7), tdf, "doc_id", "text"),
        "doc_id",
        k=7,
    ).collect()
    assert {r["doc_id"] for r in again if r["selected"]} == {
        r["doc_id"] for r in rows if r["selected"]
    }


def test_gumbel_noise_is_finite_everywhere(spark):
    # u in (0,1) strictly: doc_id values that map to LCG extremes must
    # not produce +-inf
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    rows = df.select(gumbel_noise("doc_id").alias("g")).collect()
    assert all(math.isfinite(r["g"]) for r in rows)


def test_gumbel_noise_finite_for_negative_ids(spark):
    # ADVICE r11: Spark's % is sign-preserving, so a negative doc_id
    # used to yield h < 0, u <= 0 and ln(NULL) — a silently-NULL
    # selected flag. pmod normalization makes every integer id finite.
    df = spark.range(-2000, 2000).select(F.col("id").alias("doc_id"))
    rows = df.select(gumbel_noise("doc_id").alias("g")).collect()
    assert len(rows) == 4000
    assert all(r["g"] is not None and math.isfinite(r["g"]) for r in rows)


def test_resample_truncates_lineage_before_threshold(spark):
    # VERDICT r11 #5: the returned DataFrame must scan the
    # localCheckpoint-ed RDD, not replay the corpus explode + joins +
    # agg lineage on every downstream action.
    texts = [f"word{i} some shared filler" for i in range(40)]
    cdf = _corpus(spark, texts)
    tdf = cdf.filter(F.col("doc_id") < 4).select("doc_id", "text")
    out = dsir_resample(dsir_logweights(cdf, tdf, "doc_id", "text"), "doc_id", k=5)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in optimized  # no explode in the consumed plan
    assert "Join" not in optimized
    assert ("LogicalRDD" in optimized) or ("ExistingRDD" in optimized)
    # still selects exactly k and both consumptions agree
    a = {r["doc_id"] for r in out.collect() if r["selected"]}
    b = {r["doc_id"] for r in out.collect() if r["selected"]}
    assert a == b and len(a) == 5
