"""Token-level multinomial Naive-Bayes classifier
(operators/quality.py nb_* — the closed-form fastText-shape rung).

Oracle parity of the composed ``quality_classifier_nb`` entry is
enforced by test_oracles.py (overflow, driver-exact compare); these pin
the semantics directly: python-reference parity of the smoothed
log-odds, the learned sign of junk tokens, the unseen-token default
weight, and the zero-token prior-only path.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.quality import (
    nb_quality_classifier,
    nb_score,
    nb_token_model,
)

ROWS = [
    (1, 1, "good clean prose with many fine words"),
    (2, 1, "more good clean text here today"),
    (3, 1, "fine prose text words here again"),
    (4, 0, "lorem ipsum junk junk filler"),
    (5, 0, "junk filler lorem spam spam"),
]


def _labeled(spark):
    return spark.createDataFrame(ROWS, "doc_id long, weak_label int, text string")


def _py_model(alpha=1.0):
    cnt: dict[str, list[int]] = {}
    n = [0.0, 0.0]
    for _, y, text in ROWS:
        n[y] += 1
        for t in text.lower().split():
            cnt.setdefault(t, [0, 0])[y] += 1
    t0 = float(sum(c[0] for c in cnt.values()))
    t1 = float(sum(c[1] for c in cnt.values()))
    v = float(len(cnt))
    llr = {
        t: math.log((c[1] + alpha) / (t1 + alpha * v))
        - math.log((c[0] + alpha) / (t0 + alpha * v))
        for t, c in cnt.items()
    }
    default = math.log(alpha / (t1 + alpha * v)) - math.log(
        alpha / (t0 + alpha * v)
    )
    prior = math.log(n[1] / n[0])
    return llr, default, prior


def test_log_odds_matches_python_reference(spark):
    labeled = _labeled(spark)
    llr, meta = nb_token_model(labeled, "text", "weak_label")
    out = {
        r["doc_id"]: (r["n_tokens"], r["log_odds"], r["pred_keep"])
        for r in nb_score(labeled, "text", "doc_id", llr, meta).collect()
    }
    pyllr, _, prior = _py_model()
    for doc_id, y, text in ROWS:
        toks = text.lower().split()
        expected = round(prior + sum(pyllr[t] for t in toks), 6)
        n_got, lo_got, pred = out[doc_id]
        assert n_got == len(toks)
        assert lo_got == pytest.approx(expected, abs=2e-6)
        # the weak labels are linearly separable here — NB recovers them
        assert pred == y


def test_junk_tokens_learn_negative_weights(spark):
    llr, _ = nb_token_model(_labeled(spark), "text", "weak_label")
    w = {r["tok"]: r["llr"] for r in llr.collect()}
    assert w["lorem"] < 0 and w["spam"] < 0
    assert w["good"] > 0 and w["prose"] > 0


def test_unseen_token_gets_default_llr(spark):
    labeled = _labeled(spark)
    llr, meta = nb_token_model(labeled, "text", "weak_label")
    target = spark.createDataFrame(
        [(9, "zzz yyy")], "doc_id long, text string"
    )
    _, default, prior = _py_model()
    row = nb_score(target, "text", "doc_id", llr, meta).collect()[0]
    assert row["log_odds"] == pytest.approx(
        round(prior + 2 * default, 6), abs=2e-6
    )


def test_zero_token_doc_scores_bare_prior(spark):
    labeled = _labeled(spark)
    llr, meta = nb_token_model(labeled, "text", "weak_label")
    target = spark.createDataFrame([(9, "   ")], "doc_id long, text string")
    _, _, prior = _py_model()
    row = nb_score(target, "text", "doc_id", llr, meta).collect()[0]
    assert row["n_tokens"] == 0
    assert row["log_odds"] == pytest.approx(round(prior, 6), abs=2e-6)


def test_composed_pipeline_carries_weak_label(spark):
    docs = spark.createDataFrame(
        [(i, y, t) for i, y, t in ROWS], "doc_id long, y int, text string"
    )
    out = nb_quality_classifier(
        docs, "text", "doc_id", F.col("y") == 1
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(out.columns) == {
        "doc_id",
        "weak_label",
        "n_tokens",
        "log_odds",
        "pred_keep",
    }
    for doc_id, y, _ in ROWS:
        assert rows[doc_id]["weak_label"] == y


def test_hashed_features_match_raw_when_collision_free(spark):
    """DSIR's hashed-feature contract, mirrored: with enough buckets
    the hashed model reproduces the raw one's log-odds exactly (the
    weight table just keys on buckets), and junk-token learning
    survives."""
    labeled = _labeled(spark)
    raw_llr, raw_meta = nb_token_model(labeled, "text", "weak_label")
    h_llr, h_meta = nb_token_model(
        labeled, "text", "weak_label", num_buckets=1 << 20
    )
    assert h_llr.count() == raw_llr.count()  # collision-free
    raw = {
        r["doc_id"]: r["log_odds"]
        for r in nb_score(labeled, "text", "doc_id", raw_llr, raw_meta).collect()
    }
    hashed = {
        r["doc_id"]: r["log_odds"]
        for r in nb_score(
            labeled, "text", "doc_id", h_llr, h_meta, num_buckets=1 << 20
        ).collect()
    }
    assert hashed == raw


def test_hashed_features_tiny_buckets_still_finite(spark):
    """Collisions merge counts (the documented trade) but scores stay
    finite and the separable fixture still classifies."""
    labeled = _labeled(spark)
    llr, meta = nb_token_model(labeled, "text", "weak_label", num_buckets=8)
    out = nb_score(
        labeled, "text", "doc_id", llr, meta, num_buckets=8
    ).collect()
    assert all(r["log_odds"] is not None for r in out)
