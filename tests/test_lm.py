"""Reference-trained trigram LM + CCNet perplexity buckets
(operators/lm.py, Wenzek et al. 2019).

The oracle parity of the composed ``text_ppl_ccnet`` entry is enforced
by test_oracles.py (overflow, driver-exact compare at sf0.001); these
tests pin the semantics the SQL compare can't see — python-reference
parity of the smoothed probability, OOV behavior, the exact/approx
bucketing contract, and determinism of the tie-break.
"""

from __future__ import annotations

import math

import pytest

from architrave_project_apache_nifi_spark.operators import lm


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


REF_ROWS = [
    (0, "en", "the cat sat on the mat"),
    (5, "en", "the cat ate the fish"),
    (10, "en", "a dog sat on a log"),
]


def _py_counts():
    uni: dict[str, int] = {}
    bi: dict[tuple, int] = {}
    tri: dict[tuple, int] = {}
    for _, _, text in REF_ROWS:
        toks = text.lower().split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            tri[(a, b, c)] = tri.get((a, b, c), 0) + 1
    return uni, bi, tri


def _py_nll(text: str) -> tuple[int, float]:
    uni, bi, tri = _py_counts()
    t = float(sum(uni.values()))
    v = float(len(uni))
    l3, l2, l1, l0 = lm.LM_LAMBDAS
    toks = text.lower().split()
    logs = []
    for a, b, c in zip(toks, toks[1:], toks[2:]):
        p = l0 / (v + 1)
        if (a, b, c) in tri:
            p += l3 * tri[(a, b, c)] / bi[(a, b)]
        if (b, c) in bi:
            p += l2 * bi[(b, c)] / uni[b]
        if c in uni:
            p += l1 * uni[c] / t
        logs.append(-math.log(p))
    return len(logs), round(sum(logs) / len(logs), 6)


def test_lambdas_sum_to_one():
    assert abs(sum(lm.LM_LAMBDAS) - 1.0) < 1e-12


def test_trigram_nll_matches_python_reference(spark):
    ref = _mk_docs(spark, REF_ROWS)
    targets = [
        (1, "en", "the cat sat on the mat"),  # fully in-model
        (2, "en", "the cat sat on a log"),  # mixed seen/backoff
        (3, "en", "zz qq ww rr"),  # fully OOV — floor only
    ]
    out = {
        r["doc_id"]: (r["n_trigrams"], r["nll"])
        for r in lm.trigram_nll(
            _mk_docs(spark, targets), "text", "doc_id", ref
        ).collect()
    }
    for doc_id, _, text in targets:
        n_exp, nll_exp = _py_nll(text)
        n_got, nll_got = out[doc_id]
        assert n_got == n_exp
        assert nll_got == pytest.approx(nll_exp, abs=2e-6), text


def test_oov_doc_scores_exactly_the_floor(spark):
    """A fully out-of-vocabulary document's every position gets only
    the uniform floor l0/(V+1) — finite, positive, and the worst
    (highest) NLL any document can receive."""
    ref = _mk_docs(spark, REF_ROWS)
    uni, _, _ = _py_counts()
    floor_nll = round(-math.log(lm.LM_LAMBDAS[3] / (len(uni) + 1)), 6)
    row = (
        lm.trigram_nll(
            _mk_docs(spark, [(9, "en", "zz qq ww")]), "text", "doc_id", ref
        )
        .collect()[0]
    )
    assert row["nll"] == pytest.approx(floor_nll, abs=2e-6)


def test_short_docs_have_no_trigram_rows(spark):
    ref = _mk_docs(spark, REF_ROWS)
    out = lm.trigram_nll(
        _mk_docs(spark, [(1, "en", "two tokens"), (2, "en", "a b c")]),
        "text",
        "doc_id",
        ref,
    ).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_exact_buckets_are_per_lang_terciles(spark):
    rows = [(i, "en", float(i)) for i in range(9)] + [
        (100 + i, "de", float(i)) for i in range(3)
    ]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    out = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.ppl_bucket_exact(scored, "nll", "doc_id").collect()
    }
    assert [out[i] for i in range(9)] == (
        ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    )
    assert [out[100 + i] for i in range(3)] == ["head", "middle", "tail"]


def test_approx_buckets_match_exact_on_separated_values(spark):
    """With values far apart relative to the sketch's rank error the
    approx thresholds reproduce the exact terciles — the documented
    production trade is boundary-rows-only."""
    rows = [(i, "en", float(i) * 10.0) for i in range(30)]
    scored = spark.createDataFrame(rows, "doc_id long, lang string, nll double")
    exact = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.ppl_bucket_exact(scored, "nll", "doc_id").collect()
    }
    approx = {
        r["doc_id"]: r["ppl_bucket"]
        for r in lm.ppl_bucket_approx(scored, "nll").collect()
    }
    assert exact == approx


def test_ccnet_composition_carries_lang_and_buckets(spark):
    ref = _mk_docs(spark, REF_ROWS)
    docs = _mk_docs(
        spark,
        [(i, "en", f"the cat sat on mat {i} extra words here") for i in range(6)]
        + [(50, "de", "der hund sitzt auf dem baum heute")],
    )
    out = lm.ccnet_ppl_buckets(docs, "text", "doc_id", "lang", ref)
    assert set(out.columns) == {
        "doc_id",
        "lang",
        "n_trigrams",
        "nll",
        "ppl_bucket",
    }
    rows = out.collect()
    assert {r["ppl_bucket"] for r in rows} <= set(lm.PPL_BUCKETS)
    # the lone de doc is its own tercile boundary case: ntile(3) of 1
    # row = bucket 1 = head
    de = [r for r in rows if r["lang"] == "de"]
    assert len(de) == 1 and de[0]["ppl_bucket"] == "head"


def test_max_vocab_cap_recovers_uncapped_when_large(spark):
    ref = _mk_docs(spark, REF_ROWS)
    targets = _mk_docs(spark, [(1, "en", "the cat sat on a log today")])
    full = lm.trigram_nll_with(
        targets, "text", "doc_id", lm.lm_counts(ref, "text")
    ).collect()[0]["nll"]
    capped = lm.trigram_nll_with(
        targets, "text", "doc_id", lm.lm_counts(ref, "text", max_vocab=10_000)
    ).collect()[0]["nll"]
    assert capped == full


def test_max_vocab_cap_degrades_to_lower_orders_not_errors(spark):
    """Dropped grams fall through the interpolation exactly like
    unseen grams: with a tiny cap every doc still scores finite, and
    the capped NLL can only be >= the full model's (less probability
    mass resolved at higher orders)."""
    ref = _mk_docs(spark, REF_ROWS)
    targets = _mk_docs(
        spark,
        [(1, "en", "the cat sat on the mat"), (2, "en", "a dog sat on a log")],
    )
    counts = lm.lm_counts(ref, "text", max_vocab=3)
    uni, bi, tri, _ = counts
    assert uni.count() == 3 and bi.count() == 3 and tri.count() == 3
    full = {
        r["doc_id"]: r["nll"]
        for r in lm.trigram_nll_with(
            targets, "text", "doc_id", lm.lm_counts(ref, "text")
        ).collect()
    }
    capped = {
        r["doc_id"]: r["nll"]
        for r in lm.trigram_nll_with(
            targets, "text", "doc_id", counts
        ).collect()
    }
    for d in full:
        assert capped[d] is not None and capped[d] >= full[d]


def _py_kn_nll(text: str, d=0.75, eps=0.05) -> tuple[int, float]:
    uni, bi, tri = _py_counts()
    v = float(len(uni))
    nbig = float(len(bi))
    ncont: dict[str, int] = {}
    n1p_b: dict[str, int] = {}
    for (a, b) in bi:
        ncont[b] = ncont.get(b, 0) + 1
        n1p_b[a] = n1p_b.get(a, 0) + 1
    n1p_ab: dict[tuple, int] = {}
    for (a, b, c) in tri:
        n1p_ab[(a, b)] = n1p_ab.get((a, b), 0) + 1
    toks = text.lower().split()
    logs = []
    for a, b, c in zip(toks, toks[1:], toks[2:]):
        p1 = ncont.get(c, 0) / nbig
        if b in uni:
            c1b = uni[b]
            p2 = (
                max(bi.get((b, c), 0) - d, 0.0) / c1b
                + d * n1p_b.get(b, 0) / c1b * p1
            )
        else:
            p2 = p1
        if (a, b) in bi:
            c2ab = bi[(a, b)]
            p3 = (
                max(tri.get((a, b, c), 0) - d, 0.0) / c2ab
                + d * n1p_ab.get((a, b), 0) / c2ab * p2
            )
        else:
            p3 = p2
        p = (1 - eps) * p3 + eps / (v + 1)
        logs.append(-math.log(p))
    return len(logs), round(sum(logs) / len(logs), 6)


def test_kn_trigram_nll_matches_python_reference(spark):
    ref = _mk_docs(spark, REF_ROWS)
    targets = [
        (1, "en", "the cat sat on the mat"),  # fully in-model
        (2, "en", "the cat sat on a log"),  # mixed / backoff
        (3, "en", "fish the cat sat"),  # unseen context (a,b) backoff
        (4, "en", "zz qq ww rr"),  # fully OOV — escape floor only
    ]
    out = {
        r["doc_id"]: (r["n_trigrams"], r["nll"])
        for r in lm.kn_trigram_nll(
            _mk_docs(spark, targets), "text", "doc_id", ref
        ).collect()
    }
    for doc_id, _, text in targets:
        n_exp, nll_exp = _py_kn_nll(text)
        n_got, nll_got = out[doc_id]
        assert n_got == n_exp
        assert nll_got == pytest.approx(nll_exp, abs=2e-6), text


def test_kn_probabilities_sum_to_at_most_one_per_context(spark):
    """Smoothing sanity: for a seen context (a,b), summing the KN
    P(c|a,b) over the full reference vocabulary stays <= 1 (the
    discount redistributes, never inflates; the escape adds eps·V/(V+1)
    of extra mass bounded by eps)."""
    uni, bi, tri = _py_counts()
    d, eps = 0.75, 0.05
    v = float(len(uni))
    nbig = float(len(bi))
    ncont: dict[str, int] = {}
    n1p_b: dict[str, int] = {}
    for (a, b) in bi:
        ncont[b] = ncont.get(b, 0) + 1
        n1p_b[a] = n1p_b.get(a, 0) + 1
    n1p_ab: dict[tuple, int] = {}
    for k in tri:
        n1p_ab[(k[0], k[1])] = n1p_ab.get((k[0], k[1]), 0) + 1
    a, b = "the", "cat"  # seen context
    total = 0.0
    for c in uni:
        p1 = ncont.get(c, 0) / nbig
        c1b = uni[b]
        p2 = max(bi.get((b, c), 0) - d, 0.0) / c1b + d * n1p_b[b] / c1b * p1
        c2ab = bi[(a, b)]
        p3 = max(tri.get((a, b, c), 0) - d, 0.0) / c2ab + d * n1p_ab[(a, b)] / c2ab * p2
        total += (1 - eps) * p3 + eps / (v + 1)
    assert total <= 1.0 + 1e-9


def test_kn_oov_doc_scores_exactly_the_escape_floor(spark):
    """A fully out-of-vocabulary document backs off through every
    level to P1=0 and lands exactly on the eps/(V+1) escape — the KN
    twin of the JM floor test."""
    ref = _mk_docs(spark, REF_ROWS)
    uni, _, _ = _py_counts()
    floor_nll = round(-math.log(lm.KN_EPSILON / (len(uni) + 1)), 6)
    row = lm.kn_trigram_nll(
        _mk_docs(spark, [(9, "en", "zz qq ww")]), "text", "doc_id", ref
    ).collect()[0]
    assert row["nll"] == pytest.approx(floor_nll, abs=2e-6)
