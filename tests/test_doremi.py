"""DoReMi-style domain reweighting (operators/selection.py
doremi_domain_weights — one closed-form EG round over per-doc LM
scores). Oracle parity of the composed ``mixture_doremi_weights``
entry is enforced by test_oracles.py; these pin the update rule
itself against a python reference.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.selection import (
    doremi_domain_weights,
)

# (doc_id, domain, n_trigrams, nll) — "web" is the lossy domain.
ROWS = [
    (1, "wiki", 100, 2.0),
    (2, "wiki", 100, 2.2),
    (3, "web", 50, 5.0),
    (4, "web", 50, 5.4),
    (5, "books", 200, 1.0),
]


def _py_weights(eta=1.0):
    doms: dict[str, list] = {}
    for _, d, n, nll in ROWS:
        doms.setdefault(d, []).append((n, nll))
    gmean = sum(nll for _, _, _, nll in ROWS) / len(ROWS)
    gtok = float(sum(n for _, _, n, _ in ROWS))
    tilt = {}
    for d, rs in doms.items():
        m = sum(nll for _, nll in rs) / len(rs)
        ex = max(m - gmean, 0.0)
        tilt[d] = (sum(n for n, _ in rs) / gtok) * math.exp(eta * ex), m, ex
    z = sum(t for t, _, _ in tilt.values())
    return {
        d: (round(m, 6), round(ex, 6), round(t / z, 6))
        for d, (t, m, ex) in tilt.items()
    }


def _scored(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, source string, n_trigrams long, nll double"
    )


def test_matches_python_reference(spark):
    out = {
        r["source"]: (r["mean_nll"], r["excess"], r["weight"])
        for r in doremi_domain_weights(_scored(spark), "source").collect()
    }
    exp = _py_weights()
    for d, (m, ex, w) in exp.items():
        assert out[d][0] == pytest.approx(m, abs=2e-6)
        assert out[d][1] == pytest.approx(ex, abs=2e-6)
        assert out[d][2] == pytest.approx(w, abs=2e-6)


def test_weights_sum_to_one(spark):
    rows = doremi_domain_weights(_scored(spark), "source").collect()
    assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-5)


def test_below_average_domains_clip_to_zero_excess(spark):
    out = {
        r["source"]: r for r in doremi_domain_weights(
            _scored(spark), "source"
        ).collect()
    }
    assert out["books"]["excess"] == 0.0
    assert out["wiki"]["excess"] == 0.0
    assert out["web"]["excess"] > 0.0


def test_lossy_domain_tilts_above_its_token_share(spark):
    out = {
        r["source"]: r for r in doremi_domain_weights(
            _scored(spark), "source"
        ).collect()
    }
    gtok = sum(n for _, _, n, _ in ROWS)
    web_share = sum(n for _, d, n, _ in ROWS if d == "web") / gtok
    books_share = sum(n for _, d, n, _ in ROWS if d == "books") / gtok
    assert out["web"]["weight"] > web_share
    assert out["books"]["weight"] < books_share


def test_eta_zero_recovers_token_shares(spark):
    out = {
        r["source"]: r["weight"]
        for r in doremi_domain_weights(_scored(spark), "source", eta=0.0).collect()
    }
    gtok = sum(n for _, _, n, _ in ROWS)
    for d in ("wiki", "web", "books"):
        share = sum(n for _, dd, n, _ in ROWS if dd == d) / gtok
        assert out[d] == pytest.approx(share, abs=2e-6)


def test_weighted_budget_filter_matches_python(spark):
    from architrave_project_apache_nifi_spark.operators.sampling import (
        doremi_token_budgets,
        token_budget_filter_weighted,
    )

    docs = spark.createDataFrame(
        [(i, "web" if i % 2 else "wiki", 10 + i) for i in range(20)],
        "doc_id long, source string, n_trigrams long",
    )
    weights = spark.createDataFrame(
        [("web", 0.75), ("wiki", 0.25)], "source string, weight double"
    )
    budgets = doremi_token_budgets(weights, "source", 200)
    assert {
        r["source"]: r["budget"] for r in budgets.collect()
    } == {"web": 150, "wiki": 50}
    out = token_budget_filter_weighted(
        docs, ["source"], "doc_id", F.col("n_trigrams"), budgets
    ).collect()
    # python reference: cumulative in doc_id order per source
    cums: dict[str, int] = {}
    expected = {}
    for i in range(20):
        src = "web" if i % 2 else "wiki"
        cums[src] = cums.get(src, 0) + 10 + i
        expected[i] = (cums[src], 1 if cums[src] <= (150 if src == "web" else 50) else 0)
    for r in out:
        assert (r["cum_tokens"], r["in_budget"]) == expected[r["doc_id"]], r
    # the cut respects each stratum's OWN bound — some wiki doc must be
    # out while a later web doc is still in
    by = {r["doc_id"]: r["in_budget"] for r in out}
    assert by[4] == 1 and by[6] == 0  # wiki (cum 36 → 52) crosses 50
    assert by[9] == 1  # web still under 150


def test_weighted_budget_filter_keeps_scalar_columns(spark):
    """The weighted variant returns the scalar filter's exact columns
    plus budget — callers filter in_budget identically."""
    from architrave_project_apache_nifi_spark.operators.sampling import (
        token_budget_filter,
        token_budget_filter_weighted,
    )

    docs = spark.createDataFrame(
        [(i, "a", 5) for i in range(6)],
        "doc_id long, source string, n long",
    )
    budgets = spark.createDataFrame([("a", 15)], "source string, budget long")
    w = token_budget_filter_weighted(
        docs, ["source"], "doc_id", F.col("n"), budgets
    )
    s = token_budget_filter(docs, ["source"], "doc_id", F.col("n"), 15)
    assert set(w.columns) == set(s.columns) | {"budget"}
    assert {
        (r["doc_id"], r["cum_tokens"], r["in_budget"]) for r in w.collect()
    } == {(r["doc_id"], r["cum_tokens"], r["in_budget"]) for r in s.collect()}
