"""Property-based tests for the deterministic mixture/shuffle family:
for ARBITRARY rates, budgets, and shard counts, the Spark operators
must equal a straight-line Python recomputation of the same integer
LCG / prefix-sum arithmetic (the oracle SQL repeats that arithmetic,
so these properties are what make the oracles trustworthy)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators import sampling as sp

_LCG_MOD = 2147483647
_LCG_MUL = 1103515245
_LCG_INC = 12345
_LCG_RANGE = 2147483648


def _lcg(i: int) -> int:
    return ((i % _LCG_MOD) * _LCG_MUL + _LCG_INC) % _LCG_RANGE


_SETTINGS = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@_SETTINGS
@given(
    rates=st.lists(
        st.floats(min_value=0.0, max_value=3.0, allow_nan=False, width=32),
        min_size=2,
        max_size=4,
    )
)
def test_replicate_by_rate_matches_reference_arithmetic(spark, rates):
    strata = [f"s{i}" for i in range(len(rates))]
    rows = [(s, i) for i, s in enumerate(strata * 10)]
    df = spark.createDataFrame(rows, "stratum string, id long")
    rdf = spark.createDataFrame(
        list(zip(strata, [float(r) for r in rates])), "stratum string, rate double"
    )
    out = sp.replicate_by_rate(df, rdf, ["stratum"], "id")
    got = sorted(
        (r["id"], r["copy_idx"]) for r in out.select("id", "copy_idx").collect()
    )
    expect = []
    rate_by = dict(zip(strata, [float(r) for r in rates]))
    import math

    for s, i in rows:
        r = rate_by[s]
        n = int(math.floor(r))
        frac = r - math.floor(r)
        if _lcg(i) < math.floor(frac * float(_LCG_RANGE)):
            n += 1
        expect.extend((i, c) for c in range(1, n + 1))
    assert got == sorted(expect)


@_SETTINGS
@given(
    n_rows=st.integers(min_value=1, max_value=60),
    n_shards=st.integers(min_value=1, max_value=16),
)
def test_shuffle_rank_always_the_same_permutation(spark, n_rows, n_shards):
    df = spark.range(0, n_rows).withColumnRenamed("id", "doc_id")
    out = sp.shuffle_rank(df, "doc_id", n_shards=n_shards)
    got = {r["doc_id"]: r["rank"] for r in out.collect()}
    order = sorted(range(n_rows), key=lambda i: (_lcg(i), i))
    expect = {doc: pos for pos, doc in enumerate(order)}
    assert got == expect


@_SETTINGS
@given(
    toks=st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=20),
    budget=st.integers(min_value=0, max_value=300),
)
def test_token_budget_matches_running_sum(spark, toks, budget):
    rows = [("s", i, int(t)) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = sp.token_budget_filter(df, ["source"], "doc_id", F.col("n"), budget)
    got = {
        r["doc_id"]: (r["cum_tokens"], r["in_budget"]) for r in out.collect()
    }
    cum = 0
    for i, t in enumerate(toks):
        cum += t
        assert got[i] == (cum, 1 if cum <= budget else 0)


@_SETTINGS
@given(
    n_rows=st.integers(min_value=1, max_value=60),
    cap=st.integers(min_value=1, max_value=12),
    n_domains=st.integers(min_value=1, max_value=4),
)
def test_domain_cap_reference_and_nested(spark, n_rows, cap, n_domains):
    """domain_cap (r9): per-domain survivors are exactly the cap
    lowest-LCG-priority ids (Python reference), the result is
    identical under a different partitioning (replayable), and
    raising the cap keeps a strict superset (nested — the property
    mixture re-weighs rely on)."""
    rows = [(i, f"d{i % n_domains}") for i in range(n_rows)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def keyfn(i):
        return (_lcg(i), i)

    expect = {}
    for d in range(n_domains):
        ids = sorted((i for i in range(n_rows) if i % n_domains == d), key=keyfn)
        for rank, i in enumerate(ids[:cap], start=1):
            expect[i] = rank

    out = sp.domain_cap(df, ["source"], "doc_id", cap)
    got = {r["doc_id"]: r["cap_rank"] for r in out.collect()}
    assert got == expect

    # partitioning-independence
    got2 = {
        r["doc_id"]: r["cap_rank"]
        for r in sp.domain_cap(
            df.repartition(7, "doc_id"), ["source"], "doc_id", cap
        ).collect()
    }
    assert got2 == expect

    # nested: cap+3 survivors ⊇ cap survivors, ranks unchanged
    wider = {
        r["doc_id"]: r["cap_rank"]
        for r in sp.domain_cap(df, ["source"], "doc_id", cap + 3).collect()
    }
    assert set(expect) <= set(wider)
    assert all(wider[i] == expect[i] for i in expect)


def test_domain_cap_salted_equals_plain(spark):
    """The forced two-phase salted path equals the plain window form
    exactly (topk_per_key's pigeonhole guarantee through domain_cap's
    priority ordering)."""
    rows = [(i, "hot" if i % 5 else f"d{i % 3}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    plain = sorted(
        map(tuple, sp.domain_cap(
            df, ["source"], "doc_id", 7, skew_protection=False
        ).collect())
    )
    salted = sorted(
        map(tuple, sp.domain_cap(
            df, ["source"], "doc_id", 7,
            skew_protection=True, salt_cols=["doc_id"], n_salts=8,
        ).collect())
    )
    assert plain == salted and len(plain) > 0
