from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from architrave_project_apache_nifi_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_token_count,
    bpe_train,
    word_freqs,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def toy(spark):
    # the classic BPE walkthrough vocabulary (Sennrich et al. 2016):
    # low×5, lower×2, newest×6, widest×3
    texts = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return _corpus(spark, [" ".join(texts)])


def test_word_freqs_matches_counter(spark):
    texts = ["the cat sat", "the cat", "sat sat SAT"]
    df = _corpus(spark, texts)
    got = {r["word"]: r["freq"] for r in word_freqs(df, "text").collect()}
    want = Counter(w for t in texts for w in t.lower().split())
    assert got == dict(want)


def test_train_reproduces_classic_merges(spark, toy):
    wf = word_freqs(toy, "text")
    merges = bpe_train(wf, n_merges=5)
    # e+s appears 9× (newest 6 + widest 3) — the classic first merge,
    # then es+t (9), then est+</w> (9)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)


def test_train_is_deterministic(spark, toy):
    wf = word_freqs(toy, "text")
    assert bpe_train(wf, n_merges=8) == bpe_train(wf, n_merges=8)


def test_encode_applies_merges(spark, toy):
    wf = word_freqs(toy, "text")
    merges = bpe_train(wf, n_merges=3)
    df = _corpus(spark, ["newest"])
    out = bpe_encode(df, "text", merges).collect()[0]["bpe_tokens"]
    assert out == ["n", "e", "w", f"est{END}"]


def test_encode_round_trips_text(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    wf = word_freqs(docs, "text")
    merges = bpe_train(wf, n_merges=50)
    enc = bpe_encode(docs, "text", merges)
    # concatenating subwords and restoring word boundaries at </w>
    # must reproduce the lowercased token stream exactly
    check = enc.select(
        F.col("text"),
        F.array_join(F.col("bpe_tokens"), "").alias("glued"),
    ).collect()
    for r in check:
        want = "".join(w + END for w in r["text"].lower().split())
        assert r["glued"] == want


def test_more_merges_never_increase_count(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(30)
    wf = word_freqs(docs, "text")
    m10 = bpe_train(wf, n_merges=10)
    m50 = bpe_train(wf, n_merges=50)
    c10 = bpe_token_count(docs, "text", m10).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    c50 = bpe_token_count(docs, "text", m50).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    c0 = bpe_token_count(docs, "text", []).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert c50 <= c10 <= c0
    # zero merges = chars + one end marker per word
    want0 = docs.select(
        F.aggregate(
            F.split(F.lower(F.trim("text")), r"\s+"),
            F.lit(0),
            lambda acc, w: acc + F.length(w) + 1,
        ).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert c0 == want0


def test_merge_prefix_stability(spark, toy):
    """BPE merges are greedy: the first k merges do not depend on
    n_merges — training longer only appends."""
    wf = word_freqs(toy, "text")
    short = bpe_train(wf, n_merges=3)
    long = bpe_train(wf, n_merges=8)
    assert long[:3] == short


def test_save_load_round_trip(spark, toy, tmp_path):
    from architrave_project_apache_nifi_spark.operators.bpe import (
        bpe_load,
        bpe_save,
    )

    wf = word_freqs(toy, "text")
    merges = bpe_train(wf, n_merges=20)
    p = str(tmp_path / "vocab.json")
    bpe_save(merges, p)
    loaded = bpe_load(p)
    assert loaded == merges
    a = bpe_encode(_corpus(spark, ["lowest newest"]), "text", merges).collect()
    b = bpe_encode(_corpus(spark, ["lowest newest"]), "text", loaded).collect()
    assert a[0]["bpe_tokens"] == b[0]["bpe_tokens"]


def _bpe_count_py(text, merges):
    """Pure-python reference counter (mirrors bpe._encode_word)."""
    from architrave_project_apache_nifi_spark.operators.bpe import (
        _encode_word,
    )

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    return sum(len(_encode_word(w, ranks)) for w in str(text).lower().split())


def test_token_budget_costed_by_bpe_matches_python_reference(spark):
    """The VERDICT r10 #8 seam: token_budget_filter keyed to ACTUAL
    BPE counts — in_budget/cum_tokens must equal the pure-python
    replay (encode each doc, cumulative-sum in id order per source)."""
    from architrave_project_apache_nifi_spark.operators.sampling import (
        token_budget_filter,
    )

    texts = [
        "low lower newest",          # merge-friendly -> few tokens
        "xqzv bnmp qwrt",            # rare words -> char-level blowup
        "newest newest newest low",
        "zzzz xxxx yyyy wwww vvvv",
        "low low low",
        "widest newest lower",
    ]
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    merges = bpe_train(word_freqs(df, "text"), n_merges=10)
    counted = bpe_token_count(df, "text", merges)
    budget = 30
    out = {
        r["doc_id"]: r
        for r in token_budget_filter(
            counted, ["source"], "doc_id", F.col("n_bpe_tokens"), budget
        ).collect()
    }
    cum = 0
    for i, t in enumerate(texts):
        n = _bpe_count_py(t, merges)
        cum += n
        assert out[i]["n_tokens"] == n, (i, t)
        assert out[i]["cum_tokens"] == cum
        assert out[i]["in_budget"] == int(cum <= budget)


def test_bpe_and_whitespace_budgets_order_differently(spark):
    """Why the seam matters: a whitespace budget and a BPE budget keep
    DIFFERENT documents — rare-word docs explode under BPE while
    common-word docs compress, so cutting by word count misstates the
    model-token spend."""
    from architrave_project_apache_nifi_spark.operators.sampling import (
        token_budget_filter,
    )
    from architrave_project_apache_nifi_spark.operators.textanalysis import (
        token_count,
    )

    # doc 0: 6 common words (BPE-cheap); doc 1: 3 rare words
    # (BPE-expensive). Whitespace says doc1 < doc0; BPE says opposite.
    texts = [
        "low low newest newest widest lower",
        "xyzqwfjp bnmvcxza qpwoeiru",
    ]
    train = spark.createDataFrame(
        [(0, " ".join(["low lower newest widest"] * 20))],
        "doc_id long, text string",
    )
    merges = bpe_train(word_freqs(train, "text"), n_merges=30)
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    counted = bpe_token_count(df, "text", merges)
    rows = {r["doc_id"]: r for r in counted.collect()}
    ws = {i: len(t.split()) for i, t in enumerate(texts)}
    assert ws[0] > ws[1]
    assert rows[0]["n_bpe_tokens"] < rows[1]["n_bpe_tokens"]
    # a budget that admits doc0 under BPE but would admit doc1 under
    # whitespace-ordering flips the kept set
    budget = rows[0]["n_bpe_tokens"]
    kept_bpe = {
        r["doc_id"]
        for r in token_budget_filter(
            counted, ["source"], "doc_id", F.col("n_bpe_tokens"), budget
        ).collect()
        if r["in_budget"] == 1
    }
    assert kept_bpe == {0}


def test_pack_bins_accepts_bpe_counts(spark):
    """The pack_bins half of the seam: FFD packing keyed to BPE counts
    — invariants hold (no bin exceeds budget, every doc appears,
    oversize routed out) with the model-token costing."""
    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_bins,
    )

    texts = ["low newest"] * 4 + ["xqzv bnmp qwrt zzzz xxxx yyyy"] * 2
    df = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id long, source string, text string",
    )
    merges = bpe_train(word_freqs(df, "text"), n_merges=10)
    counted = bpe_token_count(df, "text", merges)
    budget = 30
    out = pack_bins(
        counted, "doc_id", "source", F.col("n_bpe_tokens"), budget=budget
    ).collect()
    assert {r["id"] for r in out} == set(range(6))
    fills: dict = {}
    for r in out:
        if r["is_packed"]:
            assert r["n_tokens"] <= budget
            key = (r["stream"], r["shard"], r["bin_local"])
            fills[key] = fills.get(key, 0) + r["n_tokens"]
        else:
            assert r["n_tokens"] > budget and r["bin_local"] == -1
    assert all(v <= budget for v in fills.values())
