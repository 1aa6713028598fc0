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


# --- Byte-level (GPT-2-style) BPE ---------------------------------------

from architrave_project_apache_nifi_spark.operators.bpe import (  # noqa: E402
    byte_bpe_encode,
    byte_bpe_token_count,
    byte_bpe_train,
    byte_pretokens,
    byte_unicode_map,
    byte_word_freqs,
)


def _ref_byte_encode(pretoken: str, merges, b2u) -> list[str]:
    """Independent reference: classic sequential-merge BPE inference —
    apply each merge IN RANK ORDER over the whole symbol list (the
    textbook formulation, provably equivalent to the engine's
    lowest-rank-first loop). Deliberately different code shape from
    operators/bpe.py."""
    sym = [b2u[b] for b in pretoken.encode("utf-8")]
    for a, b in merges:
        i, out = 0, []
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_byte_unicode_map_is_reversible_printable():
    m = byte_unicode_map()
    assert len(m) == 256
    assert len(set(m.values())) == 256  # bijective
    assert m[ord("A")] == "A" and m[ord("!")] == "!"
    assert m[0x20] == "Ġ"  # space -> 'Ġ' (the GPT-2 signature)
    for ch in m.values():  # every symbol is printable, none whitespace
        assert not ch.isspace() and ch.isprintable()


def test_jvm_pretokenizer_matches_gpt2_semantics(spark):
    df = _corpus(spark, ["Hello world! it's 2026", "a  b", "tail  "])
    got = [
        r["p"]
        for r in df.orderBy("doc_id")
        .select(byte_pretokens("text").alias("p"))
        .collect()
    ]
    assert got[0] == ["Hello", " world", "!", " it", "'s", " 2026"]
    # double space: first space is whitespace-run (lookahead), second
    # rides the following word
    assert got[1] == ["a", " ", " b"]
    # trailing whitespace is its own token
    assert got[2] == ["tail", "  "]


def test_byte_encode_matches_independent_reference(spark):
    texts = [
        "the low lower lowest newest news",
        "the newest estimates, the widest tests!",
        "café costs 12 euros — naïve example",
    ] * 3
    df = _corpus(spark, texts)
    merges = byte_bpe_train(byte_word_freqs(df, "text"), n_merges=40)
    assert len(merges) > 10
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in byte_bpe_encode(df, "text", merges).collect()
    }
    b2u = byte_unicode_map()
    pts = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", byte_pretokens("text").alias("p")).collect()
    }
    for i in got:
        want = [t for pt in pts[i] for t in _ref_byte_encode(pt, merges, b2u)]
        assert got[i] == want
    # lossless: concatenated tokens reproduce the byte-mapped text
    for i, text in ((r["doc_id"], r["text"]) for r in df.collect()):
        mapped = "".join(b2u[b] for b in text.encode("utf-8"))
        assert "".join(got[i]) == mapped


def test_byte_level_has_no_oov_and_counts_bytes_without_merges(spark):
    # zero merges -> token count == UTF-8 byte count of the pretokens
    # (= of the text: pretokens partition it); emoji/controls included
    texts = ["héllo \U0001f600 \x01 world", "普通话 text"]
    df = _corpus(spark, texts)
    rows = byte_bpe_token_count(df, "text", [], out_col="n").collect()
    got = {r["doc_id"]: r["n"] for r in rows}
    for i, t in enumerate(texts):
        assert got[i] == len(t.encode("utf-8"))


def test_byte_vs_word_level_counts_diverge(spark):
    # rare-word text explodes under BPE; common-word text does not —
    # the ordering divergence that motivates costing with the REAL
    # tokenizer (same shape as the word-level divergence pin)
    common = "the the the the the the the the"
    rare = "zqxj vwpk qjzx bnmq"
    df = _corpus(spark, [common] * 20 + [rare])
    merges = byte_bpe_train(byte_word_freqs(df, "text"), n_merges=30)
    rows = byte_bpe_token_count(df, "text", merges, out_col="n").collect()
    got = {r["doc_id"]: r["n"] for r in rows}
    # 'the' collapses to ~1 token/word; the rare line stays ~1/byte
    assert got[0] <= 16  # 8 common words, heavily merged
    assert got[20] >= 15  # 19 bytes of unmerged rare text
    # whitespace counting would order them the OTHER way (8 vs 4 words)
    assert got[20] > 4


def test_byte_bpe_rides_budget_and_packing_seams(spark):
    from architrave_project_apache_nifi_spark.operators.packing import (
        pack_sequences,
    )
    from architrave_project_apache_nifi_spark.operators.sampling import (
        token_budget_filter,
    )

    texts = [f"document {i} words and more filler text {i}" for i in range(30)]
    df = _corpus(spark, texts).withColumn("lang", F.lit("en"))
    merges = byte_bpe_train(byte_word_freqs(df, "text"), n_merges=25)
    costed = byte_bpe_token_count(df, "text", merges)
    out = token_budget_filter(costed, ["lang"], "doc_id", F.col("n_bpe_tokens"), 120)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    cum = 0
    for r in rows:  # prefix-sum invariant under byte-BPE costs
        cum += r["n_tokens"]
        assert r["cum_tokens"] == cum
        assert r["in_budget"] == int(cum <= 120)
    packed = pack_sequences(
        costed, "doc_id", "lang", F.col("n_bpe_tokens"), budget=64
    ).collect()
    offs = {r["doc_id"]: r for r in packed}
    run = 0
    for i in range(30):  # concat-then-chunk offsets under byte-BPE costs
        assert offs[i]["seq_id"] == run // 64
        assert offs[i]["seq_offset"] == run % 64
        run += offs[i]["n_tokens"]
