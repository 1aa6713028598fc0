"""Importance-weighted data selection — DSIR (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS
2023): pick raw-corpus documents that LOOK LIKE a small target set
(Wikipedia, textbooks, a domain slice) by scoring each document with
the log-likelihood ratio of its words under target-vs-raw unigram
models, then resampling with Gumbel top-k. This is the selection step
that sits BETWEEN the quality gates this engine already has (Gopher /
C4 / bigram-LM floors — absolute quality) and mixture sampling
(temperature_rates — composition): those answer "is it good text" and
"how much of each source"; DSIR answers "is it the KIND of text the
target distribution wants".

Decomposition for 100 TB (the paper's own: hashed n-gram features make
the model a bounded table regardless of corpus size):

1. One explode + hash-agg per side builds the word (or hashed-bucket)
   count table — map-side partial combine absorbs the explosion; the
   table is vocabulary- (or num_buckets-) sized, megabytes where the
   corpus is terabytes.
2. The two log-prob tables broadcast; per-doc scoring is an explode +
   two broadcast joins + one sum keyed by the doc id — the corpus
   shuffles once, on its own id.
3. Selection is Gumbel top-k: score = logweight + Gumbel noise from
   the engine's deterministic LCG (``sampling.sample_hash`` — same
   replayability contract as every sampler here), selected = score ≥
   the k-th largest (a sort+limit+min broadcast, never a global
   single-partition window).

The raw-word form is DuckDB-replayable end-to-end (the ``dsir_select``
gate entry); the hashed form (``num_buckets``) is the production path
when the vocabulary itself is too large to broadcast — same
arithmetic, bucket collisions are the paper's trade — and is
property-tested against the raw form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens
from .sampling import _LCG_RANGE, sample_hash

# Smoothing: add-one on counts, vocabulary size from the RAW side —
# fixed denominators both engines compute identically.


def _words(df: DataFrame, id_col: str | None, text_col: str) -> DataFrame:
    """Exploded non-empty words; ``id_col=None`` drops the id — the
    TARGET side only ever aggregates by word, and a curated external
    target corpus has no reason to carry the raw corpus's id column."""
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(tokens(F.col(text_col))).alias("__w")
    ]
    return df.select(*cols).filter(F.col("__w") != "")


def word_logprob_table(
    words: DataFrame, n_total: int, vocab_size: int
) -> DataFrame:
    """(word, logp) under add-one smoothing with the given fixed
    denominator: ``logp = ln(c + 1) − ln(n_total + vocab_size)``.
    Words absent from the table take ``−ln(n_total + vocab_size)``
    (c = 0) via a coalesce at join time."""
    return words.groupBy("__w").agg(
        (
            F.log(F.count(F.lit(1)).cast("double") + F.lit(1.0))
            - F.log(F.lit(float(n_total + vocab_size)))
        ).alias("__logp")
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weight: ``Σ_w [ logp_target(w)
    − logp_raw(w) ]`` over the document's words (with multiplicity),
    add-one smoothed, raw-side vocabulary as the shared smoothing
    denominator. Positive = more target-like than raw-like.

    ``num_buckets`` switches words to hashed buckets (xxhash64 mod B)
    — the paper's hashed n-gram features, bounding both model tables
    at B rows regardless of vocabulary (the 100 TB form; not
    oracle-portable, property-tested instead).

    Returns (id_col, n_tokens, logweight). Two bounded broadcast
    tables; the corpus is exploded once and aggregated on its own id —
    one shuffle. The two ln() calls per distinct word happen in the
    bounded tables, not per corpus token."""
    cw = _words(corpus, id_col, text_col)
    tw = _words(target, None, text_col)
    if num_buckets is not None:
        bucket = lambda c: F.pmod(F.xxhash64(c), F.lit(num_buckets))  # noqa: E731
        cw = cw.withColumn("__w", bucket(F.col("__w")))
        tw = tw.withColumn("__w", bucket(F.col("__w")))
    # fixed denominators: one tiny agg per side (V from the raw side)
    n_raw, v_raw = cw.agg(
        F.count(F.lit(1)), F.countDistinct("__w")
    ).collect()[0]
    n_tgt = tw.count()
    lp_t = word_logprob_table(tw, n_tgt, v_raw).withColumnRenamed(
        "__logp", "__lp_t"
    )
    lp_r = word_logprob_table(cw, n_raw, v_raw).withColumnRenamed(
        "__logp", "__lp_r"
    )
    zero_t = -F.log(F.lit(float(n_tgt + v_raw)))
    zero_r = -F.log(F.lit(float(n_raw + v_raw)))
    return (
        cw.join(F.broadcast(lp_t), "__w", "left")
        .join(F.broadcast(lp_r), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.coalesce(F.col("__lp_t"), zero_t)
                - F.coalesce(F.col("__lp_r"), zero_r)
            ).alias("logweight"),
        )
    )


def gumbel_noise(id_col) -> Column:
    """Deterministic standard-Gumbel draw from the engine's LCG hash:
    ``u = (h + 1) / (2^31 + 1)`` ∈ (0, 1) strictly (no ±inf), then
    ``−ln(−ln(u))`` — the same pure-integer-then-IEEE arithmetic in
    any ANSI engine, so the oracle replays the exact noise.

    The hash is normalized with ``pmod`` (ADVICE r11): Spark's ``%``
    is sign-preserving, so a NEGATIVE id would otherwise give h < 0,
    u ≤ 0 and ln(NULL) — a silently NULL ``selected`` flag. pmod maps
    every id into [0, 2^31) (a no-op for the non-negative ids the
    other samplers assume; the oracle mirrors it with the ANSI
    ``((x % m) + m) % m`` form)."""
    u = (
        F.pmod(sample_hash(id_col), F.lit(_LCG_RANGE)).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(_LCG_RANGE + 1))
    return -F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame, id_col: str, k: int, logweight_col: str = "logweight"
) -> DataFrame:
    """Gumbel top-k resampling (the paper's sampler: adding standard
    Gumbel noise to log-weights and taking the top k draws k documents
    WITHOUT replacement with probability ∝ exp(logweight)): annotate
    every row with its noisy score and ``selected`` = score ≥ the k-th
    largest. The threshold is a sort+limit+min — distributed
    TakeOrderedAndProject — COLLECTED to one scalar and compared as a
    literal: a join against a threshold subtree would embed the whole
    upstream lineage (corpus explode + joins + agg) TWICE in the plan
    and replay it per action. Never a global single-partition rank
    window. Deterministic: the noise is the LCG hash of the id;
    continuous scores make threshold ties measure-zero (and both
    engines compute the identical score, so they agree even on a tie).

    The scored weights are ``localCheckpoint``-ed (eager) BEFORE the
    threshold job (VERDICT r11 #5): without the barrier the weights
    lineage — whose upstream is the corpus explode + two joins + agg —
    executes once for the threshold collect and AGAIN when the
    returned DataFrame is consumed. At 100 TB the weights table is
    corpus-sized (one row per document); the checkpoint makes the
    explode+agg pay exactly once, and the returned plan's scan is the
    materialized RDD (asserted in tests/test_selection.py), so every
    downstream action reads partitions, not lineage."""
    scored = weights.withColumn(
        "__score", F.col(logweight_col) + gumbel_noise(id_col)
    ).localCheckpoint(eager=True)
    kth_row = (
        scored.orderBy(F.col("__score").desc())
        .limit(k)
        .agg(F.min("__score"))
        .collect()
    )
    if not kth_row or kth_row[0][0] is None:
        raise ValueError("dsir_resample: empty weights input")
    kth = float(kth_row[0][0])
    return scored.select(
        "*",
        (F.col("__score") >= F.lit(kth)).cast("int").alias("selected"),
    ).withColumnRenamed("__score", "gumbel_score")


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (r12): where DSIR picks DOCUMENTS
# that look like the target, DoReMi (Xie et al., "DoReMi: Optimizing
# Data Mixtures Speeds Up Language Model Pretraining", NeurIPS 2023)
# picks DOMAIN WEIGHTS from measured loss: domains where the proxy
# model's loss exceeds the reference get upweighted by exponentiated
# gradient. The full recipe interleaves weight updates with proxy
# TRAINING steps; the closed-form member implemented here is one EG
# round with the engine's reference-trained trigram LM standing in as
# the loss oracle (lm.trigram_nll = per-doc NLL), which is exactly the
# shape the paper's update rule takes between steps:
#
#     w_d  ∝  b_d · exp(eta · max(L_d − L̄, 0))        (normalized)
#
# b_d = baseline token share of domain d, L_d = mean per-position NLL
# of domain d, L̄ = the corpus doc-mean (the "reference loss" — excess
# below it is clipped to 0, the paper's non-negative excess). Feed the
# resulting weights straight into sampling.temperature_rates /
# token_budget_filter / weighted_sample to materialize the new mix.
# ---------------------------------------------------------------------------


def doremi_domain_weights(
    scored: DataFrame,
    domain_col: str,
    nll_col: str = "nll",
    tokens_col: str = "n_trigrams",
    eta: float = 1.0,
) -> DataFrame:
    """One exponentiated-gradient reweighting round over per-doc LM
    scores (the output shape of ``lm.trigram_nll`` with the domain in
    ``carry_cols``): returns one row per domain —

    (``domain_col``, ``n_docs``, ``n_tokens``, ``mean_nll``,
    ``excess``, ``weight``)

    with ``mean_nll`` the doc-mean NLL, ``excess`` = max(mean_nll −
    corpus doc-mean, 0), and ``weight`` the normalized tilted share
    b_d·exp(eta·excess) / Σ. All three reported floats round to 6
    decimals (the family hash-stability discipline); the
    normalization uses unrounded intermediates.

    Scale: the input is doc-level (already reduced from tokens); one
    hash aggregate to domain granularity (tens of rows — partial
    map-side combine absorbs everything), one broadcast of the
    two-scalar corpus row, one broadcast of the one-row normalizer.
    Nothing here grows with the corpus.

    The doc-level input is ``localCheckpoint``-ed first (r12
    optimization, the dsir_resample convention): it is referenced by
    BOTH the per-domain and the corpus-global aggregates, and its
    lineage is typically the full LM scoring plan (corpus explode +
    five count-table joins) — un-truncated, that scoring ran twice
    per evaluation."""
    scored = scored.localCheckpoint(eager=True)
    dom = scored.groupBy(domain_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col)).alias("n_tokens"),
        F.avg(F.col(nll_col)).alias("__mean"),
    )
    glob = scored.agg(
        F.avg(F.col(nll_col)).alias("__gmean"),
        F.sum(F.col(tokens_col)).cast("double").alias("__gtok"),
    )
    excess = F.greatest(F.col("__mean") - F.col("__gmean"), F.lit(0.0))
    tilted = dom.join(F.broadcast(glob)).select(
        domain_col,
        "n_docs",
        "n_tokens",
        F.col("__mean"),
        excess.alias("__excess"),
        (
            (F.col("n_tokens") / F.col("__gtok"))
            * F.exp(F.lit(float(eta)) * excess)
        ).alias("__tilt"),
    )
    norm = tilted.agg(F.sum("__tilt").alias("__z"))
    return tilted.join(F.broadcast(norm)).select(
        domain_col,
        "n_docs",
        "n_tokens",
        F.round(F.col("__mean"), 6).alias("mean_nll"),
        F.round(F.col("__excess"), 6).alias("excess"),
        F.round(F.col("__tilt") / F.col("__z"), 6).alias("weight"),
    )
