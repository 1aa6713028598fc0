"""Data-quality constraint checking (Deequ-style, Spark-first).

The reference flow has no validation stage — malformed events simply
corrupt the history (SURVEY.md §2.8 Bugs 1-3 are partly data-quality
failures). This module turns declarative constraints into ONE
aggregation pass producing a violation report, the guard a pipeline
runs before committing a batch to the SCD2 store or a training corpus.

Scale: every row-level rule compiles to a conditional count inside one
hash aggregate — adding rules adds expressions, not passes or
shuffles. Uniqueness is the one rule that genuinely needs its own
shuffle (a groupBy on the key columns); it is a separate function so
the caller pays for it explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_constraints(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (``rule``, ``n_rows``, ``n_violations``,
    ``passed``). Each rule is a boolean Column where True = row OK;
    NULL counts as a violation (unknown is not OK — the Deequ
    convention). All rules evaluate in a single aggregation pass."""
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, cond in rules.items():
        aggs.append(
            F.sum(
                F.when(cond.isNull() | ~cond, 1).otherwise(0)
            ).alias(f"__v_{name}")
        )
    wide = df.agg(*aggs)
    reports = [
        wide.select(
            F.lit(name).alias("rule"),
            F.col("n_rows"),
            F.col(f"__v_{name}").cast("bigint").alias("n_violations"),
            (F.col(f"__v_{name}") == 0).cast("int").alias("passed"),
        )
        for name in rules
    ]
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness constraint as the same report shape: one row
    (``rule`` = 'unique(<cols>)') counting rows that share their key
    with at least one other row. One shuffle on the key columns."""
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("n_violations")
        )
    )
    total = df.agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        total.join(F.broadcast(dup_rows))
        .select(
            F.lit(f"unique({','.join(cols)})").alias("rule"),
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).cast("int").alias("passed"),
        )
    )


def winsorize(
    df: DataFrame,
    col: str,
    p_lo: float = 0.01,
    p_hi: float = 0.99,
    out_col: str | None = None,
) -> DataFrame:
    """Percentile clipping (winsorization) — the feature-prep pass
    that tames heavy tails before normalization: values below the
    ``p_lo`` exact percentile clamp up to it, above ``p_hi`` clamp
    down. NULLs pass through.

    One exact-percentile aggregate (1 row) broadcast back + a map-only
    clamp — the same plan shape as the adaptive quality floor; at
    100 TB substitute ``approx_percentile(ε)`` for the exact one
    (identical plan, stated error bound)."""
    if not (0.0 <= p_lo < p_hi <= 1.0):
        raise ValueError(f"winsorize: need 0 <= p_lo < p_hi <= 1, got {p_lo}, {p_hi}")
    bounds = df.agg(
        F.percentile(F.col(col), F.lit(p_lo)).alias("__lo"),
        F.percentile(F.col(col), F.lit(p_hi)).alias("__hi"),
    )
    target = out_col or col
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            target,
            F.when(F.col(col).isNull(), F.lit(None))
            .otherwise(F.least(F.greatest(F.col(col), F.col("__lo")), F.col("__hi"))),
        )
        .drop("__lo", "__hi")
    )


def quantile_transform(
    df: DataFrame, col: str, out_col: str | None = None
) -> DataFrame:
    """Exact empirical-CDF normalization (SQL ``percent_rank``
    semantics): each value maps to (#rows strictly below) / (n − 1),
    ties sharing their quantile — the rank-based feature scaling that
    is immune to outliers where min/max scaling is not. NULLs pass
    through untouched.

    Distributed without a corpus-wide window (the classic
    ``percent_rank() OVER (ORDER BY v)`` is a single-reducer sort):
    per-distinct-value counts aggregate once, the cumulative
    below-count builds with the sharded prefix-sum decomposition
    (value-range shards rank locally; ≤ n_shards totals broadcast
    back — packing.py's trick on the value axis), and rows join their
    quantile back on the 8-byte value key. Two row-sized shuffles
    (distinct-value agg + join back)."""
    from pyspark.sql import Window

    target = out_col or f"{col}_q"
    nonnull = df.filter(F.col(col).isNotNull())
    n = nonnull.count()
    if n < 2:
        raise ValueError("quantile_transform: need >= 2 non-null rows")
    # localCheckpoint (r12 optimization): counts is distinct-value-
    # sized but referenced by bounds, the sharded local cumsum AND the
    # shard offsets — un-truncated lineage re-ran the corpus aggregate
    # per reference (the same fix as drift.ks_statistic)
    counts = nonnull.groupBy(F.col(col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    ).localCheckpoint(eager=True)
    parts = df.sparkSession.sparkContext.defaultParallelism
    bounds = counts.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    sharded = counts.crossJoin(F.broadcast(bounds)).withColumn(
        "__shard",
        F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__lo"))
                    / (F.col("__hi") - F.col("__lo"))
                    * parts
                ).cast("long"),
                F.lit(parts - 1),
            )
        ),
    )
    in_shard = Window.partitionBy("__shard").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = sharded.withColumn(
        "__below_local", F.coalesce(F.sum("__c").over(in_shard), F.lit(0))
    )
    offsets = (
        sharded.groupBy("__shard")
        .agg(F.sum("__c").alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__shard", "__offset")
    )
    quantiles = (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn(
            "__q",
            (F.col("__offset") + F.col("__below_local"))
            / F.lit(float(n - 1)),
        )
        .select("__v", "__q")
    )
    return (
        df.join(quantiles, df[col] == quantiles["__v"], "left")
        .withColumn(target, F.col("__q"))
        .drop("__v", "__q")
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring (r9): the classifier rung of the quality
# ladder, above the heuristic gates (gopher_rules, repetition_features)
# and the corpus-LM scores (unigram/bigram logprob). The CCNet/LLaMA
# recipe: weak-label a reference-like positive set against random
# crawl negatives, train a linear classifier on cheap per-doc
# features, score the whole corpus, keep by probability.
# ---------------------------------------------------------------------------

QUALITY_FEATURE_COLS = (
    "n_tokens",
    "type_token_ratio",
    "stopword_ratio",
    "dup_bigram_ratio",
    "top_token_ratio",
)


def weak_quality_labels(
    df: DataFrame,
    id_col: str,
    positive: Column,
    neg_rate: float = 1.0,
    seed: int = 41,
) -> DataFrame:
    """Weak-label bootstrap: rows matching ``positive`` (a reference-
    domain predicate — 'looks like the curated corpus') get label 1;
    a deterministic LCG-hash sample of the REST at ``neg_rate`` gets
    label 0; everything else is unlabeled and dropped. Map-only; the
    negative sample rides ``sampling.sample_hash`` (the engine's one
    LCG — seed folded into the id), so the training set is stable
    across runs and engines and stays consistent with every other
    deterministic sample in the repo."""
    from .sampling import _LCG_RANGE, sample_hash

    h = sample_hash(F.col(id_col).cast("long") + F.lit(seed))
    keep_neg = (h.cast("double") / F.lit(float(_LCG_RANGE))) < F.lit(neg_rate)
    return (
        df.withColumn(
            "label",
            F.when(positive, F.lit(1.0)).otherwise(
                F.when(keep_neg, F.lit(0.0))
            ),
        )
        .filter(F.col("label").isNotNull())
    )


def _feature_vector(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    from .textanalysis import quality_features

    feats = quality_features(df, text_col, id_col).select(
        id_col, *QUALITY_FEATURE_COLS
    )
    asm = VectorAssembler(
        inputCols=list(QUALITY_FEATURE_COLS),
        outputCol="features",
        handleInvalid="keep",
    )
    return asm.transform(feats)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    id_col: str,
    label_col: str = "label",
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit a logistic-regression quality model on the per-doc feature
    set the heuristic gates already compute (QUALITY_FEATURE_COLS; all
    map-only Column arithmetic). Returns the fitted
    ``LogisticRegressionModel``.

    Scale: feature extraction is one map pass; LBFGS training is
    MLlib's tree-aggregated gradient loop — a linear scan of the
    (bounded, weak-labeled) training set per iteration, never a
    corpus shuffle. The model is k+1 doubles; persist with
    ``model.write().save(path)`` like the IVF index artifact."""
    from pyspark.ml.classification import LogisticRegression

    # Zero-token docs have null type_token_ratio/stopword_ratio, which
    # handleInvalid='keep' forwards as NaN features; one such doc in
    # the weak-label sample would NaN-poison the LBFGS loss. Train only
    # on docs with tokens ('keep' stays for the scoring path, where a
    # NaN probability just drops that doc).
    train = (
        _feature_vector(labeled.select(id_col, text_col), text_col, id_col)
        .filter(F.col("n_tokens") > 0)
        .join(labeled.select(id_col, label_col), id_col)
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    return lr.fit(train)


def score_quality(
    df: DataFrame, model, text_col: str, id_col: str
) -> DataFrame:
    """(id, ``quality_prob``) for every document: P(label=1) under the
    trained model. Feature extraction + the linear model are both
    map-only — scoring composes with any scan, and the keep decision
    is a plain filter (absolute floor or adaptive_percentile_filter
    on the probability)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_feature_vector(df, text_col, id_col))
    return scored.select(
        id_col,
        vector_to_array("probability")[1].alias("quality_prob"),
    )


# ---------------------------------------------------------------------------
# Token-level Naive-Bayes classifier (r12): the bag-of-words sibling of
# the feature-based logistic model above — the shape fastText-style
# quality classifiers (GPT-3 Appendix A, LLaMA §2.1) actually use:
# every TOKEN carries a learned weight, so the model discovers
# "lorem"/"{"-like junk markers from the weak labels instead of relying
# on hand-picked ratios. Multinomial NB is the closed-form member of
# that family (token weight = smoothed log-likelihood ratio; document
# score = sum over token positions + prior), which keeps training a
# pair of hash aggregates — no iterative fitting — and makes the whole
# pipeline ANSI-SQL-expressible for the DuckDB oracle.
# ---------------------------------------------------------------------------


def _nb_feature(tok, num_buckets: int | None):
    """Raw token string, or its hashed bucket (the fastText trick —
    DSIR's exact contract: the weight table is ``num_buckets``-sized
    regardless of vocabulary; collisions merge counts, the documented
    trade, and hashed == raw whenever collision-free)."""
    if num_buckets is None:
        return tok
    return F.pmod(F.xxhash64(tok), F.lit(int(num_buckets)))


def nb_token_model(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    alpha: float = 1.0,
    num_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial Naive Bayes from a 0/1 ``label_col``:
    returns (``llr``, ``meta``) where ``llr`` is the per-token weight
    table (tok, llr) with

        llr(tok) = ln((c1 + a) / (T1 + a·V)) − ln((c0 + a) / (T0 + a·V))

    (c_y = token count in class y, T_y = class token total, V = joint
    vocabulary, a = Laplace ``alpha``) and ``meta`` is one row
    (``prior_odds`` = ln(n1/n0) over docs, ``default_llr`` = the
    alpha-only weight for tokens unseen in training).

    Scale: one token explode → one vocabulary-sized hash aggregate
    (conditional sums give both class counts in a single pass), one
    two-scalar totals row, one doc-count row; the weight table is
    vocabulary-sized and broadcast-joins back in scoring — or, with
    ``num_buckets``, HASHED-feature-sized regardless of vocabulary
    (the 100 TB bound; pass the same value to :func:`nb_score`)."""
    from .dedup import tokens

    y = F.col(label_col).cast("int")
    base = labeled.select(
        y.alias("__y"),
        F.filter(tokens(F.col(text_col)), lambda x: x != "").alias("__toks"),
    )
    # localCheckpoint (r12 optimization — the lm_counts/DSIR lesson):
    # cnt is vocabulary-sized but its lineage is the full labeled-
    # corpus explode+aggregate; un-truncated, the scoring plan replayed
    # that explode once for the llr build, once for tot, and once per
    # meta reference — four corpus passes where one suffices.
    cnt = (
        base.select("__y", F.explode("__toks").alias("__tk"))
        .select("__y", _nb_feature(F.col("__tk"), num_buckets).alias("tok"))
        .groupBy("tok")
        .agg(
            F.sum(F.col("__y")).alias("c1"),
            F.sum(F.lit(1) - F.col("__y")).alias("c0"),
        )
        .localCheckpoint(eager=True)
    )
    tot = cnt.agg(
        F.sum("c1").cast("double").alias("t1"),
        F.sum("c0").cast("double").alias("t0"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    a = F.lit(float(alpha))
    llr_expr = F.log((F.col("c1") + a) / (F.col("t1") + a * F.col("v"))) - F.log(
        (F.col("c0") + a) / (F.col("t0") + a * F.col("v"))
    )
    llr = cnt.join(F.broadcast(tot)).select("tok", llr_expr.alias("llr"))
    docs = base.agg(
        F.sum("__y").cast("double").alias("n1"),
        F.sum(F.lit(1) - F.col("__y")).cast("double").alias("n0"),
    )
    # meta is one row but its docs side is a labeled-corpus pass, and
    # scoring broadcasts meta TWICE — checkpoint so the pass runs once
    meta = (
        docs.join(tot)
        .select(
            F.log(F.col("n1") / F.col("n0")).alias("prior_odds"),
            (
                F.log(a / (F.col("t1") + a * F.col("v")))
                - F.log(a / (F.col("t0") + a * F.col("v")))
            ).alias("default_llr"),
        )
        .localCheckpoint(eager=True)
    )
    return llr, meta


def nb_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    llr: DataFrame,
    meta: DataFrame,
    carry_cols: tuple[str, ...] = (),
    num_buckets: int | None = None,
) -> DataFrame:
    """Score documents under a trained NB model: (``id_col``,
    *carry_cols*, ``n_tokens``, ``log_odds``, ``pred_keep``) with
    ``log_odds`` = prior + Σ per-position llr (unseen tokens get
    ``default_llr``), rounded to 6 decimals for hash stability, and
    ``pred_keep`` = 1 iff log_odds > 0.

    One OUTER explode, one LEFT join on the vocabulary-sized weight
    table (AQE broadcasts it), one per-doc sum — documents never
    shuffle except that final aggregate. Zero-token docs ride the
    ``explode_outer`` NULL row through the same aggregate (r12
    optimization: this replaces a doc-spine left join that cost a
    second corpus pass plus a sort-merge join — one corpus scan and
    two exchanges removed, values identical: a NULL position never
    matches the weight table, is excluded from ``n_tokens`` by
    ``count(tok)``, and contributes nothing to the sum)."""
    from .dedup import tokens

    carry = list(carry_cols)
    base = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        F.filter(tokens(F.col(text_col)), lambda x: x != "").alias("__toks"),
    )
    pos = base.select(
        id_col, *carry, F.explode_outer("__toks").alias("__tk")
    ).select(
        id_col,
        *carry,
        F.when(
            F.col("__tk").isNotNull(), _nb_feature(F.col("__tk"), num_buckets)
        ).alias("tok"),
    )
    summed = (
        pos.join(llr, "tok", "left")
        .join(F.broadcast(meta))
        .groupBy(id_col, *carry)
        .agg(
            F.count(F.col("tok")).alias("n_tokens"),
            F.sum(
                F.when(
                    F.col("tok").isNotNull(),
                    F.coalesce(F.col("llr"), F.col("default_llr")),
                )
            ).alias("__s"),
            F.first("prior_odds").alias("prior_odds"),
        )
    )
    log_odds = F.round(
        F.col("prior_odds") + F.coalesce(F.col("__s"), F.lit(0.0)), 6
    )
    return summed.select(
        id_col,
        *carry,
        F.col("n_tokens"),
        log_odds.alias("log_odds"),
        (log_odds > 0).cast("int").alias("pred_keep"),
    )


def nb_quality_classifier(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    alpha: float = 1.0,
    num_buckets: int | None = None,
) -> DataFrame:
    """The composed weak-supervision pipeline: label every document
    with the boolean ``label`` Column (e.g. html.c4_page_keep — the
    heuristic gate bootstraps the model, the model generalizes beyond
    it), train NB on the labeled corpus, score the same corpus.
    Returns (``id_col``, ``weak_label``, ``n_tokens``, ``log_odds``,
    ``pred_keep``)."""
    labeled = df.select(
        F.col(id_col),
        F.col(text_col),
        label.cast("int").alias("weak_label"),
    )
    llr, meta = nb_token_model(
        labeled, text_col, "weak_label", alpha, num_buckets
    )
    return nb_score(
        labeled,
        text_col,
        id_col,
        llr,
        meta,
        carry_cols=("weak_label",),
        num_buckets=num_buckets,
    )
