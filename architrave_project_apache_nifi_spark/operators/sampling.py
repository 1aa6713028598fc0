"""Deterministic stratified sampling — domain/language mixture control
for training-data pipelines.

Given per-stratum keep rates (e.g. ``{"en": 0.5, "de": 0.25}``), keep
each row iff a deterministic hash of its id falls under the stratum's
threshold. Properties a training pipeline needs and `df.sample()` does
not give:

- **Deterministic & replayable**: the decision is a pure function of
  (id, rate) — re-running the pipeline, or running it on a different
  cluster/partitioning, selects the identical row set. No RNG state,
  no seed-per-partition coupling.
- **Nested**: lowering a stratum's rate produces a subset of the
  previous sample (thresholding one fixed hash), so mixture re-weighs
  are monotone — important when re-mixing an already-materialized
  corpus.
- **Stratified**: rates ride a small DataFrame joined (broadcast) on
  the stratum key, so thousands of (lang × source) strata cost one
  map-side join, no shuffle of the corpus.

The hash is a 31-bit LCG step ``((id % 2147483647) * 1103515245 +
12345) % 2^31`` — pure integer arithmetic expressible identically in
any ANSI SQL engine (the DuckDB oracle runs the same formula), bounded
so the product never overflows int64. It is NOT crypto-grade; for
adversarial id distributions swap in ``xxhash64(id)`` (same call
shape) at the cost of oracle portability. Rates with exact binary
fractions (k/2^31) avoid float-rounding disagreement between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LCG_MOD = 2147483647  # 2^31 - 1 (bounds the multiply under int64)
_LCG_MUL = 1103515245
_LCG_INC = 12345
_LCG_RANGE = 2147483648  # 2^31


def sample_hash(id_col) -> F.Column:
    """Deterministic 31-bit hash of an integer id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        (c.cast("long") % _LCG_MOD) * _LCG_MUL + _LCG_INC
    ) % _LCG_RANGE


def stratified_sample(
    df: DataFrame,
    rates: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Rows of ``df`` kept by the per-stratum deterministic sample.

    ``rates`` has ``stratum_cols`` + a double ``rate`` column in
    [0, 1]; strata absent from ``rates`` fall back to
    ``default_rate``. The rates table is broadcast — the corpus is
    filtered in place with zero shuffles.
    """
    keyed = rates.select(
        *stratum_cols, F.col("rate").cast("double").alias("__rate")
    )
    return (
        df.join(F.broadcast(keyed), stratum_cols, "left")
        .withColumn("__rate", F.coalesce("__rate", F.lit(float(default_rate))))
        .filter(
            sample_hash(id_col)
            < F.floor(F.col("__rate") * F.lit(float(_LCG_RANGE))).cast("long")
        )
        .drop("__rate")
    )


def temperature_rates(
    df: DataFrame,
    stratum_cols: list[str],
    alpha: float = 0.5,
    out_col: str = "rate",
) -> DataFrame:
    """Per-stratum keep rates realizing TEMPERATURE (α-) sampling — the
    standard mixture-flattening rule for multilingual / multi-domain
    training corpora: target mixture ``p_s ∝ n_s^α`` (α=1 natural,
    α→0 uniform), achieved without upsampling by keeping each stratum
    at ``rate_s ∝ n_s^(α−1)``, normalized so the rarest stratum keeps
    rate 1.0 (the maximal sample consistent with the mixture).

    Returns ``stratum_cols + (n_rows, rate)`` — small (one row per
    stratum); feed straight into :func:`stratified_sample`, whose
    broadcast join applies it to the corpus with zero shuffles. One
    shuffle total (the stratum count aggregation, map-side combined).

    Determinism note: ``pow`` is the one step not guaranteed bit-equal
    across engines (JVM StrictMath vs libm, ≤1 ulp); a 1-ulp rate
    difference moves the LCG threshold by ≤1 in 2^31, flipping a row
    only if its hash equals the boundary exactly (~n/2^31 odds).
    Everything else (div/mul/floor) is IEEE-exact."""
    # localCheckpoint (r12 optimization): counts is stratum-sized but
    # referenced twice (wmax and the rate projection) and its output
    # broadcasts into the corpus sampling join — un-truncated lineage
    # re-ran the corpus count aggregate per reference
    counts = (
        df.groupBy(*stratum_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=True)
    )
    w = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha) - 1.0))
    weighted = counts.withColumn("__w", w)
    wmax = weighted.agg(F.max("__w").alias("__wmax"))
    return (
        weighted.join(F.broadcast(wmax))
        .select(
            *stratum_cols,
            "n_rows",
            (F.col("__w") / F.col("__wmax")).alias(out_col),
        )
    )


def lcg_where_sql(id_expr: str, rate_case_sql: str) -> str:
    """The equivalent ANSI-SQL predicate, for oracle construction:
    ``lcg(id) < floor(rate * 2^31)`` with the same constants."""
    return (
        f"(({id_expr} % {_LCG_MOD}) * {_LCG_MUL} + {_LCG_INC}) % {_LCG_RANGE}"
        f" < CAST(floor(({rate_case_sql}) * {_LCG_RANGE}.0) AS BIGINT)"
    )


def token_budget_filter(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    n_tokens_col,
    budget: int,
    skew_protection: bool | str = "auto",
    hot_key_rows: int = 5_000_000,
    n_ts_buckets: int = 32,
) -> DataFrame:
    """Per-stratum token-budget cut: keep documents in deterministic
    ``id_col`` order until the stratum's cumulative token count reaches
    ``budget`` — the "sample each source down to N tokens" mixture
    primitive (budgets in tokens, not rows, is how training mixtures
    are actually specified).

    Returns every row annotated (``cum_tokens`` INCLUSIVE of the row,
    ``in_budget`` = 1 iff the row fits entirely under the budget), so
    callers can either filter ``in_budget = 1`` or inspect the
    boundary. A document is never truncated — it fits or it doesn't.

    Scale: a mixture has tens of strata but each stratum is a whole
    SOURCE — at 100 TB every stratum exceeds one task, so the plain
    per-stratum window is the pathological case, not the corner case.
    ``skew_protection="auto"`` (r7, the engine's standard contract)
    detects strata above ``hot_key_rows`` with one bounded sampled job
    and routes them through the bucketed cumulative sum: rows split by
    per-stratum ``percentile_approx`` edges over ``id_col``, the local
    window runs over (stratum, bucket), and each bucket adds the
    preceding buckets' token total from a per-(stratum, bucket) summary
    (integer arithmetic — the bucketed sum is bit-exact, not merely
    ulp-close). Cold corpora keep the plain single-window plan.
    """
    c = F.col(n_tokens_col) if isinstance(n_tokens_col, str) else n_tokens_col
    from pyspark.sql import Window

    from .skew_windows import order_bucketable, resolve_skew_protection

    if skew_protection and order_bucketable(df, id_col):
        engaged, edges = resolve_skew_protection(
            df, stratum_cols, id_col, skew_protection, hot_key_rows,
            n_ts_buckets,
        )
        if engaged:
            return _token_budget_filter_skewed(
                df, stratum_cols, id_col, c, budget,
                hot_key_rows, n_ts_buckets, edges,
            )
    elif skew_protection is True:
        # same contract as event_ngrams: forced protection on an
        # un-bucketable id must fail loudly, not silently serialize
        # the stratum in one task
        raise ValueError(
            "token_budget_filter: skew_protection=True needs a numeric "
            f"or timestamp id_col, got {dict(df.dtypes)[id_col]}"
        )
    w = (
        Window.partitionBy(*stratum_cols)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("__n_tok", c.cast("bigint")).select(
        *stratum_cols,
        id_col,
        F.col("__n_tok").alias("n_tokens"),
        F.sum("__n_tok").over(w).alias("cum_tokens"),
        (F.sum("__n_tok").over(w) <= F.lit(int(budget)))
        .cast("int")
        .alias("in_budget"),
    )


def _token_budget_filter_skewed(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    c,
    budget: int,
    hot_key_rows: int,
    n_ts_buckets: int,
    hot_edges: DataFrame | None,
) -> DataFrame:
    """The bucketed cumulative sum behind
    :func:`token_budget_filter`'s auto gate — running_window_skewed's
    offset pattern specialised to one integer sum (bit-exact). Same
    harvested/lazy summary split as the other twins."""
    from pyspark.sql import Window

    from .skew_windows import (
        BUCKET,
        _bucket_rows,
        _bucketed_exchange,
        _hot_edges_agg,
    )

    keys = list(stratum_cols)
    base = df.withColumn("__n_tok", c.cast("bigint"))
    harvested = hot_edges is not None
    if not harvested:
        hot_edges = _hot_edges_agg(
            base, keys, id_col, hot_key_rows, n_ts_buckets, ()
        )
    bucketed = _bucketed_exchange(
        _bucket_rows(base, keys, id_col, hot_edges, "left"), keys
    )
    w = (
        Window.partitionBy(*keys, BUCKET)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    summ_src = _bucket_rows(
        base.select(*dict.fromkeys([*keys, id_col, "__n_tok"])),
        keys, id_col, hot_edges, "inner",
    ) if harvested else bucketed
    wk = Window.partitionBy(*keys).orderBy(BUCKET)
    offsets = (
        summ_src.groupBy(*keys, BUCKET)
        .agg(
            F.sum("__n_tok").alias("__bsum"),
            F.count("__n_tok").alias("__bnn"),  # non-NULL counts
        )
        .select(
            *keys,
            BUCKET,
            F.coalesce(
                F.sum("__bsum").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__toff"),
            F.coalesce(
                F.sum("__bnn").over(
                    wk.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__nnoff"),
        )
    )
    # NULL semantics must mirror the plain window exactly (code-review
    # r7): sum() skips NULLs, so cum_tokens is NULL only while the
    # ENTIRE per-stratum prefix (local + prior buckets) has zero
    # non-NULL token counts — an all-NULL bucket prefix must still
    # carry the prior buckets' total forward, not poison it to NULL.
    nn_total = F.count("__n_tok").over(w) + F.coalesce(
        F.col("__nnoff"), F.lit(0)
    )
    cum = F.when(nn_total == 0, F.lit(None).cast("bigint")).otherwise(
        F.coalesce(F.sum("__n_tok").over(w), F.lit(0))
        + F.coalesce(F.col("__toff"), F.lit(0))
    )
    return (
        bucketed.join(offsets, [*keys, BUCKET], "left")
        .select(
            *keys,
            id_col,
            F.col("__n_tok").alias("n_tokens"),
            cum.alias("cum_tokens"),
            (cum <= F.lit(int(budget))).cast("int").alias("in_budget"),
        )
    )


def replicate_by_rate(
    df: DataFrame,
    rates: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic UPSAMPLING — the other half of mixture shaping
    (``stratified_sample`` can only keep ≤ 1 copy): each row is
    replicated ``floor(rate)`` times plus one more iff its LCG hash
    falls under ``frac(rate)``, so a stratum with rate 2.3 emits
    exactly-reproducible 2-or-3 copies averaging 2.3×.

    Output = input columns + ``copy_idx`` (1-based). Map-only after the
    broadcast rates join: the fan-out is an ``explode(sequence(...))``
    generator — no shuffle, bounded per-row expansion; at 100 TB the
    blow-up is governed by the rates table, which the mixture spec
    already fixes. Oracle-exact: the same integer LCG threshold as
    :func:`stratified_sample`, never float multiplication of row
    counts."""
    keyed = rates.select(
        *stratum_cols, F.col("rate").cast("double").alias("__rate")
    )
    with_rate = df.join(F.broadcast(keyed), stratum_cols, "left").withColumn(
        "__rate", F.coalesce("__rate", F.lit(float(default_rate)))
    )
    base = F.floor(F.col("__rate")).cast("long")
    frac = F.col("__rate") - F.floor(F.col("__rate"))
    extra = (
        sample_hash(id_col)
        < F.floor(frac * F.lit(float(_LCG_RANGE))).cast("long")
    ).cast("long")
    n_copies = (base + extra).alias("__n_copies")
    return (
        with_rate.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__rate", "__n")
    )


def shuffle_rank(
    df: DataFrame, id_col: str, n_shards: int = 1024
) -> DataFrame:
    """Deterministic global training-order permutation: every row gets
    a dense 0-based ``rank`` in the order of its LCG hash (ties broken
    by id) — the "shuffle the corpus before training" step, replayable
    across runs and engines.

    Distributed the same way as packing's prefix sum: the hash space is
    cut into ``n_shards`` contiguous ranges, rows rank locally within
    their shard (parallel windows), and shard row-counts (≤ n_shards
    tiny rows) prefix-sum on a broadcastable side to offset the local
    ranks — no corpus-wide single-reducer window. Because shards are
    contiguous HASH RANGES, local-rank + shard-offset IS the global
    hash-order rank."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    width = (_LCG_RANGE + n_shards - 1) // n_shards
    base = df.withColumn("__h", sample_hash(id_col)).withColumn(
        "__shard", F.floor(F.col("__h") / width).cast("long")
    )
    from pyspark.sql import Window

    in_shard = Window.partitionBy("__shard").orderBy("__h", id_col)
    local = base.withColumn("__local", F.row_number().over(in_shard))
    shard_sizes = base.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    offsets = shard_sizes.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__n").over(
                Window.orderBy("__shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("__shard", "__offset")
    return (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn("rank", (F.col("__offset") + F.col("__local") - 1))
        .drop("__h", "__shard", "__local", "__offset")
    )


def domain_cap(
    df: DataFrame,
    domain_cols: list[str],
    id_col: str,
    cap: int,
    rank_col: str = "cap_rank",
    **topk_kwargs,
) -> DataFrame:
    """Cap each domain at ``cap`` documents (r9) — the crawl-corpus
    balancing step: without it a handful of mega-domains dominate the
    training mixture. Kept rows are chosen by the deterministic LCG
    priority of the id (ties by id), so the selection is replayable
    across runs/engines and NESTED — raising the cap keeps a strict
    superset (the priority order is fixed), exactly the property
    mixture re-weighs need on an already-materialized corpus.

    Rides :func:`~..operators.skew_windows.topk_per_key` (two-phase
    salted rank, ``skew_protection="auto"``), because the one domain
    that NEEDS capping is by definition the hot key a plain
    ``row_number`` window stragglers on — at 100 TB the cap operator
    and the skew problem are the same rows. Returns the surviving rows
    with a 1-based ``rank_col`` attached."""
    from .skew_windows import topk_per_key

    with_pri = df.withColumn("__pri", sample_hash(id_col))
    out = topk_per_key(
        with_pri,
        domain_cols,
        [F.col("__pri").asc(), F.col(id_col).asc()],
        cap,
        rank_col=rank_col,
        **topk_kwargs,
    )
    return out.drop("__pri")


def weighted_priority_key(id_col, weight_col) -> F.Column:
    """Sequential-Poisson sampling key (Ohlsson 1998, public method):
    ``u / w`` with ``u = (lcg(id) + 1) / 2^31`` uniform in (0, 1].
    Taking the n SMALLEST keys draws an (approximately
    probability-proportional-to-size) weighted sample — deterministic,
    replayable, and IEEE-exact: only division is involved (no ln/pow,
    whose last-ulp rounding differs across engines), so the DuckDB
    oracle reproduces the identical ranking bit-for-bit."""
    w = (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
        "double"
    )
    u = (sample_hash(id_col) + 1).cast("double") / F.lit(float(_LCG_RANGE))
    return u / w


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, n: int
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows (sequential Poisson
    / PPS-approximate): rows with weight w are drawn with probability
    ≈ proportional to w. Zero/negative weights never selected (key =
    +inf is filtered). ``orderBy().limit(n)`` plans as
    TakeOrderedAndProject — per-partition top-n, no global sort; the
    corpus never shuffles."""
    keyed = df.withColumn(
        "__wkey", weighted_priority_key(id_col, weight_col)
    ).filter(F.col(weight_col) > 0)
    return (
        keyed.orderBy(F.col("__wkey"), F.col(id_col)).limit(n).drop("__wkey")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    dense: bool = False,
) -> DataFrame:
    """Deterministic negative sampling (contrastive-training pairs):
    for each anchor row, ``k`` pseudo-random partner ids drawn by pure
    LCG arithmetic over the id domain — replayable across runs and
    engines, no RNG state.

    ``dense=True`` asserts ids are exactly 0..n-1 (the candidate is
    the arithmetic value itself); otherwise candidates map into the
    actual id set via a rank table (one extra row-sized shuffle).
    Accidental self-pairs advance to the next slot (candidate+1 mod n)
    — closed-form, so the SQL oracle replays it exactly.

    Output: (anchor id, ``neg_id``, ``slot`` 0..k-1). Map-only in the
    dense case; the fan-out is the k× generator, exactly like
    ``mixture_upsample``'s explode."""
    n = df.count()  # one scalar to the driver — the id-domain size
    if n < 2:
        raise ValueError("negative_pairs: need at least 2 rows")
    anchors = df.select(F.col(id_col))
    slots = anchors.select(
        id_col, F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("slot")
    )
    cand = F.pmod(
        (F.col(id_col).cast("long") * _LCG_MUL + F.col("slot") * 40503 + _LCG_INC),
        F.lit(n),
    )
    if dense:
        # dense: the candidate index IS the id — self-avoidance compares
        # them directly
        cand = F.when(
            cand == F.col(id_col), F.pmod(cand + 1, F.lit(n))
        ).otherwise(cand)
        return slots.withColumn("__cand", cand.cast("long")).select(
            id_col, F.col("__cand").alias("neg_id"), "slot"
        )
    paired = slots.withColumn("__cand", cand.cast("long"))
    # rank table (i-th smallest id ← candidate i) built with the
    # sharded prefix-sum decomposition (training_order's trick, id
    # VALUE ranges instead of hash ranges) — no corpus-wide
    # single-reducer window.
    from pyspark.sql import Window

    ids = df.select(F.col(id_col).alias("neg_id"))
    parts = df.sparkSession.sparkContext.defaultParallelism
    bounds = ids.agg(
        F.min("neg_id").alias("__lo"), F.max("neg_id").alias("__hi")
    )
    sharded = ids.crossJoin(F.broadcast(bounds)).withColumn(
        "__shard",
        F.least(
            (
                (F.col("neg_id") - F.col("__lo"))
                * parts
                / (F.col("__hi") - F.col("__lo") + 1)
            ).cast("long"),
            F.lit(parts - 1),
        ),
    )
    in_shard = Window.partitionBy("__shard").orderBy("neg_id")
    local = sharded.withColumn("__local", F.row_number().over(in_shard))
    offsets = (
        sharded.groupBy("__shard")
        .agg(F.count(F.lit(1)).alias("__n"))
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
    ranked = (
        local.join(F.broadcast(offsets), "__shard")
        .withColumn("__cand", F.col("__offset") + F.col("__local") - 1)
        .select("neg_id", "__cand")
    )
    # sparse self-avoidance must compare RANKS, not ids: look up the
    # anchor's own rank and bump colliding candidates to the next slot
    anchor_rank = ranked.select(
        F.col("neg_id").alias(id_col), F.col("__cand").alias("__self")
    )
    adjusted = paired.join(anchor_rank, id_col).withColumn(
        "__cand",
        F.when(
            F.col("__cand") == F.col("__self"),
            F.pmod(F.col("__cand") + 1, F.lit(n)),
        ).otherwise(F.col("__cand")),
    )
    return adjusted.join(ranked, "__cand").select(id_col, "neg_id", "slot")


def token_budget_filter_weighted(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    n_tokens_col,
    budgets: DataFrame,
    budget_col: str = "budget",
    **kwargs,
) -> DataFrame:
    """Per-STRATUM token budgets — the form a DoReMi/temperature
    mixture actually specifies ("web gets 120B tokens, wiki 40B"),
    where :func:`token_budget_filter` caps every stratum at one shared
    number. ``budgets`` is (stratum_cols → ``budget_col``), e.g.
    ``doremi_token_budgets`` output.

    Reuses the scalar filter's entire cumulative machinery (including
    the auto skew-protected bucketed window) with an unreachable
    sentinel budget, then re-derives ``in_budget`` against the
    stratum's own bound — the cumulative sums are budget-independent,
    so this costs one broadcast join over the mixture-sized budget
    table and nothing else. Returns the scalar form's columns plus
    ``budget``."""
    out = token_budget_filter(
        df, stratum_cols, id_col, n_tokens_col, budget=1 << 62, **kwargs
    ).drop("in_budget")
    bud = budgets.select(
        *stratum_cols, F.col(budget_col).cast("bigint").alias("budget")
    )
    return out.join(F.broadcast(bud), stratum_cols).withColumn(
        "in_budget",
        (F.col("cum_tokens") <= F.col("budget")).cast("int"),
    )


def doremi_token_budgets(
    weights: DataFrame,
    domain_col: str,
    total_budget: int,
    weight_col: str = "weight",
) -> DataFrame:
    """Materialize DoReMi weights as per-domain token budgets:
    ``budget_d = round(w_d × total_budget)`` — the bridge from
    ``selection.doremi_domain_weights`` to
    :func:`token_budget_filter_weighted`. Mixture-sized (tens of
    rows)."""
    return weights.select(
        domain_col,
        F.round(F.col(weight_col) * F.lit(float(total_budget)))
        .cast("bigint")
        .alias("budget"),
    )
