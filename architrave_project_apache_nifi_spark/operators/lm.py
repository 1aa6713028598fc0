"""Reference-trained n-gram language model + CCNet perplexity buckets.

The top rung of the corpus-LM quality ladder (queries.py
``text_unigram_logprob`` → ``text_bigram_logprob`` → here): CCNet
(Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores every crawled document with a
language model trained on a REFERENCE corpus (Wikipedia), then splits
each language into head / middle / tail perplexity terciles; LLaMA's
pipeline keeps head+middle. The two pieces the earlier rungs lack are
exactly what this module adds:

- a real train/apply split — counts come from a reference slice, the
  scored corpus contains n-grams the model never saw, so smoothing and
  out-of-vocabulary mass are load-bearing, not decorative;
- the per-language percentile bucketing that turns raw scores into the
  keep/drop decision.

The model is an interpolated trigram (Jelinek–Mercer across trigram /
bigram / unigram / uniform-OOV floor):

    P(c | a, b) = l3 * c3(a,b,c)/c2(a,b) + l2 * c2(b,c)/c1(b)
                + l1 * c1(c)/T          + l0 / (V + 1)

with every count drawn from the reference slice, missing counts
contributing 0 (the floor ``l0/(V+1)`` keeps P strictly positive for
any token, seen or not), T = reference token count, V = reference
vocabulary size. Deliberately ANSI-SQL-expressible (like the whole
textanalysis family) so the DuckDB oracle replicates it bit-for-bit.
:func:`kn_trigram_nll` is the stronger sibling — interpolated
Kneser-Ney (the smoothing KenLM implements and CCNet actually runs),
whose continuation counts derive from the same checkpointed tables.

Scale (the same documented plan as ``bigram_logprob``, one rung up):
the three count tables aggregate once at vocabulary size over the
REFERENCE slice only (a few percent of the corpus in CCNet's setup)
and join back to the exploded (doc, a, b, c) positions — AQE
broadcasts them when small; at 100 TB cap each table to the top-K
grams plus the floor term, still a broadcast. Documents themselves
never shuffle except the final per-doc mean. Bucketing has two
implementations: ``ppl_bucket_exact`` (per-language ``ntile`` — a
sort within each language partition, used by the oracle-checked
entry) and ``ppl_bucket_approx`` (``approx_percentile`` thresholds
collected into a broadcast join — no global sort, the production
path at corpus scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens

#: Jelinek–Mercer interpolation weights (trigram, bigram, unigram,
#: uniform OOV floor) — must sum to 1.
LM_LAMBDAS = (0.5, 0.3, 0.15, 0.05)

#: CCNet bucket names in ascending-perplexity order (head = closest to
#: the reference distribution).
PPL_BUCKETS = ("head", "middle", "tail")


def _clean_tokens(text: Column) -> Column:
    return F.filter(tokens(text), lambda x: x != "")


def _pos_structs(toks: Column, n: int) -> Column:
    """Array of structs (t0..t{n-1}) for every length-``n`` window of
    ``toks`` — empty when the document is shorter than ``n``. Stays in
    codegen (transform over sequence, like dedup.shingles)."""
    empty = F.array().cast(
        "array<struct<" + ",".join(f"t{i}:string" for i in range(n)) + ">>"
    )
    return F.when(F.size(toks) < n, empty).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.struct(
                *[F.get(toks, i + j).alias(f"t{j}") for j in range(n)]
            ),
        )
    )


def lm_counts(
    ref: DataFrame, text_col: str, max_vocab: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Train the trigram model: (uni, bi, tri, totals) count tables
    from the reference slice. ``uni`` = (tok, c1); ``bi`` = (a, b,
    c2); ``tri`` = (a, b, c, c3); ``totals`` = one row (t = token
    count as double, v = vocabulary size as double).

    Three hash aggregates over the exploded reference tokens — each
    output is vocabulary-sized, keyed by gram content (sharded by
    construction, no doc-level hot key can exist). Each table is
    ``localCheckpoint``-ed (eager) before return — the DSIR lesson
    (VERDICT r11 #5): the scoring plan references uni twice and bi
    twice, and ``totals`` derives from uni, so un-truncated lineage
    would re-run the reference explode up to six times inside one
    plan (AQE's ReusedExchange recovers only part of it — measured 9
    residual scans at sf0.01). Materializing the three vocab-sized
    tables costs one reference pass each and makes every reuse read
    partitions, not lineage.

    ``max_vocab`` is the promised 100 TB bound: keep only the top-K
    most frequent entries of EACH table (count-desc, gram tiebreak —
    deterministic), so the broadcast stays K-rows regardless of corpus
    vocabulary. Scoring needs no special casing — dropped grams simply
    miss their left join and fall through the interpolation to the
    lower orders / the OOV floor, exactly like genuinely-unseen grams.
    ``totals`` (T, V) always reflects the UNCAPPED reference, keeping
    the unigram term a true probability and the floor denominator the
    real vocabulary size; the caps are built FROM the checkpointed
    full tables (vocab-sized sorts, no corpus rescan).

    r12 (optimization): the three tables come from ONE reference pass.
    Every position i emits a padded window struct (a=tok[i],
    b=tok[i+1]|NULL, c=tok[i+2]|NULL) and a single ``rollup(a, b, c)``
    aggregates all three gram orders in one shuffle — uni is the (a)
    grouping over every position, bi the (a,b) rows whose window had a
    second token, tri the (a,b,c) rows with a third (real tokens are
    never NULL after ``_clean_tokens``, so a NULL key can only mean
    padding and ``grouping_id`` + null filters split exactly). One
    explode + one shuffle + one eager checkpoint replaces three of
    each — same counts, 3× fewer reference passes (this used to be
    three tokenize+explode+shuffle+checkpoint jobs per train)."""
    toks = _clean_tokens(F.col(text_col))
    empty = F.array().cast("array<struct<a:string,b:string,c:string>>")
    padded = F.when(F.size(toks) < 1, empty).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 1),
            lambda i: F.struct(
                F.get(toks, i).alias("a"),
                F.get(toks, i + 1).alias("b"),
                F.get(toks, i + 2).alias("c"),
            ),
        )
    )
    pos = ref.select(F.explode(padded).alias("p")).select("p.a", "p.b", "p.c")
    grams = (
        pos.rollup("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("__n"), F.grouping_id().alias("__gid"))
        .filter(F.col("__gid") < 7)  # drop the grand-total row
        .localCheckpoint(eager=True)
    )
    uni = grams.filter(F.col("__gid") == 3).select(
        F.col("a").alias("tok"), F.col("__n").alias("c1")
    )
    totals = uni.agg(
        F.sum("c1").cast("double").alias("t"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    bi = grams.filter(
        (F.col("__gid") == 1) & F.col("b").isNotNull()
    ).select("a", "b", F.col("__n").alias("c2"))
    tri = grams.filter(
        (F.col("__gid") == 0) & F.col("c").isNotNull()
    ).select("a", "b", "c", F.col("__n").alias("c3"))
    if max_vocab is not None:
        uni = (
            uni.orderBy(F.desc("c1"), "tok")
            .limit(int(max_vocab))
            .localCheckpoint(eager=True)
        )
        bi = (
            bi.orderBy(F.desc("c2"), "a", "b")
            .limit(int(max_vocab))
            .localCheckpoint(eager=True)
        )
        tri = (
            tri.orderBy(F.desc("c3"), "a", "b", "c")
            .limit(int(max_vocab))
            .localCheckpoint(eager=True)
        )
    return uni, bi, tri, totals


def trigram_nll(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref: DataFrame,
    carry_cols: tuple[str, ...] = (),
    lams: tuple[float, float, float, float] = LM_LAMBDAS,
) -> DataFrame:
    """Score every document of ``df`` (≥3 tokens) under the trigram
    model trained on ``ref``: returns (``id_col``, *carry_cols*,
    ``n_trigrams``, ``nll``) where ``nll`` is the mean negative log
    likelihood per trigram position, rounded to 6 decimals so the
    value hash is stable across summation orders (the family-wide
    discipline). ``nll`` is the log of CCNet's perplexity — the
    bucketing below never needs ``exp``, which keeps the oracle
    compare free of cross-engine libm last-ulp drift.

    Plan: one explode to (doc, a, b, c) positions, five LEFT joins
    against the vocabulary-sized count tables (tri on (a,b,c), bi on
    (a,b) and on (b,c), uni on b and on c — AQE broadcasts small
    tables; at 100 TB cap to top-K grams), one broadcast of the
    two-scalar totals row, one per-doc aggregate. Documents never
    shuffle except that final mean."""
    return trigram_nll_with(
        df, text_col, id_col, lm_counts(ref, text_col), carry_cols, lams
    )


def trigram_nll_with(
    df: DataFrame,
    text_col: str,
    id_col: str,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    carry_cols: tuple[str, ...] = (),
    lams: tuple[float, float, float, float] = LM_LAMBDAS,
) -> DataFrame:
    """:func:`trigram_nll` against an already-trained ``model`` (the
    :func:`lm_counts` tuple) — the artifact form: train once on the
    reference, score many corpora / micro-batches against the same
    checkpointed tables (the streaming gate's stream-static join)."""
    l3, l2, l1, l0 = lams
    carry = [F.col(c) for c in carry_cols]
    uni, bi, tri, totals = model

    base = df.select(
        F.col(id_col), *carry, _clean_tokens(F.col(text_col)).alias("__toks")
    )
    pos = base.select(
        id_col, *carry_cols, F.explode(_pos_structs(F.col("__toks"), 3)).alias("p")
    ).select(
        id_col,
        *carry_cols,
        F.col("p.t0").alias("a"),
        F.col("p.t1").alias("b"),
        F.col("p.t2").alias("c"),
    )

    bi_ab = bi.select("a", "b", F.col("c2").alias("__c2ab"))
    bi_bc = bi.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.col("c2").alias("__c2bc")
    )
    uni_b = uni.select(F.col("tok").alias("b"), F.col("c1").alias("__c1b"))
    uni_c = uni.select(F.col("tok").alias("c"), F.col("c1").alias("__c1c"))

    j = (
        pos.join(tri, ["a", "b", "c"], "left")
        .join(bi_ab, ["a", "b"], "left")
        .join(bi_bc, ["b", "c"], "left")
        .join(uni_b, "b", "left")
        .join(uni_c, "c", "left")
        .join(F.broadcast(totals))
    )
    p = (
        F.lit(l3)
        * F.coalesce(F.col("c3").cast("double") / F.col("__c2ab"), F.lit(0.0))
        + F.lit(l2)
        * F.coalesce(F.col("__c2bc").cast("double") / F.col("__c1b"), F.lit(0.0))
        + F.lit(l1)
        * F.coalesce(F.col("__c1c").cast("double") / F.col("t"), F.lit(0.0))
        + F.lit(l0) / (F.col("v") + 1)
    )
    return j.groupBy(id_col, *carry_cols).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(F.avg(-F.log(p)), 6).alias("nll"),
    )


def ppl_bucket_exact(
    scored: DataFrame,
    nll_col: str,
    id_col: str,
    part_cols: tuple[str, ...] = ("lang",),
    buckets: tuple[str, ...] = PPL_BUCKETS,
) -> DataFrame:
    """CCNet bucket assignment by EXACT per-language terciles:
    ``ntile(len(buckets))`` over (``part_cols`` ordered by
    ``nll_col``, ``id_col``) — the id tiebreak makes the assignment
    deterministic under the 6-decimal rounding, so the DuckDB oracle
    lands every boundary row in the same bucket. Adds ``ppl_bucket``.

    This is a sort within each language partition of the DOC-level
    table (already reduced from tokens by orders of magnitude); at
    corpus scale prefer :func:`ppl_bucket_approx`."""
    w = Window.partitionBy(*part_cols).orderBy(F.col(nll_col), F.col(id_col))
    nt = F.ntile(len(buckets)).over(w)
    expr = F.when(nt == 1, F.lit(buckets[0]))
    for i, name in enumerate(buckets[1:-1], start=2):
        expr = expr.when(nt == i, F.lit(name))
    expr = expr.otherwise(F.lit(buckets[-1]))
    return scored.withColumn("ppl_bucket", expr)


def ppl_bucket_approx(
    scored: DataFrame,
    nll_col: str,
    part_cols: tuple[str, ...] = ("lang",),
    buckets: tuple[str, ...] = PPL_BUCKETS,
    accuracy: int = 10_000,
) -> DataFrame:
    """The production bucketing at corpus scale: per-language NLL
    thresholds via ``approx_percentile`` (one tiny aggregate — a few
    rows per language), broadcast-joined back and applied map-side.
    No global sort; the scored table streams through once. Adds
    ``ppl_bucket``. Boundary rows may differ from the exact terciles
    by the sketch's rank error (1/accuracy) — the documented trade."""
    k = len(buckets)
    qs = [i / k for i in range(1, k)]
    thr = scored.groupBy(*part_cols).agg(
        F.percentile_approx(nll_col, qs, accuracy).alias("__thr")
    )
    out = scored.join(F.broadcast(thr), list(part_cols))
    nll = F.col(nll_col)
    expr = F.when(nll <= F.get("__thr", 0), F.lit(buckets[0]))
    for i, name in enumerate(buckets[1:-1], start=1):
        expr = expr.when(nll <= F.get("__thr", i), F.lit(name))
    expr = expr.otherwise(F.lit(buckets[-1]))
    return out.withColumn("ppl_bucket", expr).drop("__thr")


def ccnet_ppl_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    lang_col: str,
    ref: DataFrame,
    exact: bool = True,
) -> DataFrame:
    """The composed CCNet stage: train on ``ref``, score ``df``,
    bucket per language. Returns (``id_col``, ``lang_col``,
    ``n_trigrams``, ``nll``, ``ppl_bucket``); documents shorter than
    3 tokens are excluded (no trigram positions — CCNet drops them to
    the tail by convention, callers can union them back)."""
    scored = trigram_nll(df, text_col, id_col, ref, carry_cols=(lang_col,))
    if exact:
        return ppl_bucket_exact(scored, "nll", id_col, (lang_col,))
    return ppl_bucket_approx(scored, "nll", (lang_col,))


def lm_save(
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame], path: str
) -> None:
    """Persist the trained LM (the :func:`lm_counts` tuple) as parquet
    — the train-once/serve-many artifact convention (``ivfpq_save``,
    ``ivf_save``): reference models are fit on a cadence, then many
    scoring runs (and the streaming gate) load the same frozen tables.
    ``totals`` materializes to its one row so a load never re-derives
    it from uni's lineage."""
    uni, bi, tri, totals = model
    uni.write.mode("overwrite").parquet(f"{path}/uni")
    bi.write.mode("overwrite").parquet(f"{path}/bi")
    tri.write.mode("overwrite").parquet(f"{path}/tri")
    totals.coalesce(1).write.mode("overwrite").parquet(f"{path}/totals")


def lm_load(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Load a persisted LM for :func:`trigram_nll_with` — parquet
    scans, no recomputation; the vocab-sized tables broadcast into the
    scoring joins exactly like the freshly-trained form."""
    return (
        spark.read.parquet(f"{path}/uni"),
        spark.read.parquet(f"{path}/bi"),
        spark.read.parquet(f"{path}/tri"),
        spark.read.parquet(f"{path}/totals"),
    )


#: Absolute discount for Kneser-Ney (the standard 0.75) and the
#: uniform escape mass keeping P strictly positive for any token.
KN_DISCOUNT = 0.75
KN_EPSILON = 0.05


def kn_counts(
    ref: DataFrame, text_col: str
) -> tuple[DataFrame, ...]:
    """Kneser-Ney count tables from the reference slice: the
    :func:`lm_counts` tuple PLUS the continuation statistics the KN
    recursion needs — ``ncont`` (c → N1+(·,c): distinct left contexts,
    the "how many kinds of bigrams end in c" count that replaces raw
    frequency at the unigram level), ``n1p_b`` (b → N1+(b,·): distinct
    continuations of b), ``n1p_ab`` ((a,b) → N1+(a,b,·)), and
    ``kn_totals`` (one row: n_bigram_types). Every table derives from
    the already-checkpointed uni/bi/tri by vocabulary-sized aggregates
    — no extra reference pass."""
    uni, bi, tri, totals = lm_counts(ref, text_col)
    ncont = (
        bi.groupBy(F.col("b").alias("c"))
        .agg(F.count(F.lit(1)).alias("ncont"))
        .localCheckpoint(eager=True)
    )
    n1p_b = (
        bi.groupBy(F.col("a").alias("b"))
        .agg(F.count(F.lit(1)).alias("n1p_b"))
        .localCheckpoint(eager=True)
    )
    n1p_ab = (
        tri.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n1p_ab"))
        .localCheckpoint(eager=True)
    )
    kn_totals = bi.agg(
        F.count(F.lit(1)).cast("double").alias("nbig")
    )
    return uni, bi, tri, totals, ncont, n1p_b, n1p_ab, kn_totals


def kn_trigram_nll(
    df: DataFrame,
    text_col: str,
    id_col: str,
    ref: DataFrame,
    carry_cols: tuple[str, ...] = (),
    discount: float = KN_DISCOUNT,
    eps: float = KN_EPSILON,
) -> DataFrame:
    """Interpolated Kneser-Ney trigram NLL (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 4.x — the smoothing family KenLM implements and
    CCNet's filter actually runs), the stronger sibling of the
    Jelinek-Mercer :func:`trigram_nll`:

        P1(c)      = N1+(·,c) / n_bigram_types        (continuation)
        P2(c | b)  = max(c2(b,c)−D, 0)/c1(b)
                   + D·N1+(b,·)/c1(b) · P1(c)
        P3(c|a,b)  = max(c3(a,b,c)−D, 0)/c2(a,b)
                   + D·N1+(a,b,·)/c2(a,b) · P2(c | b)
        P          = (1−eps)·P3 + eps/(V+1)           (uniform escape)

    An unseen context backs off wholesale (c2(a,b)=0 → P3:=P2;
    c1(b)=0 → P2:=P1), exactly the KN recursion; the engineering
    deviation is the explicit ``eps`` escape to the uniform floor in
    place of KenLM's <unk> token — it keeps P strictly positive for
    any input and is documented rather than hidden in vocabulary
    handling. Returns (``id_col``, *carry_cols*, ``n_trigrams``,
    ``nll``), same rounding discipline as the JM form.

    Plan: the same explode + vocabulary-sized broadcast joins as
    :func:`trigram_nll` with three continuation tables added (derived
    from the checkpointed uni/bi/tri, no extra reference pass), one
    per-doc mean."""
    uni, bi, tri, totals, ncont, n1p_b, n1p_ab, kn_totals = kn_counts(
        ref, text_col
    )
    d = F.lit(float(discount))
    e = F.lit(float(eps))
    carry = [F.col(c) for c in carry_cols]

    base = df.select(
        F.col(id_col), *carry, _clean_tokens(F.col(text_col)).alias("__toks")
    )
    pos = base.select(
        id_col, *carry_cols, F.explode(_pos_structs(F.col("__toks"), 3)).alias("p")
    ).select(
        id_col,
        *carry_cols,
        F.col("p.t0").alias("a"),
        F.col("p.t1").alias("b"),
        F.col("p.t2").alias("c"),
    )

    bi_ab = bi.select("a", "b", F.col("c2").alias("__c2ab"))
    bi_bc = bi.select(
        F.col("a").alias("b"), F.col("b").alias("c"), F.col("c2").alias("__c2bc")
    )
    uni_b = uni.select(F.col("tok").alias("b"), F.col("c1").alias("__c1b"))

    j = (
        pos.join(tri, ["a", "b", "c"], "left")
        .join(bi_ab, ["a", "b"], "left")
        .join(bi_bc, ["b", "c"], "left")
        .join(uni_b, "b", "left")
        .join(ncont, "c", "left")
        .join(n1p_b, "b", "left")
        .join(n1p_ab, ["a", "b"], "left")
        .join(F.broadcast(totals))
        .join(F.broadcast(kn_totals))
    )
    p1 = F.coalesce(F.col("ncont").cast("double") / F.col("nbig"), F.lit(0.0))
    c1b = F.col("__c1b").cast("double")
    p2 = F.when(
        F.col("__c1b").isNull(), p1
    ).otherwise(
        F.greatest(F.coalesce(F.col("__c2bc").cast("double"), F.lit(0.0)) - d, F.lit(0.0)) / c1b
        + d * F.coalesce(F.col("n1p_b").cast("double"), F.lit(0.0)) / c1b * p1
    )
    c2ab = F.col("__c2ab").cast("double")
    p3 = F.when(
        F.col("__c2ab").isNull(), p2
    ).otherwise(
        F.greatest(F.coalesce(F.col("c3").cast("double"), F.lit(0.0)) - d, F.lit(0.0)) / c2ab
        + d * F.coalesce(F.col("n1p_ab").cast("double"), F.lit(0.0)) / c2ab * p2
    )
    p = (F.lit(1.0) - e) * p3 + e / (F.col("v") + 1)
    return j.groupBy(id_col, *carry_cols).agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(F.avg(-F.log(p)), 6).alias("nll"),
    )
